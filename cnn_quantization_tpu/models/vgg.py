"""VGG family (11/13/16/19, +BN variants), NHWC Flax implementation.

Mirrors torchvision VGG: a conv/maxpool feature stack followed by the
4096-4096-1000 classifier.  These are fused-relu architectures in the
reference (every tapped tensor feeds a ReLU), so activation quantizers run
with force_positive at the policy level rather than per-site marks
(inference_quantization_manager.py:492).  vgg*_bn variants fold BN at load
(inference_sim.py:179-182); plain variants have no BN at all.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn

from ..engine.context import Site, TapContext
from .layers import QConv, QLinear, QMaxPool, SiteNamer, relu

_CFGS = {
    'vgg11': (64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'),
    'vgg13': (64, 64, 'M', 128, 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'),
    'vgg16': (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512, 'M',
              512, 512, 512, 'M'),
    'vgg19': (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M', 512, 512, 512, 512,
              'M', 512, 512, 512, 512, 'M'),
}


class VGG(nn.Module):
    cfg: tuple
    batch_norm: bool
    fold_bn: bool
    feature_sites: tuple        # Site per cfg entry (conv -> (conv,bn) sites, 'M' -> pool site)
    classifier_sites: tuple     # (linear0, linear1, linear2)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        from .layers import QBatchNorm
        folded = (not self.batch_norm) or self.fold_bn
        torch_idx = 0
        for entry, sites in zip(self.cfg, self.feature_sites):
            if entry == 'M':
                x = QMaxPool(2, 2, site=sites, name=f'features_{torch_idx}')(x, ctx)
                torch_idx += 1
            else:
                conv_site, bn_site = sites
                x = QConv(entry, 3, 1, 1, use_bias=folded, site=conv_site,
                          name=f'features_{torch_idx}')(x, ctx)
                torch_idx += 1
                if self.batch_norm:
                    if not self.fold_bn:
                        x = QBatchNorm(entry, site=bn_site,
                                       name=f'features_{torch_idx}')(x, ctx)
                    torch_idx += 1
                x = relu(x)
                torch_idx += 1  # the ReLU slot in torchvision numbering
        x = x.reshape(x.shape[0], -1)
        l0, l1, l2 = self.classifier_sites
        x = relu(QLinear(4096, site=l0, name='classifier_0')(x, ctx))
        x = relu(QLinear(4096, site=l1, name='classifier_3')(x, ctx))
        x = QLinear(self.num_classes, site=l2, name='classifier_6')(x, ctx)
        return x


def build_vgg(arch: str, fold_bn: bool = True, num_classes: int = 1000) -> VGG:
    base = arch.replace('_bn', '')
    batch_norm = arch.endswith('_bn')
    cfg = _CFGS[base]
    namer = SiteNamer()
    feature_sites = []
    for entry in cfg:
        if entry == 'M':
            feature_sites.append(namer.maxpool())
        else:
            conv_site = namer.conv()
            bn_site = namer.bn() if batch_norm else None
            feature_sites.append((conv_site, bn_site))
    classifier_sites = (namer.linear(), namer.linear(),
                        namer.linear(classifier=True))
    return VGG(cfg=cfg, batch_norm=batch_norm, fold_bn=fold_bn,
               feature_sites=tuple(feature_sites),
               classifier_sites=classifier_sites, num_classes=num_classes)
