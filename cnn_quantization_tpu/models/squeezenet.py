"""SqueezeNet 1.0 / 1.1 (torchvision layout), NHWC Flax implementation.

Fused-relu arch in the reference ('squeezenet' in arch,
inference_quantization_manager.py:492).  The final classifier conv has 1000
output channels, so its activation site carries the classifier tag
(Conv2dWithId tag rule, i_q_m.py:171).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..engine.context import TapContext
from .layers import QConv, QGlobalAvgPool, QMaxPool, SiteNamer, relu


class Fire(nn.Module):
    squeeze: int
    expand1: int
    expand3: int
    sites: tuple  # (squeeze_site, e1_site, e3_site)

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        s, e1, e3 = self.sites
        x = relu(QConv(self.squeeze, 1, site=s, name='squeeze')(x, ctx))
        a = relu(QConv(self.expand1, 1, site=e1, name='expand1x1')(x, ctx))
        b = relu(QConv(self.expand3, 3, 1, 1, site=e3, name='expand3x3')(x, ctx))
        return jnp.concatenate([a, b], axis=-1)


_FIRE_CFG = {
    'squeezenet1_0': dict(
        stem=(96, 7, 2, 0),
        stages=[(3, [(16, 64, 64), (16, 64, 64), (32, 128, 128)]),
                (3, [(32, 128, 128), (48, 192, 192), (48, 192, 192), (64, 256, 256)]),
                (3, [(64, 256, 256)])]),
    'squeezenet1_1': dict(
        stem=(64, 3, 2, 0),
        stages=[(3, [(16, 64, 64), (16, 64, 64)]),
                (3, [(32, 128, 128), (32, 128, 128)]),
                (3, [(48, 192, 192), (48, 192, 192), (64, 256, 256), (64, 256, 256)])]),
}


class SqueezeNet(nn.Module):
    cfg: tuple
    sites: tuple
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        stem, stages = self.cfg
        stem_site, fire_sites, pool_sites, cls_site, gap_site = self.sites
        feats, k, s, p = stem
        idx = 0
        x = relu(QConv(feats, k, s, p, site=stem_site, name='features_0')(x, ctx))
        torch_idx = 2
        fi = 0
        for pi, (pool_k, fires) in enumerate(stages):
            x = QMaxPool(pool_k, 2, ceil_mode=True, site=pool_sites[pi],
                         name=f'features_{torch_idx}')(x, ctx)
            torch_idx += 1
            for sq, e1, e3 in fires:
                x = Fire(sq, e1, e3, fire_sites[fi],
                         name=f'features_{torch_idx}')(x, ctx)
                torch_idx += 1
                fi += 1
        x = QConv(self.num_classes, 1, site=cls_site, name='classifier_1')(x, ctx)
        x = relu(x)
        x = QGlobalAvgPool(site=gap_site, name='avgpool')(x, ctx)
        return x.reshape(x.shape[0], -1)


def build_squeezenet(arch: str = 'squeezenet1_0', num_classes: int = 1000) -> SqueezeNet:
    cfg = _FIRE_CFG[arch]
    n = SiteNamer()
    stem_site = n.conv()
    fire_sites = []
    pool_sites = []
    # torchvision constructs features sequentially: pools interleave with
    # fire modules; per-kind counters make the interleaving irrelevant
    for pool_k, fires in cfg['stages']:
        pool_sites.append(n.maxpool())
        for _ in fires:
            fire_sites.append((n.conv(), n.conv(), n.conv()))
    cls_site = n.conv(classifier=True)
    gap_site = n.avgpool(classifier=True)
    return SqueezeNet(cfg=(cfg['stem'], tuple(cfg['stages'])),
                      sites=(stem_site, tuple(fire_sites), tuple(pool_sites),
                             cls_site, gap_site),
                      num_classes=num_classes)
