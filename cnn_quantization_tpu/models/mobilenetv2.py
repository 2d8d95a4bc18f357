"""MobileNet-v2 (torchvision layout), NHWC Flax implementation.

Depthwise stress case for per-channel kernels (BASELINE.json config 5).
BN folding follows the reference rule (absorb_bn.py:31): only groups==1
convs absorb their BN, so depthwise BNs remain live modules (quantized with
tag 'activation') while expand/project BNs fold into the convs at load.
Activations are ReLU6.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..engine.context import TapContext
from .layers import QBatchNorm, QConv, QLinear, SiteNamer


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0), 6)


def conv_bn_relu(x, ctx, features, *, kernel=3, stride=1, groups=1,
                 fold_bn=True, sites=(), prefix='0'):
    """torchvision ``ConvBNReLU`` as a scope-transparent helper: creating
    it as a submodule would add a scope level that torchvision's flat
    ``features.N.0`` state-dict naming does not have (caught round 4 by
    the mobilenet torch ground-truth test) — the conv/bn params must live
    DIRECTLY in the caller's scope as ``{prefix}_0``/``{prefix}_1``."""
    conv_site, bn_site = sites
    pad = (kernel - 1) // 2
    folded = fold_bn and groups == 1
    x = QConv(features, kernel, stride, pad, groups=groups, use_bias=folded,
              site=conv_site, name=f'{prefix}_0')(x, ctx)
    if not folded:
        x = QBatchNorm(features, site=bn_site, name=f'{prefix}_1')(x, ctx)
    return relu6(x)


class InvertedResidual(nn.Module):
    in_ch: int
    out_ch: int
    stride: int
    expand: int
    fold_bn: bool
    sites: tuple  # ((conv,bn) per conv in construction order)

    @nn.compact
    def __call__(self, x, ctx):
        hidden = self.in_ch * self.expand
        use_res = self.stride == 1 and self.in_ch == self.out_ch
        s = iter(self.sites)
        out = x
        idx = 0
        if self.expand != 1:
            out = conv_bn_relu(out, ctx, hidden, kernel=1, stride=1,
                               fold_bn=self.fold_bn, sites=next(s),
                               prefix=f'conv_{idx}')
            idx += 1
        out = conv_bn_relu(out, ctx, hidden, kernel=3, stride=self.stride,
                           groups=hidden, fold_bn=self.fold_bn,
                           sites=next(s), prefix=f'conv_{idx}')
        idx += 1
        conv_site, bn_site = next(s)
        folded = self.fold_bn  # project conv groups==1 -> folds
        out = QConv(self.out_ch, 1, 1, 0, use_bias=folded, site=conv_site,
                    name=f'conv_{idx}')(out, ctx)
        if not folded:
            out = QBatchNorm(self.out_ch, site=bn_site,
                             name=f'conv_{idx + 1}')(out, ctx)
        return x + out if use_res else out


_CFG = [  # t, c, n, s
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    block_specs: tuple
    sites: dict
    fold_bn: bool = True
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        st = self.sites
        x = conv_bn_relu(x, ctx, 32, kernel=3, stride=2,
                         fold_bn=self.fold_bn, sites=st['stem'],
                         prefix='features_0')
        for i, (in_ch, out_ch, stride, t, block_sites) in enumerate(self.block_specs):
            x = InvertedResidual(in_ch, out_ch, stride, t, self.fold_bn,
                                 block_sites, name=f'features_{i + 1}')(x, ctx)
        x = conv_bn_relu(x, ctx, 1280, kernel=1, stride=1,
                         fold_bn=self.fold_bn, sites=st['head'],
                         prefix='features_18')
        x = jnp.mean(x, axis=(1, 2))
        x = QLinear(self.num_classes, site=st['fc'], name='classifier_1')(x, ctx)
        return x


def build_mobilenet_v2(num_classes: int = 1000, fold_bn: bool = True) -> MobileNetV2:
    n = SiteNamer()
    sites = {'stem': (n.conv(), n.bn())}
    specs = []
    in_ch = 32
    for t, c, blocks, s in _CFG:
        for b in range(blocks):
            stride = s if b == 0 else 1
            n_convs = 3 if t != 1 else 2
            block_sites = tuple((n.conv(), n.bn()) for _ in range(n_convs))
            specs.append((in_ch, c, stride, t, block_sites))
            in_ch = c
    sites['head'] = (n.conv(), n.bn())
    sites['fc'] = n.linear(classifier=True)
    return MobileNetV2(block_specs=tuple(specs), sites=sites,
                       fold_bn=fold_bn, num_classes=num_classes)
