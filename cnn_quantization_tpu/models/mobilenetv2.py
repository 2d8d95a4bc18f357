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


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    fold_bn: bool = True
    sites: tuple = ()   # (conv_site, bn_site)
    prefix: str = '0'

    @nn.compact
    def __call__(self, x, ctx):
        conv_site, bn_site = self.sites
        pad = (self.kernel - 1) // 2
        folded = self.fold_bn and self.groups == 1
        x = QConv(self.features, self.kernel, self.stride, pad,
                  groups=self.groups, use_bias=folded, site=conv_site,
                  name=f'{self.prefix}_0')(x, ctx)
        if not folded:
            x = QBatchNorm(self.features, site=bn_site,
                           name=f'{self.prefix}_1')(x, ctx)
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
            out = ConvBNReLU(hidden, 1, 1, fold_bn=self.fold_bn,
                             sites=next(s), prefix=f'conv_{idx}')(out, ctx)
            idx += 1
        out = ConvBNReLU(hidden, 3, self.stride, groups=hidden,
                         fold_bn=self.fold_bn, sites=next(s),
                         prefix=f'conv_{idx}')(out, ctx)
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
        x = ConvBNReLU(32, 3, 2, fold_bn=self.fold_bn, sites=st['stem'],
                       prefix='0', name='features_0')(x, ctx)
        for i, (in_ch, out_ch, stride, t, block_sites) in enumerate(self.block_specs):
            x = InvertedResidual(in_ch, out_ch, stride, t, self.fold_bn,
                                 block_sites, name=f'features_{i + 1}')(x, ctx)
        x = ConvBNReLU(1280, 1, 1, fold_bn=self.fold_bn, sites=st['head'],
                       prefix='0', name='features_18')(x, ctx)
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
