"""GoogLeNet / Inception-v1 (torchvision layout), NHWC Flax implementation.

Parity notes (reference behavior under QuantizationManagerInference):
  * no 'resnet' substring and not vgg16_bn/inception_v3, so the reference
    neither BN-folds nor before-relu-marks googlenet
    (inference_sim.py:175-182) — BN layers (eps=1e-3, BasicConv2d) are live
    quantization sites;
  * torchvision's ``googlenet(pretrained=True)`` always *constructs* the two
    aux towers (then deletes them when aux_logits was not requested), so
    they consume conv/bn ids and linear0..3 — the live classifier is
    ``linear4_activation``;
  * nn.MaxPool2d modules (maxpool1..4 and each inception's branch4[0]) are
    pooling sites; the final nn.AdaptiveAvgPool2d is NOT patched by the
    reference (only MaxPool2d/AvgPool2d are — i_q_m.py:518-533), so no site;
  * pretrained transform_input renormalization matches inception_v3's.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..engine.context import TapContext
from .layers import QBatchNorm, QConv, QLinear, QMaxPool, SiteNamer, relu


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3) + ReLU."""
    features: int
    kernel_size: Any
    strides: Any = 1
    padding: Any = 0
    sites: tuple = ()  # (conv_site, bn_site)

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        conv_site, bn_site = self.sites
        x = QConv(self.features, self.kernel_size, self.strides, self.padding,
                  use_bias=False, site=conv_site, name='conv')(x, ctx)
        x = QBatchNorm(self.features, eps=1e-3, site=bn_site, name='bn')(x, ctx)
        return relu(x)


class Inception(nn.Module):
    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int
    sites: tuple  # (bc, bc, bc, bc, bc, maxpool_site, bc)

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        s = iter(self.sites)
        b1 = BasicConv2d(self.ch1x1, 1, sites=next(s), name='branch1')(x, ctx)
        b2 = BasicConv2d(self.ch3x3red, 1, sites=next(s), name='branch2_0')(x, ctx)
        b2 = BasicConv2d(self.ch3x3, 3, 1, 1, sites=next(s), name='branch2_1')(b2, ctx)
        # torchvision quirk kept for checkpoint compat: "5x5" branch is 3x3
        b3 = BasicConv2d(self.ch5x5red, 1, sites=next(s), name='branch3_0')(x, ctx)
        b3 = BasicConv2d(self.ch5x5, 3, 1, 1, sites=next(s), name='branch3_1')(b3, ctx)
        bp = QMaxPool(3, 1, 1, ceil_mode=True, site=next(s))(x, ctx)
        bp = BasicConv2d(self.pool_proj, 1, sites=next(s), name='branch4_1')(bp, ctx)
        return jnp.concatenate([b1, b2, b3, bp], axis=-1)


class GoogLeNet(nn.Module):
    sites: dict
    num_classes: int = 1000
    transform_input: bool = True

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        if self.transform_input:
            x0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            x1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            x2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([x0, x1, x2], axis=-1)
        st = self.sites
        x = BasicConv2d(64, 7, 2, 3, sites=st['conv1'], name='conv1')(x, ctx)
        x = QMaxPool(3, 2, ceil_mode=True, site=st['maxpool1'])(x, ctx)
        x = BasicConv2d(64, 1, sites=st['conv2'], name='conv2')(x, ctx)
        x = BasicConv2d(192, 3, 1, 1, sites=st['conv3'], name='conv3')(x, ctx)
        x = QMaxPool(3, 2, ceil_mode=True, site=st['maxpool2'])(x, ctx)
        x = Inception(64, 96, 128, 16, 32, 32, st['3a'], name='inception3a')(x, ctx)
        x = Inception(128, 128, 192, 32, 96, 64, st['3b'], name='inception3b')(x, ctx)
        x = QMaxPool(3, 2, ceil_mode=True, site=st['maxpool3'])(x, ctx)
        x = Inception(192, 96, 208, 16, 48, 64, st['4a'], name='inception4a')(x, ctx)
        x = Inception(160, 112, 224, 24, 64, 64, st['4b'], name='inception4b')(x, ctx)
        x = Inception(128, 128, 256, 24, 64, 64, st['4c'], name='inception4c')(x, ctx)
        x = Inception(112, 144, 288, 32, 64, 64, st['4d'], name='inception4d')(x, ctx)
        x = Inception(256, 160, 320, 32, 128, 128, st['4e'], name='inception4e')(x, ctx)
        x = QMaxPool(2, 2, ceil_mode=True, site=st['maxpool4'])(x, ctx)
        x = Inception(256, 160, 320, 32, 128, 128, st['5a'], name='inception5a')(x, ctx)
        x = Inception(384, 192, 384, 48, 128, 128, st['5b'], name='inception5b')(x, ctx)
        # aux towers consume site ids at construction but never run at
        # inference (deleted by torchvision when aux_logits not requested)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d: not a site
        return QLinear(self.num_classes, site=st['fc'], name='fc')(x, ctx)


def build_googlenet(num_classes: int = 1000, transform_input: bool = True) -> GoogLeNet:
    n = SiteNamer()

    def bc():
        return (n.conv(), n.bn())

    sites: dict = {}
    sites['conv1'] = bc()
    sites['maxpool1'] = n.maxpool()
    sites['conv2'] = bc()
    sites['conv3'] = bc()
    sites['maxpool2'] = n.maxpool()
    for key in ('3a', '3b'):
        sites[key] = (bc(), bc(), bc(), bc(), bc(), n.maxpool(), bc())
    sites['maxpool3'] = n.maxpool()
    for key in ('4a', '4b', '4c', '4d', '4e'):
        sites[key] = (bc(), bc(), bc(), bc(), bc(), n.maxpool(), bc())
    sites['maxpool4'] = n.maxpool()
    for key in ('5a', '5b'):
        sites[key] = (bc(), bc(), bc(), bc(), bc(), n.maxpool(), bc())
    # aux1/aux2: conv+bn, fc1, fc2 each -> consume conv/bn ids and linear0..3
    for _ in range(2):
        bc()
        n.linear()
        n.linear()
    sites['fc'] = n.linear(classifier=True)
    return GoogLeNet(sites=sites, num_classes=num_classes,
                     transform_input=transform_input)
