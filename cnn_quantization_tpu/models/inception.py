"""Inception-v3 (torchvision layout), NHWC Flax implementation.

Construction-order notes replicated from the reference era torchvision:
  * pooling is functional (F.max_pool2d / F.avg_pool2d) in Inception3, so
    there are NO pool quantization sites in this arch — matching the
    reference's interception, which only wraps nn.* module classes;
  * the aux tower (conv0, conv1, fc) is constructed between Mixed_6e and
    Mixed_7a, consuming conv ids and linear0, so the final classifier is
    ``linear1_activation`` — exactly as in the reference's sweep list
    (inference_sim.py:125);
  * fused-relu arch (every tap feeds a ReLU): force_positive at policy level;
  * BN eps is 1e-3 (BasicConv2d), folded at load time;
  * the first two stem convs stay 8-bit by name (i_q_m.py:360-362) — see
    ModelMeta.eight_bit_weight_names in models/zoo.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..engine.context import Site, TapContext
from .layers import QBatchNorm, QConv, SiteNamer, relu


def _avg_pool(x, window, strides, padding):
    w = (window, window)
    s = (strides, strides)
    p = (padding, padding)
    y = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, (1, w[0], w[1], 1),
        (1, s[0], s[1], 1), ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)))
    return (y / (w[0] * w[1])).astype(x.dtype)


def _max_pool(x, window, strides):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, strides, strides, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)))


class BasicConv2d(nn.Module):
    """conv + BN(eps=1e-3) + ReLU; BN folded at load when fold_bn."""
    features: int
    kernel_size: Any
    strides: Any = 1
    padding: Any = 0
    fold_bn: bool = True
    sites: tuple = ()  # (conv_site, bn_site)

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        conv_site, bn_site = self.sites
        x = QConv(self.features, self.kernel_size, self.strides, self.padding,
                  use_bias=self.fold_bn, site=conv_site, name='conv')(x, ctx)
        if not self.fold_bn:
            x = QBatchNorm(self.features, eps=1e-3, site=bn_site, name='bn')(x, ctx)
        return relu(x)


class InceptionA(nn.Module):
    pool_features: int
    fold_bn: bool
    sites: tuple

    @nn.compact
    def __call__(self, x, ctx):
        s = iter(self.sites)
        b1 = BasicConv2d(64, 1, fold_bn=self.fold_bn, sites=next(s), name='branch1x1')(x, ctx)
        b5 = BasicConv2d(48, 1, fold_bn=self.fold_bn, sites=next(s), name='branch5x5_1')(x, ctx)
        b5 = BasicConv2d(64, 5, 1, 2, fold_bn=self.fold_bn, sites=next(s), name='branch5x5_2')(b5, ctx)
        b3 = BasicConv2d(64, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_1')(x, ctx)
        b3 = BasicConv2d(96, 3, 1, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_2')(b3, ctx)
        b3 = BasicConv2d(96, 3, 1, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_3')(b3, ctx)
        bp = _avg_pool(x, 3, 1, 1)
        bp = BasicConv2d(self.pool_features, 1, fold_bn=self.fold_bn, sites=next(s), name='branch_pool')(bp, ctx)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    fold_bn: bool
    sites: tuple

    @nn.compact
    def __call__(self, x, ctx):
        s = iter(self.sites)
        b3 = BasicConv2d(384, 3, 2, fold_bn=self.fold_bn, sites=next(s), name='branch3x3')(x, ctx)
        bd = BasicConv2d(64, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_1')(x, ctx)
        bd = BasicConv2d(96, 3, 1, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_2')(bd, ctx)
        bd = BasicConv2d(96, 3, 2, fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_3')(bd, ctx)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fold_bn: bool
    sites: tuple

    @nn.compact
    def __call__(self, x, ctx):
        s = iter(self.sites)
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, 1, fold_bn=self.fold_bn, sites=next(s), name='branch1x1')(x, ctx)
        b7 = BasicConv2d(c7, 1, fold_bn=self.fold_bn, sites=next(s), name='branch7x7_1')(x, ctx)
        b7 = BasicConv2d(c7, (1, 7), 1, (0, 3), fold_bn=self.fold_bn, sites=next(s), name='branch7x7_2')(b7, ctx)
        b7 = BasicConv2d(192, (7, 1), 1, (3, 0), fold_bn=self.fold_bn, sites=next(s), name='branch7x7_3')(b7, ctx)
        bd = BasicConv2d(c7, 1, fold_bn=self.fold_bn, sites=next(s), name='branch7x7dbl_1')(x, ctx)
        bd = BasicConv2d(c7, (7, 1), 1, (3, 0), fold_bn=self.fold_bn, sites=next(s), name='branch7x7dbl_2')(bd, ctx)
        bd = BasicConv2d(c7, (1, 7), 1, (0, 3), fold_bn=self.fold_bn, sites=next(s), name='branch7x7dbl_3')(bd, ctx)
        bd = BasicConv2d(c7, (7, 1), 1, (3, 0), fold_bn=self.fold_bn, sites=next(s), name='branch7x7dbl_4')(bd, ctx)
        bd = BasicConv2d(192, (1, 7), 1, (0, 3), fold_bn=self.fold_bn, sites=next(s), name='branch7x7dbl_5')(bd, ctx)
        bp = _avg_pool(x, 3, 1, 1)
        bp = BasicConv2d(192, 1, fold_bn=self.fold_bn, sites=next(s), name='branch_pool')(bp, ctx)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    fold_bn: bool
    sites: tuple

    @nn.compact
    def __call__(self, x, ctx):
        s = iter(self.sites)
        b3 = BasicConv2d(192, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3_1')(x, ctx)
        b3 = BasicConv2d(320, 3, 2, fold_bn=self.fold_bn, sites=next(s), name='branch3x3_2')(b3, ctx)
        b7 = BasicConv2d(192, 1, fold_bn=self.fold_bn, sites=next(s), name='branch7x7x3_1')(x, ctx)
        b7 = BasicConv2d(192, (1, 7), 1, (0, 3), fold_bn=self.fold_bn, sites=next(s), name='branch7x7x3_2')(b7, ctx)
        b7 = BasicConv2d(192, (7, 1), 1, (3, 0), fold_bn=self.fold_bn, sites=next(s), name='branch7x7x3_3')(b7, ctx)
        b7 = BasicConv2d(192, 3, 2, fold_bn=self.fold_bn, sites=next(s), name='branch7x7x3_4')(b7, ctx)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    fold_bn: bool
    sites: tuple

    @nn.compact
    def __call__(self, x, ctx):
        s = iter(self.sites)
        b1 = BasicConv2d(320, 1, fold_bn=self.fold_bn, sites=next(s), name='branch1x1')(x, ctx)
        b3 = BasicConv2d(384, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3_1')(x, ctx)
        b3a = BasicConv2d(384, (1, 3), 1, (0, 1), fold_bn=self.fold_bn, sites=next(s), name='branch3x3_2a')(b3, ctx)
        b3b = BasicConv2d(384, (3, 1), 1, (1, 0), fold_bn=self.fold_bn, sites=next(s), name='branch3x3_2b')(b3, ctx)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_1')(x, ctx)
        bd = BasicConv2d(384, 3, 1, 1, fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_2')(bd, ctx)
        bda = BasicConv2d(384, (1, 3), 1, (0, 1), fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_3a')(bd, ctx)
        bdb = BasicConv2d(384, (3, 1), 1, (1, 0), fold_bn=self.fold_bn, sites=next(s), name='branch3x3dbl_3b')(bd, ctx)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool(x, 3, 1, 1)
        bp = BasicConv2d(192, 1, fold_bn=self.fold_bn, sites=next(s), name='branch_pool')(bp, ctx)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class Inception3(nn.Module):
    sites: dict
    fold_bn: bool = True
    num_classes: int = 1000
    transform_input: bool = True

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        from .layers import QLinear
        if self.transform_input:
            # torchvision's pretrained input renormalization
            x0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            x1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            x2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([x0, x1, x2], axis=-1)
        st = self.sites
        fb = self.fold_bn
        x = BasicConv2d(32, 3, 2, fold_bn=fb, sites=st['c1a'], name='Conv2d_1a_3x3')(x, ctx)
        x = BasicConv2d(32, 3, fold_bn=fb, sites=st['c2a'], name='Conv2d_2a_3x3')(x, ctx)
        x = BasicConv2d(64, 3, 1, 1, fold_bn=fb, sites=st['c2b'], name='Conv2d_2b_3x3')(x, ctx)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, 1, fold_bn=fb, sites=st['c3b'], name='Conv2d_3b_1x1')(x, ctx)
        x = BasicConv2d(192, 3, fold_bn=fb, sites=st['c4a'], name='Conv2d_4a_3x3')(x, ctx)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, fb, st['m5b'], name='Mixed_5b')(x, ctx)
        x = InceptionA(64, fb, st['m5c'], name='Mixed_5c')(x, ctx)
        x = InceptionA(64, fb, st['m5d'], name='Mixed_5d')(x, ctx)
        x = InceptionB(fb, st['m6a'], name='Mixed_6a')(x, ctx)
        x = InceptionC(128, fb, st['m6b'], name='Mixed_6b')(x, ctx)
        x = InceptionC(160, fb, st['m6c'], name='Mixed_6c')(x, ctx)
        x = InceptionC(160, fb, st['m6d'], name='Mixed_6d')(x, ctx)
        x = InceptionC(192, fb, st['m6e'], name='Mixed_6e')(x, ctx)
        # aux tower exists for checkpoint parity but never runs at inference
        x = InceptionD(fb, st['m7a'], name='Mixed_7a')(x, ctx)
        x = InceptionE(fb, st['m7b'], name='Mixed_7b')(x, ctx)
        x = InceptionE(fb, st['m7c'], name='Mixed_7c')(x, ctx)
        x = jnp.mean(x, axis=(1, 2))  # global average pool (functional)
        x = QLinear(self.num_classes, site=st['fc'], name='fc')(x, ctx)
        return x


def build_inception_v3(num_classes: int = 1000, fold_bn: bool = True,
                       transform_input: bool = True) -> Inception3:
    n = SiteNamer()

    def bc():
        return (n.conv(), n.bn())

    sites = {}
    for key in ('c1a', 'c2a', 'c2b', 'c3b', 'c4a'):
        sites[key] = bc()
    for key in ('m5b', 'm5c', 'm5d'):
        sites[key] = tuple(bc() for _ in range(7))
    sites['m6a'] = tuple(bc() for _ in range(4))
    for key in ('m6b', 'm6c', 'm6d', 'm6e'):
        sites[key] = tuple(bc() for _ in range(10))
    # aux tower constructed here: conv0, conv1 + linear0 (consume ids)
    sites['aux'] = (bc(), bc(), n.linear(classifier=True))
    sites['m7a'] = tuple(bc() for _ in range(6))
    for key in ('m7b', 'm7c'):
        sites[key] = tuple(bc() for _ in range(9))
    sites['fc'] = n.linear(classifier=True)
    return Inception3(sites=sites, fold_bn=fold_bn, num_classes=num_classes,
                      transform_input=transform_input)
