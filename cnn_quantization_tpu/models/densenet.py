"""DenseNet 121/161/169/201 (torchvision layout), NHWC Flax implementation.

Parity notes vs the reference's interception (reference:
pytorch_quantizer/quantization/inference/inference_quantization_manager.py):
  * the arch name contains no 'resnet' substring, so the reference neither
    BN-folds nor before-relu-marks densenets (inference_sim.py:175-182) —
    BN layers are live quantization sites here, and no half_range marks;
  * densenet is pre-activation (norm -> relu -> conv), so conv outputs feed
    concatenations and BN outputs feed ReLUs; taps land on both, exactly as
    Conv2dWithId / BatchNorm2dWithId would;
  * torchvision construction order fixes site numbering: features(conv0,
    norm0, pool0), then denseblock{i}.denselayer{j}(norm1, conv1, norm2,
    conv2), transitions (norm, conv, nn.AvgPool2d -> avgpool site), norm5,
    classifier Linear; the final adaptive average pool is functional in
    torchvision's forward, hence NOT a site;
  * state-dict keys convert mechanically: 'features.denseblock1.denselayer1
    .conv1' -> params['features']['denseblock1']['denselayer1']['conv1'].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..engine.context import TapContext
from .layers import (QAvgPool, QBatchNorm, QConv, QLinear, QMaxPool,
                     SiteNamer, relu)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    sites: tuple  # ((bn1, conv1, bn2, conv2) Sites)

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        b1, c1, b2, c2 = self.sites
        ch_in = x.shape[-1]
        h = QBatchNorm(ch_in, site=b1, name='norm1')(x, ctx)
        h = relu(h)
        h = QConv(self.bn_size * self.growth_rate, 1, use_bias=False,
                  site=c1, name='conv1')(h, ctx)
        h = QBatchNorm(self.bn_size * self.growth_rate, site=b2, name='norm2')(h, ctx)
        h = relu(h)
        h = QConv(self.growth_rate, 3, 1, 1, use_bias=False,
                  site=c2, name='conv2')(h, ctx)
        return h


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    bn_size: int
    sites: tuple  # per-layer site tuples

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        for j in range(self.num_layers):
            new = DenseLayer(self.growth_rate, self.bn_size,
                             self.sites[j], name=f'denselayer{j + 1}')(x, ctx)
            x = jnp.concatenate([x, new], axis=-1)
        return x


class Transition(nn.Module):
    out_features: int
    sites: tuple  # (bn, conv, avgpool)

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        b, c, p = self.sites
        x = QBatchNorm(x.shape[-1], site=b, name='norm')(x, ctx)
        x = relu(x)
        x = QConv(self.out_features, 1, use_bias=False, site=c, name='conv')(x, ctx)
        return QAvgPool(2, 2, site=p, name='pool')(x, ctx)


class DenseFeatures(nn.Module):
    block_config: tuple
    growth_rate: int
    num_init_features: int
    bn_size: int
    sites: dict

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        st = self.sites
        x = QConv(self.num_init_features, 7, 2, 3, use_bias=False,
                  site=st['conv0'], name='conv0')(x, ctx)
        x = QBatchNorm(self.num_init_features, site=st['norm0'], name='norm0')(x, ctx)
        x = relu(x)
        x = QMaxPool(3, 2, 1, site=st['pool0'], name='pool0')(x, ctx)
        num_features = self.num_init_features
        for i, n_layers in enumerate(self.block_config):
            x = DenseBlock(n_layers, self.growth_rate, self.bn_size,
                           st[f'block{i + 1}'], name=f'denseblock{i + 1}')(x, ctx)
            num_features += n_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                x = Transition(num_features // 2, st[f'trans{i + 1}'],
                               name=f'transition{i + 1}')(x, ctx)
                num_features //= 2
        x = QBatchNorm(num_features, site=st['norm5'], name='norm5')(x, ctx)
        return x


class DenseNet(nn.Module):
    block_config: tuple
    growth_rate: int
    num_init_features: int
    sites: dict
    bn_size: int = 4
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        x = DenseFeatures(self.block_config, self.growth_rate,
                          self.num_init_features, self.bn_size, self.sites,
                          name='features')(x, ctx)
        x = relu(x)
        x = jnp.mean(x, axis=(1, 2))  # functional adaptive pool: no site
        return QLinear(self.num_classes, site=self.sites['classifier'],
                       name='classifier')(x, ctx)


_CFG = {
    # arch: (growth_rate, block_config, num_init_features)
    'densenet121': (32, (6, 12, 24, 16), 64),
    'densenet161': (48, (6, 12, 36, 24), 96),
    'densenet169': (32, (6, 12, 32, 32), 64),
    'densenet201': (32, (6, 12, 48, 32), 64),
}


def build_densenet(arch: str, num_classes: int = 1000) -> DenseNet:
    growth, blocks, init_feat = _CFG[arch]
    n = SiteNamer()
    sites: dict = {
        'conv0': n.conv(), 'norm0': n.bn(), 'pool0': n.maxpool(),
    }
    for i, n_layers in enumerate(blocks):
        sites[f'block{i + 1}'] = tuple(
            (n.bn(), n.conv(), n.bn(), n.conv()) for _ in range(n_layers))
        if i != len(blocks) - 1:
            sites[f'trans{i + 1}'] = (n.bn(), n.conv(), n.avgpool())
    sites['norm5'] = n.bn()
    sites['classifier'] = n.linear(classifier=True)
    return DenseNet(block_config=blocks, growth_rate=growth,
                    num_init_features=init_feat, sites=sites,
                    num_classes=num_classes)
