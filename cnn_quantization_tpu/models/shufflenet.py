"""ShuffleNet v1 (groups=8), NHWC Flax implementation.

The reference evaluates a user-supplied ShuffleNet(groups=8) checkpoint
(inference/inference_sim.py:155-160).  Grouped and depthwise convs keep
their BNs live (absorb_bn.py:31 folds only groups==1), so this arch runs
unfolded.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..engine.context import TapContext
from .layers import QAvgPool, QBatchNorm, QConv, QLinear, QMaxPool, SiteNamer, relu

# output channels per stage for each group count (ShuffleNet v1 table 1)
_STAGE_OUT = {1: (144, 288, 576), 2: (200, 400, 800), 3: (240, 480, 960),
              4: (272, 544, 1088), 8: (384, 768, 1536)}
_REPEATS = (3, 7, 3)


def channel_shuffle(x, groups: int):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


class ShuffleUnit(nn.Module):
    out_ch: int
    groups: int
    stride: int
    first_group: bool  # stage2's first 1x1 uses groups=1
    sites: tuple       # ((conv,bn) x3, optional avgpool site)

    @nn.compact
    def __call__(self, x, ctx):
        in_ch = x.shape[-1]
        bottleneck = self.out_ch // 4
        (c1, b1), (c2, b2), (c3, b3) = self.sites[:3]
        g1 = 1 if self.first_group else self.groups
        branch_out = self.out_ch - in_ch if self.stride > 1 else self.out_ch

        out = QConv(bottleneck, 1, groups=g1, use_bias=False, site=c1,
                    name='gconv1')(x, ctx)
        out = QBatchNorm(bottleneck, site=b1, name='bn1')(out, ctx)
        out = relu(out)
        out = channel_shuffle(out, self.groups)
        out = QConv(bottleneck, 3, self.stride, 1, groups=bottleneck,
                    use_bias=False, site=c2, name='dwconv')(out, ctx)
        out = QBatchNorm(bottleneck, site=b2, name='bn2')(out, ctx)
        out = QConv(branch_out, 1, groups=self.groups, use_bias=False, site=c3,
                    name='gconv3')(out, ctx)
        out = QBatchNorm(branch_out, site=b3, name='bn3')(out, ctx)

        if self.stride > 1:
            shortcut = QAvgPool(3, 2, 1, site=self.sites[3], name='shortcut_pool')(x, ctx)
            return relu(jnp.concatenate([shortcut, out], axis=-1))
        return relu(x + out)


class ShuffleNet(nn.Module):
    groups: int
    sites: dict
    unit_specs: tuple
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        st = self.sites
        c0, b0 = st['stem']
        x = QConv(24, 3, 2, 1, use_bias=False, site=c0, name='conv1')(x, ctx)
        x = QBatchNorm(24, site=b0, name='bn1')(x, ctx)
        x = relu(x)
        x = QMaxPool(3, 2, 1, site=st['maxpool'], name='maxpool')(x, ctx)
        for i, (out_ch, stride, first_group, unit_sites) in enumerate(self.unit_specs):
            x = ShuffleUnit(out_ch, self.groups, stride, first_group,
                            unit_sites, name=f'stage_{i}')(x, ctx)
        x = jnp.mean(x, axis=(1, 2))
        x = QLinear(self.num_classes, site=st['fc'], name='fc')(x, ctx)
        return x


def build_shufflenet(groups: int = 8, num_classes: int = 1000) -> ShuffleNet:
    outs = _STAGE_OUT[groups]
    n = SiteNamer()
    sites = {'stem': (n.conv(), n.bn()), 'maxpool': n.maxpool()}
    specs = []
    for si, (out_ch, reps) in enumerate(zip(outs, _REPEATS)):
        unit_sites = tuple([(n.conv(), n.bn()) for _ in range(3)] + [n.avgpool()])
        specs.append((out_ch, 2, si == 0, unit_sites))
        for _ in range(reps):
            unit_sites = tuple((n.conv(), n.bn()) for _ in range(3))
            specs.append((out_ch, 1, False, unit_sites))
    sites['fc'] = n.linear(classifier=True)
    return ShuffleNet(groups=groups, sites=sites, unit_specs=tuple(specs),
                      num_classes=num_classes)
