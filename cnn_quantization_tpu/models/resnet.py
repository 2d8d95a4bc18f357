"""ResNet family (18/34/50/101/152), TPU-native NHWC Flax implementation.

Structure and parameter naming mirror torchvision's ResNet so pretrained
checkpoints convert mechanically; *site ids* replicate the reference's
construction-order numbering of ``Conv2dWithId`` (downsample convs are
constructed before the first block of each stage, reference behavior via
torchvision ``_make_layer``), so 8-bit exception lists like
``conv52_activation`` (inference/inference_sim.py:114-125) are portable.

BN is folded into convs at parameter-load time for this family (the
reference folds resnets — inference_sim.py:179-182, utils/absorb_bn.py), so
the module tree carries no BN layers when ``fold_bn=True``; convs then have
biases.  ``before_relu`` marking (utils/mark_relu.py) is baked statically
into the sites: stem conv, and conv1/conv2 of a Bottleneck (conv1 of a
BasicBlock) are half-range sites.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..engine.context import Site, TapContext
from .layers import (PackedQTensor, QAvgPool, QBatchNorm, QConv, QLinear,
                     QMaxPool, QTensor, SiteNamer, relu)


def _dequant_identity(identity, dtype):
    """Residual identity may arrive as int8 codes (downsample out-codes or
    the stem's pooled codes); dequantize for the add — the dequant fuses
    into the consuming conv's epilogue, so only 1-byte codes cross HBM."""
    if isinstance(identity, QTensor):
        return identity.dequant(dtype)
    return identity


def _serving_block_input(x, ctx, conv1_site):
    """Int8-resident serving: quantize the block input ONCE at conv1's frozen
    scale and hand the codes to every consumer (conv1, downsample, residual
    dequant).  The block-boundary bf16 tensor then has a single consumer
    (this quantize), so XLA fuses it into the producing fusion and only
    1-byte codes travel between blocks — measured the dominant HBM traffic
    of the serving path at the 56x56 stages.

    Returns (x_in, identity): the conv input (QTensor or raw) and the
    residual tensor.  Falls back to the plain path when not serving or when
    no frozen scale exists (dynamic serving keeps per-conv abs-max)."""
    if not getattr(ctx, 'int8_serving', False) or isinstance(x, QTensor):
        return x, x
    scale = getattr(ctx, 'act_scales', {}).get(conv1_site.id)
    if scale is None:
        return x, x
    import jax.numpy as jnp
    act_bits = getattr(ctx, 'act_bits', 8)
    qmax = 2.0 ** (act_bits - 1) - 1.0
    scale = jnp.asarray(scale, jnp.float32)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -qmax, qmax).astype(jnp.int8)
    q = QTensor(codes, scale)
    return q, q.dequant(x.dtype)


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    planes: int
    stride: int
    in_planes: int
    bottleneck: bool
    fold_bn: bool
    has_downsample: bool
    ds_sites: tuple  # (conv_site, bn_site) or ()
    conv_sites: tuple  # ((conv_site, bn_site), ...) per conv in the block
    dtype: str = 'float32'
    groups: int = 1       # ResNeXt cardinality (torchvision Bottleneck)
    base_width: int = 64  # WideResNet width_per_group

    @property
    def out_planes(self) -> int:
        return self.planes * (4 if self.bottleneck else 1)


class BasicBlock(nn.Module):
    spec: BlockSpec

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        s = self.spec
        fold = s.fold_bn
        dt = jnp.dtype(s.dtype)
        (c1, b1), (c2, b2) = s.conv_sites
        x, identity = _serving_block_input(x, ctx, c1)
        out = QConv(s.planes, 3, s.stride, 1, use_bias=fold, site=c1, dtype=dt, name='conv1')(x, ctx)
        if not fold:
            out = QBatchNorm(s.planes, site=b1, name='bn1')(out, ctx)
        out = relu(out)
        out = QConv(s.planes, 3, 1, 1, use_bias=fold, site=c2, dtype=dt, name='conv2')(out, ctx)
        if not fold:
            out = QBatchNorm(s.planes, site=b2, name='bn2')(out, ctx)
        if s.has_downsample:
            dc, db = s.ds_sites
            identity = QConv(s.out_planes, 1, s.stride, 0, use_bias=fold,
                             site=dc, out_codes=fold, dtype=dt,
                             name='downsample_0')(x, ctx)
            if not fold:
                identity = QBatchNorm(s.out_planes, site=db, name='downsample_1')(identity, ctx)
        return relu(out + _dequant_identity(identity, dt))


class Bottleneck(nn.Module):
    spec: BlockSpec

    @nn.compact
    def __call__(self, x, ctx: TapContext, out_spec=False):
        # out_spec: False = plain path; in packed serving, ResNet passes
        # ('packed', next_block_scale) or None (last block -> float out)
        s = self.spec
        fold = s.fold_bn
        dt = jnp.dtype(s.dtype)
        width = int(s.planes * (s.base_width / 64.0)) * s.groups
        (c1, b1), (c2, b2), (c3, b3) = s.conv_sites
        if out_spec is not False and getattr(ctx, 'packed', False):
            # W4A4 packed serving (orchestrated by ResNet.__call__, which
            # passes out_spec= the NEXT block's frozen input spec, or None
            # for the last block): conv1/conv3/downsample run as Pallas
            # int4 GEMMs, conv2 stays an XLA int8 conv emitting codes at
            # conv3's frozen scale; the residual identity is added packed
            # inside conv3's epilogue.  Every inter-conv tensor is int8
            # codes and every block boundary is 4-bit packed.
            scales = getattr(ctx, 'act_scales', {})
            out = QConv(width, 1, 1, 0, use_bias=fold, site=c1, dtype=dt,
                        name='conv1')(x, ctx, fuse_relu=True,
                                      out_spec=('int8', scales[c2.id]))
            out = QConv(width, 3, s.stride, 1, groups=s.groups,
                        use_bias=fold, site=c2, dtype=dt, name='conv2')(
                out, ctx, fuse_relu=True, out_spec=('int8', scales[c3.id]))
            if s.has_downsample:
                dc, _db = s.ds_sites
                identity = QConv(
                    s.out_planes, 1, s.stride, 0, use_bias=fold, site=dc,
                    out_codes=fold, dtype=dt, name='downsample_0')(
                    x, ctx, out_spec=('packed',
                                      scales[dc.id + ':out:packed']))
            else:
                identity = x  # packed codes from the previous block
            return QConv(s.out_planes, 1, 1, 0, use_bias=fold, site=c3,
                         dtype=dt, name='conv3')(
                out, ctx, residual=identity, fuse_relu=True,
                out_spec=out_spec)
        x, identity = _serving_block_input(x, ctx, c1)
        out = QConv(width, 1, 1, 0, use_bias=fold, site=c1, dtype=dt, name='conv1')(x, ctx)
        if not fold:
            out = QBatchNorm(width, site=b1, name='bn1')(out, ctx)
        out = relu(out)
        out = QConv(width, 3, s.stride, 1, groups=s.groups, use_bias=fold,
                    site=c2, dtype=dt, name='conv2')(out, ctx)
        if not fold:
            out = QBatchNorm(width, site=b2, name='bn2')(out, ctx)
        out = relu(out)
        out = QConv(s.out_planes, 1, 1, 0, use_bias=fold, site=c3, dtype=dt, name='conv3')(out, ctx)
        if not fold:
            out = QBatchNorm(s.out_planes, site=b3, name='bn3')(out, ctx)
        if s.has_downsample:
            dc, db = s.ds_sites
            identity = QConv(s.out_planes, 1, s.stride, 0, use_bias=fold,
                             site=dc, out_codes=fold, dtype=dt,
                             name='downsample_0')(x, ctx)
            if not fold:
                identity = QBatchNorm(s.out_planes, site=db, name='downsample_1')(identity, ctx)
        return relu(out + _dequant_identity(identity, dt))


class ResNet(nn.Module):
    stem_sites: tuple            # (conv_site, bn_site, maxpool_site)
    stage_specs: tuple           # tuple of tuples of BlockSpec
    avgpool_site: Site
    fc_site: Site
    fold_bn: bool = True
    num_classes: int = 1000
    dtype: str = 'float32'

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        dt = jnp.dtype(self.dtype)
        x = x.astype(dt)
        conv_site, bn_site, mp_site = self.stem_sites
        x = QConv(64, 7, 2, 3, use_bias=self.fold_bn, site=conv_site, dtype=dt, name='conv1')(x, ctx)
        if not self.fold_bn:
            x = QBatchNorm(64, site=bn_site, name='bn1')(x, ctx)
        x = relu(x)
        if getattr(ctx, 'int8_serving', False) and self.fold_bn:
            # serving: quantize the stem output at the first block conv's
            # frozen input scale and max-pool on int8 codes (max commutes
            # with dequant) — the 112x112 bf16 stem tensor becomes 1-byte
            first_site = self.stage_specs[0][0].conv_sites[0][0]
            scale = getattr(ctx, 'act_scales', {}).get(first_site.id)
            if scale is not None:
                act_bits = getattr(ctx, 'act_bits', 8)
                qmax = 2.0 ** (act_bits - 1) - 1.0
                s = jnp.asarray(scale, jnp.float32)
                codes = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                                 -qmax, qmax).astype(jnp.int8)
                x = QTensor(codes, s)
        x = QMaxPool(3, 2, 1, site=mp_site, name='maxpool')(x, ctx)
        blocks = [spec for stage in self.stage_specs for spec in stage]
        # W4A4 packed serving is all-or-nothing across the trunk: every
        # block must be a Bottleneck with group-alignable output channels
        # and every needed frozen scale present (block input scales, conv2/
        # conv3 input scales, downsample ':out:packed' scales — the latter
        # exist ONLY when freeze_serving_scales ran with packed=True, so
        # int8-grid frozen scales can never engage the packed epilogue) —
        # else the model falls back to the plain int8-resident serving path
        # everywhere.
        # ctx.packed may be True (all stages) or a tuple of 1-based stage
        # indices (e.g. (1,) = Pallas-orchestrate stage 1 only, stages 2-4
        # stay on the plain int8-resident XLA path) — the XLA<->Pallas
        # friction is per-stage, so the profitable zone is selectable.
        pk = getattr(ctx, 'packed', False)
        pk_stages = (tuple(pk) if isinstance(pk, (tuple, list))
                     else ((1, 2, 3, 4) if pk else ()))
        packed_ok = (bool(pk_stages) and self.fold_bn
                     and all(sp.bottleneck and sp.out_planes % 256 == 0
                             for sp in blocks))
        if packed_ok:
            scales = getattr(ctx, 'act_scales', {})
            need = []
            for sp in blocks:
                need += [sp.conv_sites[0][0].id, sp.conv_sites[1][0].id,
                         sp.conv_sites[2][0].id]
                if sp.has_downsample:
                    need.append(sp.ds_sites[0].id + ':out:packed')
            packed_ok = all(n in scales for n in need)
        idx = 0
        for li, stage in enumerate(self.stage_specs):
            for bi, spec in enumerate(stage):
                block = Bottleneck if spec.bottleneck else BasicBlock
                if packed_ok and (li + 1) in pk_stages:
                    nxt = blocks[idx + 1] if idx + 1 < len(blocks) else None
                    if nxt is None:
                        out_spec = None  # last block: float out to avgpool
                    else:
                        nxt_scale = scales[nxt.conv_sites[0][0].id]
                        # boundary into a Pallas-orchestrated block crosses
                        # HBM 4-bit packed; into a plain block, int8 codes
                        # (the plain path's QTensor block input)
                        nxt_stage = next(
                            si + 1 for si, st in enumerate(self.stage_specs)
                            for b in st if b is nxt)
                        mode = ('packed' if nxt_stage in pk_stages
                                else 'int8')
                        out_spec = (mode, nxt_scale)
                    x = block(spec, name=f'layer{li + 1}_{bi}')(
                        x, ctx, out_spec=out_spec)
                else:
                    # packed->plain stage boundaries arrive as int8 codes
                    # (out_spec 'int8' above), never as PackedQTensor
                    assert not isinstance(x, PackedQTensor)
                    x = block(spec, name=f'layer{li + 1}_{bi}')(x, ctx)
                idx += 1
        x = QAvgPool(x.shape[1], 1, site=self.avgpool_site, name='avgpool')(x, ctx)
        x = x.reshape(x.shape[0], -1)
        x = QLinear(self.num_classes, site=self.fc_site, dtype=dt, name='fc')(x, ctx)
        return x.astype(jnp.float32)


_LAYER_CFG = {
    # arch: (block kind, stage depths, groups, width_per_group)
    'resnet18': ('basic', (2, 2, 2, 2), 1, 64),
    'resnet34': ('basic', (3, 4, 6, 3), 1, 64),
    'resnet50': ('bottleneck', (3, 4, 6, 3), 1, 64),
    'resnet101': ('bottleneck', (3, 4, 23, 3), 1, 64),
    'resnet152': ('bottleneck', (3, 8, 36, 3), 1, 64),
    'resnext50_32x4d': ('bottleneck', (3, 4, 6, 3), 32, 4),
    'resnext101_32x8d': ('bottleneck', (3, 4, 23, 3), 32, 8),
    'wide_resnet50_2': ('bottleneck', (3, 4, 6, 3), 1, 128),
    'wide_resnet101_2': ('bottleneck', (3, 4, 23, 3), 1, 128),
}


def build_resnet(arch: str, fold_bn: bool = True, num_classes: int = 1000,
                 dtype: str = 'float32', mark_relu: bool | None = None) -> ResNet:
    """Build a ResNet with reference-compatible site numbering.

    Construction-order rules replicated from torchvision + the reference:
      * stem conv/bn first,
      * per stage: downsample conv/bn constructed *before* block 0's convs,
      * before_relu half-range marks per utils/mark_relu.py:4-29, applied
        only when ``'resnet' in arch`` (inference_sim.py:175-177) — so
        resnext* is neither marked nor BN-folded in the reference, while
        wide_resnet* is both.
    """
    kind, depths, groups, base_width = _LAYER_CFG[arch]
    bottleneck = kind == 'bottleneck'
    expansion = 4 if bottleneck else 1
    if mark_relu is None:
        mark_relu = 'resnet' in arch
    hr = mark_relu  # half_range on before-relu sites
    namer = SiteNamer()

    stem = (namer.conv(half_range=hr), namer.bn(half_range=hr), namer.maxpool())

    in_planes = 64
    stages = []
    for si, depth in enumerate(depths):
        planes = 64 * (2 ** si)
        stride = 1 if si == 0 else 2
        blocks = []
        for bi in range(depth):
            blk_stride = stride if bi == 0 else 1
            has_ds = bi == 0 and (blk_stride != 1 or in_planes != planes * expansion)
            ds_sites = (namer.conv(), namer.bn()) if has_ds else ()
            if bottleneck:
                conv_sites = (
                    (namer.conv(half_range=hr), namer.bn(half_range=hr)),
                    (namer.conv(half_range=hr), namer.bn(half_range=hr)),
                    (namer.conv(), namer.bn()),
                )
            else:
                conv_sites = (
                    (namer.conv(half_range=hr), namer.bn(half_range=hr)),
                    (namer.conv(), namer.bn()),
                )
            blocks.append(BlockSpec(
                planes=planes, stride=blk_stride, in_planes=in_planes,
                bottleneck=bottleneck, fold_bn=fold_bn, has_downsample=has_ds,
                ds_sites=ds_sites, conv_sites=conv_sites, dtype=dtype,
                groups=groups, base_width=base_width))
            in_planes = planes * expansion
        stages.append(tuple(blocks))

    return ResNet(stem_sites=stem, stage_specs=tuple(stages),
                  avgpool_site=namer.avgpool(), fc_site=namer.linear(classifier=True),
                  fold_bn=fold_bn, num_classes=num_classes, dtype=dtype)
