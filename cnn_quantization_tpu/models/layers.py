"""Flax layer primitives with quantization tap sites (NHWC / HWIO).

The TPU-native replacement for the reference's ``*WithId`` intercepting
layers (reference: pytorch_quantizer/quantization/inference/
inference_quantization_manager.py:28-283): instead of monkeypatched classes
with global id counters, each layer carries a static ``Site`` and calls the
explicit ``TapContext`` on its output.  Layouts are TPU-native: activations
NHWC, conv kernels HWIO, linear kernels [in, out].
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..engine.context import Site, TapContext


class QTensor(NamedTuple):
    """Pre-quantized activation: int8 codes + the f32 scale they encode.

    The int8-resident serving path (ResNet blocks) quantizes a block input
    once and feeds the codes to every consumer (conv1, downsample, residual
    dequant), so the bf16 boundary tensor never hits HBM — the requantize
    fuses into the producing fusion and only 1-byte codes travel between
    blocks.
    """
    codes: Any   # int8, same layout as the float tensor it replaces
    scale: Any   # f32 scalar

    def dequant(self, dtype=jnp.float32):
        return (self.codes.astype(jnp.float32) * self.scale).astype(dtype)


class PackedQTensor(NamedTuple):
    """Int4 codes packed two-per-byte (W4A4 packed serving): channel dim is
    HALVED vs the float tensor.  Packing layout is the Pallas kernel's
    group-local split-half convention (ops/kernels/int4_matmul.py) — only
    Pallas GEMMs produce/consume these on the hot path; ``dequant`` exists
    for boundary cases (tap inspection, final block feeding avgpool)."""
    codes: Any   # int8 bytes, [..., C/2]
    scale: Any   # f32 scalar

    def dequant(self, dtype=jnp.float32):
        from ..ops.kernels.int4_matmul import unpack_int4
        return (unpack_int4(self.codes).astype(jnp.float32)
                * self.scale).astype(dtype)


class SiteNamer:
    """Construction-order id counters mirroring the reference's
    ``itertools.count`` class attributes, so site ids like ``conv12_activation``
    match the reference's layer numbering for the same architecture."""

    def __init__(self):
        self.counters: dict[str, int] = {}

    def next(self, kind: str) -> int:
        i = self.counters.get(kind, 0)
        self.counters[kind] = i + 1
        return i

    def conv(self, half_range: bool = False, classifier: bool = False) -> Site:
        i = self.next('conv')
        tag = 'activation_classifier' if classifier else 'activation'
        return Site(id=f'conv{i}_activation', tag=tag, half_range=half_range, kind='conv')

    def bn(self, half_range: bool = False) -> Site:
        i = self.next('bn')
        return Site(id=f'bn{i}_activation', tag='activation', half_range=half_range, kind='bn')

    def linear(self, classifier: bool = False, half_range: bool = False) -> Site:
        i = self.next('linear')
        tag = 'activation_classifier' if classifier else 'activation_linear'
        return Site(id=f'linear{i}_activation', tag=tag,
                    half_range=half_range and not classifier, kind='linear')

    def maxpool(self) -> Site:
        i = self.next('maxpool')
        return Site(id=f'maxpool{i}_out', tag='activation_pooling', kind='maxpool')

    def avgpool(self, classifier: bool = False) -> Site:
        """AvgPool2dWithId computes a classifier/pooling tag but passes it
        positionally as the ``id`` argument of quantize_instant
        (inference_quantization_manager.py:95-99), so the reference always
        quantizes avgpool outputs with the *default* int8 quantizer — the
        'default' tag here mirrors that quirk (see engine/policy.py)."""
        i = self.next('avgpool')
        return Site(id=f'avgpool{i}_out', tag='default', kind='avgpool')


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class QConv(nn.Module):
    """Conv2d with bias, tapped output (Conv2dWithId analogue).

    ``out_codes=True`` marks convs whose output feeds only a residual add
    (ResNet downsample convs): at serving time, when calibration froze an
    output scale (``<site>:out``), the conv emits a ``QTensor`` so the
    identity tensor crosses HBM as 1-byte codes instead of bf16 — measured
    the largest remaining bf16 round-trip of the serving path (one 196 MiB
    tensor per stage at batch 128).
    """
    features: int
    kernel_size: Any
    strides: Any = 1
    padding: Any = 0
    groups: int = 1
    use_bias: bool = True
    site: Site | None = None
    out_codes: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: TapContext, residual=None, out_spec=None,
                 fuse_relu: bool = False):
        """``residual``/``out_spec``/``fuse_relu`` are packed-serving-only
        block-orchestration inputs (models/resnet.py Bottleneck):
        residual = PackedQTensor added (dequantized) before the fused ReLU
        inside the Pallas epilogue; out_spec = ('int8'|'packed', scale)
        requantizes the output to codes at the NEXT consumer's frozen
        scale; ignored on every other path."""
        kh, kw = _pair(self.kernel_size)
        packed_in = isinstance(x, PackedQTensor)
        prequant = isinstance(x, QTensor)
        if prequant:
            x, pre_scale = x.codes, x.scale
        in_ch = x.codes.shape[-1] * 2 if packed_in else x.shape[-1]
        if (getattr(ctx, 'int8_serving', False)
                and self.scope.has_variable('params', 'kernel')):
            # serving apply: read the prepared kernel without flax's shape
            # check — prepare_serving_params(s2d_stem=True) stores the stem
            # kernel in its space-to-depth form [4,4,12,O], a different
            # shape than the declared 7x7x3xO
            kernel = self.scope.get_variable('params', 'kernel')
        else:
            kernel = self.param(
                'kernel', nn.initializers.he_normal(),
                (kh, kw, in_ch // self.groups, self.features), jnp.float32)
        pad = _pair(self.padding)
        # s2d stem (opt-in): prepare_serving_params(s2d_stem=True)
        # transformed the 7x7/2 stem kernel to an equivalent int8 [4,4,12,O]
        # stride-1 kernel (engine.py s2d_stem_kernel).  Not the default:
        # measured ~parity with the bf16 stem on v5e/XLA (see
        # prepare_serving_params docstring + README kernel lowering notes)
        stem_s2d = (in_ch == 3 and kernel.ndim == 4
                    and kernel.dtype == jnp.int8
                    and kernel.shape[:3] == (4, 4, 12))
        if getattr(ctx, 'int8_serving', False) and (stem_s2d or not (
                in_ch == 3 and getattr(ctx, 'bf16_first_conv', True))):
            # true-int path: per-tensor act quant (frozen scale if the context
            # carries one for this site) + per-channel int8 weights on the
            # MXU's native int8 conv (ops/kernels/int_conv.py)
            from ..ops.kernels.int_conv import int8_conv, prepare_int8_weights
            act_bits = getattr(ctx, 'act_bits', 8)
            w_bits = getattr(ctx, 'weight_bits', 8)
            if in_ch == 3 or stem_s2d:
                # first layer (any in_ch==3 conv, s2d or direct int8 stem) is
                # the 8-bit exception (reference i_q_m.py:336-338, 360-366);
                # must match freeze_serving_scales' conv0 full-grid scale
                # (engine.py freeze_serving_scales) or the frozen clip/127
                # scale would be replayed with a +/-(2^(b-1)-1) clamp,
                # covering only ~7/127 of the calibrated range at b=4
                act_bits = 8
            if kernel.dtype == jnp.int8:
                # offline-prepared tree (QuantEngine.prepare_serving_params):
                # kernel holds the int8 codes, 'w_scale' their per-channel
                # scale — no per-call weight quantization, 1-byte HBM reads
                w_codes = kernel
                w_scale = self.param('w_scale', nn.initializers.ones,
                                     (self.features,), jnp.float32)
            else:
                w_codes, w_scale = prepare_int8_weights(kernel, bits=w_bits)
            bias = (self.param('bias', nn.initializers.zeros,
                               (self.features,), jnp.float32)
                    if self.use_bias else None)
            if (getattr(ctx, 'packed', False) and (kh, kw) == (1, 1)
                    and in_ch != 3 and kernel.dtype == jnp.int8
                    and (out_spec is not None or residual is not None)):
                # only when the block orchestrator drives this conv
                # (resnet.py Bottleneck passes out_spec/residual); a stray
                # 1x1 conv in packed mode (e.g. a BasicBlock downsample)
                # stays on the XLA path unchanged
                y = _packed_gemm_1x1(
                    self, ctx, x, packed_in=packed_in, prequant=prequant,
                    pre_scale=pre_scale if prequant else None,
                    kernel=kernel, w_scale=w_scale, bias=bias,
                    residual=residual, out_spec=out_spec,
                    fuse_relu=fuse_relu, act_bits=act_bits)
                if self.site is not None:
                    y = ctx.tap(y, self.site)
                return y
            # past the Pallas branch: fail loudly rather than silently
            # dropping a residual the packed orchestration handed us
            # (e.g. packed mode on un-prepared float params)
            assert residual is None, (
                'residual fusion requires the packed 1x1 Pallas path '
                '(prepare_serving_params + frozen scales)')
            # grouped convs admit PER-GROUP activation scales in true-int
            # arithmetic: output channel o accumulates only over its
            # group's inputs, so acc[o] * gs[group_of(o)] * w_scale[o] is
            # exact (int8_conv does the mapping).  Depthwise (groups ==
            # channels) is the fully per-channel case — the known fix for
            # MobileNet-family int8 sensitivity; ResNeXt/ShuffleNet
            # grouped convs get the per-group form.  Regular convs stay
            # per-tensor.
            per_group = (self.groups > 1 and in_ch % self.groups == 0
                         and self.features % self.groups == 0)
            if prequant:
                act_scale = pre_scale
            else:
                act_scale = None
                if self.site is not None:
                    act_scale = getattr(ctx, 'act_scales', {}).get(self.site.id)
                if act_scale is None:
                    # dynamic abs-max; record so calibration can freeze it
                    xf32 = x.astype(jnp.float32)
                    qmax = 2.0 ** (act_bits - 1) - 1.0
                    if per_group:
                        per = in_ch // self.groups
                        amax = jnp.repeat(jnp.max(
                            jnp.abs(xf32).reshape(-1, self.groups, per),
                            axis=(0, 2)), per)
                    else:
                        amax = jnp.max(jnp.abs(xf32))
                    act_scale = jnp.maximum(amax / qmax, 1e-8)
                    if self.site is not None and hasattr(ctx, 'record_scale'):
                        ctx.record_scale(self.site.id, act_scale)
                        if getattr(ctx, 'calibrate', False):
                            ctx.record_input_stats(
                                self.site.id, xf32,
                                groups=self.groups if per_group else 1)
            if stem_s2d:
                # the [4,4,12,O] kernel is the s2d rewrite of a 7x7 stride-2
                # pad-3 stem ONLY — fail loudly on any other declared conv
                # config instead of silently computing a wrong conv
                assert _pair(self.strides) == (2, 2) and pad == (3, 3), (
                    f's2d stem kernel requires the 7x7/2 pad-3 stem, got '
                    f'strides={self.strides} padding={self.padding}')
                # quantize the image at the frozen (or just-recorded) scale,
                # THEN pad + space-to-depth in the int8 domain (zero padding
                # is exact at zero-point 0), stride-1 equivalent conv
                from ..engine.engine import s2d_stem_input
                codes = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                                 -127, 127).astype(jnp.int8)
                y = int8_conv(s2d_stem_input(codes), w_codes, w_scale, bias,
                              strides=(1, 1), padding=(0, 0), act_bits=8,
                              act_scale=act_scale, out_dtype=self.dtype)
            else:
                x_in = x if prequant else x.astype(jnp.float32)
                y = int8_conv(x_in, w_codes, w_scale, bias,
                              strides=_pair(self.strides), padding=pad,
                              groups=self.groups, act_bits=act_bits,
                              act_scale=act_scale, out_dtype=self.dtype)
            if out_spec is not None:
                # packed-serving orchestration (Bottleneck conv2): requant
                # the XLA conv's output to codes at the NEXT consumer's
                # frozen scale — pure elementwise, fuses into the conv's
                # epilogue so only 1-byte codes cross HBM
                yq = y.astype(jnp.float32)
                if fuse_relu:
                    yq = jnp.maximum(yq, 0.0)
                oscale = jnp.asarray(out_spec[1], jnp.float32)
                qmb = 2.0 ** (act_bits - 1) - 1.0
                codes = jnp.clip(jnp.round(yq / oscale),
                                 -qmb, qmb).astype(jnp.int8)
                if out_spec[0] == 'packed':
                    from ..ops.kernels.int4_matmul import pack_int4
                    y = PackedQTensor(pack_int4(codes), oscale)
                else:
                    y = QTensor(codes, oscale)
                if self.site is not None:
                    y = ctx.tap(y, self.site)
                return y
            if self.out_codes and self.site is not None:
                out_scale = getattr(ctx, 'act_scales', {}).get(
                    self.site.id + ':out')
                if out_scale is None and getattr(ctx, 'calibrate', False):
                    ctx.record_input_stats(self.site.id + ':out',
                                           y.astype(jnp.float32))
                elif out_scale is not None:
                    # identity path crosses HBM as codes; full int8 grid
                    # regardless of act_bits (the codes are only dequantized
                    # for the residual add, never fed to an int conv)
                    oscale = jnp.asarray(out_scale, jnp.float32)
                    oc = jnp.clip(jnp.round(y.astype(jnp.float32) / oscale),
                                  -127, 127).astype(jnp.int8)
                    y = QTensor(oc, oscale)
            if self.site is not None:
                y = ctx.tap(y, self.site)
            return y
        if prequant:  # safety: dequantize codes on the float path
            x = (x.astype(jnp.float32) * pre_scale)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=_pair(self.strides),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            feature_group_count=self.groups,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        y = y.astype(self.dtype)
        if self.site is not None:
            y = ctx.tap(y, self.site)
        return y


def _packed_gemm_1x1(mod, ctx, x, *, packed_in, prequant, pre_scale, kernel,
                     w_scale, bias, residual, out_spec, fuse_relu, act_bits):
    """Packed-serving 1x1 conv == Pallas int4 GEMM: packed (or plain int8)
    codes in, fused dequant/residual/ReLU/requant epilogue, codes out —
    block boundaries cross HBM at 4 bits (ops/kernels/int4_matmul.py);
    orchestrated by models/resnet.py Bottleneck.  ``mod`` is the QConv.
    """
    from ..ops.kernels.int4_matmul import int4_matmul
    if packed_in:
        a, a_scale, a_packed = x.codes, x.scale, True
    elif prequant:
        a, a_scale, a_packed = x, pre_scale, False
    else:
        a_scale = None
        if mod.site is not None:
            a_scale = getattr(ctx, 'act_scales', {}).get(mod.site.id)
        assert a_scale is not None, \
            'packed serving requires frozen activation scales'
        qm = 2.0 ** (act_bits - 1) - 1.0
        a = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                     -qm, qm).astype(jnp.int8)
        a_packed = False
    s = _pair(mod.strides)
    if s != (1, 1):
        a = a[:, ::s[0], ::s[1], :]
    n, h, w, cc = a.shape
    in_ch = kernel.shape[2]
    alpha = (jnp.asarray(a_scale, jnp.float32) * w_scale).astype(jnp.float32)
    beta = (jnp.zeros((mod.features,), jnp.float32)
            if bias is None else bias.astype(jnp.float32))
    res2 = res_scale = None
    if residual is not None:
        res2 = residual.codes.reshape(-1, residual.codes.shape[-1])
        res_scale = residual.scale
    mode = 'f32' if out_spec is None else out_spec[0]
    out_scale = None if out_spec is None else out_spec[1]
    y2 = int4_matmul(
        a.reshape(n * h * w, cc), kernel.reshape(in_ch, mod.features),
        alpha, beta, residual=res2, res_scale=res_scale, out_scale=out_scale,
        a_packed=a_packed, fuse_relu=fuse_relu, out_mode=mode,
        out_qmax=2.0 ** (act_bits - 1) - 1.0, out_dtype=mod.dtype)
    if mode == 'packed':
        return PackedQTensor(y2.reshape(n, h, w, mod.features // 2),
                             jnp.asarray(out_scale, jnp.float32))
    if mode == 'int8':
        return QTensor(y2.reshape(n, h, w, mod.features),
                       jnp.asarray(out_scale, jnp.float32))
    return y2.reshape(n, h, w, mod.features)


class QLinear(nn.Module):
    """Linear with tapped output (LinearWithId analogue)."""
    features: int
    use_bias: bool = True
    site: Site | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        kernel = self.param('kernel', nn.initializers.he_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        if getattr(ctx, 'int8_serving', False):
            # true-int path; classifier/linear stays 8-bit regardless of the
            # conv bit widths (reference weight_classifier/
            # activation_classifier policy, i_q_m.py:414, 437)
            from ..ops.kernels.int_matmul import quantize_sym_int8
            if kernel.dtype == jnp.int8:
                w_codes = kernel
                w_scale = self.param('w_scale', nn.initializers.ones,
                                     (self.features,), jnp.float32)
            else:
                w_codes, w_scale = quantize_sym_int8(kernel, axis=-1, bits=8)
            act_scale = None
            if self.site is not None:
                act_scale = getattr(ctx, 'act_scales', {}).get(self.site.id)
            xf = x.astype(jnp.float32)
            if act_scale is None:
                act_scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
                if self.site is not None and hasattr(ctx, 'record_scale'):
                    ctx.record_scale(self.site.id, act_scale)
                    if getattr(ctx, 'calibrate', False):
                        ctx.record_input_stats(self.site.id, xf)
            x_q = jnp.clip(jnp.round(xf / act_scale), -127, 127).astype(jnp.int8)
            acc = lax.dot_general(
                x_q, w_codes, (((x_q.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (act_scale * w_scale)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        y = y.astype(self.dtype)
        if self.site is not None:
            y = ctx.tap(y, self.site)
        return y


class QBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d with tapped output.

    Only instantiated for architectures where BN is *not* folded into the
    preceding conv; folded models never construct this module
    (BatchNorm2dWithId's absorbed check, i_q_m.py:264-265, resolved
    statically at model build time instead of per-forward).
    """
    features: int
    eps: float = 1e-5
    site: Site | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        scale = self.param('scale', nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param('mean', nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param('var', nn.initializers.ones, (self.features,), jnp.float32)
        inv = scale * lax.rsqrt(var + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv + bias
        y = y.astype(self.dtype)
        if self.site is not None:
            y = ctx.tap(y, self.site)
        return y


class QMaxPool(nn.Module):
    """MaxPool2d with tapped output (MaxPool2dWithId analogue).

    ``ceil_mode`` pads the right/bottom with -inf so the output size rounds
    up, matching torch's ceil_mode=True (used by squeezenet/inception).
    """
    window: Any
    strides: Any
    padding: Any = 0
    ceil_mode: bool = False
    site: Site | None = None

    def __call__(self, x, ctx: TapContext):
        prequant = isinstance(x, QTensor)
        if prequant:
            # max commutes with the (monotone, symmetric) dequant, so pooling
            # runs directly on int8 codes — the serving stem's bf16 maxpool
            # round-trip becomes a 1-byte one
            x, scale = x.codes, x.scale
        w = _pair(self.window)
        s = _pair(self.strides)
        p = _pair(self.padding)
        hi_pad = [p[0], p[1]]
        if self.ceil_mode:
            for d in (0, 1):
                size = x.shape[1 + d] + 2 * p[d]
                out_ceil = -(-(size - w[d]) // s[d]) + 1
                hi_pad[d] = p[d] + max(0, (out_ceil - 1) * s[d] + w[d] - size)
        init = (jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
                if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf)
        y = lax.reduce_window(
            x, init, lax.max, (1, w[0], w[1], 1), (1, s[0], s[1], 1),
            ((0, 0), (p[0], hi_pad[0]), (p[1], hi_pad[1]), (0, 0)))
        if prequant:
            y = QTensor(y, scale)
        if self.site is not None:
            y = ctx.tap(y, self.site)
        return y


class QAvgPool(nn.Module):
    """AvgPool2d (count_include_pad=True, torch default) with tapped output."""
    window: Any
    strides: Any = None
    padding: Any = 0
    site: Site | None = None

    def __call__(self, x, ctx: TapContext):
        w = _pair(self.window)
        s = _pair(self.strides if self.strides is not None else self.window)
        p = _pair(self.padding)
        y = lax.reduce_window(
            x.astype(jnp.float32), 0.0, lax.add, (1, w[0], w[1], 1),
            (1, s[0], s[1], 1), ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)))
        y = (y / (w[0] * w[1])).astype(x.dtype)
        if self.site is not None:
            y = ctx.tap(y, self.site)
        return y


class QGlobalAvgPool(nn.Module):
    """Adaptive 1x1 average pool, tapped like AvgPool2dWithId."""
    site: Site | None = None

    def __call__(self, x, ctx: TapContext):
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        if self.site is not None:
            y = ctx.tap(y, self.site)
        return y


def relu(x):
    """ReLU — quantization of ReLU outputs is disabled in the reference
    (ReLUWithId, i_q_m.py:28-48), so no tap here."""
    return jnp.maximum(x, 0)
