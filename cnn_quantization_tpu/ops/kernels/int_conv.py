"""True-int8 convolution: quantize -> int8 conv (MXU, int32 accumulate) ->
dequant epilogue.

Two lowerings:

* ``int8_conv`` (default): XLA's native int8 convolution —
  ``lax.conv_general_dilated`` on int8 codes with
  ``preferred_element_type=int32`` maps directly onto the MXU at int8 rate
  (~2x bf16 peak; measured ~3x bf16 on this chip at ResNet shapes) with the
  f32 dequant epilogue fused by XLA.  Supports strides/padding/groups
  (grouped + depthwise convs via ``feature_group_count``).
* ``int8_conv_im2col``: patches + the Pallas int8 GEMM kernel
  (ops/kernels/int_matmul.py).  The explicit-kernel path; useful where the
  epilogue must do work XLA cannot fuse, but the im2col materialization costs
  ~9x HBM traffic for 3x3 convs, so the native path is the serving default.

Activations are quantized per tensor (symmetric int8 — required so the scale
factors out of the integer accumulation), weights per output channel.  Pass
``act_scale`` (from calibration) to skip the dynamic abs-max pass — the
frozen deployment configuration.

This is the deployment-arithmetic path the reference only simulates in fp32
(SURVEY.md §2 native-code inventory; its "quantized" convs run fp32 cuDNN,
inference_quantization_manager.py:170).

Numerics contract:
  y ≈ conv(x, w) with error bounded by the two quantization steps; exact
  int32 accumulation means the result equals conv(dequant(x_q), dequant(w_q))
  up to f32 epilogue rounding — tested in tests/test_int_conv.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .int_matmul import int8_matmul_dequant, quantize_sym_int8


def prepare_int8_weights(kernel, *, bits: int = 8):
    """Offline per-output-channel symmetric quantization of an HWIO kernel.

    Returns (codes [KH, KW, I, O] int8, scale [O] f32).
    """
    return quantize_sym_int8(kernel, axis=-1, bits=bits)


def _quantize_act(x, act_bits: int, act_scale):
    if jnp.asarray(x).dtype == jnp.int8:
        # pre-quantized codes (int8-resident path): the caller must supply
        # the scale they were quantized with
        assert act_scale is not None, 'int8 codes input requires act_scale'
        return x, jnp.asarray(act_scale, jnp.float32)
    qmax = 2.0 ** (act_bits - 1) - 1.0
    xf = jnp.asarray(x, jnp.float32)
    if act_scale is None:
        return quantize_sym_int8(xf, bits=act_bits)
    scale = jnp.asarray(act_scale, jnp.float32)
    codes = jnp.clip(jnp.round(xf / scale), -qmax, qmax).astype(jnp.int8)
    return codes, scale


def int8_conv(x, w_codes, w_scale, bias=None, *, kernel_size=None,
              strides=(1, 1), padding=(0, 0), groups: int = 1,
              act_bits: int = 8, act_scale=None, fuse_relu: bool = False,
              out_dtype=jnp.float32, interpret: bool | None = None):
    """Quantize x per-tensor, convolve in int8 on the MXU, dequantize.

    ``w_codes`` [KH, KW, I, O] int8 and ``w_scale`` [O] from
    ``prepare_int8_weights``.  ``kernel_size``/``interpret`` are accepted for
    signature compatibility with the im2col path (shape comes from w_codes).
    ``x`` may already be int8 codes (with ``act_scale`` = their scale) — the
    int8-resident path used by the ResNet serving blocks.
    """
    del kernel_size, interpret  # derived from w_codes / native path
    x_q, x_scale = _quantize_act(x, act_bits, act_scale)
    if x_scale.ndim == 1:
        # per-channel activation scale vector [in_ch], constant within each
        # conv group (depthwise = groups==in_ch, the fully per-channel
        # case).  The scale factors out of the integer accumulation PER
        # GROUP: output channel o sums only over its group's inputs, so the
        # epilogue needs the per-OUTPUT-channel scale gs[group_of(o)].
        in_total = w_codes.shape[2] * groups
        features = w_codes.shape[3]
        assert x_scale.shape[0] == in_total, (x_scale.shape, in_total)
        gs = x_scale.reshape(groups, in_total // groups)[:, 0]
        x_scale_out = jnp.repeat(gs, features // groups)
    else:
        x_scale_out = x_scale
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    # Note: lowering 1x1 convs as explicit int8 GEMMs (reshape + dot_general)
    # was measured and rejected — isolated, the stage-4 expansion shape
    # (7^2 spatial, 512->2048) runs 84us as conv vs 48us as dot, but inside
    # the full serving graph the rewrite costs ~1% end-to-end (fusion
    # boundaries change), and every other 1x1 shape is 1.4-2.7x SLOWER as a
    # dot.  See README "kernel lowering notes".
    acc = lax.conv_general_dilated(
        x_q, w_codes, window_strides=tuple(strides), padding=pad,
        feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale_out
                                     * w_scale).astype(jnp.float32)
    if bias is not None:
        out = out + jnp.asarray(bias, jnp.float32)
    if fuse_relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(out_dtype)


def _extract_patches(x, kh, kw, strides, padding):
    """NHWC -> [N, Ho, Wo, KH*KW*C] patches, feature order (kh, kw, c)."""
    n, h, w, c = x.shape
    pads = ((padding[0], padding[0]), (padding[1], padding[1]))
    # conv_general_dilated_patches returns features ordered (c, kh, kw) for
    # NHWC inputs; transpose to (kh, kw, c) to match HWIO kernel flattening.
    patches = lax.conv_general_dilated_patches(
        x, (kh, kw), strides, pads,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ho, wo = patches.shape[1], patches.shape[2]
    patches = patches.reshape(n, ho, wo, c, kh * kw)
    patches = jnp.moveaxis(patches, 3, -1)  # [..., kh*kw, c]
    return patches.reshape(n, ho, wo, kh * kw * c)


def int8_conv_im2col(x, w_codes, w_scale, bias=None, *, strides=(1, 1),
                     padding=(0, 0), act_bits: int = 8, act_scale=None,
                     fuse_relu: bool = False, out_dtype=jnp.float32,
                     interpret: bool | None = None):
    """im2col + Pallas int8 GEMM lowering (explicit-kernel path).

    ``w_codes`` [KH, KW, I, O] int8 as for ``int8_conv``.
    """
    kh, kw, ic, oc = w_codes.shape
    n, h, w_in, c = x.shape
    assert c == ic, 'groups unsupported on the im2col path'

    x_q, x_scale = _quantize_act(x, act_bits, act_scale)
    if kh == kw == 1 and tuple(strides) == (1, 1) and tuple(padding) == (0, 0):
        patches = x_q.reshape(-1, c)
        ho, wo = h, w_in
    else:
        # pad in int domain (zero point is 0 for symmetric quantization)
        patches = _extract_patches(x_q, kh, kw, strides, padding)
        ho, wo = patches.shape[1], patches.shape[2]
        patches = patches.reshape(-1, kh * kw * c)

    alpha = (x_scale * w_scale).astype(jnp.float32)
    beta = (jnp.zeros_like(w_scale) if bias is None else bias).astype(jnp.float32)
    out = int8_matmul_dequant(patches.astype(jnp.int8),
                              w_codes.reshape(kh * kw * ic, oc),
                              alpha, beta, fuse_relu=fuse_relu,
                              out_dtype=out_dtype, interpret=interpret)
    return out.reshape(n, ho, wo, -1)
