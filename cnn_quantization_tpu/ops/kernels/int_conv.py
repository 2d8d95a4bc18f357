"""True-int8 convolution: quantize -> int8 GEMM (MXU) -> dequant epilogue.

NHWC conv lowered to im2col + the Pallas int8 matmul kernel.  Activations
are quantized per tensor (symmetric int8 — required so the scale factors out
of the integer accumulation), weights per output channel (symmetric int8).
This is the deployment-arithmetic path the reference only simulates in fp32
(SURVEY.md §2, "TPU-native equivalent").

Numerics contract:
  y ≈ conv(x, w) with error bounded by the two quantization steps; exact
  int32 accumulation means the result equals conv(dequant(x_q), dequant(w_q))
  up to f32 epilogue rounding — tested in tests/test_int_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .int_matmul import int8_matmul_dequant, quantize_sym_int8


def prepare_int8_weights(kernel, *, bits: int = 8):
    """Offline per-output-channel symmetric quantization of an HWIO kernel.

    Returns (codes [K*K*I, O] int8, scale [O] f32).
    """
    kh, kw, ic, oc = kernel.shape
    codes, scale = quantize_sym_int8(kernel, axis=-1, bits=bits)
    return codes.reshape(kh * kw * ic, oc), scale


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


def int8_conv(x, w_codes, w_scale, bias=None, *, kernel_size, strides=(1, 1),
              padding=(0, 0), act_bits: int = 8, fuse_relu: bool = False,
              out_dtype=jnp.float32, interpret: bool | None = None):
    """Quantize x per-tensor, convolve in int8, dequantize.

    ``w_codes`` [KH*KW*I, O] int8 and ``w_scale`` [O] from
    ``prepare_int8_weights``.
    """
    kh, kw = kernel_size
    n, h, w_in, c = x.shape

    x_q, x_scale = quantize_sym_int8(x, bits=act_bits)
    if kh == kw == 1 and strides == (1, 1) and padding == (0, 0):
        patches = x_q.reshape(-1, c)
        ho, wo = h, w_in
    else:
        # pad in int domain (zero point is 0 for symmetric quantization)
        patches = _extract_patches(x_q.astype(jnp.int8), kh, kw, strides, padding)
        ho, wo = patches.shape[1], patches.shape[2]
        patches = patches.reshape(-1, kh * kw * c)

    alpha = (x_scale * w_scale).astype(jnp.float32)
    beta = (jnp.zeros_like(w_scale) if bias is None else bias).astype(jnp.float32)
    out = int8_matmul_dequant(patches.astype(jnp.int8), w_codes, alpha, beta,
                              fuse_relu=fuse_relu, out_dtype=out_dtype,
                              interpret=interpret)
    return out.reshape(n, ho, wo, -1)
