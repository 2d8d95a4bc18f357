"""Core GEMMLOWP-style affine fake-quantization math (pure jnp).

Executable spec: the reference's ``__gemmlowpQuantize1__``
(reference: pytorch_quantizer/quantization/qtypes/int_quantizer.py:557-603) and
the CUDA kernel ``float2gemmlowp`` (reference: kernels/gemmlowp.cu:8-45).

Semantics preserved exactly:
  * uint quantization grid [0, qmax], qmax = 2**bits - 1
  * scale = delta / qmax, floored at 1e-8
  * "true zero": zero_point = round(-offset / scale); q = round(clamp(x/scale + zp, 0, qmax))
  * dequant: (q - zp) * scale
  * per-channel bit widths: qmax is a per-channel vector, scale = delta/qmax
    where qmax > 0 (else 0, then floored at 1e-8)

All functions are shape-polymorphic over a trailing "reduction" layout:
per-channel operation means the *leading* axis indexes channels and the
remaining axes are flattened, mirroring the reference's [C, N*H*W] /
[OFM, IFM*K1*K2] layouts — except that callers on TPU should prefer
channels-last layouts and use the ``axis`` arguments to avoid transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALE_EPS = 1e-8


def qmax_for_bits(bits) -> jnp.ndarray:
    """2**bits - 1, elementwise (bits may be a float/int array)."""
    return 2.0 ** jnp.asarray(bits, jnp.float32) - 1.0


def affine_qparams(delta, offset, qmax):
    """Compute (scale, zero_point) from range ``delta``, min ``offset``, ``qmax``.

    Mirrors int_quantizer.py:557-572: scale = delta/qmax (0 where qmax == 0),
    floored at 1e-8; zero_point = round(-offset/scale) so that 0 is exactly
    representable ("enforce_true_zero", always on in the reference).
    """
    delta = jnp.asarray(delta, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    qmax = jnp.asarray(qmax, jnp.float32)
    scale = jnp.where(qmax > 0, delta / jnp.maximum(qmax, 1.0), 0.0)
    scale = jnp.maximum(scale, SCALE_EPS)
    zero_point = jnp.round(-offset / scale)
    return scale, zero_point


def fake_quant(x, delta, offset, qmax, *, channel_axis: int | None = None):
    """Fused quantize->dequantize to the affine uint grid.

    ``delta``/``offset``/``qmax`` are scalars (per-tensor) or 1-D vectors of
    length x.shape[channel_axis] (per-channel).  Per-channel bit allocation is
    expressed by passing a per-channel ``qmax`` vector.

    Reference: int_quantizer.py:557-603 (clamp-then-round ordering is
    equivalent to round-then-clamp on this monotone grid and matches both
    reference paths).
    """
    x = jnp.asarray(x)
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    scale, zero_point = affine_qparams(delta, offset, qmax)
    qmax = jnp.asarray(qmax, jnp.float32)

    if channel_axis is not None and jnp.ndim(scale) > 0:
        shape = [1] * xf.ndim
        shape[channel_axis] = xf.shape[channel_axis]
        scale = scale.reshape(shape)
        zero_point = zero_point.reshape(shape)
        if jnp.ndim(qmax) > 0:
            qmax = qmax.reshape(shape)

    q = xf / scale + zero_point
    q = jnp.clip(q, 0.0, qmax)
    q = jnp.round(q)
    deq = (q - zero_point) * scale
    return deq.astype(out_dtype)


def quantize_codes(x, delta, offset, qmax, *, channel_axis: int | None = None):
    """Quantize only: return integer codes (float dtype) plus (scale, zp).

    Used by the entropy/rate measurement path and by the true-int kernels.
    """
    xf = jnp.asarray(x, jnp.float32)
    scale, zero_point = affine_qparams(delta, offset, qmax)
    qmaxf = jnp.asarray(qmax, jnp.float32)
    if channel_axis is not None and jnp.ndim(scale) > 0:
        shape = [1] * xf.ndim
        shape[channel_axis] = xf.shape[channel_axis]
        scale = scale.reshape(shape)
        zero_point = zero_point.reshape(shape)
        if jnp.ndim(qmaxf) > 0:
            qmaxf = qmaxf.reshape(shape)
    q = jnp.round(jnp.clip(xf / scale + zero_point, 0.0, qmaxf))
    return q, (scale, zero_point)


def dequantize_codes(q, scale, zero_point, *, channel_axis: int | None = None):
    qf = jnp.asarray(q, jnp.float32)
    if channel_axis is not None and jnp.ndim(scale) > 0:
        shape = [1] * qf.ndim
        shape[channel_axis] = qf.shape[channel_axis]
        scale = jnp.reshape(scale, shape)
        zero_point = jnp.reshape(zero_point, shape)
    return (qf - zero_point) * scale


def fake_quant_kernel_semantics(x, delta, offset, num_bits: int):
    """Per-tensor fake-quant with the reference *CUDA-kernel* semantics.

    The reference routes its per-tensor min/max and KLD paths through the
    native ``float2gemmlowp`` kernel (reference: kernels/gemmlowp.cu:30-45,
    int_quantizer.py:605-614), whose semantics differ from the Python
    ``__gemmlowpQuantize1__`` path in three ways:

      * ``range <= 0``     -> the input is returned unchanged;
      * no 1e-8 scale floor;
      * "preserve zero" is *gated*: the rounded-zero-point form is used only
        when the range straddles zero (``offset < 0 < offset + delta``,
        int_quantizer.py:613); otherwise the exact affine form
        ``round((x - offset)/scale) * scale + offset`` is used.

    ``delta``/``offset`` are scalars (0-d).  Bit width is static.
    """
    x = jnp.asarray(x)
    xf = x.astype(jnp.float32)
    delta = jnp.asarray(delta, jnp.float32)
    offset = jnp.asarray(offset, jnp.float32)
    qmax = 2.0 ** num_bits - 1.0

    scale = delta / qmax
    safe_scale = jnp.where(delta > 0, scale, 1.0)
    zero_point = jnp.round(-offset / safe_scale)
    straddles = (offset + delta > 0) & (offset < 0)
    shift = jnp.where(straddles, zero_point, -offset)

    q = jnp.where(straddles, xf / safe_scale + shift, (xf + shift) / safe_scale)
    # Kernel order: min with qmax, max with 0, then round (gemmlowp.cu:17-19).
    q = jnp.round(jnp.clip(q, 0.0, qmax))
    deq = jnp.where(straddles, (q - shift) * safe_scale, q * safe_scale - shift)
    out = jnp.where(delta > 0, deq, xf)
    return out.astype(x.dtype)


def alpha_to_delta_offset(alpha, max_value, min_value, mean, *, half_range: bool,
                          clip2max: bool = False):
    """Convert a clip value alpha into (delta, offset) = (range, min).

    Reference: int_quantizer.py:284-300 (``alpha2DeltaOffset``).
      half-range / force-positive: delta = max(mean, 0) + alpha, offset = 0
      symmetric-around-mean:       delta = 2*alpha, offset = max(min, mean - alpha)
    """
    alpha = jnp.asarray(alpha, jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)
    if half_range:
        delta = jnp.maximum(mean, 0.0) + alpha
        if clip2max:
            delta = jnp.minimum(delta, jnp.asarray(max_value, jnp.float32))
        offset = jnp.zeros_like(delta)
    else:
        delta = 2.0 * alpha
        if clip2max:
            rng = jnp.asarray(max_value, jnp.float32) - jnp.asarray(min_value, jnp.float32)
            delta = jnp.minimum(delta, rng)
        offset = jnp.maximum(jnp.asarray(min_value, jnp.float32), mean - alpha)
    return delta, offset


def minmax_delta_offset(min_value, max_value, *, half_range: bool):
    """Naive min/max range: delta = max - min, offset = min (0 if half-range).

    Reference: int_quantizer.py:361-379 (``gemmlowpMinMaxQuantize``).
    """
    min_value = jnp.asarray(min_value, jnp.float32)
    max_value = jnp.asarray(max_value, jnp.float32)
    if half_range:
        min_value = jnp.zeros_like(min_value)
    return max_value - min_value, min_value
