"""Mid-tread quantization with real-valued per-channel bin allocation.

Reference: pytorch_quantizer/quantization/qtypes/int_quantizer.py:147-225.

Unlike the gemmlowp path (uint grid, scale/zero-point), the mid-tread path
quantizes x to round(x / Delta) * Delta with a per-channel step
Delta_i = range_i / omega_i where omega_i is the (rounded) real-valued bin
count allocated to channel i by the sigma^(2/3) rule, and the clamp window is
centered on the channel mean (symmetric case) or anchored at zero
(asymmetric / post-ReLU case).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import aciq, bit_alloc
from .entropy import shannon_entropy

_F32_MAX = jnp.finfo(jnp.float32).max


class MidTreadResult(NamedTuple):
    values: jnp.ndarray          # dequantized tensor, same shape as input
    codes: jnp.ndarray           # integer codes (float32), for rate measurement
    delta: jnp.ndarray           # per-row step size


def mid_tread_quantize(t, target_bits, *, clip: bool, sym: bool):
    """Quantize rows of a 2-D tensor ``t`` [rows, elems] mid-tread style.

    Rows are channels (per-channel mode) or a single row (per-tensor mode).
    Reference: int_quantizer.py:185-225 (``mid_tread_quantization``).
    """
    t = jnp.asarray(t, jnp.float32)
    std = jnp.std(t, axis=-1, ddof=1)
    omega = jnp.round(bit_alloc.get_omega(std, 2.0 ** jnp.asarray(target_bits, jnp.float32)))

    if clip:
        alpha_mult = aciq.alpha_mult_for_omega(omega, sym=sym)
        mu = jnp.mean(t, axis=-1)
        b = jnp.mean(jnp.abs(t - mu[:, None]), axis=-1)
        rng = 2.0 * alpha_mult * b if sym else jnp.maximum(mu, 0.0) + alpha_mult * b
    else:
        rng = (jnp.max(t, axis=-1) - jnp.min(t, axis=-1)) if sym else jnp.max(t, axis=-1)

    delta = jnp.where(omega > 0, rng / jnp.where(omega > 0, omega, 1.0), _F32_MAX)

    codes = jnp.round(t / delta[:, None])

    if clip:
        mu_q = (mu if sym else jnp.maximum(mu, 0.0)) / delta
        c_max = mu_q + (omega / 2.0 if sym else omega)
        c_min = (mu_q - omega / 2.0) if sym else jnp.zeros_like(mu_q)
        codes = jnp.minimum(codes, c_max[:, None])
        codes = jnp.maximum(codes, c_min[:, None])

    values = codes * delta[:, None]
    return MidTreadResult(values=values, codes=codes, delta=delta)


def mid_tread_quantize_tensor(x, target_bits, *, clip: bool, sym: bool,
                              per_channel: bool, channel_axis: int = -1,
                              measure_entropy: bool = False):
    """Shape-preserving wrapper over ``mid_tread_quantize``.

    per_channel=True treats ``channel_axis`` as rows (the reference's
    C x (N*H*W) view, int_quantizer.py:170-183); otherwise one row.
    Returns (values, entropy_or_None).
    """
    x = jnp.asarray(x)
    xf = x.astype(jnp.float32)
    if per_channel:
        axis = channel_axis % xf.ndim
        perm = (axis,) + tuple(i for i in range(xf.ndim) if i != axis)
        t = jnp.transpose(xf, perm).reshape(xf.shape[axis], -1)
        res = mid_tread_quantize(t, target_bits, clip=clip, sym=sym)
        inv = tuple(perm.index(i) for i in range(xf.ndim))
        moved_shape = tuple(xf.shape[p] for p in perm)
        values = jnp.transpose(res.values.reshape(moved_shape), inv)
    else:
        res = mid_tread_quantize(xf.reshape(1, -1), target_bits, clip=clip, sym=sym)
        values = res.values.reshape(xf.shape)
    ent = shannon_entropy(res.codes) if measure_entropy else None
    return values.astype(x.dtype), ent
