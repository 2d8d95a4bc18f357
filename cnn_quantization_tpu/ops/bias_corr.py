"""Bias and variance correction of quantized tensors.

Reference: pytorch_quantizer/quantization/inference/inference_quantization_manager.py
  * weights: :374-393 (per-output-channel mean/std matching, paper eq. 12/13)
  * activations: :180-203 (positive-part mean matching post-ReLU)
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _per_out_channel(x, out_axis):
    """Moments per output channel, reshaped for broadcast against x."""
    out_axis = out_axis % x.ndim
    axes = tuple(i for i in range(x.ndim) if i != out_axis)
    shape = [1] * x.ndim
    shape[out_axis] = x.shape[out_axis]
    return axes, shape


def weight_correction(w_orig, w_q, *, out_axis: int = -1,
                      bias_corr: bool = True, var_corr: bool = False):
    """Match per-output-channel mean (and optionally std) of w_q to w_orig.

    var-corr first: w_q = (w_q - mu_q) * (std_o / std_q) + mu_q, then
    bias-corr: w_q += mu_o - mu_q  — the reference applies them in this order
    (inference_quantization_manager.py:380-391).
    """
    w_orig = jnp.asarray(w_orig, jnp.float32)
    w_q = jnp.asarray(w_q, jnp.float32)
    axes, shape = _per_out_channel(w_q, out_axis)

    mu_q = jnp.mean(w_q, axis=axes).reshape(shape)
    mu_o = jnp.mean(w_orig, axis=axes).reshape(shape)

    if var_corr:
        std_o = jnp.std(w_orig, axis=axes, ddof=1).reshape(shape)
        std_q = jnp.std(w_q, axis=axes, ddof=1).reshape(shape)
        w_q = (w_q - mu_q) * (std_o / (std_q + _EPS)) + mu_q

    if bias_corr:
        w_q = w_q - mu_q + mu_o

    return w_q


def activation_bias_correction(out, out_q, *, channel_axis: int = -1,
                               pre_relu: bool = True):
    """Per-channel positive-part mean correction of a quantized activation.

    Reference (inference_quantization_manager.py:188-196): with r = relu(out),
      q_bias_c = (sum_c r - sum_c out_q) / count(r > 0)
      out_q   += [out_q > 0] * q_bias_c
    ``pre_relu=True`` applies the ReLU to the float reference first (the
    reference does so when the site feeds a ReLU or the arch fuses ReLUs).
    """
    out = jnp.asarray(out, jnp.float32)
    out_q = jnp.asarray(out_q, jnp.float32)
    axes, shape = _per_out_channel(out, channel_axis)

    ref = jnp.maximum(out, 0.0) if pre_relu else out
    q_bias = jnp.sum(ref, axis=axes) - jnp.sum(out_q, axis=axes)
    count = jnp.sum((ref > 0).astype(jnp.float32), axis=axes)
    q_bias = (q_bias / (count + _EPS)).reshape(shape)

    return out_q + (out_q > 0).astype(out_q.dtype) * q_bias
