"""Tensor statistics for calibration and online quantization (pure jnp).

Executable spec: the reference's ``__act_stats__`` / ``__act_stats_perchannel__``
(reference: pytorch_quantizer/quantization/qtypes/int_quantizer.py:507-555) and
the collection-time statistics of StatisticManager
(reference: .../inference/statistic_manager.py:47-124,
.../inference/statistic_manager_perchannel.py:46-110).

Layout: the reference transposes NCHW activations to [C, N*H*W]; on TPU we
keep activations channels-last (NHWC) and reduce over all axes but the last —
numerically identical, zero data movement.

All stats are computed in float32.  ``std`` is the unbiased (ddof=1) estimator
throughout, matching torch defaults.  ``b`` is the Laplace scale estimate
mean(|x - mean(x)|).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

_ALL_STATS = ('min', 'max', 'mean', 'std', 'b', 'mean_abs', 'kurtosis', 'std_pos')


def _reduce_stats(t, stats: Sequence[str], axis):
    """Compute the requested stats of ``t`` reducing over ``axis``."""
    out = {}
    need_mean = any(s in stats for s in ('mean', 'b', 'kurtosis'))
    mean = jnp.mean(t, axis=axis, keepdims=True) if need_mean else None
    for s in stats:
        if s == 'min':
            out[s] = jnp.min(t, axis=axis)
        elif s == 'max':
            out[s] = jnp.max(t, axis=axis)
        elif s == 'mean':
            out[s] = jnp.squeeze(mean, axis=axis)
        elif s == 'std':
            out[s] = jnp.std(t, axis=axis, ddof=1)
        elif s == 'std_pos':
            out[s] = jnp.std(jnp.maximum(t, 0.0), axis=axis, ddof=1)
        elif s == 'b':
            out[s] = jnp.mean(jnp.abs(t - mean), axis=axis)
        elif s == 'mean_abs':
            out[s] = jnp.mean(jnp.abs(t), axis=axis)
        elif s == 'kurtosis':
            std = jnp.std(t, axis=axis, ddof=1, keepdims=True)
            out[s] = jnp.mean(((t - mean) / std) ** 4, axis=axis) - 3.0
        else:
            raise ValueError(f'unknown stat {s!r}')
    return out


def act_stats(x, stats: Sequence[str], *, avg_over_batch: bool = False):
    """Per-tensor statistics.

    ``avg_over_batch=True`` computes each stat per sample (leading axis) and
    averages over the batch — the reference's behavior for online per-tensor
    activation min/max (int_quantizer.py:372, 507-528).
    """
    t = jnp.asarray(x, jnp.float32)
    if avg_over_batch:
        t = t.reshape(t.shape[0], -1)
        per_sample = _reduce_stats(t, stats, axis=-1)
        return {k: jnp.mean(v, axis=0) for k, v in per_sample.items()}
    return _reduce_stats(t.reshape(-1), stats, axis=-1)


def act_stats_per_channel(x, stats: Sequence[str], *, channel_axis: int = -1,
                          avg_over_batch: bool = False):
    """Per-channel statistics of an activation batch.

    Returns vectors of length C = x.shape[channel_axis].
    ``avg_over_batch=False``: reduce over every axis except channels (the
    reference's [C, N*H*W] reduction).  ``avg_over_batch=True``: reduce per
    (sample, channel) then mean over samples (int_quantizer.py:530-555).
    """
    t = jnp.asarray(x, jnp.float32)
    channel_axis = channel_axis % t.ndim
    if not avg_over_batch:
        axes = tuple(i for i in range(t.ndim) if i != channel_axis)
        return _reduce_stats(t, stats, axis=axes)
    # Per (sample, channel): reduce all axes except 0 and channel_axis.
    axes = tuple(i for i in range(t.ndim) if i not in (0, channel_axis))
    per_sample = _reduce_stats(t, stats, axis=axes)
    return {k: jnp.mean(v, axis=0) for k, v in per_sample.items()}


def weight_stats_per_channel(w, stats: Sequence[str], *, out_axis: int = -1):
    """Per-output-channel statistics of a weight tensor.

    The reference flattens [OFM, IFM*K1*K2] (int_quantizer.py:453-465); our
    HWIO weights reduce over all axes but ``out_axis``.
    """
    t = jnp.asarray(w, jnp.float32)
    out_axis = out_axis % t.ndim
    axes = tuple(i for i in range(t.ndim) if i != out_axis)
    return _reduce_stats(t, stats, axis=axes)
