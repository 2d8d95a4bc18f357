"""TensorRT-style KLD calibration threshold.

Reference: pytorch_quantizer/quantization/inference/kld_threshold.py (which
vendors the MXNet implementation of NVIDIA's entropy-calibration sweep).
This is an independent implementation of the published algorithm:

  For a symmetric histogram of the activation, sweep candidate thresholds;
  for each, form the clipped reference distribution p (outliers folded into
  the edge bins) and its 15-bin quantized reconstruction q; pick the
  threshold minimizing KL(p || q).

Runs on host during calibration (pure numpy; a C++ fast path is used when
the native extension is built — see native/).
"""

from __future__ import annotations

import numpy as np

_SMOOTH_EPS = 1e-4


def _smooth(p: np.ndarray) -> np.ndarray:
    """Replace zeros with eps, debiting nonzero entries proportionally."""
    is_zero = p == 0
    n_zero = int(is_zero.sum())
    n_nonzero = p.size - n_zero
    if n_nonzero == 0:
        raise ValueError('all-zero distribution')
    out = p.astype(np.float64).copy()
    out[is_zero] += _SMOOTH_EPS
    out[~is_zero] -= _SMOOTH_EPS * n_zero / n_nonzero
    return out


def _kl_divergence(p: np.ndarray, q: np.ndarray) -> float:
    p = p / p.sum()
    q = q / q.sum()
    mask = p > 0
    return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))


def kld_threshold(arr: np.ndarray, num_bins: int = 2001,
                  num_quantized_bins: int = 15, use_native: bool = True) -> float:
    """Optimal symmetric clip threshold by KL-divergence sweep.

    Dispatches to the C++ implementation (native/kld_threshold.cpp) when the
    shared library is available; this numpy body is the reference fallback
    and the equivalence oracle for tests.
    """
    if use_native:
        from ..native import kld_threshold_native
        th = kld_threshold_native(arr, num_bins, num_quantized_bins)
        if th is not None:
            return th
    arr = np.asarray(arr).ravel()
    th = float(max(abs(arr.min()), abs(arr.max())))
    if th == 0.0:
        return 0.0
    hist, edges = np.histogram(arr, bins=num_bins, range=(-th, th))
    zero = num_bins // 2
    half_q = num_quantized_bins // 2

    best_div = np.inf
    best_th = th
    for i in range(half_q, num_bins // 2 + 1):
        lo, hi = zero - i, zero + i + 1
        sliced = hist[lo:hi]
        p = sliced.astype(np.float64).copy()
        p[0] += hist[:lo].sum()
        p[-1] += hist[hi:].sum()
        nonzero_mask = sliced != 0

        # quantize sliced into num_quantized_bins merged bins, then expand
        merged = sliced.size // num_quantized_bins
        q = np.zeros_like(p)
        for j in range(num_quantized_bins):
            start = j * merged
            stop = sliced.size if j == num_quantized_bins - 1 else start + merged
            total = sliced[start:stop].sum()
            # expansion spreads the merged mass uniformly over the originally
            # nonzero bins of the group
            group_mask = nonzero_mask[start:stop]
            n = int(group_mask.sum())
            if n:
                q[start:stop][group_mask] = total / n
        q[~nonzero_mask] = 0

        try:
            ps = _smooth(p)
            qs = _smooth(q)
        except ValueError:
            continue
        div = _kl_divergence(ps, qs)
        if div < best_div:
            best_div = div
            best_th = edges[hi]
    return float(best_th)


def add_kld_thresholds(summary, engine, params, batches, *,
                       cal_set_size: int | None = None,
                       num_quantized_bins: int = 15):
    """Augment a calibration summary with per-site 'scalar/<kind>_kld_th'.

    Per reference semantics (statistic_manager.py:80-82): per batch, the
    threshold is the max over per-image thresholds; kinds aggregate across
    batches.
    """
    import jax
    from ..engine.context import Site
    from .capture import make_capture_fn

    capture = make_capture_fn(engine)
    rows: dict[str, list[float]] = {}
    seen = 0
    for images, _ in batches:
        if cal_set_size is not None and seen >= cal_set_size:
            break
        acts = jax.device_get(capture(params, images))
        for site_id, t in acts.items():
            per_image = [kld_threshold(np.asarray(t[i]),
                                       num_quantized_bins=num_quantized_bins)
                         for i in range(t.shape[0])]
            rows.setdefault(site_id, []).append(float(np.max(per_image)))
        seen += images.shape[0]
    for site_id, vals in rows.items():
        entry = summary.setdefault(site_id, {})
        v = np.asarray(vals, np.float32)
        entry['scalar/min_kld_th'] = v.min()
        entry['scalar/mean_kld_th'] = v.mean()
        entry['scalar/max_kld_th'] = v.max()
    return summary
