"""Runtime activation measurement (the reference's -ms mode).

Reference: pytorch_quantizer/quantization/inference/distance_stats.py — per
layer, accumulate ||activation||^2 rows and save a CSV; and the richer
measure_statistics.py variant (eps-norm/mse/cos between float and quantized
activations).  Here both are served by one captured-forward comparison: run
the float and quantized forwards once per batch and compare tapped tensors.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
import pandas as pd


def measure_statistics(engine, params_fp, params_q, batches: Iterable, *,
                       stats=None, max_batches: int = 4):
    """Per-site rows of {norm_fp, norm_q, mse, cos, rel_err} comparing the
    float model against the quantized one on the same inputs."""
    import jax
    import jax.numpy as jnp
    from ..calib.capture import CaptureContext

    @jax.jit
    def both(p_fp, p_q, stats, images):
        ctx_f = CaptureContext()
        engine.model.apply({'params': p_fp}, images, ctx_f)
        from ..engine.context import QuantizeContext

        class CapturingQC(QuantizeContext):
            def __init__(s, *a, **k):
                super().__init__(*a, **k)
                s.outs = {}

            def tap(s, x, site):
                out = super().tap(x, site)
                s.outs[site.id] = out
                return out

        ctx_q = CapturingQC(engine.policy, stats=stats,
                            ignore_ids=engine.ignore_ids)
        engine.model.apply({'params': p_q}, images, ctx_q)
        return ctx_f.finalize(), ctx_q.outs

    rows: dict[str, list[dict]] = {}
    for i, (images, _) in enumerate(batches):
        if i >= max_batches:
            break
        f_acts, q_acts = jax.device_get(both(params_fp, params_q, stats,
                                             jnp.asarray(images)))
        for site_id, f in f_acts.items():
            q = q_acts.get(site_id)
            if q is None:
                continue
            f = np.asarray(f, np.float64).ravel()
            q = np.asarray(q, np.float64).ravel()
            nf, nq = np.linalg.norm(f), np.linalg.norm(q)
            mse = float(np.mean((f - q) ** 2))
            cos = float(np.dot(f, q) / (nf * nq + 1e-12))
            rows.setdefault(site_id, []).append({
                'norm_fp': nf, 'norm_q': nq, 'mse': mse, 'cos': cos,
                'rel_err': float(np.linalg.norm(f - q) / (nf + 1e-12))})
    return {site: pd.DataFrame(r) for site, r in rows.items()}


def save_measure_csv(frames: dict, folder: str, arch: str):
    os.makedirs(folder, exist_ok=True)
    summary = pd.DataFrame({site: df.mean() for site, df in frames.items()}).T
    path = os.path.join(folder, f'{arch}_distance.csv')
    summary.to_csv(path)
    return path
