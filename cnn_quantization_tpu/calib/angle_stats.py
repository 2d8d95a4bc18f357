"""Pairwise inter-sample activation angle statistics.

Reference: pytorch_quantizer/quantization/inference/angle_stats.py — for each
tapped layer output [N, ...] it fills an upper-triangular N x N matrix of
angles acos(cos_sim(x_i, x_j)) between flattened per-sample activations with
a double Python loop (:29-43), stacks matrices across batches, and pickles
{site: DataFrame, 'target': labels} to <base>/angle/<folder>/angle.pkl
(:56-73).

Here the whole matrix is one normalized Gram matmul inside jit (MXU work, no
loops), computed from a CaptureContext forward; accumulation and persistence
match the reference artifact shape.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def angle_matrix(acts):
    """[N, ...] activations -> [N, N] upper-triangular matrix of pairwise
    angles (radians); zero on and below the diagonal like the reference."""
    import jax.numpy as jnp
    x = jnp.asarray(acts, jnp.float32).reshape(acts.shape[0], -1)
    norm = jnp.linalg.norm(x, axis=1, keepdims=True)
    xn = x / jnp.maximum(norm, 1e-12)
    cos = jnp.clip(xn @ xn.T, -1.0, 1.0)
    ang = jnp.arccos(cos)
    n = x.shape[0]
    upper = jnp.triu(jnp.ones((n, n), bool), k=1)
    return jnp.where(upper, ang, 0.0)


class AngleStats:
    """Accumulate per-site angle matrices across batches and persist.

    Artifact: pickle of {site_id: DataFrame[N_total, N_batch], 'target':
    np.ndarray} at <folder>/angle.pkl (reference angle_stats.py:56-73).
    """

    def __init__(self, folder: str):
        self.folder = folder
        self.stats: dict[str, np.ndarray] = {}
        self.targets = np.zeros((0,), np.int64)

    def update(self, captured: dict, targets=None):
        """``captured``: {site_id: [N, ...] activation} (CaptureContext
        output).  Computes all angle matrices in one jitted call."""
        import jax

        mats = jax.jit(lambda c: {k: angle_matrix(v) for k, v in c.items()})(
            {k: v for k, v in captured.items()})
        for site, m in jax.device_get(mats).items():
            m = np.asarray(m)
            prev = self.stats.get(site)
            self.stats[site] = m if prev is None else np.vstack([prev, m])
        if targets is not None:
            self.targets = np.concatenate(
                [self.targets, np.asarray(targets).ravel()])

    def save(self) -> str:
        import pandas as pd
        os.makedirs(self.folder, exist_ok=True)
        out = {site: pd.DataFrame(m) for site, m in self.stats.items()}
        out['target'] = self.targets
        path = os.path.join(self.folder, 'angle.pkl')
        with open(path, 'wb') as f:
            pickle.dump(out, f)
        return path


def load_angle_stats(path: str) -> dict:
    with open(path, 'rb') as f:
        return pickle.load(f)
