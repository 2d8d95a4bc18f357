"""FP32 statistical clippers.

Reference: pytorch_quantizer/clipping/clipping_manager.py — a rho-scaled
statistical clipper and a max-ratio clipper, constructed but never invoked
on the reference's inference path (and the statistical one would crash on a
tuple-arity bug, SURVEY.md §7 "known bugs").  Implemented here in working
form for capability parity.
"""

from __future__ import annotations

import jax.numpy as jnp


def statistical_clip(x, rho: float, *, site_stats=None):
    """Symmetric clamp at rho-scaled dispersion: |x| <= rho * (mean_abs + 3*std).

    Stats come from the calibration artifact when given, else the tensor.
    """
    xf = jnp.asarray(x, jnp.float32)
    if site_stats is not None:
        mean_abs = jnp.asarray(site_stats['mean_mean_abs'], jnp.float32)
        std = jnp.asarray(site_stats['mean_std'], jnp.float32)
    else:
        mean_abs = jnp.mean(jnp.abs(xf))
        std = jnp.std(xf, ddof=1)
    bound = rho * (mean_abs + 3.0 * std)
    return jnp.clip(xf, -bound, bound).astype(x.dtype)


def ratio_clip(x, rho: float):
    """Clamp at +/- rho * max|x| (clipping_manager.py:45-62)."""
    xf = jnp.asarray(x, jnp.float32)
    bound = rho * jnp.max(jnp.abs(xf))
    return jnp.clip(xf, -bound, bound).astype(x.dtype)
