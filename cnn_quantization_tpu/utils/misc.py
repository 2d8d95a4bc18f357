"""Small shared utilities.

Reference: utils/misc.py (cos_sim :23-34, onehot :37-52, set_global_seeds
:55-64, sorted_nicely :79-88, torch_dtypes :5-20).  The reference's
``Singleton`` metaclass (:67-73) — the backbone of its mutable manager
design — has no equivalent here on purpose: state lives in explicit pytrees
and frozen configs, not process-global singletons.
"""

from __future__ import annotations

import random
import re

import numpy as np

# dtype-name table (reference torch_dtypes, utils/misc.py:5-20), jnp flavored.
JNP_DTYPES = {
    'float': np.float32, 'float32': np.float32, 'float64': np.float64,
    'double': np.float64, 'float16': np.float16, 'half': np.float16,
    'bfloat16': 'bfloat16',
    'uint8': np.uint8, 'int8': np.int8, 'int16': np.int16, 'short': np.int16,
    'int32': np.int32, 'int': np.int32, 'int64': np.int64, 'long': np.int64,
}


def cos_sim(x, y, dims=(-1,)):
    """Cosine similarity reduced over ``dims`` (reference utils/misc.py:23-34).

    Accepts jnp or np arrays; keeps the non-reduced axes (multi-dim form the
    reference uses for per-sample similarity of [N, D] activations).
    """
    import jax.numpy as jnp
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    dims = tuple(dims)
    dot = jnp.sum(x * y, axis=dims)
    nx = jnp.sqrt(jnp.sum(x * x, axis=dims))
    ny = jnp.sqrt(jnp.sum(y * y, axis=dims))
    return dot / (nx * ny)


def onehot(indexes, N: int | None = None, ignore_index: int | None = None):
    """One-hot encode an integer array (reference utils/misc.py:37-52)."""
    import jax.numpy as jnp
    idx = jnp.asarray(indexes)
    if N is None:
        N = int(idx.max()) + 1
    out = jnp.asarray(idx[..., None] == jnp.arange(N), jnp.uint8)
    if ignore_index is not None and ignore_index >= 0:
        out = jnp.where(idx[..., None] == ignore_index,
                        jnp.zeros_like(out), out)
    return out


def sorted_nicely(items):
    """Human/alphanumeric sort (reference utils/misc.py:79-88):
    conv2 < conv10, used for ordering site ids."""
    def convert(text):
        return int(text) if text.isdigit() else text

    def key(s):
        return [convert(c) for c in re.split(r'([0-9]+)', s)]

    return sorted(items, key=key)


def set_global_seeds(i: int):
    """Seed numpy + python RNGs and return a jax PRNG key
    (reference utils/misc.py:55-64; jax randomness is explicit, so the key
    is returned rather than stored globally)."""
    np.random.seed(i)
    random.seed(i)
    try:
        import torch
        torch.manual_seed(i)
    except ImportError:
        pass
    import jax
    return jax.random.PRNGKey(i)
