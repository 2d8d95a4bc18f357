"""Entropy / rate measurement of quantized codes (jit-friendly).

Reference: utils/entropy.py:6-36.  The reference computes Shannon entropy via
``torch.unique(return_counts=True)`` which is shape-dynamic; here we use a
fixed-size bincount over the (bounded) integer code space so the measurement
stays inside jit.  Codes are shifted by their minimum so negative mid-tread
codes are handled (``handle_negative`` in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp

# Upper bound on distinct integer code values per tensor.  gemmlowp codes are
# <= 255; mid-tread bin allocation can exceed that but is bounded by the total
# bin budget of a layer.  2**17 covers every configuration in the reference.
_MAX_CODES = 1 << 17


def shannon_entropy(codes, max_codes: int = _MAX_CODES):
    """Entropy (bits/value) of an integer-valued tensor.

    Equivalent to utils/entropy.py:6-17 for any tensor whose value range
    spans fewer than ``max_codes`` distinct integers.
    """
    c = jnp.asarray(codes).reshape(-1)
    c = c - jnp.min(c)
    c = jnp.clip(c, 0, max_codes - 1).astype(jnp.int32)
    counts = jnp.bincount(c, length=max_codes).astype(jnp.float32)
    probs = counts / jnp.sum(counts)
    probs = jnp.where(probs == 0, 1.0, probs)
    return -jnp.sum(probs * jnp.log2(probs))


def most_frequent_value_compression(codes, base_bit: int = 8, compressed_bit: int = 1,
                                    max_codes: int = _MAX_CODES):
    """Rate if the most frequent value is coded with ``compressed_bit`` bits.

    Reference: utils/entropy.py:28-36.
    """
    c = jnp.asarray(codes).reshape(-1)
    n = c.shape[0]
    c = c - jnp.min(c)
    c = jnp.clip(c, 0, max_codes - 1).astype(jnp.int32)
    counts = jnp.bincount(c, length=max_codes)
    mfv = jnp.max(counts)
    return (mfv * compressed_bit + (n - mfv) * base_bit) / n
