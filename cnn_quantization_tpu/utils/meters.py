"""Accuracy and averaging meters.

Reference: utils/meters.py:21-95 (AverageMeter, top-k accuracy).  The top-k
computation itself is jnp so it runs on-device inside the eval step; meters
aggregate scalars on host.
"""

from __future__ import annotations

import jax.numpy as jnp


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)


def accuracy_counts(logits, labels, ks=(1, 5)):
    """Return {k: correct_count} as jnp scalars (device-side, psum-able)."""
    maxk = max(ks)
    top = jnp.argsort(-logits, axis=-1)[:, :maxk]
    correct = top == labels[:, None]
    return {k: jnp.sum(correct[:, :k]) for k in ks}


def cross_entropy_sum(logits, labels):
    logp = logits - jnp.max(logits, axis=-1, keepdims=True)
    logp = logp - jnp.log(jnp.sum(jnp.exp(logp), axis=-1, keepdims=True))
    return -jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=-1))
