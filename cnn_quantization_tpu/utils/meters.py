"""Accuracy and averaging meters.

Reference: utils/meters.py:21-126 (AverageMeter, OnlineMeter, top-k accuracy,
AccuracyMeter).  The top-k computation itself is jnp so it runs on-device
inside the eval step; meters aggregate scalars on host (numpy), since the
running state is tiny and mutates per batch.
"""

from __future__ import annotations

import numpy as np
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


class OnlineMeter:
    """Streaming elementwise mean/variance via Welford's algorithm
    (reference utils/meters.py:45-78).  Shape is taken from the first
    ``update``; ``var`` uses the unbiased (n-1) denominator and is zero
    until two samples have been seen."""

    def __init__(self):
        self.mean = np.full((1,), -1.0, np.float32)
        self.M2 = np.zeros((1,), np.float32)
        self.count = 0
        self.val = None

    def reset(self, x):
        x = np.asarray(x, np.float32)
        self.mean = np.zeros_like(x)
        self.M2 = np.zeros_like(x)
        self.count = 0

    def update(self, x):
        x = np.asarray(x, np.float32)
        self.val = x
        if self.count == 0 and x.shape != self.mean.shape:
            self.reset(x)
        self.count += 1
        delta = x - self.mean
        self.mean = self.mean + delta / self.count
        self.M2 = self.M2 + delta * (x - self.mean)

    @property
    def var(self):
        if self.count < 2:
            return np.zeros_like(self.M2)
        return self.M2 / (self.count - 1)

    @property
    def std(self):
        return np.sqrt(self.var)


class AccuracyMeter:
    """Running top-k accuracy in percent (reference utils/meters.py:98-126)."""

    def __init__(self, topk=(1,)):
        self.topk = tuple(topk)
        self.reset()

    def reset(self):
        self._meters = {k: AverageMeter() for k in self.topk}

    def update(self, logits, labels):
        n = int(np.asarray(labels).size)
        counts = accuracy_counts(jnp.asarray(logits), jnp.asarray(labels),
                                 ks=self.topk)
        for k in self.topk:
            self._meters[k].update(100.0 * float(counts[k]) / n, n)

    @property
    def val(self):
        return {k: m.val for k, m in self._meters.items()}

    @property
    def avg(self):
        return {k: m.avg for k, m in self._meters.items()}

    @property
    def avg_error(self):
        return {k: 100.0 - m.avg for k, m in self._meters.items()}


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
