"""Dataset helpers: subsetting / class filtering / index views.

Reference: utils/dataset.py (LimitDataset, ByClassDataset, IdxDataset,
RandomSamplerReplacment).  Here these are sample-list transformations over
the (path, label) lists used by data.imagenet.
"""

from __future__ import annotations

import numpy as np


def limit_samples(samples, max_len: int):
    return samples[:min(max_len, len(samples))]


def by_class(samples, class_indices):
    keep = set(class_indices)
    return [(p, l) for p, l in samples if l in keep]


def index_view(samples, indices):
    return [samples[i] for i in indices]


def sample_with_replacement(samples, n: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, len(samples), size=n)
    return [samples[i] for i in idx]
