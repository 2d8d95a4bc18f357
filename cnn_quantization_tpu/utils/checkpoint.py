"""Parameter / qparams checkpointing.

Reference persists: calibration stats (CSV/pickle), k-means quantized models
(.pt) (SURVEY.md §5).  Here: params pytrees as flat .npz (portable, no torch
needed) plus optional orbax for large sharded checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np


def _flatten(tree: Mapping[str, Any], prefix: str = ''):
    for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else k
        if isinstance(v, Mapping):
            yield from _flatten(v, path)
        else:
            yield path, np.asarray(v)


def save_params_npz(path: str, params):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **dict(_flatten(params)))


def load_params_npz(path: str):
    out: dict[str, Any] = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            parts = key.split('/')
            for seg in parts[:-1]:
                node = node.setdefault(seg, {})
            node[parts[-1]] = data[key]
    return out


def save_params_orbax(path: str, params):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(path: str):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
