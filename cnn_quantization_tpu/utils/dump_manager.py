"""Tensor dump debugging utility.

Reference: utils/dump_manager.py — dump named tensors as .npy files under a
tagged directory, driven by the CLI's --dump_dir.  Here dumping integrates
with the capture context: one jitted forward returns all tapped tensors,
which are then written on host (no per-layer host syncs inside the loop).
"""

from __future__ import annotations

import os

import numpy as np


class DumpManager:
    def __init__(self, dump_dir: str, tag: str = ''):
        self.dump_dir = dump_dir
        self.tag = tag

    def set_tag(self, tag: str):
        self.tag = tag

    def dump(self, tensor, name: str):
        d = os.path.join(self.dump_dir, self.tag) if self.tag else self.dump_dir
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, f'{name}.npy'), np.asarray(tensor))

    def dump_all(self, tensors: dict):
        for name, t in tensors.items():
            self.dump(t, name)


def dump_activations(engine, params, images, dump_dir: str, tag: str = 'batch0'):
    """Capture every tapped activation of one batch and write .npy files
    (the reference's --dump_dir flow, inference_sim.py:287-312)."""
    import jax
    from ..calib.capture import make_capture_fn

    acts = jax.device_get(make_capture_fn(engine)(params, images))
    dm = DumpManager(dump_dir, tag)
    dm.dump_all(acts)
    return sorted(acts)
