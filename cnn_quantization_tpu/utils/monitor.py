"""Op/tensor monitor: record observed tensors and conv-op attributes per step.

Reference: utils/monitor.py — a Singleton that registers tensors
(:31-34), dumps them to ``epoch_<e>_step_<s>.pt`` files (:36-48), and
records Conv2d attributes + input/output by patching the instance ``__call__``
(:80-107).  The patching trick is impossible (and unnecessary) under jit; a
``MonitorContext`` tap records every site tensor from one traced forward, and
op attributes come from the model's static site metadata and params pytree.
Artifacts are ``.npz`` files with the same epoch/step naming.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from ..engine.context import TapContext


class MonitorContext(TapContext):
    """Tap context recording every site's output tensor (trace-time)."""

    mode = 'monitor'

    def __init__(self):
        self.observed: dict[str, Any] = {}

    def tap(self, x, site):
        self.observed[site.id] = x
        return x

    def finalize(self):
        return dict(self.observed)


class Monitor:
    """Accumulate named tensors / op records and dump one file per step."""

    def __init__(self, dump_dir: str):
        self.dump_dir = dump_dir
        os.makedirs(dump_dir, exist_ok=True)
        self.observed_tensors: dict[str, np.ndarray] = {}
        self.observed_operations: dict[str, dict[str, Any]] = {}

    def register_tensor(self, tensor, key: str):
        self.observed_tensors[key] = np.asarray(tensor)

    def register_tensors(self, tensors: dict):
        for k, v in tensors.items():
            self.register_tensor(v, k)

    def register_operation(self, key: str, attrs: dict):
        """Record one op's static attrs + tensors (the reference's
        register_Conv2d dict: in/out channels, kernel, stride, padding,
        groups, weight, input, output — utils/monitor.py:80-107)."""
        self.observed_operations[key] = {
            k: (np.asarray(v) if hasattr(v, 'shape') else v)
            for k, v in attrs.items()}

    def dump_tensors(self, epoch: int, step: int) -> str:
        path = os.path.join(self.dump_dir, f'epoch_{epoch}_step_{step}.npz')
        np.savez_compressed(path, **self.observed_tensors)
        self.observed_tensors.clear()
        return path

    def dump_operations(self, epoch: int, step: int) -> str:
        path = os.path.join(self.dump_dir, f'epoch_{epoch}_step_{step}_ops.npz')
        flat = {}
        for op, attrs in self.observed_operations.items():
            for k, v in attrs.items():
                flat[f'{op}|{k}'] = np.asarray(v)
        np.savez_compressed(path, **flat)
        self.observed_operations.clear()
        return path

    def clear_tensors(self):
        self.observed_tensors.clear()

    def clear_operations(self):
        self.observed_operations.clear()


def monitor_forward(engine, params, images) -> dict[str, np.ndarray]:
    """One jitted forward returning every site's output tensor."""
    import jax

    @jax.jit
    def fn(p, im):
        ctx = MonitorContext()
        engine.model.apply({'params': p}, im, ctx)
        return ctx.finalize()

    return jax.device_get(fn(params, images))
