"""Capture raw tapped activations (for KLD calibration and tensor dumps).

The reference's analogue is the DumpManager / per-batch numpy pulls inside
StatisticManager; here a CaptureContext records every tapped tensor as an
auxiliary output of one jitted forward.
"""

from __future__ import annotations

import jax

from ..engine.context import TapContext


class CaptureContext(TapContext):
    mode = 'capture'

    def __init__(self):
        self.captured = {}

    def tap(self, x, site):
        self.captured[site.id] = x
        return x

    def finalize(self):
        return dict(self.captured)


def make_capture_fn(engine):
    """jitted f(params, images) -> {site_id: activation} (pre-quantization)."""

    @jax.jit
    def fn(params, images):
        ctx = CaptureContext()
        engine.model.apply({'params': params}, images, ctx)
        return ctx.finalize()

    return fn
