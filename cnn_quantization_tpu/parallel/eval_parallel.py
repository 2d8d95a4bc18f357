"""Sharded (multi-device / multi-host) quantized evaluation.

DP+TP SPMD eval step: images sharded over the ``data`` axis, per-channel
quantized weights sharded over the ``model`` axis, accuracy counts reduced
globally (GSPMD inserts the psums).  This is the TPU-native replacement for
the reference's DataParallel scatter/gather (inference_sim.py:196-200) and
the design target of SURVEY.md §5 / BASELINE north star.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping

import jax
import jax.numpy as jnp

from ..engine.engine import QuantEngine
from ..utils.meters import AverageMeter, accuracy_counts, cross_entropy_sum
from .mesh import batch_sharding, make_mesh, param_sharding, replicated, shard_params


def make_sharded_eval_step(engine: QuantEngine, mesh, params_example,
                           quantized: bool = True, qparams=None,
                           act_scales=None):
    """jit the eval step with explicit input/output shardings.

    ``qparams`` (frozen per-site fake-quant params) and ``act_scales``
    (frozen serving-int8 scales) make the sharded step x-independent in its
    quantization decisions, so its results are EXACTLY those of the
    single-device step (asserted by tests/test_parallel.py) — sharding is an
    execution detail under GSPMD, never a semantics change."""
    fwd = engine.make_forward(quantized, qparams=qparams, act_scales=act_scales)

    def step(params, stats, images, labels):
        logits, aux = fwd(params, stats, images)
        counts = accuracy_counts(logits, labels, ks=(1, 5))
        loss = cross_entropy_sum(logits, labels)
        return {'top1': counts[1], 'top5': counts[5], 'loss': loss}

    in_shardings = (param_sharding(mesh, params_example), None,
                    batch_sharding(mesh, 4), batch_sharding(mesh, 1))
    return jax.jit(step, in_shardings=in_shardings,
                   out_shardings=replicated(mesh))


def evaluate_sharded(engine: QuantEngine, params, batches: Iterable, *,
                     mesh=None, stats: Mapping[str, Any] | None = None,
                     quantized: bool = True, subset: int | None = None,
                     qparams=None, act_scales=None):
    """Sharded eval loop; per-batch global accuracy via replicated outputs."""
    import time
    mesh = mesh if mesh is not None else make_mesh()
    params = shard_params(params, mesh)
    step = make_sharded_eval_step(engine, mesh, params, quantized,
                                  qparams=qparams, act_scales=act_scales)
    top1 = AverageMeter(); top5 = AverageMeter(); losses = AverageMeter()
    seen = 0
    t0 = time.time()
    for images, labels in batches:
        if subset is not None and seen >= subset:
            break
        out = jax.device_get(step(params, stats, jnp.asarray(images),
                                  jnp.asarray(labels)))
        n = images.shape[0]
        seen += n
        top1.update(out['top1'] / n * 100.0, n)
        top5.update(out['top5'] / n * 100.0, n)
        losses.update(out['loss'] / n, n)
    dt = time.time() - t0
    return {'top1': top1.avg, 'top5': top5.avg, 'loss': losses.avg,
            'images_per_sec': seen / max(dt, 1e-9)}
