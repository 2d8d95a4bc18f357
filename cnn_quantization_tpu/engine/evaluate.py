"""Evaluation harness: jitted eval step + host-side meter loop.

Reference: inference/inference_sim.py:278-343 (``validate``).  The per-batch
work (forward, top-k counts, loss) is one jitted function; the host loop only
feeds batches and accumulates scalar meters.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Iterable, Mapping

import jax
import jax.numpy as jnp

from ..utils.meters import AverageMeter, accuracy_counts, cross_entropy_sum
from .engine import QuantEngine


def make_eval_step(engine: QuantEngine, quantized: bool = True, qparams=None,
                   act_scales=None, packed: bool = False):
    fwd = engine.make_forward(quantized, qparams=qparams,
                              act_scales=act_scales, packed=packed)

    @jax.jit
    def step(params, stats, images, labels):
        logits, aux = fwd(params, stats, images)
        counts = accuracy_counts(logits, labels, ks=(1, 5))
        loss = cross_entropy_sum(logits, labels)
        return {'top1': counts[1], 'top5': counts[5], 'loss': loss, 'aux': aux}

    return step


def evaluate(engine: QuantEngine, params, batches: Iterable, *,
             stats: Mapping[str, Any] | None = None, quantized: bool = True,
             subset: int | None = None, print_freq: int = 10,
             verbose: bool = False, qparams=None,
             act_scales=None, packed: bool = False,
             resume_path: str | None = None,
             checkpoint_every: int = 50) -> dict[str, float]:
    """Run the eval loop; returns {'top1', 'top5', 'loss', 'images_per_sec',
    'avg_entropy'(opt)}.  ``subset`` stops after N images
    (inference_sim.py:294-296).  ``quantized='serving_int8'`` runs the
    true-integer deployment path (optionally with frozen ``act_scales``).

    ``resume_path``: JSON checkpoint of meter state written every
    ``checkpoint_every`` batches; an interrupted run restarted with the same
    path and a deterministic (unshuffled or same-seed) loader skips the
    already-counted batches and continues the meters — eval-loop resume the
    reference lacks (SURVEY.md §5, restart-from-scratch)."""
    step = make_eval_step(engine, quantized, qparams=qparams,
                          act_scales=act_scales, packed=packed)
    top1 = AverageMeter()
    top5 = AverageMeter()
    losses = AverageMeter()
    batch_time = AverageMeter()
    ent_sum = 0.0
    ent_weight = 0.0
    seen = 0
    skip_batches = 0
    if resume_path and os.path.exists(resume_path):
        with open(resume_path) as f:
            ck = json.load(f)
        skip_batches = ck['batches']
        seen = ck['seen']
        ent_sum, ent_weight = ck['ent_sum'], ck['ent_weight']
        for meter, key in ((top1, 'top1'), (top5, 'top5'), (losses, 'loss')):
            meter.sum = ck[key] * seen
            meter.count = seen
        if verbose:
            print(f'=> resuming eval at batch {skip_batches} ({seen} images)')
    seen_at_start = seen
    end = time.time()
    for i, (images, labels) in enumerate(batches):
        if i < skip_batches:
            continue
        if subset is not None and seen >= subset:
            break
        out = step(params, stats, jnp.asarray(images), jnp.asarray(labels))
        out = jax.device_get(out)
        n = images.shape[0]
        seen += n
        top1.update(out['top1'] / n * 100.0, n)
        top5.update(out['top5'] / n * 100.0, n)
        losses.update(out['loss'] / n, n)
        batch_time.update(time.time() - end)
        end = time.time()
        aux = out.get('aux') or {}
        sites = {k[:-len('/entropy')] for k in aux if k.endswith('/entropy')}
        for s in sites:
            w = float(aux.get(f'{s}/numel', 1.0))
            ent_sum += float(aux[f'{s}/entropy']) * w
            ent_weight += w
        if verbose and i % print_freq == 0:
            print(f'Test: [{i}]\tTime {batch_time.val:.3f} ({batch_time.avg:.3f})\t'
                  f'Loss {losses.val:.4f} ({losses.avg:.4f})\t'
                  f'Prec@1 {top1.val:.3f} ({top1.avg:.3f})\t'
                  f'Prec@5 {top5.val:.3f} ({top5.avg:.3f})')
        if resume_path and (i + 1) % checkpoint_every == 0:
            _write_eval_checkpoint(resume_path, i + 1, seen, top1, top5,
                                   losses, ent_sum, ent_weight)
    result = {'top1': top1.avg, 'top5': top5.avg, 'loss': losses.avg,
              'images_per_sec': (seen - seen_at_start)
              / max(batch_time.sum, 1e-9)}
    if ent_weight > 0:
        result['avg_entropy'] = ent_sum / ent_weight
    if resume_path and os.path.exists(resume_path):
        os.remove(resume_path)  # completed: clear the checkpoint
    return result


def _write_eval_checkpoint(path, batches, seen, top1, top5, losses,
                           ent_sum, ent_weight):
    tmp = path + '.tmp'
    with open(tmp, 'w') as f:
        json.dump({'batches': batches, 'seen': seen, 'top1': top1.avg,
                   'top5': top5.avg, 'loss': losses.avg,
                   'ent_sum': ent_sum, 'ent_weight': ent_weight}, f)
    os.replace(tmp, path)
