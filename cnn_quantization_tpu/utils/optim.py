"""Epoch/step-driven optimizer regime reconfiguration.

Reference: utils/optim.py — ``OptimRegime`` rebuilds/retunes a torch
optimizer from a list of {'epoch': e, 'optimizer': ..., 'lr': ..., ...}
settings as training progresses (a training-era leftover, unused on the
reference's inference path — SURVEY.md §2 #29).  Provided here as the optax
equivalent: a regime list becomes (a) a pure ``lr_schedule(step)`` usable
inside jit, and (b) an ``optax.inject_hyperparams`` transform so the same
regime drives any optax optimizer.  Kept for capability parity (e.g. QAT
fine-tuning on top of the PTQ pipeline).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence


def _normalize(regime: Sequence[Mapping[str, Any]], steps_per_epoch: int):
    """[{'epoch': e, 'lr': v, ...}] -> sorted [(boundary_step, settings)]."""
    out = []
    for entry in regime:
        e = entry.get('epoch', 0)
        step = entry.get('step', int(e * steps_per_epoch))
        out.append((step, dict(entry)))
    return sorted(out, key=lambda t: t[0])


def lr_schedule(regime: Sequence[Mapping[str, Any]], *,
                steps_per_epoch: int = 1, default_lr: float = 0.1):
    """Piecewise-constant schedule fn(step)->lr from a reference-style
    regime list; jit-compatible (pure jnp, static boundaries)."""
    import jax.numpy as jnp

    rules = [(s, e['lr']) for s, e in _normalize(regime, steps_per_epoch)
             if 'lr' in e]

    def schedule(step):
        lr = jnp.asarray(default_lr, jnp.float32)
        for boundary, value in rules:
            lr = jnp.where(step >= boundary, jnp.asarray(value, jnp.float32), lr)
        return lr

    return schedule


class OptimRegime:
    """Stateful wrapper mirroring the reference API: ``update(epoch, step)``
    applies the regime; ``setting`` exposes the active hyperparameters.
    Backed by optax — call ``transform()`` for the gradient transformation.
    """

    def __init__(self, regime: Sequence[Mapping[str, Any]], *,
                 steps_per_epoch: int = 1, optimizer: str = 'sgd'):
        self.rules = _normalize(regime, steps_per_epoch)
        self.steps_per_epoch = steps_per_epoch
        self.optimizer = optimizer
        self.setting: dict[str, Any] = {'lr': 0.1, 'momentum': 0.0,
                                        'weight_decay': 0.0}
        self.update(0, 0)

    def update(self, epoch: int, train_steps: int) -> bool:
        step = int(epoch * self.steps_per_epoch + train_steps)
        changed = False
        for boundary, entry in self.rules:
            if step >= boundary:
                for k, v in entry.items():
                    if k in ('epoch', 'step'):
                        continue
                    if self.setting.get(k) != v:
                        self.setting[k] = v
                        changed = True
        return changed

    def transform(self):
        """optax transform with hyperparams injected from the regime; update
        ``.hyperparams`` of the returned init/update state per step via the
        schedule, or re-call after ``update()`` for coarse regimes."""
        import optax
        if self.optimizer.lower() == 'sgd':
            return optax.inject_hyperparams(optax.sgd)(
                learning_rate=self.setting['lr'],
                momentum=self.setting.get('momentum', 0.0) or None)
        if self.optimizer.lower() == 'adam':
            return optax.inject_hyperparams(optax.adam)(
                learning_rate=self.setting['lr'])
        raise ValueError(f'unknown optimizer: {self.optimizer}')
