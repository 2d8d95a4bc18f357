"""Optimizer regime (#29) and gradient attachment / STE (#16)."""

import numpy as np
import jax
import jax.numpy as jnp

from cnn_quantization_tpu.utils.optim import OptimRegime, lr_schedule
from cnn_quantization_tpu.ops.ste import attach, straight_through, fake_quant_ste
from cnn_quantization_tpu.ops.quant_math import fake_quant


REGIME = [{'epoch': 0, 'optimizer': 'sgd', 'lr': 0.1, 'momentum': 0.9},
          {'epoch': 2, 'lr': 0.01},
          {'epoch': 4, 'lr': 0.001, 'momentum': 0.0}]


def test_lr_schedule_boundaries():
    sched = lr_schedule(REGIME, steps_per_epoch=10)
    vals = [float(sched(s)) for s in (0, 5, 19, 20, 39, 40, 100)]
    np.testing.assert_allclose(vals, [0.1, 0.1, 0.1, 0.01, 0.01, 0.001, 0.001],
                               rtol=1e-6)
    # usable inside jit
    np.testing.assert_allclose(float(jax.jit(sched)(25)), 0.01, rtol=1e-6)


def test_optim_regime_settings_and_transform():
    reg = OptimRegime(REGIME, steps_per_epoch=1)
    assert reg.setting['lr'] == 0.1 and reg.setting['momentum'] == 0.9
    changed = reg.update(3, 0)
    assert changed and reg.setting['lr'] == 0.01
    reg.update(4, 0)
    assert reg.setting['lr'] == 0.001 and reg.setting['momentum'] == 0.0

    tx = reg.transform()
    params = {'w': jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({'w': jnp.ones(3)}, state, params)
    np.testing.assert_allclose(np.asarray(updates['w']), -0.001 * np.ones(3),
                               rtol=1e-6)


def test_attach_forward_and_backward():
    f = attach(forward_fn=lambda x: x * 2, backward_fn=lambda g: g * 3)
    x = jnp.asarray(2.0)
    assert float(f(x)) == 4.0
    assert float(jax.grad(lambda v: f(v))(x)) == 3.0  # bwd functor, not 2


def test_straight_through_round():
    f = straight_through(jnp.round)
    g = jax.grad(lambda v: jnp.sum(f(v)))(jnp.asarray([0.3, 0.7]))
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])


def test_fake_quant_ste_matches_forward_and_masks_grad():
    x = jnp.asarray([-0.5, 0.1, 0.5, 0.9, 1.5])
    delta, offset, qmax = 1.0, 0.0, 15.0
    out = fake_quant_ste(x, delta, offset, qmax)
    want = fake_quant(x, delta, offset, qmax)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(fake_quant_ste(v, delta, offset, qmax)))(x)
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0, 1.0, 1.0, 0.0])
