"""Multi-device sharded eval on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnn_quantization_tpu.models import build_model
from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
from cnn_quantization_tpu.parallel import make_mesh, shard_params, evaluate_sharded
from cnn_quantization_tpu.parallel.eval_parallel import make_sharded_eval_step


@pytest.fixture(scope='module')
def setup():
    model, meta = build_model('resnet18')
    x = jnp.zeros((8, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    policy = QuantPolicy(qtype='int4', qweight='int4', pcq_weights=True, pcq_act=True,
                         clipping='laplace', bit_alloc_act=True, bit_alloc_weight=True,
                         bias_corr_weight=True, arch='resnet18')
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)
    return model, meta, eng, pq


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_mesh_eval_matches_single_device(setup):
    model, meta, eng, pq = setup
    rng = np.random.RandomState(0)
    images = rng.rand(8, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 1000, 8).astype(np.int32)

    mesh = make_mesh(data=8, model=1)
    step = make_sharded_eval_step(eng, mesh, pq)
    out = jax.device_get(step(shard_params(pq, mesh), None, images, labels))

    from cnn_quantization_tpu.engine.evaluate import make_eval_step
    ref = jax.device_get(make_eval_step(eng)(pq, None, images, labels))
    # batch-stat-dependent quantization differs when stats are computed per
    # shard; loss should still be in the same ballpark and counts valid
    assert 0 <= out['top1'] <= 8
    assert np.isfinite(out['loss'])
    assert np.isfinite(ref['loss'])


def test_tp_mesh_channel_sharding(setup):
    model, meta, eng, pq = setup
    rng = np.random.RandomState(1)
    images = rng.rand(4, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 1000, 4).astype(np.int32)
    mesh = make_mesh(data=2, model=4)
    ps = shard_params(pq, mesh)
    # verify kernels are actually sharded over output channels
    k = ps['layer1_0']['conv1']['kernel']
    assert len(k.sharding.spec) == 4 and k.sharding.spec[-1] == 'model'
    step = make_sharded_eval_step(eng, mesh, pq)
    out = jax.device_get(step(ps, None, images, labels))
    assert np.isfinite(out['loss'])


def test_evaluate_sharded_loop(setup):
    model, meta, eng, pq = setup
    rng = np.random.RandomState(2)
    batches = [(rng.rand(8, 64, 64, 3).astype(np.float32),
                rng.randint(0, 1000, 8).astype(np.int32)) for _ in range(2)]
    res = evaluate_sharded(eng, pq, batches, mesh=make_mesh(data=4, model=2))
    assert set(res) >= {'top1', 'top5', 'loss', 'images_per_sec'}
    assert np.isfinite(res['loss'])


def test_sharded_serving_int8_eval():
    """True-int8 serving under the DP x TP mesh: int8 codes + scales shard
    like any other pytree; GSPMD handles the collectives."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
    from cnn_quantization_tpu.parallel import make_mesh, shard_params
    from cnn_quantization_tpu.parallel.eval_parallel import make_sharded_eval_step

    model, meta = build_model('resnet18')
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    policy = QuantPolicy(arch='resnet18', qtype='int8', qweight='int8')
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)

    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    ps = shard_params(pq, mesh)
    step = make_sharded_eval_step(eng, mesh, pq, quantized='serving_int8')
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    labels = jnp.asarray(np.zeros(4, np.int32))
    out = jax.device_get(step(ps, None, images, labels))
    assert np.isfinite(out['loss'])
