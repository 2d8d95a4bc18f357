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


def _compare_sharded_vs_single(eng, pq, mesh, *, stats=None, qparams=None,
                               loss_rtol=1e-6):
    """Sharded step vs single-device step on identical inputs: under GSPMD
    the program's global semantics must not depend on sharding — counts must
    match exactly and loss to float tolerance."""
    from cnn_quantization_tpu.engine.evaluate import make_eval_step
    rng = np.random.RandomState(0)
    images = rng.rand(8, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 1000, 8).astype(np.int32)

    step = make_sharded_eval_step(eng, mesh, pq, qparams=qparams)
    out = jax.device_get(step(shard_params(pq, mesh), stats, images, labels))
    ref = jax.device_get(make_eval_step(eng, qparams=qparams)(
        pq, stats, images, labels))
    assert int(out['top1']) == int(ref['top1'])
    assert int(out['top5']) == int(ref['top5'])
    np.testing.assert_allclose(out['loss'], ref['loss'], rtol=loss_rtol)


def test_dp_mesh_eval_matches_single_device_dynamic(setup):
    """Dynamic (online-stats) path under pure DP: GSPMD computes batch
    statistics GLOBALLY (asserted precisely by
    test_dp_collect_stats_are_global), but the mean/std reductions
    reassociate across shards (~1e-7 relative), and int4 rounding amplifies
    that chaotically through 20 layers on random weights — the same effect
    any two XLA fusion decisions produce on one device.  So this end-to-end
    check uses a coarse tolerance whose job is to catch per-SHARD-stats bugs
    (which shift the loss by O(10%+) and accuracy counts arbitrarily); exact
    reproducibility is guaranteed — and asserted exactly below — for the
    x-independent configs (frozen qparams / use-stats), which are the
    deployment paths."""
    from cnn_quantization_tpu.engine.evaluate import make_eval_step
    model, meta, eng, pq = setup
    mesh = make_mesh(data=8, model=1)
    rng = np.random.RandomState(0)
    images = rng.rand(8, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 1000, 8).astype(np.int32)
    step = make_sharded_eval_step(eng, mesh, pq)
    out = jax.device_get(step(shard_params(pq, mesh), None, images, labels))
    ref = jax.device_get(make_eval_step(eng)(pq, None, images, labels))
    np.testing.assert_allclose(out['loss'], ref['loss'], rtol=5e-2)
    assert abs(int(out['top1']) - int(ref['top1'])) <= 1
    assert abs(int(out['top5']) - int(ref['top5'])) <= 1


def test_dp_collect_stats_are_global(setup):
    """Calibration stats computed under a DP-sharded collect step equal the
    single-device stats to reassociation tolerance — i.e. GSPMD reduces
    globally across shards, never per-shard.  (A per-shard bug would be off
    by O(1): e.g. per-shard min/max of 1 image vs the global 8.)  Kurtosis
    is a 4th-moment ratio and amplifies reassociation noise the most, hence
    the atol floor."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    model, meta, eng, pq = setup
    mesh = make_mesh(data=8, model=1)
    rng = np.random.RandomState(11)
    images = rng.rand(8, 64, 64, 3).astype(np.float32)

    collect = eng.make_collect()
    sharded = jax.jit(collect, in_shardings=(
        None, NamedSharding(mesh, P('data'))),
        out_shardings=None)
    _, st_sh = jax.device_get(sharded(pq, images))
    _, st_si = jax.device_get(jax.jit(collect)(pq, images))
    for site, entry in st_si.items():
        for stat, v in entry.items():
            np.testing.assert_allclose(
                np.asarray(st_sh[site][stat]), np.asarray(v),
                rtol=1e-3, atol=1e-4,
                err_msg=f'{site}/{stat} differs under DP sharding')


def test_dp_mesh_eval_matches_single_device_frozen(setup):
    """Frozen-qparams path (x-independent quantization) under DP: exact."""
    model, meta, eng, pq = setup
    from cnn_quantization_tpu.calib.calibrator import collect_statistics
    rng = np.random.RandomState(7)
    batches = [(rng.rand(8, 64, 64, 3).astype(np.float32),
                np.zeros(8, np.int32))]
    stats = collect_statistics(eng.jit_collect(), pq, batches)
    qp = eng.freeze_qparams(stats, input_shape=(8, 64, 64, 3))
    assert qp, 'freeze_qparams resolved no sites'
    _compare_sharded_vs_single(eng, pq, make_mesh(data=8, model=1), qparams=qp)


def test_dp_mesh_eval_matches_single_device_use_stats(setup):
    """Stats-driven dynamic path (use-stats mode) under DP: quantization
    params are functions of the replicated stats artifact only — exact."""
    model, meta, eng, pq = setup
    from cnn_quantization_tpu.calib.calibrator import collect_statistics
    rng = np.random.RandomState(8)
    batches = [(rng.rand(8, 64, 64, 3).astype(np.float32),
                np.zeros(8, np.int32))]
    stats = collect_statistics(eng.jit_collect(), pq, batches)
    _compare_sharded_vs_single(eng, pq, make_mesh(data=8, model=1), stats=stats)


def test_tp_mesh_eval_matches_single_device_frozen(setup):
    """Model-axis sharding splits conv accumulations across devices; with
    frozen qparams the only divergence is f32 reduction reassociation in the
    psum — loss agrees to ~1e-5 and counts must still match on this input."""
    model, meta, eng, pq = setup
    from cnn_quantization_tpu.calib.calibrator import collect_statistics
    rng = np.random.RandomState(9)
    batches = [(rng.rand(8, 64, 64, 3).astype(np.float32),
                np.zeros(8, np.int32))]
    stats = collect_statistics(eng.jit_collect(), pq, batches)
    qp = eng.freeze_qparams(stats, input_shape=(8, 64, 64, 3))
    _compare_sharded_vs_single(eng, pq, make_mesh(data=2, model=4),
                               qparams=qp, loss_rtol=1e-4)


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


def test_sharded_prepared_serving_exactness():
    """Deployment configuration under TP (VERDICT r3 task 5): offline-
    prepared int8 codes + per-channel ``w_scale`` leaves sharded over the
    ``model`` axis with FROZEN activation scales must produce EXACTLY the
    single-device logits — frozen scales make the quantization decisions
    x-independent, so GSPMD sharding is an execution detail."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
    from cnn_quantization_tpu.parallel import make_mesh, shard_params
    from cnn_quantization_tpu.parallel.eval_parallel import make_sharded_eval_step
    from cnn_quantization_tpu.parallel.mesh import batch_sharding, param_sharding, replicated

    model, meta = build_model('resnet18')
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, TapContext())['params']
    policy = QuantPolicy(arch='resnet18', qtype='int8', qweight='int8')
    eng = QuantEngine(model, policy, meta)
    sp = eng.prepare_serving_params(eng.quantize_params(params))
    rng = np.random.RandomState(5)
    cal = [(rng.rand(4, 64, 64, 3).astype(np.float32), np.zeros(4, np.int32))]
    scales = eng.freeze_serving_scales(sp, cal)

    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    fwd = eng.make_forward(quantized='serving_int8', act_scales=scales)
    single_logits, _ = jax.jit(fwd)(sp, None, images)

    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    sps = shard_params(sp, mesh)
    # int8 code kernels and their w_scale leaves must actually shard
    k = sps['layer1_0']['conv1']['kernel']
    assert k.dtype == jnp.int8 and k.sharding.spec[-1] == 'model'
    ws = sps['layer1_0']['conv1']['w_scale']
    assert ws.sharding.spec[-1] == 'model'

    sharded = jax.jit(
        lambda p, im: fwd(p, None, im)[0],
        in_shardings=(param_sharding(mesh, sp), batch_sharding(mesh, 4)),
        out_shardings=replicated(mesh))
    sharded_logits = jax.device_get(sharded(sps, images))
    np.testing.assert_array_equal(np.asarray(single_logits),
                                  np.asarray(sharded_logits))


def test_sharded_serving_depthwise_per_channel():
    """Per-channel/per-group frozen activation scales (round 5) under the
    DP x TP mesh: MobileNet-v2's depthwise trunk with vector act scales.
    Unlike ResNet-18 (bit-exact above), the sharded program is a DIFFERENT
    XLA compilation whose f32 fusion rounding flips occasional requant
    boundary codes, and 53 int layers amplify a flip to visible logit
    deltas (measured: 25% of logits off by <=0.52 on ~|7| values, argmax
    stable) — the same compilation-sensitivity as jit-vs-eager at 4 bits
    (round 4).  So this asserts prediction agreement + bounded deltas, not
    bit equality; the quantization DECISIONS stay x-independent (frozen
    vector scales are closed-over constants)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
    from cnn_quantization_tpu.parallel import make_mesh, shard_params
    from cnn_quantization_tpu.parallel.mesh import (batch_sharding,
                                                    param_sharding,
                                                    replicated)

    model, meta = build_model('mobilenet_v2')
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, TapContext())['params']
    eng = QuantEngine(model, QuantPolicy(arch='mobilenet_v2', qtype='int8',
                                         qweight='int8'), meta)
    sp = eng.prepare_serving_params(eng.quantize_params(params))
    rng = np.random.RandomState(6)
    cal = [(rng.rand(4, 64, 64, 3).astype(np.float32), np.zeros(4, np.int32))]
    scales = eng.freeze_serving_scales(sp, cal)
    assert sum(1 for v in scales.values() if np.ndim(v) == 1) == 17

    images = jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32))
    fwd = eng.make_forward(quantized='serving_int8', act_scales=scales)
    single_logits, _ = jax.jit(fwd)(sp, None, images)

    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    sps = shard_params(sp, mesh)
    sharded = jax.jit(
        lambda p, im: fwd(p, None, im)[0],
        in_shardings=(param_sharding(mesh, sp), batch_sharding(mesh, 4)),
        out_shardings=replicated(mesh))
    sharded_logits = jax.device_get(sharded(sps, images))
    a, b = np.asarray(single_logits), np.asarray(sharded_logits)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel
    assert (a.argmax(-1) == b.argmax(-1)).all()
