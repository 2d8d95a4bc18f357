"""End-to-end engine tests on a small ResNet-18 with synthetic data."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnn_quantization_tpu.models import build_model
from cnn_quantization_tpu.engine import (QuantPolicy, QuantEngine, TapContext,
                                         CollectContext, QuantizeContext)
from cnn_quantization_tpu.engine.evaluate import evaluate
from cnn_quantization_tpu.calib.calibrator import (StatsAggregator, collect_statistics,
                                                   save_stats, load_stats)


@pytest.fixture(scope='module')
def small_resnet():
    model, meta = build_model('resnet18')
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    return model, meta, params


def _policy(**kw):
    base = dict(qtype='int4', qweight='int4', pcq_weights=True, pcq_act=True,
                clipping='laplace', bit_alloc_act=True, bit_alloc_weight=True,
                bias_corr_weight=True, arch='resnet18')
    base.update(kw)
    return QuantPolicy(**base)


def test_site_numbering_resnet18(small_resnet):
    model, _, params = small_resnet
    ctx = CollectContext(per_channel=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    model.apply({'params': params}, x, ctx)
    ids = set(ctx.collected)
    # 20 convs (conv0..conv19), 1 maxpool, 1 avgpool, 1 linear
    assert 'conv0_activation' in ids and 'conv19_activation' in ids
    assert 'conv20_activation' not in ids
    assert 'maxpool0_out' in ids and 'avgpool0_out' in ids
    assert 'linear0_activation' in ids
    assert len([i for i in ids if i.startswith('conv')]) == 20


def test_resnet50_site_count():
    from cnn_quantization_tpu.models.resnet import build_resnet
    m = build_resnet('resnet50')
    ids = [m.stem_sites[0].id]
    ds_ids = []
    for stage in m.stage_specs:
        for spec in stage:
            if spec.has_downsample:
                ds_ids.append(spec.ds_sites[0].id)
                ids.append(spec.ds_sites[0].id)
            ids.extend(c.id for c, _ in spec.conv_sites)
    nums = sorted(int(s[len('conv'):-len('_activation')]) for s in ids)
    # 53 convs in resnet50, ids conv0..conv52 — matches the reference's
    # max_mse_order_id list (inference_sim.py:115 mentions conv52)
    assert len(nums) == 53 and nums[0] == 0 and nums[-1] == 52
    # layer4 downsample is conv43 in reference ordering: stem(1)+L1(10)+L2(13)+L3(19)
    assert 'conv43_activation' in ds_ids
    # stem + bottleneck conv1/conv2 are half-range (before_relu marking)
    assert m.stem_sites[0].half_range
    spec0 = m.stage_specs[0][0]
    assert spec0.conv_sites[0][0].half_range and spec0.conv_sites[1][0].half_range
    assert not spec0.conv_sites[2][0].half_range
    assert not spec0.ds_sites[0].half_range


def test_quantized_forward_changes_logits(small_resnet):
    model, meta, params = small_resnet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    fp_logits = model.apply({'params': params}, x, TapContext())
    eng = QuantEngine(model, _policy(), meta)
    pq = eng.quantize_params(params)
    q_logits, _ = eng.jit_forward()(pq, None, x)
    assert q_logits.shape == (2, 1000)
    assert not np.allclose(np.asarray(fp_logits), np.asarray(q_logits))
    # int8 should be close to fp32
    eng8 = QuantEngine(model, _policy(qtype='int8', qweight='int8', clipping='no',
                                      bit_alloc_act=False, bit_alloc_weight=False), meta)
    p8 = eng8.quantize_params(params)
    l8, _ = eng8.jit_forward()(p8, None, x)
    rel = np.linalg.norm(np.asarray(l8 - fp_logits)) / np.linalg.norm(np.asarray(fp_logits))
    assert rel < 0.15, rel


def test_weight_pass_first_layer_stays_8bit(small_resnet):
    model, meta, params = small_resnet
    eng = QuantEngine(model, _policy(clipping='no'), meta)
    pq = eng.quantize_params(params)
    # first conv (in_ch==3) gets 8 bits -> many more unique values than int4
    k0 = np.asarray(pq['conv1']['kernel'])
    uniq0 = max(np.unique(k0[..., c]).size for c in range(k0.shape[-1]))
    assert uniq0 > 16
    # a deeper conv is 4-bit: <= 16 levels per output channel
    k = np.asarray(pq['layer2_0']['conv1']['kernel'])
    uniq = max(np.unique(k[..., c]).size for c in range(k.shape[-1]))
    assert uniq <= 16


def test_bias_corr_weight_preserves_channel_means(small_resnet):
    model, meta, params = small_resnet
    eng = QuantEngine(model, _policy(qweight='int4', clipping='no'), meta)
    pq = eng.quantize_params(params)
    w = np.asarray(params['layer3_0']['conv2']['kernel'])
    wq = np.asarray(pq['layer3_0']['conv2']['kernel'])
    np.testing.assert_allclose(wq.reshape(-1, w.shape[-1]).mean(0),
                               w.reshape(-1, w.shape[-1]).mean(0), atol=1e-6)


def test_collect_use_roundtrip(tmp_path, small_resnet):
    model, meta, params = small_resnet
    policy = _policy()
    eng = QuantEngine(model, policy, meta)
    collect = eng.jit_collect()
    rng = np.random.RandomState(0)
    batches = [(rng.rand(2, 64, 64, 3).astype(np.float32), np.zeros(2, np.int32))
               for _ in range(3)]
    summary = collect_statistics(collect, params, batches)
    assert 'conv0_activation' in summary
    e = summary['conv0_activation']
    assert 'scalar/mean_b' in e and 'channel/mean_min' in e
    assert e['channel/mean_min'].shape == (64,)
    path = str(tmp_path / 'stats.npz')
    save_stats(path, summary)
    loaded = load_stats(path)
    np.testing.assert_allclose(loaded['conv0_activation']['channel/mean_min'],
                               e['channel/mean_min'])
    # use-stats forward runs
    pq = eng.quantize_params(params)
    logits, _ = eng.jit_forward()(pq, loaded, batches[0][0])
    assert np.all(np.isfinite(np.asarray(logits)))


def test_evaluate_loop(small_resnet):
    model, meta, params = small_resnet
    eng = QuantEngine(model, _policy(qtype='int8', qweight='int8', clipping='no',
                                     bit_alloc_act=False, bit_alloc_weight=False), meta)
    pq = eng.quantize_params(params)
    rng = np.random.RandomState(1)
    batches = [(rng.rand(4, 64, 64, 3).astype(np.float32),
                rng.randint(0, 1000, 4).astype(np.int32)) for _ in range(2)]
    res = evaluate(eng, pq, batches)
    assert set(res) >= {'top1', 'top5', 'loss', 'images_per_sec'}
    assert 0 <= res['top1'] <= 100


def test_ignore_ids_route_to_int8(small_resnet):
    """The 8-bit ignore list fires only in use-stats mode, because the
    reference's no-stats layer branches omit stat_id and quantize_instant
    matches the list against stat_id
    (inference_quantization_manager.py:549-556) — differentially verified
    in tests/test_full_model_parity.py."""
    model, meta, params = small_resnet
    x = np.abs(np.random.RandomState(2).rand(2, 64, 64, 3)).astype(np.float32)
    pol = _policy(clipping='no', bit_alloc_act=False)
    eng_all4 = QuantEngine(model, pol, meta, ignore_ids=())
    eng_ign = QuantEngine(model, pol, meta, ignore_ids=('conv5_activation',))
    stats = collect_statistics(eng_all4.jit_collect(), params,
                               [(x, np.zeros(2, np.int32))])
    l1, _ = eng_all4.jit_forward()(params, stats, x)
    l2, _ = eng_ign.jit_forward()(params, stats, x)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # no-stats mode: the list does not fire (reference parity)
    l3, _ = eng_all4.jit_forward()(params, None, x)
    l4, _ = eng_ign.jit_forward()(params, None, x)
    np.testing.assert_array_equal(np.asarray(l3), np.asarray(l4))


def test_evaluate_resume(tmp_path):
    """Eval-loop checkpoint/resume: interrupting after N batches and
    restarting with the same resume_path reproduces the uninterrupted
    meters exactly (aux subsystem the reference lacks, SURVEY.md §5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
    from cnn_quantization_tpu.engine.evaluate import evaluate

    model, meta = build_model('resnet18')
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    policy = QuantPolicy(arch='resnet18', qtype='int8', qweight='int8')
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)
    rng = np.random.RandomState(0)
    batches = [(rng.rand(2, 64, 64, 3).astype(np.float32),
                rng.randint(0, 1000, 2).astype(np.int32)) for _ in range(4)]

    full = evaluate(eng, pq, batches)

    ckpt = str(tmp_path / 'eval_resume.json')

    # interrupted run: dies after 2 batches (checkpoint written per batch)
    def interrupted():
        for i, b in enumerate(batches):
            if i == 2:
                raise RuntimeError('simulated preemption')
            yield b

    with pytest.raises(RuntimeError):
        evaluate(eng, pq, interrupted(), resume_path=ckpt, checkpoint_every=1)
    assert os.path.exists(ckpt)
    resumed = evaluate(eng, pq, batches, resume_path=ckpt,
                       checkpoint_every=1)
    assert not os.path.exists(ckpt)  # cleared on completion
    for k in ('top1', 'top5'):
        assert abs(resumed[k] - full[k]) < 1e-9, (k, resumed[k], full[k])
    assert abs(resumed['loss'] - full['loss']) < 1e-4


def test_stochastic_rounding_end_to_end(small_resnet):
    """--stochastic wired CLI->policy->kernel (the reference's dead flag,
    inference_sim.py:79): the stochastic forward must differ from the
    deterministic one but stay close (noise is +/-0.5 code), and be
    reproducible (per-site crc32 seeds, not salted hash)."""
    model, meta, params = small_resnet
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3), jnp.float32)

    det = QuantEngine(model, _policy(stochastic=False), meta)
    sto = QuantEngine(model, _policy(stochastic=True), meta)
    pq = det.quantize_params(params)
    logits_det, _ = det.jit_forward()(pq, None, x)
    logits_sto, _ = sto.jit_forward()(pq, None, x)
    logits_sto2, _ = sto.jit_forward()(pq, None, x)

    assert not np.allclose(np.asarray(logits_det), np.asarray(logits_sto))
    np.testing.assert_allclose(np.asarray(logits_sto), np.asarray(logits_sto2))
    # same quantization grid, only rounding differs: logits stay in the
    # same ballpark
    d = np.abs(np.asarray(logits_det) - np.asarray(logits_sto))
    scale = np.abs(np.asarray(logits_det)).max() + 1e-6
    assert d.max() / scale < 1.0


def test_rho_clippers_wired(small_resnet):
    """--rho_act/--rho_weight (dead in the reference,
    clipping_manager.py) are live: a small rho changes the quantized
    forward; weight clip at rho=1.0 is a no-op."""
    model, meta, params = small_resnet
    x = jnp.asarray(np.random.RandomState(4).rand(2, 64, 64, 3), jnp.float32)

    base = QuantEngine(model, _policy(), meta)
    clipped = QuantEngine(model, _policy(rho_act=0.2, rho_weight=0.5), meta)
    noop_w = QuantEngine(model, _policy(rho_weight=1.0), meta)

    pq_base = base.quantize_params(params)
    pq_noop = noop_w.quantize_params(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        pq_base, pq_noop)

    l_base, _ = base.jit_forward()(pq_base, None, x)
    pq_clip = clipped.quantize_params(params)
    l_clip, _ = clipped.jit_forward()(pq_clip, None, x)
    assert not np.allclose(np.asarray(l_base), np.asarray(l_clip))
