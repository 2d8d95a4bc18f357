"""Frozen qparams must reproduce the dynamic use-stats path exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnn_quantization_tpu.models import build_model
from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
from cnn_quantization_tpu.engine.qparams import discover_sites
from cnn_quantization_tpu.calib.calibrator import collect_statistics


@pytest.fixture(scope='module')
def setup():
    model, meta = build_model('resnet18')
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    return model, meta, params


def _stats_for(eng, params):
    rng = np.random.RandomState(0)
    batches = [(rng.rand(2, 64, 64, 3).astype(np.float32), np.zeros(2, np.int32))
               for _ in range(2)]
    return collect_statistics(eng.jit_collect(), params, batches), batches


POLICIES = {
    'headline': dict(qtype='int4', qweight='int4', pcq_weights=True, pcq_act=True,
                     clipping='laplace', bit_alloc_act=True, bit_alloc_weight=True,
                     bias_corr_weight=True),
    'naive8': dict(qtype='int8', qweight='int8', pcq_weights=True, pcq_act=True),
    'layerwise_aciq': dict(qtype='int4', qweight='int8', clipping='laplace'),
    'gaus2std': dict(qtype='int4', clipping='2std', pcq_act=True),
}


@pytest.mark.parametrize('name', sorted(POLICIES))
def test_frozen_matches_dynamic(setup, name):
    """Site-level: frozen affine == dynamic affine bit-for-bit (eager).

    Whole-model jit comparisons are only approximate because XLA fusion can
    flip codes at exact bin edges even between two compilations of the SAME
    program, so exactness is asserted per site and the end-to-end check is at
    the prediction level.
    """
    from cnn_quantization_tpu.engine.context import QuantizeContext
    from cnn_quantization_tpu.engine.qparams import apply_frozen, discover_sites, freeze_qparams
    from cnn_quantization_tpu.calib.capture import make_capture_fn
    from cnn_quantization_tpu.ops.quantizer import quantize_activation

    model, meta, params = setup
    policy = QuantPolicy(arch='resnet18', **POLICIES[name])
    eng = QuantEngine(model, policy, meta)
    stats, batches = _stats_for(eng, params)
    pq = eng.quantize_params(params)
    x = jnp.asarray(batches[0][0])

    sites = discover_sites(model, (2, 64, 64, 3))
    qp = freeze_qparams(policy, stats, sites)
    assert qp, 'no sites frozen'
    acts = jax.device_get(make_capture_fn(eng)(pq, x))
    qctx = QuantizeContext(policy, stats=stats)
    for site, _shape in sites:
        cfg = qctx.config_for(site)
        if cfg is None or site.id not in qp:
            continue
        a = jnp.asarray(acts[site.id])
        dyn, _ = quantize_activation(a, cfg, half_range=site.half_range,
                                     site_stats=qctx.site_stats(site, cfg),
                                     tag=site.tag)
        fro = apply_frozen(a, qp[site.id])
        np.testing.assert_allclose(np.asarray(dyn), np.asarray(fro),
                                   atol=1e-6, err_msg=site.id)

    # end-to-end: same predictions, close logits
    dyn_logits, _ = eng.jit_forward()(pq, stats, x)
    fro_logits, _ = eng.jit_forward(qparams=qp)(pq, stats, x)
    d = np.abs(np.asarray(dyn_logits) - np.asarray(fro_logits))
    assert np.mean(d) < 0.3, np.mean(d)
    np.testing.assert_array_equal(np.argmax(np.asarray(dyn_logits), -1),
                                  np.argmax(np.asarray(fro_logits), -1))


def test_site_discovery(setup):
    model, meta, params = setup
    sites = discover_sites(model, (1, 64, 64, 3))
    ids = [s.id for s, _ in sites]
    assert ids.count('conv0_activation') == 1
    assert len([i for i in ids if i.startswith('conv')]) == 20
    shapes = dict((s.id, sh) for s, sh in sites)
    assert shapes['conv0_activation'][-1] == 64


def test_frozen_covers_all_gemmlowp_sites(setup):
    model, meta, params = setup
    policy = QuantPolicy(arch='resnet18', **POLICIES['headline'])
    eng = QuantEngine(model, policy, meta)
    stats, _ = _stats_for(eng, params)
    qp = eng.freeze_qparams(stats, input_shape=(2, 64, 64, 3))
    sites = discover_sites(model, (2, 64, 64, 3))
    # every site in the stats artifact should freeze (no mid-tread configured)
    missing = [s.id for s, _ in sites if s.id in stats and s.id not in qp]
    assert not missing, missing
