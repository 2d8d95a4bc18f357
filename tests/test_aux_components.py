"""Auxiliary components: error stats, mix clipping, measurement, tracker,
clippers, results log, dataset helpers, bias study."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnn_quantization_tpu.models import build_model
from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
from cnn_quantization_tpu.calib.calibrator import collect_statistics


@pytest.fixture(scope='module')
def setup():
    model, meta = build_model('resnet18')
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    rng = np.random.RandomState(0)
    batches = [(rng.rand(2, 64, 64, 3).astype(np.float32), np.zeros(2, np.int32))
               for _ in range(2)]
    return model, meta, params, batches


def test_error_stats_collected_and_mix_clipping_works(setup):
    model, meta, params, batches = setup
    policy = QuantPolicy(arch='resnet18', qtype='int4', qweight='int8',
                         clipping='mix')
    eng = QuantEngine(model, policy, meta)
    stats = collect_statistics(eng.jit_collect(err_bits=4), params, batches)
    e = stats['conv1_activation']
    for k in ('scalar/mean_mse_lowp', 'scalar/mean_mse_gaus',
              'scalar/mean_mse_laplace', 'scalar/mean_cos_laplace'):
        assert k in e, sorted(e)
    assert 0.9 < float(e['scalar/mean_cos_laplace']) <= 1.0
    # mix clipping consumes the error stats without blowing up
    pq = eng.quantize_params(params)
    logits, _ = eng.jit_forward()(pq, stats, jnp.asarray(batches[0][0]))
    assert np.all(np.isfinite(np.asarray(logits)))


def test_measure_statistics(tmp_path, setup):
    model, meta, params, batches = setup
    policy = QuantPolicy(arch='resnet18', qtype='int4', qweight='int4',
                         pcq_weights=True, pcq_act=True)
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)
    from cnn_quantization_tpu.calib.measure import measure_statistics, save_measure_csv
    frames = measure_statistics(eng, params, pq, batches, max_batches=1)
    assert 'conv1_activation' in frames
    df = frames['conv1_activation']
    assert {'norm_fp', 'norm_q', 'mse', 'cos', 'rel_err'} <= set(df.columns)
    assert 0.5 < df['cos'].iloc[0] <= 1.0
    path = save_measure_csv(frames, str(tmp_path), 'resnet18')
    assert os.path.exists(path)


def test_metrics_tracker(tmp_path):
    from cnn_quantization_tpu.utils.tracker import MetricsTracker
    with MetricsTracker(str(tmp_path), 'exp', name='t') as tr:
        tr.log_metric('top1', 73.3)
        tr.log_metric('e', 2.0, step='auto', meter_id='avg.ent', weight=10)
        tr.log_metric('e', 4.0, step='auto', meter_id='avg.ent', weight=30)
        assert abs(tr.meters['avg.ent'].avg - 3.5) < 1e-9
        d = tr.dir
    lines = [json.loads(l) for l in open(os.path.join(d, 'metrics.jsonl'))]
    assert any(l['key'] == 'top1' for l in lines)
    assert any(l['key'] == 'avg.avg.ent' for l in lines)


def test_clippers():
    from cnn_quantization_tpu.ops.clippers import ratio_clip, statistical_clip
    x = jnp.asarray(np.random.RandomState(0).laplace(0, 1, 1000).astype(np.float32))
    rc = ratio_clip(x, 0.5)
    assert float(jnp.max(jnp.abs(rc))) <= 0.5 * float(jnp.max(jnp.abs(x))) + 1e-6
    sc = statistical_clip(x, 1.0)
    assert float(jnp.max(jnp.abs(sc))) <= float(jnp.max(jnp.abs(x)))


def test_results_log(tmp_path):
    from cnn_quantization_tpu.utils.results_log import ResultsLog
    rl = ResultsLog(str(tmp_path / 'res'))
    rl.add(epoch=1, top1=50.0)
    rl.add(epoch=2, top1=60.0)
    rl.save()
    rl2 = ResultsLog(str(tmp_path / 'res')).load()
    assert list(rl2.df['top1']) == [50.0, 60.0]


def test_dataset_helpers():
    from cnn_quantization_tpu.data.dataset import (limit_samples, by_class,
                                                   index_view,
                                                   sample_with_replacement)
    samples = [(f'p{i}', i % 3) for i in range(9)]
    assert len(limit_samples(samples, 4)) == 4
    assert all(l == 1 for _, l in by_class(samples, [1]))
    assert index_view(samples, [2, 0]) == [samples[2], samples[0]]
    assert len(sample_with_replacement(samples, 20)) == 20


def test_bias_correction_study(setup):
    model, meta, params, _ = setup
    from cnn_quantization_tpu.analysis.bias_correction import channel_bias
    rows = channel_bias(params, num_bits=4)
    assert rows
    q, c = next(iter(rows.values()))
    # correction should reduce the mean normalized bias dramatically
    assert c.mean() < q.mean() * 0.1


def test_online_meter_welford():
    """OnlineMeter matches numpy mean/unbiased-var (reference meters.py:45-78)."""
    from cnn_quantization_tpu.utils.meters import OnlineMeter
    rng = np.random.RandomState(0)
    xs = rng.randn(10, 4).astype(np.float32)
    m = OnlineMeter()
    for x in xs:
        m.update(x)
    np.testing.assert_allclose(m.mean, xs.mean(0), rtol=1e-5)
    np.testing.assert_allclose(m.var, xs.var(0, ddof=1), rtol=1e-4)
    np.testing.assert_allclose(m.std, xs.std(0, ddof=1), rtol=1e-4)
    single = OnlineMeter()
    single.update(xs[0])
    np.testing.assert_allclose(single.var, np.zeros(4))


def test_accuracy_meter():
    """AccuracyMeter running top-k percent (reference meters.py:98-126)."""
    from cnn_quantization_tpu.utils.meters import AccuracyMeter
    m = AccuracyMeter(topk=(1, 2))
    logits = np.array([[0.9, 0.1, 0.0],
                       [0.1, 0.9, 0.0],
                       [0.0, 0.1, 0.9],
                       [0.9, 0.1, 0.0]], np.float32)
    labels = np.array([0, 1, 1, 1])  # top1 right on 2/4; top2 right on 4/4
    m.update(logits, labels)
    assert abs(m.avg[1] - 50.0) < 1e-6
    assert abs(m.avg[2] - 100.0) < 1e-6
    assert abs(m.avg_error[1] - 50.0) < 1e-6
    m.update(logits[:2], labels[:2])  # both right at top1: running avg 4/6
    assert abs(m.avg[1] - 100.0 * 4 / 6) < 1e-4
    assert abs(m.avg[2] - 100.0) < 1e-4


def test_tracker_mlflow_forwarding(tmp_path, monkeypatch):
    """The mlflow branch of MetricsTracker (reference utils/mllog.py:20-34
    logs params+metrics to a live tracker): verified against a stub module
    since mlflow isn't installed here — params logged once, metrics
    forwarded with dots for slashes, run ended."""
    import sys
    import types
    import argparse

    calls = {'params': [], 'metrics': [], 'started': 0, 'ended': 0}
    stub = types.ModuleType('mlflow')
    stub.set_tracking_uri = lambda uri: calls.setdefault('uri', uri)
    stub.start_run = lambda: calls.__setitem__('started', calls['started'] + 1)
    stub.end_run = lambda: calls.__setitem__('ended', calls['ended'] + 1)
    stub.log_params = lambda p: calls['params'].append(p)
    stub.log_metric = lambda k, v, step=None: calls['metrics'].append((k, v, step))
    monkeypatch.setitem(sys.modules, 'mlflow', stub)

    from cnn_quantization_tpu.utils.tracker import MetricsTracker
    args = argparse.Namespace(arch='resnet18', qtype='int4')
    with MetricsTracker(str(tmp_path), 'exp', args, 'run') as tr:
        tr.log_metric('top1', 73.3)
        tr.log_metric('site/entropy', 3.5, meter_id='ent', weight=2.0)
    assert calls['started'] == 1 and calls['ended'] == 1
    assert calls['params'] and calls['params'][0]['arch'] == 'resnet18'
    assert ('top1', 73.3, None) in calls['metrics']
    assert ('site.entropy', 3.5, None) in calls['metrics']


def test_per_op_profile_cpu_graceful(tmp_path):
    """per_op_profile (the bench `per_op_top` capture) returns a plain list
    and degrades to [] where no device trace exists (CPU CI) — bench treats
    that as 'no profile', never an error.  The parsing logic itself is
    exercised on a canned xprof table."""
    import json
    import jax.numpy as jnp
    from cnn_quantization_tpu.utils import profiling

    rows = profiling.per_op_profile(
        lambda a, b: a @ b,
        (jnp.ones((64, 64)), jnp.ones((64, 64))),
        logdir=str(tmp_path / 'xp'))
    assert isinstance(rows, list)

    # canned framework_op_stats table -> parsed/sorted/filtered rows
    cols = [{'id': c} for c in (
        'rank', 'host_or_device', 'type', 'operation', 'occurrences',
        'total_time', 'avg_time', 'total_self_time', 'avg_self_time',
        'device_total_self_time_percent',
        'device_cumulative_total_self_time_percent',
        'host_total_self_time_percent',
        'Host_cumulative_total_self_time_percent', 'measured_flop_rate',
        'model_flop_rate', 'measured_memory_bw', 'operational_intensity',
        'bound_by', 'eager')]

    def row(host, op, self_us, rate, bw):
        vals = [1.0, host, 'conv', op, 3.0, self_us, self_us, self_us,
                self_us, 1.0, 1.0, 0.0, 0.0, rate, rate, bw, 1.0,
                'Compute', 'Function']
        return {'c': [{'v': v} for v in vals]}

    table = [{'cols': cols,
              'rows': [row('Device', 'conv_a', 300.0, 1e5, 480.0),
                       row('Host', 'pyloop', 900.0, 0.0, 0.0),
                       row('Device', 'conv_b', 600.0, 2e5, 240.0)]}]

    class FakeMod:
        @staticmethod
        def xspace_to_tool_data(paths, tool, opts):
            return json.dumps(table).encode(), 'application/json'

    import sys
    import types
    fake_pkg = types.ModuleType('xprof.convert.raw_to_tool_data')
    fake_pkg.xspace_to_tool_data = FakeMod.xspace_to_tool_data
    saved = {k: sys.modules.get(k) for k in
             ('xprof', 'xprof.convert', 'xprof.convert.raw_to_tool_data')}
    try:
        sys.modules['xprof'] = types.ModuleType('xprof')
        sys.modules['xprof.convert'] = types.ModuleType('xprof.convert')
        sys.modules['xprof.convert.raw_to_tool_data'] = fake_pkg
        (tmp_path / 'xp2').mkdir()
        (tmp_path / 'xp2' / 'a.xplane.pb').write_bytes(b'')
        rows = profiling.per_op_profile(
            lambda a, b: a @ b,
            (jnp.ones((64, 64)), jnp.ones((64, 64))),
            reps=3, logdir=str(tmp_path / 'xp2'))
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    # Host rows filtered, sorted by self time desc, averaged over reps
    assert [r['op'] for r in rows] == ['conv_b', 'conv_a']
    assert rows[0]['self_us'] == 200.0 and rows[1]['self_us'] == 100.0
    assert rows[0]['bound'] == 'Compute'
