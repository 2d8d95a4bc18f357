"""End-to-end CLI smoke tests: cli.inference_sim.main() in-process on the
synthetic loader (CPU), covering the reference driver's modes
(inference_sim.py:232-267, 375-391): plain eval, collect->use stats round
trip, serving-int8, precision sweep, layer-sensitivity sweep, mid-tread +
entropy.  Each must exit 0 and leave the expected artifact."""

import json
import os

import numpy as np
import pytest

from cnn_quantization_tpu.cli.inference_sim import main


@pytest.fixture()
def cli_env(tmp_path, monkeypatch):
    """Isolated HOME (stats/mlruns artifacts) and cwd (results/ CSVs)."""
    monkeypatch.setenv('HOME', str(tmp_path))
    monkeypatch.delenv('IMAGENET_DIR', raising=False)
    monkeypatch.chdir(tmp_path)
    return tmp_path


BASE = ['--device', 'cpu', '-a', 'resnet18', '-b', '4', '--subset', '8',
        '--input_size', '64', '--data', '/nonexistent']


def test_cli_plain_eval(cli_env, capsys):
    assert main(BASE + ['-pcq_w', '-pcq_a', '--qtype', 'int4', '-qw', 'int4',
                        '-c', 'laplace', '-baa', '-baw', '-bcw']) == 0
    out = capsys.readouterr().out
    res = json.loads(out.strip().splitlines()[-1])
    assert {'top1', 'top5', 'loss', 'images_per_sec'} <= set(res)


def test_cli_collect_then_use(cli_env, capsys):
    common = BASE + ['--qtype', 'int4', '-qw', 'int4', '-c', 'laplace',
                     '-sf', 'smoke_cu']
    assert main(common + ['-sm', 'collect', '-ac', '-cs', '8']) == 0
    stats_path = cli_env / 'mxt-sim-tpu' / 'statistics' / 'smoke_cu.npz'
    assert stats_path.exists(), 'collect mode must write the stats artifact'
    assert main(common + ['-sm', 'use']) == 0
    out = capsys.readouterr().out
    assert 'Loaded statistics' in out
    res = json.loads(out.strip().splitlines()[-1])
    assert res['loss'] > 0


def test_cli_serving_int8(cli_env, capsys):
    assert main(BASE + ['--qtype', 'int8', '-qw', 'int8', '--serving_int8']) == 0
    out = capsys.readouterr().out
    assert 'calibrating frozen activation scales' in out
    res = json.loads(out.strip().splitlines()[-1])
    assert res['loss'] > 0


def test_cli_serving_packed_flag(cli_env, capsys):
    """--serving_packed plumbs through freeze_serving_scales(packed=True)
    and evaluate(packed=True); on a BasicBlock arch it falls back to the
    plain path and must behave identically to --serving_int8 alone."""
    assert main(BASE + ['--qtype', 'int4', '-qw', 'int4', '--serving_int8',
                        '--serving_packed']) == 0
    out = capsys.readouterr().out
    res = json.loads(out.strip().splitlines()[-1])
    assert res['loss'] > 0


def test_cli_eval_precision_sweep(cli_env, capsys):
    assert main(BASE + ['--qtype', 'int8', '-qw', 'int8', '-ep',
                        '--subset', '4']) == 0
    csv = cli_env / 'results' / 'precision' / 'resnet18_no_clipping.csv'
    assert csv.exists()
    body = csv.read_text()
    for row in ('fp32', 'int8', 'int4'):
        assert row in body


def test_cli_custom_test_order_file(cli_env, capsys):
    order = cli_env / 'order.json'
    order.write_text(json.dumps(['conv1_activation', 'conv2_activation']))
    assert main(BASE + ['--qtype', 'int4', '-qw', 'int4', '-ct',
                        '--order_file', str(order), '--subset', '4']) == 0
    csv = (cli_env / 'results' / 'custom_test' /
           'resnet18_max_mse_no_cliping_layer_selection.csv')
    assert csv.exists()
    assert len(csv.read_text().strip().splitlines()) >= 4  # header + 3 runs


def test_cli_mid_tread_entropy(cli_env, capsys):
    assert main(BASE + ['--qtype', 'int4', '-qw', 'int4', '-c', 'laplace',
                        '-mtq', '-me', '--subset', '4']) == 0
    out = capsys.readouterr().out
    assert 'Average bit rate' in out
    res = json.loads(out.strip().splitlines()[-1])
    assert 0.0 < res['avg_entropy'] <= 8.0


def test_golden_repro_smoke(tmp_path, monkeypatch):
    """The golden-number runbook (cli/golden_repro.py, VERDICT r4 task 8)
    must run its sweep end to end on synthetic data — including a
    collect->use two-phase config — and emit the comparison table, so
    reference parity is one command the day weights + ImageNet exist."""
    import json
    monkeypatch.chdir(tmp_path)  # stats artifacts land in cwd
    from cnn_quantization_tpu.cli.golden_repro import main
    out = tmp_path / 'golden.json'
    rc = main(['--smoke', '--out', str(out),
               '--only', 'w4a4_naive', 'int4_aciq_layerwise'])
    assert rc == 0
    rows = json.loads(out.read_text())
    assert [r['config'] for r in rows] == ['w4a4_naive',
                                          'int4_aciq_layerwise']
    for r in rows:
        assert 'synthetic' in r['verdict']
        assert np.isfinite(r['top1'])


def test_serving_packed_stages_flag_validation(tmp_path, monkeypatch):
    """--serving_packed_stages rejects out-of-range stages loudly instead of
    silently measuring the plain path (round-5 review fix)."""
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match='stages 1-4'):
        main(['-a', 'resnet50', '-b', '2', '--input_size', '64', '-ss', '2',
              '--qtype', 'int4', '-qw', 'int4', '--serving_int8',
              '--serving_packed', '--serving_packed_stages', '5'])
