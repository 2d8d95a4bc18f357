"""Multi-host helpers on a single process (8 virtual devices)."""

import numpy as np
import jax

from cnn_quantization_tpu.parallel.distributed import (global_mesh, host_shard,
                                                       make_global_batch,
                                                       init_distributed)
from cnn_quantization_tpu.utils.profiling import cost_analysis, device_peaks


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv('JAX_COORDINATOR', raising=False)
    assert init_distributed() is False


def test_global_mesh_axes():
    mesh = global_mesh(model_axis=2)
    assert mesh.shape == {'data': 4, 'model': 2}


def test_host_shard_single_process():
    samples = list(range(10))
    assert host_shard(samples) == samples  # 1 process -> everything


def test_host_shard_multi_process_split():
    samples = list(range(10))
    shards = [host_shard(samples, process_index=i, process_count=4)
              for i in range(4)]
    assert sum(len(s) for s in shards) >= 10
    assert [x for s in shards for x in s][:10] == samples


def test_make_global_batch_sharding():
    mesh = global_mesh(model_axis=1)
    im = np.zeros((8, 4, 4, 3), np.float32)
    lb = np.zeros((8,), np.int32)
    gim, glb = make_global_batch(mesh, im, lb)
    assert gim.sharding.spec[0] == 'data'
    assert glb.sharding.spec[0] == 'data'


def test_cost_analysis_flops():
    import jax.numpy as jnp
    f = lambda a, b: a @ b
    a = jnp.zeros((128, 256)); b = jnp.zeros((256, 64))
    costs = cost_analysis(f, a, b)
    assert abs(costs.get('flops', 0) - 2 * 128 * 256 * 64) / (2 * 128 * 256 * 64) < 0.5


def test_device_peaks_has_keys():
    p = device_peaks()
    assert {'bf16_flops', 'int8_ops', 'hbm_gbps'} <= set(p)


def test_roofline_report_fields():
    """RooflineReport arithmetic, including the memory-roofline MFU ceiling
    bench.py emits: at 1 byte/flop on a machine with peak 100 flops/s and
    10 B/s, memory caps utilization at (1 flop/B * 10 B/s) / 100 = 10%."""
    from cnn_quantization_tpu.utils.profiling import RooflineReport
    rep = RooflineReport(flops_per_call=50.0, bytes_per_call=50.0,
                         calls_per_sec=0.1, achieved_flops=5.0,
                         achieved_bw=5.0, peak_flops=100.0, peak_bw=10.0)
    assert rep.compute_util == 0.05
    assert rep.bandwidth_util == 0.5
    assert rep.bound == 'memory'
    assert abs(rep.mem_roofline_mfu - 0.10) < 1e-12
    # compute_util can never legitimately exceed the memory ceiling when
    # the byte count is honest; here 0.05 < 0.10 as required
    assert rep.compute_util <= rep.mem_roofline_mfu


def test_two_process_sharded_eval(tmp_path):
    """Real multi-process coverage: 2 workers x 2 virtual CPU devices,
    jax.distributed.initialize on localhost, a 4-device global data mesh,
    and make_global_batch's jax.make_array_from_process_local_data branch.
    Both workers must report the identical globally-reduced result, matching
    a single-process run of the same program."""
    import json
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    coordinator = f'127.0.0.1:{port}'

    import os
    # PALLAS_AXON_POOL_IPS triggers this machine's sitecustomize to register
    # the axon TPU backend at interpreter start, which initializes XLA before
    # jax.distributed.initialize can run — strip it (workers are CPU-only)
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS', 'JAX_COORDINATOR',
                        'PALLAS_AXON_POOL_IPS')}
    env['PYTHONUNBUFFERED'] = '1'
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo_root + os.pathsep + env.get('PYTHONPATH', '')
    worker = os.path.join(os.path.dirname(__file__), '_distributed_worker.py')
    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, '2', str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=repo_root)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f'worker failed:\n{err[-3000:]}'
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # globally-reduced outputs are identical on every process
    assert outs[0]['top1'] == outs[1]['top1']
    assert outs[0]['top5'] == outs[1]['top5']
    assert abs(outs[0]['loss'] - outs[1]['loss']) < 1e-5

    # and match a single-process run of the same program (coarse loss tol:
    # cross-host reduction reassociation, see test_parallel.py)
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
    from cnn_quantization_tpu.engine.evaluate import make_eval_step
    import jax.numpy as jnp
    model, meta = build_model('resnet18')
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, TapContext())['params'])(
        jax.random.PRNGKey(0))
    eng = QuantEngine(model, QuantPolicy(qtype='int8', qweight='f32',
                                         arch='resnet18'), meta)
    rng = np.random.RandomState(0)
    images = rng.rand(4, 64, 64, 3).astype(np.float32)
    labels = rng.randint(0, 1000, 4).astype(np.int32)
    ref = jax.device_get(make_eval_step(eng)(params, None,
                                             jnp.asarray(images),
                                             jnp.asarray(labels)))
    assert abs(outs[0]['top1'] - int(ref['top1'])) <= 1
    np.testing.assert_allclose(outs[0]['loss'], float(ref['loss']), rtol=5e-2)
