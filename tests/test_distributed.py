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
