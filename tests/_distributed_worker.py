"""Worker process for the multi-process jax.distributed test.

Launched by tests/test_distributed.py::test_two_process_sharded_eval with
  python tests/_distributed_worker.py <coordinator> <num_procs> <proc_id>
Each worker owns 2 virtual CPU devices; the global mesh spans 4 devices over
2 processes, exercising init_distributed and make_global_batch's multi-host
branch (jax.make_array_from_process_local_data).  Prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=2').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from cnn_quantization_tpu.parallel.distributed import (
        global_mesh, host_shard, init_distributed, make_global_batch)

    assert init_distributed(coordinator, num_procs, proc_id) is True
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 2 * num_procs

    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext
    from cnn_quantization_tpu.parallel.eval_parallel import make_sharded_eval_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    model, meta = build_model('resnet18')
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    # same seed on every process -> identical replicated params
    params = jax.jit(lambda k: model.init(k, x0, TapContext())['params'])(
        jax.random.PRNGKey(0))
    policy = QuantPolicy(qtype='int8', qweight='f32', arch='resnet18')
    eng = QuantEngine(model, policy, meta)

    mesh = global_mesh(model_axis=1)  # data axis spans both processes
    rep = NamedSharding(mesh, P())
    gparams = jax.tree_util.tree_map(
        lambda l: jax.make_array_from_process_local_data(rep, np.asarray(l)),
        params)

    # deterministic global batch; each host materializes only its shard
    rng = np.random.RandomState(0)
    g_images = rng.rand(4, 64, 64, 3).astype(np.float32)
    g_labels = rng.randint(0, 1000, 4).astype(np.int32)
    l_images = np.stack(host_shard(list(g_images)))
    l_labels = np.asarray(host_shard(list(g_labels)))
    images, labels = make_global_batch(mesh, l_images, l_labels)

    step = make_sharded_eval_step(eng, mesh, gparams)
    out = jax.device_get(step(gparams, None, images, labels))
    print(json.dumps({'proc': proc_id,
                      'top1': int(out['top1']), 'top5': int(out['top5']),
                      'loss': float(out['loss'])}), flush=True)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
