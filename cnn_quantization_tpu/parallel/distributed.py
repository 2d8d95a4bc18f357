"""Multi-host runtime: process initialization and host-sharded evaluation.

The reference has no distributed backend at all (SURVEY.md §5); the
TPU-native design runs one process per host (`jax.distributed`), a global
mesh whose ``data`` axis spans hosts (DCN) and ``model`` axis stays within
a slice (ICI), each host feeding only its local shard of the validation set,
and globally-reduced accuracy via the replicated outputs of the sharded
eval step (GSPMD inserts the psums).

Single-host fallbacks everywhere: on one process these helpers degrade to
the local mesh in parallel/mesh.py, which is how the test suite exercises
them on the virtual 8-device CPU backend.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .mesh import make_mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize jax.distributed from args or env; no-op on single host."""
    coordinator = coordinator or os.environ.get('JAX_COORDINATOR')
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get('JAX_NUM_PROCESSES', '1')),
        process_id=process_id if process_id is not None
        else int(os.environ.get('JAX_PROCESS_ID', '0')))
    return True


def global_mesh(model_axis: int = 1):
    """Mesh over all global devices: data axis spans hosts (DCN-major
    ordering from jax.devices()), model axis within host/slice (ICI)."""
    n = len(jax.devices())
    assert n % model_axis == 0
    return make_mesh(jax.devices(), data=n // model_axis, model=model_axis)


def host_shard(samples, *, process_index: int | None = None,
               process_count: int | None = None):
    """This host's contiguous shard of the sample list (each host feeds only
    its part of the globally-sharded batch)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-len(samples) // pc)
    return samples[pi * per:(pi + 1) * per]


def make_global_batch(mesh, local_images, local_labels):
    """Assemble a globally-sharded batch from per-host local arrays using
    jax.make_array_from_process_local_data (multi-host) or device_put
    (single host)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    im_sharding = NamedSharding(mesh, P('data', None, None, None))
    lb_sharding = NamedSharding(mesh, P('data'))
    if jax.process_count() == 1:
        return (jax.device_put(local_images, im_sharding),
                jax.device_put(local_labels, lb_sharding))
    return (jax.make_array_from_process_local_data(im_sharding, local_images),
            jax.make_array_from_process_local_data(lb_sharding, local_labels))
