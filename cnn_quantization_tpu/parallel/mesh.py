"""Device mesh construction and sharding specs.

The reference's only parallelism is single-host ``torch.nn.DataParallel``
(reference: inference/inference_sim.py:159, 196-200).  The TPU-native design
(SURVEY.md §5) is SPMD over a 2-D mesh:

  * ``data`` axis — evaluation batch sharded across it (DP; across hosts
    this axis rides DCN),
  * ``model`` axis — per-output-channel-quantized weights and their
    quantization parameters sharded over output channels (TP over ICI);
    XLA/GSPMD inserts the all-gathers where a conv needs replicated inputs
    and keeps the per-channel quantization epilogue fully local, since every
    per-channel scale/zero-point/bit-width lives with its channel shard.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data: int | None = None, model: int | None = None) -> Mesh:
    """Build a (data, model) mesh.  Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and model is None:
        data, model = n, 1
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model == n, f'mesh {data}x{model} != {n} devices'
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ('data', 'model'))


def param_sharding(mesh: Mesh, params) -> Any:
    """NamedSharding tree: kernels/biases sharded over output channels on the
    ``model`` axis when divisible; everything else replicated."""
    model_size = mesh.shape['model']

    def spec(path, leaf):
        if model_size > 1 and hasattr(leaf, 'ndim') and leaf.ndim >= 1 \
                and leaf.shape[-1] % model_size == 0 and leaf.shape[-1] >= model_size:
            return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ['model'])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    return NamedSharding(mesh, P(*(['data'] + [None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_sharding(mesh, params))


def shard_batch(mesh: Mesh, images, labels):
    return (jax.device_put(images, batch_sharding(mesh, images.ndim)),
            jax.device_put(labels, batch_sharding(mesh, 1)))
