"""Tensor-parallel parameter sharding over a 2-axis (data, model) mesh.

At 4.4M parameters this model needs no tensor parallelism for memory — the
default and fastest configuration replicates params and shards the batch
(parallel/sharding.py). This module exists for the scaled-up regime (wider
channel multipliers / larger UNets) and to exercise multi-axis sharding in
the multichip dry run: the widest conv kernels are sharded on their
output-channel dimension across the ``model`` axis and XLA inserts the
matching collectives via sharding propagation; everything else stays
replicated.

Usage:
    mesh = make_mesh_2d(n_data, n_model)
    params = shard_params_tensor_parallel(params, mesh, min_features=128)
    batch = shard_batch(batch, mesh)   # leading dim on 'data'
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int, devices: Sequence[jax.Device] | None = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def _spec_for(path_leaf: str, shape, min_features: int, n_model: int):
    """Shard conv kernels (HWIO) and dense kernels (IO) on the output-feature
    axis when it is wide enough and divisible; replicate otherwise."""
    if path_leaf == "kernel" and len(shape) in (2, 4):
        out_f = shape[-1]
        if out_f >= min_features and out_f % n_model == 0:
            return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params_tensor_parallel(params, mesh: Mesh, min_features: int = 128):
    """Place params on the mesh with wide kernels output-channel-sharded."""
    n_model = mesh.shape["model"]

    def place(path, x):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        spec = _spec_for(leaf, x.shape, min_features, n_model)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
