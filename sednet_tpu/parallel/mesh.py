"""Device-mesh utilities: batch data parallelism over ICI.

The reference's only parallelism is single-process torch DataParallel
(reference: train_sed_net.py:149-150). The TPU-native equivalent is a 1-D
jax.sharding.Mesh with the batch axis sharded; jit partitions the train
step and inserts the gradient psum over ICI automatically. Shape-level
parallelism at inference reuses the same mesh: the per-shape pipeline is
vmapped and the shape axis sharded (reference tests shapes one by one in a
Python loop, generate_predictions_aug.py:178-213).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a dict/pytree of (B, ...) numpy arrays with B sharded over the
    mesh. B must be divisible by mesh size."""
    s = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
