"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.8); the TPU-native plan is
data-parallel SPMD: a 1-D ``data`` mesh axis, batches sharded over it, params
replicated, gradients all-reduced by XLA's SPMD partitioner (psum over ICI)
when the jitted loss averages over the sharded batch axis.

The mesh is factored so a ``model`` axis can be added later without touching
the runner (SURVEY.md §2.8).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """1-D data mesh (optionally 2-D with a model axis)."""
    devices = jax.devices()
    n = num_devices or len(devices)
    devices = np.asarray(devices[:n])
    if model_parallel > 1:
        if n % model_parallel:
            raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}.")
        grid = devices.reshape(n // model_parallel, model_parallel)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(devices.reshape(n), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh | None, batch: dict) -> dict:
    """Place a host batch on device, batch axis sharded over ``data``.

    Scalars / per-item python values are replicated.
    """
    if mesh is None:
        return jax.tree.map(jax.numpy.asarray, batch)
    sharding = batch_sharding(mesh)
    repl = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, repl)

    return jax.tree.map(put, batch)


def replicate_tree(mesh: Mesh | None, tree):
    if mesh is None:
        return tree
    return jax.device_put(tree, replicated(mesh))
