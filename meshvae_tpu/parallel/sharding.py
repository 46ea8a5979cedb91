"""Distribution layer: device mesh + sharding specs.

The reference is strictly single-device (SURVEY.md §2c); here distribution is
first-class and TPU-native: a jax.sharding.Mesh with a data-parallel axis
("dp") over which batches shard, and an optional vertex/"sequence" axis
("sp") reserved for sharding the vertex dimension of very large meshes.
Gradients all-reduce over ICI automatically: the train step is jitted with
sharded batch inputs and replicated params, and the GSPMD partitioner inserts
the psum (no hand-written collectives needed for DP).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(dp: int | None = None, sp: int = 1,
                     devices=None) -> Mesh:
    """Mesh with axes ("dp", "sp"). dp defaults to all devices / sp."""
    devices = devices if devices is not None else jax.devices()
    if dp is None:
        dp = len(devices) // sp
    n = dp * sp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{sp} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put every array in the batch with its batch axis sharded over
    dp. Batch sizes must be divisible by the dp axis size."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
