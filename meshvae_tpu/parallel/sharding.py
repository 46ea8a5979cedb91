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


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None,
                         cpu_collectives: str | None = None) -> None:
    """Initialize multi-host JAX (one process per host of a TPU slice /
    multi-slice deployment). After this, jax.devices() spans all hosts and
    make_device_mesh lays dp/sp over the global device set — intra-slice
    collectives ride ICI, inter-slice DCN, chosen by XLA from the mesh
    layout. On Cloud TPU the arguments are auto-detected from the
    environment; pass them explicitly elsewhere.

    cpu_collectives ("gloo" | "mpi") enables cross-process collectives on
    the CPU backend — how tests/test_multihost.py simulates a multi-host
    deployment without TPU hardware. Must be set before backend init."""
    import jax

    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    # Establish the all-device communicator NOW, while every process is
    # still in lockstep: the backend's sub-communicator handshake has a
    # short deadline (gloo: 30 s), and the first collective otherwise fires
    # only after per-process compiles whose skew can exceed it.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("meshvae_multihost_init")


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


def is_primary() -> bool:
    """True on the process that owns artifact writes: in a multi-host run
    exactly one process may write checkpoints / history / logs / norm
    stats to the shared filesystem (every process computes them; N
    concurrent writers of the same file corrupt it)."""
    return jax.process_index() == 0


def sync_processes(name: str) -> None:
    """Cross-process barrier (no-op single-process): order a primary-only
    artifact write before the other processes read it back."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(value, sharding: NamedSharding):
    """Commit a host array to a sharding, multi-process aware.

    Single-process: plain device_put. Multi-process (after
    initialize_multihost, where the mesh spans devices this process cannot
    address): every process holds the same *global* value — deterministic
    loaders guarantee this — and contributes only its addressable shards via
    make_array_from_process_local_data(global_shape=value.shape)."""
    if not hasattr(value, "ndim"):
        return value
    # already a committed global array with the right sharding (e.g. the
    # previous epoch's output params being re-replicated by maybe_replicate):
    # re-placing it would round-trip device->host->device through the relay
    current = getattr(value, "sharding", None)
    if current is not None and current.is_equivalent_to(sharding, value.ndim):
        return value
    if jax.process_count() > 1:
        value = np.asarray(value)
        return jax.make_array_from_process_local_data(sharding, value,
                                                      value.shape)
    return jax.device_put(value, sharding)


def fetch(value) -> np.ndarray:
    """Pull a device array to a full host copy, multi-process aware: a
    dp-sharded output spans non-addressable devices in multi-host runs, so
    it is all-gathered across processes first (replicated outputs — the
    packed metrics vectors — skip the collective)."""
    sharding = getattr(value, "sharding", None)
    if (jax.process_count() > 1 and sharding is not None
            and not sharding.is_fully_replicated):
        from jax.experimental import multihost_utils
        value = multihost_utils.process_allgather(value, tiled=True)
    return np.asarray(value)


VERTEX_KEYS = ("x", "original")  # batch arrays carrying a vertex dim


def vertex_dim_shardable(arr, mesh: Mesh, axis: int) -> bool:
    """True when `arr`'s vertex axis can shard evenly over "sp"."""
    sp = int(mesh.shape.get("sp", 1))
    return (sp > 1 and getattr(arr, "ndim", 0) > axis
            and arr.shape[axis] % sp == 0)


def shard_batch(batch: dict, mesh: Mesh | None) -> dict:
    """Device-put every array in the batch with its batch axis sharded over
    dp (plain jnp upload when mesh is None). Batch sizes must be divisible
    by the dp axis size. The single batch-sharding helper behind the
    Trainer, CreconTrainer, and InferenceEngine upload paths.

    Vertex-shaped arrays ([B, N, 3]: "x"/"original") additionally shard
    their vertex axis over "sp" when it divides — the sp-sharded step
    consumes them vertex-sharded, and GSPMD cannot convert batch-sharded
    -> vertex-sharded efficiently (it replicates then re-slices, warning
    "involuntary full rematerialization"). Staging in the consumer's
    layout avoids that; with sp=1 the spec degenerates to P("dp")."""
    import jax.numpy as jnp

    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    sharding = batch_sharding(mesh)
    vert = NamedSharding(mesh, P("dp", "sp"))
    return {
        k: put_sharded(
            np.asarray(v),
            vert if k in VERTEX_KEYS and vertex_dim_shardable(v, mesh, 1)
            else sharding)
        for k, v in batch.items()
    }


def replicate_tree(tree, mesh: Mesh | None):
    """Commit a pytree (params / opt state / norm stats) as replicated over
    the mesh; no-op on None mesh or already-placed arrays (put_sharded
    short-circuits matching shardings)."""
    if mesh is None:
        return tree
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda leaf: put_sharded(leaf, sharding),
                                  tree)


def shard_operators(ops, mesh: Mesh):
    """Vertex-dimension ("sequence") sharding of the static graph operands.

    The analog of sequence parallelism for meshes (SURVEY.md §2c SP row): the
    scaling axis is vertex count N. Shard the dense operator's *row* blocks
    over the "sp" axis — the propagation einsum L[n, m] @ x[b, m, f] then
    computes each device's row shard locally and GSPMD inserts the
    all-gather of the (much smaller) activations over ICI, the graph analog
    of ring-attention neighbor exchange. ELL/pool gather operands shard
    their output-row dimension the same way. Batch-dim arrays stay sharded
    over "dp" elsewhere; operators are batch-replicated.

    Pallas BSR operators get the real distributed kernel: under sp > 1 each
    128-block-CSR operator is repartitioned into per-device row shards and
    the propagation runs under shard_map (ops/pallas_shard.py) — blocks
    stream locally, activations all-gather over ICI.
    """
    sp = int(mesh.shape.get("sp", 1))
    ops = _strip_pool_bsr(ops)  # ANY mesh: see _strip_pool_bsr
    if sp > 1:
        ops = _shard_bsr_operators(ops, mesh, sp)
    row_sharded = NamedSharding(mesh, P("sp", None))
    row3 = NamedSharding(mesh, P("sp", None, None))
    rep = replicated_sharding(mesh)

    def place(path, leaf):
        name = path[-1].name if path else ""
        if not hasattr(leaf, "ndim"):
            return leaf
        if name in ("dense", "ell_idx", "ell_w", "idx", "w") and leaf.ndim == 2:
            # rows divisible by sp is not guaranteed -> GSPMD handles uneven
            # shards only for equal blocks; replicate when it doesn't divide
            if leaf.shape[0] % mesh.shape["sp"] == 0:
                return put_sharded(leaf, row_sharded)
            return put_sharded(leaf, rep)
        if name == "blocks" and leaf.ndim == 4:
            # ShardedBlockSparse stacks: leading dim IS the sp shard
            return put_sharded(leaf, NamedSharding(
                mesh, P("sp", None, None, None)))
        if name in ("block_row", "block_col", "first") and leaf.ndim == 2:
            return put_sharded(leaf, row_sharded)
        if name == "blocks" and leaf.ndim == 3:
            if leaf.shape[0] % mesh.shape["sp"] == 0:
                return put_sharded(leaf, row3)
            return put_sharded(leaf, rep)
        return put_sharded(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, ops)


def _strip_pool_bsr(ops):
    """Drop the pool backward's P^T BSR operand under ANY device mesh: that
    kernel is a plain pallas_call with no sharding rule, so inside the
    GSPMD graph it would run un-shard_mapped — under sp the vertex dim is
    sharded (wrong rows), and even dp-only meshes leave it unvalidated
    (no test or hardware run covers that composition). pool_apply then
    falls back to the ELL-transpose gathers, which GSPMD partitions like
    any other HLO."""
    import dataclasses

    def strip(p):
        if getattr(p, "t_bsr", None) is None:
            return p
        return dataclasses.replace(p, t_bsr=None)

    return dataclasses.replace(
        ops,
        down=tuple(strip(p) for p in ops.down),
        up=tuple(strip(p) for p in ops.up),
    )


def _shard_bsr_operators(ops, mesh: Mesh, sp: int):
    """Replace every single-chip BSR operator with its sp-row-sharded form
    (+ the mesh, so cheb_conv can shard_map at trace time)."""
    import dataclasses

    from ..ops.pallas_shard import shard_block_sparse

    def convert(op):
        if getattr(op, "bsr", None) is None:
            return op
        return dataclasses.replace(op, bsr=None,
                                   bsr_sp=shard_block_sparse(op.bsr, sp),
                                   mesh=mesh)

    return dataclasses.replace(
        ops,
        lap=tuple(convert(o) for o in ops.lap),
        lap_final=convert(ops.lap_final),
    )
