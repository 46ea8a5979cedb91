"""Static graph operands for the TPU compute path.

The graph topology is fixed at trace time, so instead of runtime scatter
message-passing (the reference's torch-scatter inner loop,
/root/reference/nn/conv.py:346-364) we precompute, on host, every operand the
device kernels need:

  * the scaled-Laplacian operator L_hat = -D^{-1/2} A D^{-1/2} (exactly the
    reference's `ChebConv_batch.norm` weights: symmetric-normalized negated
    adjacency, self-loops removed — /root/reference/nn/conv.py:541-555) in
    two layouts: dense [N, N] for MXU matmuls, and padded neighbor-list (ELL)
    for gather-based SpMM / Pallas kernels;
  * pool/unpool sampling matrices as gather indices + weights (rows of D are
    one-hot selections, rows of U have <= 3 barycentric entries).

Everything is a pytree of jnp arrays: safe to close over or pass through jit.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from .block_sparse import BlockSparseOperator, to_block_sparse

# Pool-backward layout cutoff: P^T fan-ins at or below this run as
# unrolled ELL gathers; above it (hub coarse vertices) the backward runs
# P^T through the block-sparse SpMM kernel instead — T unrolled
# full-size gathers lose to the kernel well before T=61 (the 80k
# template's up-pool, measured 2.5x off the whole train step).
TGRAD_ELL_MAX = int(os.environ.get("MESHVAE_POOL_TGRAD_ELL_MAX", "16"))


def normalized_neg_adjacency(adjacency: sp.spmatrix) -> sp.csr_matrix:
    """-D^{-1/2} A D^{-1/2} with unit edge weights and self-loops removed.

    Degree counts edges (ones), matching the reference's norm() which ignores
    the adjacency's stored values (/root/reference/nn/conv.py:544-555).
    """
    coo = sp.coo_matrix(adjacency)
    mask = coo.row != coo.col
    row, col = coo.row[mask], coo.col[mask]
    n = adjacency.shape[0]
    ones = np.ones(row.shape[0], dtype=np.float64)
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, row, ones)
    with np.errstate(divide="ignore"):
        dis = np.power(deg, -0.5)
    dis[~np.isfinite(dis)] = 0.0
    vals = -dis[row] * dis[col]
    out = sp.csr_matrix((vals, (row, col)), shape=(n, n))
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphOperator:
    """The Chebyshev propagation operator at one hierarchy level, in up to
    three layouts: dense [N, N] (MXU matmul path), padded neighbor-list
    (gather path), and 128-block CSR (Pallas kernel path). Layouts the
    configured cheb_method does not read are None — the dense level-0
    operator alone is O(N^2) (1.6 GB f32 at 20k vertices), which must not be
    built, shipped through the ~50 MB/s relay, or parked in HBM when the
    pallas/ell paths never touch it."""

    dense: jnp.ndarray | None       # [N, N] float32 dense L_hat
    ell_idx: jnp.ndarray | None     # [N, max_deg] int32 neighbors (self-pad)
    ell_w: jnp.ndarray | None       # [N, max_deg] float32 (0 on padding)
    bsr: "BlockSparseOperator | None"
    n: int = dataclasses.field(metadata=dict(static=True))
    # rows >= active_n have no nonzero entries (row or column): the dense
    # path can run the recurrence on the [active_n, active_n] corner only.
    # Equals n for ordinary operators; the embedded final-conv quirk
    # operator has active_n = coarse vertex count.
    active_n: int = dataclasses.field(default=-1, metadata=dict(static=True))
    # vertex-sharded kernel operands (built by shard_operators under an
    # sp > 1 mesh, replacing bsr; see ops/pallas_shard.py). `mesh` is the
    # jax.sharding.Mesh the shards live on — static metadata so cheb_conv
    # can shard_map over it at trace time.
    bsr_sp: "object | None" = None
    mesh: "object | None" = dataclasses.field(default=None,
                                              metadata=dict(static=True))

    def __post_init__(self):
        if self.active_n < 0:
            object.__setattr__(self, "active_n", self.n)

    @property
    def max_degree(self) -> int:
        return self.ell_idx.shape[1]


def _to_ell(mat: sp.csr_matrix, pad_self: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """CSR -> padded neighbor-list (ELL). Padding entries carry weight 0 and a
    safe in-bounds index (the row id for square operators, 0 otherwise)."""
    n, n_cols = mat.shape
    mat = mat.tocsr()
    counts = np.diff(mat.indptr)
    max_deg = max(int(counts.max()) if n else 0, 1)
    idx = np.zeros((n, max_deg), dtype=np.int32)
    w = np.zeros((n, max_deg), dtype=np.float32)
    for i in range(n):
        lo, hi = mat.indptr[i], mat.indptr[i + 1]
        k = hi - lo
        idx[i, :k] = mat.indices[lo:hi]
        w[i, :k] = mat.data[lo:hi]
        if pad_self and i < n_cols:
            idx[i, k:] = i
    return idx, w


# layouts each cheb_method actually reads (cheb.py / pallas_cheb.py)
CHEB_METHOD_LAYOUTS = {
    "dense": ("dense",),
    "ell": ("ell",),
    "pallas": ("bsr",),
}
ALL_LAYOUTS = ("dense", "ell", "bsr")

# Hybrid dispatch cutoff for cheb_method="pallas": below this vertex count a
# level materializes a dense operator instead of BSR — the whole operator is
# at most ~MIN_N^2 floats (tiny), XLA fuses the propagation into the
# surrounding recurrence in one kernel, and the Pallas call's fixed overhead
# (launch + padding every level to 128 rows) dominates any streaming savings.
# One 5k/bs16 train step makes ~90 propagation dispatches; most are on the
# coarse levels (1250/313/79/20 vertices) where this folds them into XLA.
PALLAS_MIN_N = int(__import__("os").environ.get("MESHVAE_PALLAS_MIN_N",
                                                "1024"))


def layouts_for_method(cheb_method: str | None,
                       n: int | None = None) -> tuple[str, ...]:
    """None -> every layout (tests / method-switching callers). For
    "pallas", n (the operator's active vertex count) selects the hybrid
    layout: BSR at or above PALLAS_MIN_N, dense below."""
    if cheb_method is None:
        return ALL_LAYOUTS
    try:
        layouts = CHEB_METHOD_LAYOUTS[cheb_method]
    except KeyError:
        raise ValueError(f"unknown cheb method: {cheb_method}") from None
    if cheb_method == "pallas" and n is not None and n < PALLAS_MIN_N:
        return ("dense",)
    return layouts


def _operator_from_laplacian(lap: sp.csr_matrix, layouts, dtype,
                             n: int, active_n: int = -1) -> GraphOperator:
    if "ell" in layouts:
        idx, w = _to_ell(lap)
        ell_idx, ell_w = jnp.asarray(idx), jnp.asarray(w, dtype=dtype)
    else:
        ell_idx = ell_w = None
    return GraphOperator(
        dense=jnp.asarray(lap.toarray(), dtype=dtype)
        if "dense" in layouts else None,
        ell_idx=ell_idx,
        ell_w=ell_w,
        bsr=to_block_sparse(lap, dtype=dtype) if "bsr" in layouts else None,
        n=n,
        active_n=active_n,
    )


def cheb_operator(adjacency: sp.spmatrix, dtype=jnp.float32,
                  layouts=ALL_LAYOUTS) -> GraphOperator:
    lap = normalized_neg_adjacency(adjacency)
    return _operator_from_laplacian(lap, layouts, dtype, n=lap.shape[0])


def embed_operator(op_coarse: sp.spmatrix, n_full: int, dtype=jnp.float32,
                   layouts=ALL_LAYOUTS) -> GraphOperator:
    """A coarse-level operator acting on the top-left corner of an
    [n_full, n_full] index space.

    Reproduces the reference's final-decoder-conv quirk: the last ChebConv is
    fed the *coarsest* level's adjacency while operating on full-resolution
    features (/root/reference/models/cheb_VAE.py:288) — only vertex ids below
    the coarse vertex count receive neighbor terms; all others see the
    identity (W0) path only.

    Storage is the CORNER only (layout arrays sized [active_n, ...]) with
    n = n_full metadata: rows/columns >= active_n are empty, so
    materializing them would be pure waste — the old full-size dense
    embedding was [N, N] (1.6 GB at 20k vertices) for an operator with a
    [79, 79] support. cheb_conv dispatches the recurrence on the corner and
    a single closed-form matmul on the rest (see its active_n fast path).
    """
    lap = normalized_neg_adjacency(op_coarse)
    return _operator_from_laplacian(lap, layouts, dtype, n=n_full,
                                    active_n=lap.shape[0])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoolOperator:
    """A precomputed sampling matrix P applied as out = P @ x per batch item.

    Stored as padded per-row gathers: out[m] = sum_k w[m, k] * x[idx[m, k]].
    For downsampling matrices rows are one-hot (pure gather); for barycentric
    upsampling rows have <= 3 entries.
    """

    idx: jnp.ndarray | None     # [M, R] int32
    w: jnp.ndarray | None       # [M, R] float32
    dense: jnp.ndarray | None   # [M, N] float32 (dense pool path / tests)
    n_in: int = dataclasses.field(metadata=dict(static=True))
    n_out: int = dataclasses.field(metadata=dict(static=True))
    # transpose gather (ELL of P^T): the pool backward dx = P^T @ g as
    # precomputed weighted gathers — autodiff's VJP of the forward gather
    # is a scatter-add, which XLA lowers poorly on TPU (sort-based); with
    # these the backward is gathers both ways (pool.py pool_apply).
    t_idx: jnp.ndarray | None = None   # [N, T] int32 into output rows
    t_w: jnp.ndarray | None = None     # [N, T] float32
    # High-fan-in transposes (hub coarse vertices: the 80k template's
    # up-pools reach T=61) would unroll T full-size gathers — worse than
    # the scatter they replace. Above TGRAD_ELL_MAX the backward instead
    # runs P^T through the block-sparse SpMM kernel (rectangular
    # operator, pallas_cheb._bsr_matmul_impl), like every other sparse
    # product in the model.
    t_bsr: object | None = None        # BlockSparseOperator of P^T

    @property
    def is_selection(self) -> bool:
        return self.idx.shape[1] == 1


def pool_operator(mat: sp.spmatrix, dtype=jnp.float32,
                  pool_method: str | None = None) -> PoolOperator:
    """pool_method None builds both layouts; "gather"/"dense" build one."""
    if pool_method not in (None, "gather", "dense"):
        raise ValueError(f"unknown pool method: {pool_method}")
    csr = sp.csr_matrix(mat)
    idx = w = t_idx = t_w = t_bsr = None
    if pool_method in (None, "gather"):
        idx_np, w_np = _to_ell(csr, pad_self=False)
        idx, w = jnp.asarray(idx_np), jnp.asarray(w_np, dtype=dtype)
        csr_t = sp.csr_matrix(csr.T)
        t_maxdeg = int(np.diff(csr_t.indptr).max()) if csr_t.shape[0] else 0
        # ELL transpose always (the fallback when the kernel path is
        # unavailable: CPU without interpret mode, vertex-sharded
        # operators); the BSR transpose additionally above the fan-in
        # cutoff, where unrolled gathers stop paying
        t_idx_np, t_w_np = _to_ell(csr_t, pad_self=False)
        t_idx = jnp.asarray(t_idx_np)
        t_w = jnp.asarray(t_w_np, dtype=dtype)
        if t_maxdeg > TGRAD_ELL_MAX:
            t_bsr = to_block_sparse(csr_t, dtype=dtype, allow_rect=True)
    return PoolOperator(
        idx=idx,
        w=w,
        dense=jnp.asarray(csr.toarray(), dtype=dtype)
        if pool_method in (None, "dense") else None,
        n_in=csr.shape[1],
        n_out=csr.shape[0],
        t_idx=t_idx,
        t_w=t_w,
        t_bsr=t_bsr,
    )
