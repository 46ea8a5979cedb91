"""Host-side block-CSR (BSR) conversion for the Pallas SpMM kernel.

The mesh Laplacians are ~0.1% dense but naturally banded (the template's
vertex ordering already clusters neighbors; measured 7.6% of 128x128 blocks
occupied at level 0 vs 100% touched by the dense path), so a 128-block
sparse layout cuts operator HBM traffic ~13x. Blocks are sorted by
(block_row, block_col) so the kernel can accumulate an output row-block
across consecutive grid steps.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

BLOCK = 128

# widest row group materialized for the grouped kernel (a mesh Laplacian
# row-block rarely touches more than 4-5 column blocks; a row wider than
# this suggests a non-banded operator where the per-block kernels with
# their accumulate path are the right tool)
MAX_GROUP = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockSparseOperator:
    """BSR operator: dense [nb, BLOCK, BLOCK] blocks + per-block coordinates.

    `first` marks the first block of each block-row (output accumulator
    reset); `n` is the true (unpadded) dimension, `n_pad` the padded one.
    Rectangular operators (a row shard of a square operator: output rows
    local, input columns global) carry n_pad_cols > n_pad.
    """

    blocks: jnp.ndarray      # [nb, BLOCK, BLOCK] float32
    block_row: jnp.ndarray   # [nb] int32
    block_col: jnp.ndarray   # [nb] int32
    first: jnp.ndarray       # [nb] int32 (1 = first block of its row)
    n: int = dataclasses.field(metadata=dict(static=True))
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    n_pad_cols: int = dataclasses.field(default=-1,
                                        metadata=dict(static=True))
    # column-major view for the VMEM-panel kernel (pallas_cheb): the same
    # `blocks` array addressed through a (block_col, block_row)-sorted
    # permutation — consecutive grid steps then revisit the same x slab, so
    # each occupied column block streams once per panel instead of once per
    # occupied block. Tiny [nb] arrays; None for hand-built operators.
    col_order: jnp.ndarray | None = None      # [nb] int32 into blocks
    block_row_c: jnp.ndarray | None = None    # [nb] int32 (col-sorted)
    block_col_c: jnp.ndarray | None = None    # [nb] int32 (col-sorted)
    # row-GROUPED view (the default kernel since round 3): one grid step
    # per output row-block computes all its G block-dots and writes once —
    # no accumulate read-modify-write, no first-flags. g_idx[r, i] indexes
    # into `blocks` (== num_blocks selects an appended zero block for rows
    # with fewer than G real blocks); g_bcol[r, i] is the slab column, with
    # padded slots aliasing the row's last real column so they add no DMA.
    # The padded [nR, G, BLOCK, BLOCK] operand is gathered at trace time
    # (CSE'd per program) — `blocks` stays the only shipped storage.
    g_idx: jnp.ndarray | None = None          # [nR, G] int32 into blocks
    g_bcol: jnp.ndarray | None = None         # [nR * G] int32
    g_width: int = dataclasses.field(default=0,
                                     metadata=dict(static=True))

    def __post_init__(self):
        if self.n_pad_cols < 0:
            object.__setattr__(self, "n_pad_cols", self.n_pad)

    @property
    def num_blocks(self) -> int:
        return self.blocks.shape[0]


def to_block_sparse(mat: sp.spmatrix, block: int = BLOCK,
                    dtype=jnp.float32,
                    allow_rect: bool = False) -> BlockSparseOperator:
    """dtype=bfloat16 halves the operator's HBM streaming (the kernel still
    accumulates in f32 via preferred_element_type).

    allow_rect builds a rectangular operator (output rows local, input
    columns independent — the same shape contract as pallas_shard's row
    shards): n_pad covers the rows, n_pad_cols the columns. Used for the
    pool-backward P^T operators (ops/pool.py)."""
    coo = sp.coo_matrix(mat)
    n = coo.shape[0]
    if not allow_rect:
        assert coo.shape[0] == coo.shape[1], "square operators only"
    n_pad = -(-n // block) * block
    # The multi-row grouped kernel (pallas_cheb.GROUP_ROWS) packs R
    # row-blocks per grid step and needs R to divide the row count; a
    # prime row count (the 20k template: 157) would force R=1. Pad the
    # row count to a multiple of 8 when the overhead is negligible
    # (<=5% extra rows — the padded rows become explicit zero blocks via
    # the missing-row path below).
    nr = n_pad // block
    nr8 = -(-nr // 8) * 8
    if nr8 > nr and (nr8 - nr) * 20 <= nr:
        n_pad = nr8 * block

    keys = {}
    for r, c, v in zip(coo.row, coo.col, coo.data):
        br, bc = int(r // block), int(c // block)
        blk = keys.setdefault((br, bc), np.zeros((block, block), np.float32))
        blk[r - br * block, c - bc * block] += v

    order = sorted(keys)
    if not order:  # degenerate: one explicit zero block keeps shapes static
        order = [(0, 0)]
        keys[(0, 0)] = np.zeros((block, block), np.float32)

    blocks = np.stack([keys[k] for k in order])
    block_row = np.array([k[0] for k in order], np.int32)
    block_col = np.array([k[1] for k in order], np.int32)
    first = np.ones(len(order), np.int32)
    first[1:] = (block_row[1:] != block_row[:-1]).astype(np.int32)

    # every block-row must appear (empty output rows need zeroing): insert an
    # explicit zero block for absent rows
    present = set(block_row.tolist())
    missing = [r for r in range(n_pad // block) if r not in present]
    if missing:
        zb = np.zeros((len(missing), block, block), np.float32)
        blocks = np.concatenate([blocks, zb])
        block_row = np.concatenate([block_row,
                                    np.array(missing, np.int32)])
        block_col = np.concatenate([block_col,
                                    np.zeros(len(missing), np.int32)])
        first = np.concatenate([first, np.ones(len(missing), np.int32)])
        reorder = np.lexsort((block_col, block_row))
        blocks, block_row, block_col = (blocks[reorder], block_row[reorder],
                                        block_col[reorder])
        first = np.ones_like(block_row)
        first[1:] = (block_row[1:] != block_row[:-1]).astype(np.int32)

    col_order = np.lexsort((block_row, block_col)).astype(np.int32)

    # row-grouped view: G = max blocks per row (capped — pathological rows
    # fall back to the per-block kernels); padded slots point at a zero
    # block appended at trace time and alias the row's last real column
    nb = len(block_row)
    n_rows = n_pad // block
    per_row = [[] for _ in range(n_rows)]
    for i in range(nb):
        per_row[int(block_row[i])].append(i)
    g = max((len(v) for v in per_row), default=1)
    g_idx = g_bcol = None
    if 1 <= g <= MAX_GROUP:
        g_idx = np.full((n_rows, g), nb, np.int32)
        g_bcol = np.zeros((n_rows, g), np.int32)
        for r, idxs in enumerate(per_row):
            for i, bi in enumerate(idxs):
                g_idx[r, i] = bi
                g_bcol[r, i] = block_col[bi]
            if idxs:
                g_bcol[r, len(idxs):] = block_col[idxs[-1]]

    return BlockSparseOperator(
        blocks=jnp.asarray(blocks, dtype=dtype),
        block_row=jnp.asarray(block_row),
        block_col=jnp.asarray(block_col),
        first=jnp.asarray(first),
        n=n,
        n_pad=n_pad,
        n_pad_cols=(-(-coo.shape[1] // block) * block if allow_rect else -1),
        col_order=jnp.asarray(col_order),
        block_row_c=jnp.asarray(block_row[col_order]),
        block_col_c=jnp.asarray(block_col[col_order]),
        g_idx=None if g_idx is None else jnp.asarray(g_idx),
        g_bcol=None if g_bcol is None else jnp.asarray(g_bcol.reshape(-1)),
        g_width=0 if g_idx is None else g,
    )


def bsr_to_dense(bsr: BlockSparseOperator) -> np.ndarray:
    out = np.zeros((bsr.n_pad, bsr.n_pad), np.float32)
    blocks = np.asarray(bsr.blocks)
    for i in range(bsr.num_blocks):
        r = int(bsr.block_row[i]) * BLOCK
        c = int(bsr.block_col[i]) * BLOCK
        out[r:r + BLOCK, c:c + BLOCK] += blocks[i]
    return out[:bsr.n, :bsr.n]
