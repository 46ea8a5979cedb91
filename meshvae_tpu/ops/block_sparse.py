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

    def __post_init__(self):
        if self.n_pad_cols < 0:
            object.__setattr__(self, "n_pad_cols", self.n_pad)

    @property
    def num_blocks(self) -> int:
        return self.blocks.shape[0]


def to_block_sparse(mat: sp.spmatrix, block: int = BLOCK,
                    dtype=jnp.float32) -> BlockSparseOperator:
    """dtype=bfloat16 halves the operator's HBM streaming (the kernel still
    accumulates in f32 via preferred_element_type)."""
    coo = sp.coo_matrix(mat)
    n = coo.shape[0]
    assert coo.shape[0] == coo.shape[1], "square operators only"
    n_pad = -(-n // block) * block

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
    return BlockSparseOperator(
        blocks=jnp.asarray(blocks, dtype=dtype),
        block_row=jnp.asarray(block_row),
        block_col=jnp.asarray(block_col),
        first=jnp.asarray(first),
        n=n,
        n_pad=n_pad,
        col_order=jnp.asarray(col_order),
        block_row_c=jnp.asarray(block_row[col_order]),
        block_col_c=jnp.asarray(block_col[col_order]),
    )


def bsr_to_dense(bsr: BlockSparseOperator) -> np.ndarray:
    out = np.zeros((bsr.n_pad, bsr.n_pad), np.float32)
    blocks = np.asarray(bsr.blocks)
    for i in range(bsr.num_blocks):
        r = int(bsr.block_row[i]) * BLOCK
        c = int(bsr.block_col[i]) * BLOCK
        out[r:r + BLOCK, c:c + BLOCK] += blocks[i]
    return out[:bsr.n, :bsr.n]
