"""Whole-recurrence Pallas kernels with VMEM-resident operator and state.

RETIRED from the default path (measured, round 3): see "Measured result"
below. Kept importable and interpret-tested as an executable design
record, exactly like ops/pallas_fused.py. MESHVAE_RESIDENT=1 re-enables
for A/B runs.

The hypothesis: the per-order kernels in pallas_cheb.py dispatch one
pallas_call per Chebyshev order — each call re-streams the BSR operator
blocks from HBM, re-fetches the activation slab per occupied block
(row-major) and round-trips the recurrence state T_{k-1}/T_{k-2} through
HBM between orders, ~550 MB of HBM traffic per conv forward at the 5k
bs128 bf16 flagship. If the SpMM were bandwidth-bound, running the
ENTIRE recurrence in ONE pallas_call (~130 MB) should win ~4x.

Measured result (v5e, level-0 conv, bs128 bf16, same session,
benchmarks/resident_ab.py + pass_probe.py): forward 0.919 ms vs the
per-order 0.929 ms (a wash), grad 0.982 vs 0.934 (-5%); a chained
standalone apply is ~4x SLOWER through this kernel (0.48 vs 0.11 ms).
The SpMM is NOT bandwidth-bound: halving the operator blocks cuts the
per-order apply by exactly half its marginal cost, and an empty-scan
probe shows the cost model is

    apply_ms ~ grid_steps x ~0.4 us  (per-grid-step overhead),

i.e. Mosaic per-step control/DMA-issue dominates at these shapes. The
resident kernel's VMEM budget (2 state slots + L resident) caps its
column panel at 128 where the per-order kernel runs 1024-wide panels —
8x more grid steps per apply, which is precisely the measured 4x-slower
marginal. The bandwidth it saves was never the binding resource.
(A second finding from the same probes: single-call microbenches on this
backend carry a ~25 ms device->host pull tax — at scan length 30 that
reads as a fake ~0.8 ms/iter floor; S >= 300 for kernel timing.)

The design, for the record — ONE pallas_call:

  * the operator blocks are DMA'd HBM->VMEM once at the first grid step
    and stay resident for every order and every column panel (the 5k
    level's bf16 blocks are ~4 MB — far below the ~16 MB VMEM);
  * the recurrence state lives in two rotating VMEM scratch slots
    (T_k is accumulated in-place over the block loop; T_{k-2}'s slot is
    reused as the accumulator after seeding, so two slots suffice);
  * the activation panel is fetched once per panel (resident input);
  * each order's T_k is written to HBM exactly once, order-major
    ([K-1, N_pad, C]) so the stacked channel mix consumes it directly —
    no jnp.concatenate copy of the basis.

Per conv forward that is: read x once + read L once + write the basis
once (~130 MB at the 5k/bs128/bf16 flagship — ~4x less than per-order).
`bsr_adjoint` is the same structure for the backward's reverse
recurrence b_{j-1} = 2 L b_j + c_{j-1} - b_{j+1} (L symmetric), consuming
the stacked per-order mix cotangents and emitting dx in one call.

Eligibility (see `resident_plan`): the operator must be square
(pallas_shard's row-shards re-gather between orders and cannot keep the
state local), the precision must not be HIGH (the bf16x3 pre-split
doubles every buffer past VMEM at level 0), and operator + 6 panels must
fit the VMEM budget. In practice that is the bf16 flagship at every 5k
level and the f32 coarse levels; everything else falls back to the
per-order kernels. MESHVAE_RESIDENT=0 disables for A/B benches.

Caveat (documented, not reachable for real meshes): rows living in a
128-block-column with NO occupied operator blocks are never stashed into
the adjoint's u_{K-1} buffer (they are treated as c_{K-1}=0 there). Such
rows have an entirely empty operator column = degree-0 vertices, which
exist only as padding rows whose dx is discarded by the caller.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_sparse import BLOCK, BlockSparseOperator

RESIDENT = bool(int(os.environ.get("MESHVAE_RESIDENT", "0")))

# VMEM allowance for operator blocks + the six resident/double-buffered
# [n_pad, panel] activation buffers (2 state slots + 2x input + 2x output).
# Kept below the ~16 MB VMEM with headroom for Mosaic's own scratch.
RESIDENT_BUDGET = int(os.environ.get("MESHVAE_RESIDENT_BUDGET",
                                     str(13 * 1024 * 1024)))

_COL_PANEL = 128


def _interpret() -> bool:
    # single source of truth with the per-order kernels (tests toggle it)
    from . import pallas_cheb
    return pallas_cheb.INTERPRET


def _max_panel() -> int:
    from . import pallas_cheb
    return pallas_cheb.MAX_PANEL


def resident_plan(bsr: BlockSparseOperator, c: int, state_dtype,
                  precision) -> int | None:
    """Widest column panel for which the resident kernels fit VMEM, or
    None if the whole-recurrence path is ineligible for this operator."""
    if not RESIDENT:
        return None
    if precision == jax.lax.Precision.HIGH:
        return None  # bf16x3 pre-split operands double every buffer
    if bsr.n_pad_cols != bsr.n_pad:
        return None  # row shard: the state is not local to this device
    l_bytes = bsr.num_blocks * BLOCK * BLOCK * bsr.blocks.dtype.itemsize
    sbytes = jnp.dtype(state_dtype).itemsize
    panel = None
    cand = _COL_PANEL
    while cand <= min(c, _max_panel()) and c % cand == 0:
        if l_bytes + 6 * bsr.n_pad * cand * sbytes > RESIDENT_BUDGET:
            break
        panel = cand
        cand *= 2
    return panel


def _acc_rows(t_ref, r, contrib, state_dtype):
    cur = t_ref[pl.ds(r, BLOCK), :].astype(jnp.float32)
    t_ref[pl.ds(r, BLOCK), :] = (cur + contrib).astype(state_dtype)


def _make_basis_kernel(nb, korder, n_pad, panel, state_dtype, op_dtype,
                       precision):
    """grid = (panels, korder-1, nb); computes T_{ki+1} at order step ki.

    Slot arithmetic: T_m lives in scratch slot (m-1) % 2 (T_0 is the
    resident x input). At step ki the accumulator slot cur = (ki+1) % 2
    already holds T_{ki-1} (needed only for the init seed -T_{ki-1}),
    so seeding negates it in place and two slots suffice."""

    def kernel(brow_ref, bcol_ref, l_hbm, x_ref, o_ref, t0, t1, l_scr, sem):
        j = pl.program_id(0)
        ki = pl.program_id(1)
        b = pl.program_id(2)

        @pl.when((j == 0) & (ki == 0) & (b == 0))
        def _():
            dma = pltpu.make_async_copy(l_hbm, l_scr, sem)
            dma.start()
            dma.wait()

        cur = (ki + 1) % 2

        @pl.when(b == 0)
        def _():
            for slot, t in ((0, t0), (1, t1)):
                @pl.when(cur == slot)
                def _(t=t):
                    @pl.when(ki == 0)
                    def _():
                        t[:] = jnp.zeros((n_pad, panel), state_dtype)

                    @pl.when(ki == 1)
                    def _():
                        t[:] = -x_ref[:]

                    @pl.when(ki >= 2)
                    def _():
                        t[:] = -t[:]

        r = pl.multiple_of(brow_ref[b] * BLOCK, BLOCK)
        ci = pl.multiple_of(bcol_ref[b] * BLOCK, BLOCK)
        l_blk = l_scr[pl.ds(b * BLOCK, BLOCK), :]
        # operand T_{ki} was written at step ki-1 into slot ki % 2
        operand = jax.lax.cond(
            ki == 0,
            lambda: x_ref[pl.ds(ci, BLOCK), :].astype(op_dtype),
            lambda: jax.lax.cond(
                ki % 2 == 0,
                lambda: t0[pl.ds(ci, BLOCK), :].astype(op_dtype),
                lambda: t1[pl.ds(ci, BLOCK), :].astype(op_dtype)))
        alpha = jnp.where(ki == 0, 1.0, 2.0).astype(jnp.float32)
        contrib = alpha * jnp.dot(l_blk, operand,
                                  preferred_element_type=jnp.float32,
                                  precision=precision)
        for slot, t in ((0, t0), (1, t1)):
            @pl.when(cur == slot)
            def _(t=t):
                _acc_rows(t, r, contrib, state_dtype)

        @pl.when(b == nb - 1)
        def _():
            for slot, t in ((0, t0), (1, t1)):
                @pl.when(cur == slot)
                def _(t=t):
                    o_ref[0] = t[:]

    return kernel


def bsr_basis(bsr: BlockSparseOperator, x2d: jnp.ndarray, korder: int,
              precision, panel: int) -> jnp.ndarray:
    """All Chebyshev basis orders T_1..T_{korder-1} of L@ in ONE kernel:
    [korder-1, n_pad, c], state dtype = x2d.dtype. Not differentiable —
    the caller (_basis_mix_resident) owns the custom VJP."""
    n_pad, c = x2d.shape
    assert korder >= 2
    assert n_pad == bsr.n_pad and c % panel == 0
    nb = bsr.num_blocks
    state_dtype = x2d.dtype
    op_dtype = bsr.blocks.dtype
    l2d = bsr.blocks.reshape(nb * BLOCK, BLOCK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c // panel, korder - 1, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # L blocks: manual DMA
            pl.BlockSpec((n_pad, panel), lambda j, ki, b, br, bc: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, panel),
                               lambda j, ki, b, br, bc: (ki, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_pad, panel), state_dtype),
            pltpu.VMEM((n_pad, panel), state_dtype),
            pltpu.VMEM((nb * BLOCK, BLOCK), op_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = _make_basis_kernel(nb, korder, n_pad, panel, state_dtype,
                                op_dtype, precision)
    op_b = bsr.blocks.dtype.itemsize
    st_b = jnp.dtype(state_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((korder - 1, n_pad, c), state_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * BLOCK * BLOCK * c * (korder - 1),
            bytes_accessed=(nb * BLOCK * BLOCK * op_b
                            + n_pad * c * st_b * korder),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(bsr.block_row, bsr.block_col, l2d, x2d)


def _make_adjoint_kernel(nb, korder, n_pad, panel, state_dtype, op_dtype,
                         precision):
    """grid = (panels, korder-1, nb); step s computes
    u_{K-2-s} = alpha L u_{K-1-s} + c_{K-2-s} - u_{K-s}, alpha = 2 except
    the final step (s = K-2, the dx) where alpha = 1. u_{K-1} = c_{K-1}
    is stashed into the idle slot during step 0 from the streamed ck1
    blocks (block-column granularity covers every row whose operator
    column is occupied; see module docstring for the padding-row caveat).
    Result slot: cur = s % 2 — the slot freed two steps ago holds u_{K-s}
    exactly as in the forward kernel."""

    def kernel(brow_ref, bcol_ref, l_hbm, cs_ref, ck1_ref, o_ref,
               t0, t1, l_scr, sem):
        j = pl.program_id(0)
        s = pl.program_id(1)
        b = pl.program_id(2)

        @pl.when((j == 0) & (s == 0) & (b == 0))
        def _():
            dma = pltpu.make_async_copy(l_hbm, l_scr, sem)
            dma.start()
            dma.wait()

        cur = s % 2

        @pl.when(b == 0)
        def _():
            # seed = c_{K-2-s} - u_{K-s}; u_{K-s} lives in this very slot
            # (for s == 1 it is the stashed u_{K-1} = c_{K-1}; for s >= 2
            # the result of step s-2) — except at s == 0 where there is
            # no subtraction yet
            for slot, t in ((0, t0), (1, t1)):
                @pl.when(cur == slot)
                def _(t=t):
                    @pl.when(s == 0)
                    def _():
                        t[:] = cs_ref[0]

                    @pl.when(s >= 1)
                    def _():
                        t[:] = cs_ref[0] - t[:]

            # step 0 additionally zeroes the idle slot, which step 0's
            # block loop fills with u_{K-1} = c_{K-1} rows (stash)
            @pl.when(s == 0)
            def _():
                for slot, t in ((0, t0), (1, t1)):
                    @pl.when(cur != slot)
                    def _(t=t):
                        t[:] = jnp.zeros((n_pad, panel), state_dtype)

        r = pl.multiple_of(brow_ref[b] * BLOCK, BLOCK)
        ci = pl.multiple_of(bcol_ref[b] * BLOCK, BLOCK)

        @pl.when(s == 0)
        def _():
            # stash c_{K-1}[rows ci] into the idle slot (idempotent for
            # repeated block-columns); it is step 0's operand AND step 1's
            # u_{K-s} subtraction
            for slot, t in ((0, t0), (1, t1)):
                @pl.when(cur != slot)
                def _(t=t):
                    t[pl.ds(ci, BLOCK), :] = ck1_ref[0]

        l_blk = l_scr[pl.ds(b * BLOCK, BLOCK), :]
        operand = jax.lax.cond(
            s == 0,
            lambda: ck1_ref[0].astype(op_dtype),
            lambda: jax.lax.cond(
                s % 2 == 1,
                lambda: t0[pl.ds(ci, BLOCK), :].astype(op_dtype),
                lambda: t1[pl.ds(ci, BLOCK), :].astype(op_dtype)))
        alpha = jnp.where(s == korder - 2, 1.0, 2.0).astype(jnp.float32)
        contrib = alpha * jnp.dot(l_blk, operand,
                                  preferred_element_type=jnp.float32,
                                  precision=precision)
        for slot, t in ((0, t0), (1, t1)):
            @pl.when(cur == slot)
            def _(t=t):
                _acc_rows(t, r, contrib, state_dtype)

        @pl.when((s == korder - 2) & (b == nb - 1))
        def _():
            for slot, t in ((0, t0), (1, t1)):
                @pl.when(cur == slot)
                def _(t=t):
                    o_ref[:] = t[:]

    return kernel


def bsr_adjoint(bsr: BlockSparseOperator, cs: jnp.ndarray,
                precision, panel: int) -> jnp.ndarray:
    """dx [n_pad, c] of the fused basis+mix, given the stacked per-order
    mix cotangents cs [korder, n_pad, c] (c_j = gm @ W_j^T): the reverse
    Chebyshev recurrence in ONE kernel call (korder >= 2)."""
    korder, n_pad, c = cs.shape
    assert korder >= 2
    assert n_pad == bsr.n_pad and c % panel == 0
    nb = bsr.num_blocks
    state_dtype = cs.dtype
    op_dtype = bsr.blocks.dtype
    l2d = bsr.blocks.reshape(nb * BLOCK, BLOCK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(c // panel, korder - 1, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # L blocks: manual DMA
            # the seed plane c_{K-2-s}: resident per (order, panel)
            pl.BlockSpec((1, n_pad, panel),
                         lambda j, s, b, br, bc: (korder - 2 - s, 0, j),
                         memory_space=pltpu.VMEM),
            # c_{K-1}, streamed per block during step 0 only (the index
            # clamps to block 0 afterwards so it stops re-fetching)
            pl.BlockSpec((1, BLOCK, panel),
                         lambda j, s, b, br, bc:
                         (korder - 1, jnp.where(s == 0, bc[b], 0), j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, panel),
                               lambda j, s, b, br, bc: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_pad, panel), state_dtype),
            pltpu.VMEM((n_pad, panel), state_dtype),
            pltpu.VMEM((nb * BLOCK, BLOCK), op_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = _make_adjoint_kernel(nb, korder, n_pad, panel, state_dtype,
                                  op_dtype, precision)
    op_b = bsr.blocks.dtype.itemsize
    st_b = jnp.dtype(state_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), state_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * BLOCK * BLOCK * c * (korder - 1),
            bytes_accessed=(nb * BLOCK * BLOCK * op_b
                            + n_pad * c * st_b * (korder + 1)),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(bsr.block_row, bsr.block_col, l2d, cs, cs)
