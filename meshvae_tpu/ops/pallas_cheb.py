"""Fused Pallas TPU kernel for the Chebyshev propagation (block-sparse SpMM).

The hot op (SURVEY.md §3: ChebConv_batch's K-order recurrence) is dominated
by L_hat @ X. The dense-MXU path streams the full N^2 operator from HBM
(100 MB at level 0) although only ~0.1% of entries are nonzero; this kernel
streams only the occupied 128x128 blocks (~8 MB, measured 7.6% occupancy on
template5k) with scalar-prefetched block coordinates driving the BlockSpec
index maps, accumulating each output row-block in VMEM across consecutive
grid steps. The normalized operator is symmetric, so the custom VJP is the
same kernel applied to the cotangent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_sparse import BLOCK, BlockSparseOperator

_COL_PANEL = 128

# VMEM allowance for the column-major kernel's resident output panel
# ([n_pad, panel] f32); levels too tall for any panel fall back to the
# row-major kernel. Env-overridable for tuning. NOTE: Mosaic
# double-buffers the output panel even though its index map is constant
# per panel, so the true VMEM footprint is 2x the panel bytes — budgets
# past ~8 MB compile-crash with "Ran out of memory in memory space vmem
# ... 20.50M and limit 16.00M" at a 1024-wide bf16 panel on the 5k level
# (measured; this is why the default stays 6 MB).
COLMAJOR_VMEM_BUDGET = int(__import__("os").environ.get(
    "MESHVAE_COLMAJOR_BUDGET", str(6 * 1024 * 1024)))

# Tuning escape hatch: take the col-major kernel whenever its panel fits
# the budget, even if that panel is NARROWER than row-major's. The
# default heuristic rejects that case — measured -6% on f32 bs128, and
# re-asked for bf16-state at an 8 MB budget (panel 512): 1.005 ms vs
# row-major's 0.99 ms on the level-0 SpMM — so the rejection stands in
# both byte regimes.
FORCE_COLMAJOR = bool(int(__import__("os").environ.get(
    "MESHVAE_COLMAJOR_FORCE", "0")))

# Widest column panel the kernels will use. The L blocks are re-streamed
# once per panel, so a wider panel cuts operator traffic proportionally;
# the cost is a bigger (double-buffered) x/out tile in VMEM. 1024 lanes
# is the long-standing default; MESHVAE_MAX_PANEL=2048 fuses the
# flagship's two bs128 panels into one (A/B knob).
MAX_PANEL = int(__import__("os").environ.get("MESHVAE_MAX_PANEL", "1024"))

# Set True to run the kernel in the Pallas interpreter (CPU tests / debug);
# MESHVAE_PALLAS_INTERPRET=1 sets it from the environment so the CLIs can
# drive the pallas path end-to-end on the CPU backend.
INTERPRET = bool(int(__import__("os").environ.get(
    "MESHVAE_PALLAS_INTERPRET", "0")))

# With bf16 operator blocks (compute_dtype=bfloat16) keep the WHOLE
# recurrence state bf16: the kernel emits bf16, so the per-order
# f32->bf16 cast round-trip disappears and the t_prev read + output
# write + mix-dot stream at half width. MESHVAE_BF16_STATE=0 restores
# the round-2 behavior (f32 state, per-order downcasts) for A/B benches.
BF16_STATE = bool(int(__import__("os").environ.get(
    "MESHVAE_BF16_STATE", "1")))

# Fused backward: the reverse Chebyshev recurrence runs as K-1 two-seed
# kernel calls (out = α·L·g + c_{k-1} − b_{k+1}) with ZERO standalone
# elementwise passes, instead of autodiff's kernel + two full-activation
# HBM round-trips per order. MESHVAE_FUSED_BWD=0 restores the autodiff
# backward for A/B benches.
FUSED_BWD = bool(int(__import__("os").environ.get(
    "MESHVAE_FUSED_BWD", "1")))

# Fused seed dot: the backward recurrence's per-order mix cotangent
# c_j = gm @ W_jᵀ is computed INSIDE the kernel's first-visit branch
# (a [BLOCK*panel/f, f] @ [f, f] dot on the VMEM-resident gm tile)
# instead of a standalone XLA dot — eliminating, per order, one full
# read of gm and one write of c_j through HBM. Only square mixes
# (f_pad == f_out, f dividing the 128-column panel) fuse; others keep
# the standalone dot. Default OFF — hardware-DISPROVEN in round 3: at
# the shipping panel width Mosaic cannot lower the in-kernel reshape
# ("infer-vector-layout: unsupported shape cast" on
# vector<128x2048xbf16> -> vector<16384x16xbf16>, v5e libtpu 2026-08),
# so any dx-carrying model fails to compile with it on. Interpret mode
# (tests) and narrower shapes still execute the math; the flag stays as
# an A/B knob for future Mosaic versions.
FUSED_SEED_DOT = bool(int(__import__("os").environ.get(
    "MESHVAE_FUSED_SEED_DOT", "0")))


def _clamp_bf16_precision(precision, op_dtype):
    """Resolve the precision flag and clamp it for bf16 operator blocks.

    Mosaic rejects an fp32-contract matmul on bf16 operands ("Bad lhs
    type"), so HIGHEST on a bf16 operator cannot lower at all — and HIGH's
    bf16x3 split is a no-op on bf16 blocks (the low residual is exactly
    zero, the three passes just triple the traffic). Both clamp to
    DEFAULT, which on bf16 inputs already accumulates f32 on the MXU.
    This is the config-path twin of bench.py's arg-level guard: a user
    running `compute_dtype bfloat16` with the default.cfg
    `matmul_precision = highest` must get the record bf16 kernel, not a
    backend compile crash."""
    from .cheb import resolve_precision

    precision = resolve_precision(precision)
    if op_dtype == jnp.bfloat16 and precision in (
            jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH):
        return jax.lax.Precision.DEFAULT
    return precision


def _seed_with(contrib, tprev_ref, tplus_ref):
    """Accumulator seed contrib [+ t_plus] [− t_prev], f32."""
    seed = contrib
    if tplus_ref is not None:
        seed = seed + tplus_ref[:].astype(jnp.float32)
    if tprev_ref is not None:
        seed = seed - tprev_ref[:].astype(jnp.float32)
    return seed


def _accumulate(first_ref, o_ref, contrib, tprev_ref, tplus_ref=None,
                plus_fn=None):
    """Row-major accumulation into the revisited output row-block. With
    fused seed operands, the first block of a row seeds the accumulator
    with −T_{k−2}[row] (forward recurrence: 2·L·T_{k−1} − T_{k−2}, the ×2
    lives in alpha upstream) and/or +t_plus[row] (backward recurrence:
    2·L·b_k + c_{k−1} − b_{k+1}) — folding the Chebyshev elementwise steps
    into the SpMM instead of separate XLA kernels that round-trip the
    whole activation through HBM once per order. plus_fn, when given,
    computes an extra additive seed lazily (only first visits pay it).

    contrib arrives f32 (MXU accumulation); o_ref may be bf16 in the
    bf16-state mode — each store rounds, which at ~3 occupied blocks per
    row stays well inside the bf16 error budget."""
    b = pl.program_id(1)
    odt = o_ref.dtype

    @pl.when(first_ref[b] == 1)
    def _():
        seed = _seed_with(contrib, tprev_ref, tplus_ref)
        if plus_fn is not None:
            seed = seed + plus_fn()
        o_ref[:] = seed.astype(odt)

    @pl.when(first_ref[b] == 0)
    def _():
        o_ref[:] = (o_ref[:].astype(jnp.float32) + contrib).astype(odt)


def _split_seeds(rest, has_m, has_p, has_pd=False):
    """Unpack (t_prev?, t_plus?, (gm, wT)?, o_ref) from trailing refs."""
    o_ref = rest[-1]
    seeds = rest[:-1]
    tprev = seeds[0] if has_m else None
    tplus = seeds[1 if has_m else 0] if has_p else None
    pd = None
    if has_pd:
        pd = (seeds[-2], seeds[-1])
    return tprev, tplus, pd, o_ref


def _seed_dot_fn(pd, precision):
    """Lazy in-kernel mix-cotangent seed: c = gm @ Wᵀ computed on the
    VMEM-resident gm tile (square f×f mix; panel columns group as
    panel/f batch items × f features, so the reshape is layout-exact)."""
    if pd is None:
        return None
    gm_ref, wt_ref = pd

    def plus_fn():
        f = wt_ref.shape[0]
        gm = gm_ref[:]
        rows, pnl = gm.shape
        return jnp.dot(gm.reshape(rows * (pnl // f), f), wt_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=precision).reshape(rows, pnl)

    return plus_fn


def _make_spmm_kernel(precision, alpha, has_m, has_p, has_pd=False):
    def _kernel(brow_ref, bcol_ref, first_ref, l_ref, x_ref, *rest):
        # HIGHEST keeps the MXU in true-f32 mode (default truncates to
        # bf16, which breaks the <1e-4 parity budget); DEFAULT is the
        # opt-in bf16 speed mode.
        tprev, tplus, pd, o_ref = _split_seeds(rest, has_m, has_p, has_pd)
        contrib = alpha * jnp.dot(l_ref[0], x_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=precision)
        _accumulate(first_ref, o_ref, contrib, tprev, tplus,
                    _seed_dot_fn(pd, precision))

    return _kernel


def _colmajor_init(o_ref, tprev_ref, tplus_ref, plus_fn=None):
    """Seed the VMEM-resident panel at step 0: 0 [+ t_plus] [− t_prev]."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        if tprev_ref is None and tplus_ref is None and plus_fn is None:
            o_ref[:] = jnp.zeros_like(o_ref)
        else:
            seed = _seed_with(jnp.float32(0.0), tprev_ref, tplus_ref)
            if plus_fn is not None:
                seed = seed + plus_fn()
            o_ref[:] = seed.astype(o_ref.dtype)


def _make_colmajor_kernel(precision, alpha, has_m, has_p, has_pd=False):
    """Column-major variant: the WHOLE [n_pad, panel] output panel stays
    VMEM-resident across the block loop (out index map is constant per
    panel), blocks iterate sorted by (col, row) so consecutive steps
    revisit the same x slab — each occupied column block streams once per
    panel instead of once per occupied block (~3x less slab traffic at the
    5k level-0's ~3 blocks/row). Accumulation is a dynamic-sliced += into
    the resident panel; the panel seeds with 0 [+t_plus] [−t_prev] at
    step 0."""

    def _acc(o_ref, brow_ref, contrib):
        r = pl.multiple_of(brow_ref[pl.program_id(1)] * BLOCK, BLOCK)
        cur = o_ref[pl.ds(r, BLOCK), :].astype(jnp.float32)
        o_ref[pl.ds(r, BLOCK), :] = (cur + contrib).astype(o_ref.dtype)

    def _kernel(ord_ref, brow_ref, bcol_ref, l_ref, x_ref, *rest):
        tprev, tplus, pd, o_ref = _split_seeds(rest, has_m, has_p, has_pd)
        _colmajor_init(o_ref, tprev, tplus, _seed_dot_fn(pd, precision))
        contrib = alpha * jnp.dot(l_ref[0], x_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=precision)
        _acc(o_ref, brow_ref, contrib)

    return _kernel


def _make_colmajor_kernel_bf16x3(alpha, has_m, has_p):
    def _kernel(ord_ref, brow_ref, bcol_ref, lh_ref, ll_ref, xh_ref, xl_ref,
                *rest):
        tprev, tplus, _, o_ref = _split_seeds(rest, has_m, has_p)
        _colmajor_init(o_ref, tprev, tplus)
        dot = lambda a, c: jnp.dot(a, c, preferred_element_type=jnp.float32)
        contrib = alpha * (dot(lh_ref[0], xh_ref[:])
                           + (dot(lh_ref[0], xl_ref[:])
                              + dot(ll_ref[0], xh_ref[:])))
        r = pl.multiple_of(brow_ref[pl.program_id(1)] * BLOCK, BLOCK)
        o_ref[pl.ds(r, BLOCK), :] += contrib

    return _kernel


def _colmajor_matmul(bsr: BlockSparseOperator, x2d, precision, high,
                     panel: int, t_prev=None, t_plus=None, t_plus_dot=None,
                     alpha=1.0, out_dtype=jnp.float32):
    """pallas_call for the column-major VMEM-panel kernel. Blocks are
    addressed through the scalar-prefetched (col, row)-sorted permutation
    ord — no duplicated block storage."""
    rows_x, c = x2d.shape
    n_pad = bsr.n_pad
    nb = bsr.num_blocks
    panels = c // panel
    has_m = t_prev is not None
    has_p = t_plus is not None
    has_pd = t_plus_dot is not None

    block_spec = lambda: pl.BlockSpec(
        (1, BLOCK, BLOCK), lambda j, b, o, br, bc: (o[b], 0, 0),
        memory_space=pltpu.VMEM)
    x_spec = lambda: pl.BlockSpec(
        (BLOCK, panel), lambda j, b, o, br, bc: (bc[b], j),
        memory_space=pltpu.VMEM)
    seed_spec = lambda: pl.BlockSpec(
        (n_pad, panel), lambda j, b, o, br, bc: (0, j),
        memory_space=pltpu.VMEM)
    if high:
        assert not has_pd  # bf16x3 keeps the standalone cotangent dot
        kernel = _make_colmajor_kernel_bf16x3(alpha, has_m, has_p)
        lh = bsr.blocks.astype(jnp.bfloat16)
        ll = (bsr.blocks - lh.astype(jnp.float32)).astype(jnp.bfloat16)
        xh = x2d.astype(jnp.bfloat16)
        xl = (x2d - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        operands = [lh, ll, xh, xl]
        in_specs = [block_spec(), block_spec(), x_spec(), x_spec()]
        flops = 3 * 2 * nb * BLOCK * BLOCK * c
    else:
        kernel = _make_colmajor_kernel(precision, alpha, has_m, has_p,
                                       has_pd)
        operands = [bsr.blocks, x2d]
        in_specs = [block_spec(), x_spec()]
        flops = 2 * nb * BLOCK * BLOCK * c
    for seed in (t_prev, t_plus):
        if seed is not None:
            operands.append(seed)
            in_specs.append(seed_spec())
    if has_pd:
        gm2, wt = t_plus_dot
        operands.extend([gm2, wt])
        f = wt.shape[0]
        in_specs.extend([
            seed_spec(),
            pl.BlockSpec((f, f), lambda j, b, o, br, bc: (0, 0),
                         memory_space=pltpu.VMEM),
        ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(panels, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_pad, panel),
                               lambda j, b, o, br, bc: (0, j),
                               memory_space=pltpu.VMEM),
    )
    op_bytes = bsr.blocks.dtype.itemsize
    act_bytes = x2d.dtype.itemsize + jnp.dtype(out_dtype).itemsize
    if has_pd:
        act_bytes += t_plus_dot[0].dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=nb * BLOCK * BLOCK * op_bytes
            + n_pad * c * act_bytes,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=INTERPRET,
    )(bsr.col_order, bsr.block_row_c, bsr.block_col_c, *operands)


def _make_spmm_kernel_bf16x3(alpha, has_m, has_p):
    """bf16x3 ("HIGH"): both operands arrive pre-split into a bf16 hi part
    and a bf16 residual (same total bytes as f32); the three leading cross
    products with f32 accumulation give ~1e-5 relative error — inside the
    <1e-4 parity budget — at 3 MXU passes instead of HIGHEST's 6. Mosaic's
    dot knows only DEFAULT/HIGHEST, so the scheme is explicit; splitting
    happens once per operand OUTSIDE the kernel (the L split is static and
    CSE'd per step; an in-kernel split would recompute per block)."""

    def _kernel(brow_ref, bcol_ref, first_ref, lh_ref, ll_ref, xh_ref,
                xl_ref, *rest):
        tprev, tplus, _, o_ref = _split_seeds(rest, has_m, has_p)
        dot = lambda a, c: jnp.dot(a, c, preferred_element_type=jnp.float32)
        contrib = alpha * (dot(lh_ref[0], xh_ref[:])
                           + (dot(lh_ref[0], xl_ref[:])
                              + dot(ll_ref[0], xh_ref[:])))
        _accumulate(first_ref, o_ref, contrib, tprev, tplus)

    return _kernel


# Row-grouped kernel (default since round 3): ONE grid step per output
# row-block computes all its G block-dots and writes once — the per-block
# kernels' accumulate read-modify-write and first-flag machinery is the
# measured per-grid-step bottleneck (apply_ms ~ steps x ~0.45us, see
# benchmarks/pass_probe.py), not HBM bytes or MXU passes. Same-session
# A/B on the 5k level-0 apply: 0.112 -> 0.067 ms (-40%).
# MESHVAE_GROUPED=0 restores the per-block kernels.
GROUPED = bool(int(__import__("os").environ.get("MESHVAE_GROUPED", "1")))

# The grouped kernel's panel: fewer, fatter steps win until slab DMA
# dominates — 2048 measured best at the flagship (vs 1024 for the
# per-block kernels). Swept per-workload by benchmarks/autotune.py.
GROUP_MAX_PANEL = int(__import__("os").environ.get(
    "MESHVAE_GROUP_MAX_PANEL", "2048"))

# per-step VMEM allowance for the grouped kernel's (double-buffered)
# slabs + blocks + out + seeds; panels shrink until they fit. 14 MB
# (round 5; was 12): at the 80k shapes the seeded recurrence steps'
# per-row cost is ~3.1 MB, so 12 MB capped them at 3 rows -> divisor 2
# while the measured best is rows_step 4 (grouped apply 2.317 -> 2.267
# ms same-session; BASELINE.md "the grid-step family, closed"). Actual
# kernel VMEM at 4 rows stays ~12.6 MB, inside Mosaic's 16 MB window.
GROUP_VMEM_BUDGET = int(__import__("os").environ.get(
    "MESHVAE_GROUP_BUDGET", str(14 * 1024 * 1024)))

# Row-blocks per grid step (0 = auto). When the column panel is narrower
# than GROUP_MAX_PANEL (small batch, or big meshes where B*F is modest),
# a single-row grid step does too little work to amortize the ~0.45 us
# per-step cost (pass_probe), so the kernel packs R row-blocks into one
# step: R*g block-dots, one (R*BLOCK, panel) write. R is chosen so
# R*panel stays at the measured per-step sweet spot (GROUP_MAX_PANEL
# columns-equivalent), fits the VMEM budget, divides the row count
# (block_sparse pads n_rows to a multiple of 8 on big operators so a
# divisor exists), and keeps the operand count Mosaic-friendly.
GROUP_ROWS = int(__import__("os").environ.get("MESHVAE_GROUP_ROWS", "0"))

# operand-count ceiling for the multi-row kernel: R*g x-slab refs
# (doubled in HIGH mode) plus blocks and seeds. Env-overridable so the
# GROUP_ROWS sweep can probe past it (e.g. R=8 at the 80k level-0's g=8
# needs 64 slab refs); Mosaic's real operand tolerance is comfortably
# higher, the default just keeps auto-picked kernels conservative.
_GROUP_MAX_OPERANDS = int(__import__("os").environ.get(
    "MESHVAE_GROUP_MAX_OPERANDS", "32"))


def _make_grouped_kernel(g, precision, alpha, has_m, has_p, has_pd):
    def _kernel(gcol_ref, l_ref, *rest):
        xs, rest = rest[:g], rest[g:]
        tprev, tplus, pd, o_ref = _split_seeds(rest, has_m, has_p, has_pd)
        contrib = jnp.dot(l_ref[0, 0], xs[0][:],
                          preferred_element_type=jnp.float32,
                          precision=precision)
        for i in range(1, g):
            contrib += jnp.dot(l_ref[0, i], xs[i][:],
                               preferred_element_type=jnp.float32,
                               precision=precision)
        seed = _seed_with(alpha * contrib, tprev, tplus)
        plus_fn = _seed_dot_fn(pd, precision)
        if plus_fn is not None:
            seed = seed + plus_fn()
        o_ref[:] = seed.astype(o_ref.dtype)

    return _kernel


def _make_grouped_kernel_bf16x3(g, alpha, has_m, has_p):
    def _kernel(gcol_ref, lh_ref, ll_ref, *rest):
        xhs, rest = rest[:g], rest[g:]
        xls, rest = rest[:g], rest[g:]
        tprev, tplus, _, o_ref = _split_seeds(rest, has_m, has_p)
        dot = lambda a, c: jnp.dot(a, c, preferred_element_type=jnp.float32)
        contrib = (dot(lh_ref[0, 0], xhs[0][:])
                   + (dot(lh_ref[0, 0], xls[0][:])
                      + dot(ll_ref[0, 0], xhs[0][:])))
        for i in range(1, g):
            contrib += (dot(lh_ref[0, i], xhs[i][:])
                        + (dot(lh_ref[0, i], xls[i][:])
                           + dot(ll_ref[0, i], xhs[i][:])))
        o_ref[:] = _seed_with(alpha * contrib, tprev, tplus).astype(
            o_ref.dtype)

    return _kernel


def _make_multirow_kernel(g, rows, precision, alpha, has_m, has_p):
    """Grouped kernel processing `rows` output row-blocks per grid step:
    each row r sums its g block-dots and writes its (BLOCK, panel) slice
    of the (rows*BLOCK, panel) output block once. Seeds slice the same
    row range (static, tile-aligned offsets)."""

    def _kernel(gcol_ref, l_ref, *rest):
        xs, rest = rest[:rows * g], rest[rows * g:]
        tprev, tplus, _, o_ref = _split_seeds(rest, has_m, has_p)
        for r in range(rows):
            contrib = jnp.dot(l_ref[0, r * g], xs[r * g][:],
                              preferred_element_type=jnp.float32,
                              precision=precision)
            for i in range(1, g):
                contrib += jnp.dot(l_ref[0, r * g + i], xs[r * g + i][:],
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
            sl = pl.ds(r * BLOCK, BLOCK)
            seed = alpha * contrib
            if tplus is not None:
                seed = seed + tplus[sl].astype(jnp.float32)
            if tprev is not None:
                seed = seed - tprev[sl].astype(jnp.float32)
            o_ref[sl] = seed.astype(o_ref.dtype)

    return _kernel


def _make_multirow_kernel_bf16x3(g, rows, alpha, has_m, has_p):
    def _kernel(gcol_ref, lh_ref, ll_ref, *rest):
        xhs, rest = rest[:rows * g], rest[rows * g:]
        xls, rest = rest[:rows * g], rest[rows * g:]
        tprev, tplus, _, o_ref = _split_seeds(rest, has_m, has_p)
        dot = lambda a, c: jnp.dot(a, c, preferred_element_type=jnp.float32)
        for r in range(rows):
            contrib = (dot(lh_ref[0, r * g], xhs[r * g][:])
                       + (dot(lh_ref[0, r * g], xls[r * g][:])
                          + dot(ll_ref[0, r * g], xhs[r * g][:])))
            for i in range(1, g):
                s = r * g + i
                contrib += (dot(lh_ref[0, s], xhs[s][:])
                            + (dot(lh_ref[0, s], xls[s][:])
                               + dot(ll_ref[0, s], xhs[s][:])))
            sl = pl.ds(r * BLOCK, BLOCK)
            seed = alpha * contrib
            if tplus is not None:
                seed = seed + tplus[sl].astype(jnp.float32)
            if tprev is not None:
                seed = seed - tprev[sl].astype(jnp.float32)
            o_ref[sl] = seed.astype(o_ref.dtype)

    return _kernel


def _pick_group_rows(n_rows, g, panel, high, per_row_bytes):
    """Largest divisor of n_rows within the work / VMEM / operand caps."""
    if GROUP_ROWS > 0:
        # explicit sweep override: bypasses the work heuristic but still
        # clamps to the VMEM budget — an oversized request must degrade,
        # not hit Mosaic VMEM exhaustion mid-sweep
        cap = min(GROUP_ROWS,
                  max(1, GROUP_VMEM_BUDGET // max(per_row_bytes, 1)))
    else:
        cap = max(1, min(GROUP_MAX_PANEL // panel,
                         GROUP_VMEM_BUDGET // max(per_row_bytes, 1)))
    cap = min(cap, n_rows,
              _GROUP_MAX_OPERANDS // (g * (2 if high else 1)))
    if cap <= 1:
        return 1
    return max(r for r in range(1, cap + 1) if n_rows % r == 0)


def _gather_grouped(blocks, g_idx):
    """[nR, G, B, B] padded operand from the canonical block storage —
    a trace-time gather (CSE'd per program; index num_blocks selects the
    appended zero block), so `blocks` stays the only shipped storage."""
    zero = jnp.zeros((1, BLOCK, BLOCK), blocks.dtype)
    return jnp.concatenate([blocks, zero])[g_idx]


def _grouped_matmul(bsr: BlockSparseOperator, x2d, precision, high,
                    t_prev=None, t_plus=None, t_plus_dot=None,
                    alpha=1.0, out_dtype=jnp.float32):
    rows_x, c = x2d.shape
    n_pad = bsr.n_pad
    g = bsr.g_width
    n_rows = n_pad // BLOCK
    has_m = t_prev is not None
    has_p = t_plus is not None
    has_pd = t_plus_dot is not None
    xb = 2 if high else x2d.dtype.itemsize
    ob = jnp.dtype(out_dtype).itemsize
    n_x = g * (2 if high else 1)
    # real per-seed itemsizes: seeds are f32 in HIGH mode (state_dtype),
    # bf16 in bf16-state mode — a flat "2" undercounts f32 seeds 2x
    seed_b = sum(s.dtype.itemsize for s in (t_prev, t_plus)
                 if s is not None)
    if has_pd:
        seed_b += t_plus_dot[0].dtype.itemsize
    # double-buffered gathered L blocks (lh+ll pair in HIGH mode)
    lb = 2 if high else bsr.blocks.dtype.itemsize
    l_bytes = 2 * (2 if high else 1) * g * BLOCK * BLOCK * lb
    # widest panel under the VMEM budget: double-buffered slabs dominate
    panel = _COL_PANEL
    while (panel * 2 <= min(c, GROUP_MAX_PANEL) and c % (panel * 2) == 0
           and BLOCK * panel * 2 * (n_x * xb + ob + seed_b) + l_bytes
           <= GROUP_VMEM_BUDGET):
        panel *= 2

    # narrow panels (small B*F) leave each grid step under-worked; pack R
    # row-blocks per step (see GROUP_ROWS). R=1 reproduces the original
    # kernel exactly; the seed-dot path (has_pd) keeps R=1.
    rows_step = 1
    if not has_pd:
        per_row_bytes = (BLOCK * panel * 2 * (n_x * xb + ob + seed_b)
                         + l_bytes)
        rows_step = _pick_group_rows(n_rows, g, panel, high, per_row_bytes)
    slots = rows_step * g

    def xspec(i, arr_idx_hint=None):
        return pl.BlockSpec((BLOCK, panel),
                            lambda j, b, gc, i=i: (gc[b * slots + i], j),
                            memory_space=pltpu.VMEM)

    l_spec = lambda: pl.BlockSpec((1, slots, BLOCK, BLOCK),
                                  lambda j, b, gc: (b, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    seed_spec = lambda: pl.BlockSpec((rows_step * BLOCK, panel),
                                     lambda j, b, gc: (b, j),
                                     memory_space=pltpu.VMEM)

    def grouped_l(blocks):
        gathered = _gather_grouped(blocks, bsr.g_idx)
        if rows_step == 1:
            return gathered
        return gathered.reshape(n_rows // rows_step, slots, BLOCK, BLOCK)

    if high:
        assert not has_pd
        kernel = (_make_grouped_kernel_bf16x3(g, alpha, has_m, has_p)
                  if rows_step == 1 else
                  _make_multirow_kernel_bf16x3(g, rows_step, alpha, has_m,
                                               has_p))
        lh = bsr.blocks.astype(jnp.bfloat16)
        ll = (bsr.blocks - lh.astype(jnp.float32)).astype(jnp.bfloat16)
        xh = x2d.astype(jnp.bfloat16)
        xl = (x2d - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        operands = [grouped_l(lh), grouped_l(ll)]
        operands += [xh] * slots + [xl] * slots
        in_specs = [l_spec(), l_spec()]
        in_specs += [xspec(i) for i in range(slots)]
        in_specs += [xspec(i) for i in range(slots)]
        flops = 3 * 2 * n_rows * g * BLOCK * BLOCK * c
    else:
        kernel = (_make_grouped_kernel(g, precision, alpha, has_m, has_p,
                                       has_pd)
                  if rows_step == 1 else
                  _make_multirow_kernel(g, rows_step, precision, alpha,
                                        has_m, has_p))
        operands = [grouped_l(bsr.blocks)]
        operands += [x2d] * slots
        in_specs = [l_spec()] + [xspec(i) for i in range(slots)]
        flops = 2 * n_rows * g * BLOCK * BLOCK * c
    for seed in (t_prev, t_plus):
        if seed is not None:
            operands.append(seed)
            in_specs.append(seed_spec())
    if has_pd:
        gm2, wt = t_plus_dot
        f = wt.shape[0]
        operands.extend([gm2, wt])
        in_specs.extend([
            seed_spec(),
            pl.BlockSpec((f, f), lambda j, b, gc: (0, 0),
                         memory_space=pltpu.VMEM),
        ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // panel, n_rows // rows_step),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows_step * BLOCK, panel),
                               lambda j, b, gc: (b, j),
                               memory_space=pltpu.VMEM),
    )
    op_b = bsr.blocks.dtype.itemsize if not high else 4
    bytes_accessed = (n_rows * g * BLOCK * BLOCK * op_b
                      + n_pad * c * (x2d.dtype.itemsize + ob)
                      + (n_pad * c * t_plus_dot[0].dtype.itemsize
                         if has_pd else 0))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), out_dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=INTERPRET,
    )(bsr.g_bcol, *operands)


def _bsr_matmul_impl(bsr: BlockSparseOperator, x2d: jnp.ndarray,
                     precision=None, t_prev=None, t_plus=None,
                     t_plus_dot=None, alpha: float = 1.0) -> jnp.ndarray:
    """y = alpha * (L @ x2d) [+ t_plus] [- t_prev] with x2d
    [n_pad_cols, C], C a multiple of the column panel. t_prev (the fused
    forward-recurrence operand T_{k-2}, [n_pad, C]) subtracts inside the
    kernel; t_plus (the fused backward-recurrence cotangent seed) adds.
    t_plus_dot = (gm [n_pad, C], wT [f, f]) is the LAZY form of t_plus:
    the kernel computes the seed c = gm @ wT on first visits, so the
    standalone XLA dot (one gm read + one c write through HBM per order)
    disappears. Requires a square mix with f dividing the column panel;
    anything else (and the pre-split bf16x3 HIGH kernels) falls back to
    computing the seed eagerly here — identical math either way."""
    precision = _clamp_bf16_precision(precision, bsr.blocks.dtype)
    rows_x, c = x2d.shape
    # rectangular operators (row shards, pallas_shard.py): output rows are
    # local (bsr.n_pad), input rows global (bsr.n_pad_cols)
    assert rows_x == bsr.n_pad_cols, (rows_x, bsr.n_pad_cols)
    n_pad = bsr.n_pad
    assert c % _COL_PANEL == 0, c
    # widest panel (<= 1024 lanes) dividing C: the L blocks are re-streamed
    # once per panel, so wide panels cut operator traffic proportionally
    panel = _COL_PANEL
    while panel * 2 <= min(c, MAX_PANEL) and c % (panel * 2) == 0:
        panel *= 2
    panels = c // panel
    nb = bsr.num_blocks
    high = precision == jax.lax.Precision.HIGH
    if t_plus_dot is not None:
        assert t_plus is None
        f = t_plus_dot[1].shape[0]
        assert c % f == 0, (c, f)  # caller passes square mixes only
        if high or _COL_PANEL % f != 0:
            # eager fallback: the same cotangent dot the caller would run
            gm2, wt = t_plus_dot
            t_plus = jax.lax.dot_general(
                gm2.reshape(n_pad, c // f, f), wt, (((2,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            ).astype(gm2.dtype).reshape(n_pad, c)
            t_plus_dot = None
    has_m = t_prev is not None
    has_p = t_plus is not None
    has_pd = t_plus_dot is not None
    n_seeds = int(has_m) + int(has_p) + int(has_pd)
    # bf16-state mode: bf16 operator blocks (compute_dtype=bfloat16) emit a
    # bf16 result, so the recurrence state / t_prev / mix inputs all stream
    # at half width and the per-order downcast disappears (accumulation
    # stays f32 on the MXU). HIGH keeps f32 out (parity mode).
    out_dtype = (jnp.bfloat16
                 if BF16_STATE and bsr.blocks.dtype == jnp.bfloat16
                 and not high else jnp.float32)

    if GROUPED and bsr.g_idx is not None:
        return _grouped_matmul(bsr, x2d, precision, high, t_prev=t_prev,
                               t_plus=t_plus, t_plus_dot=t_plus_dot,
                               alpha=alpha, out_dtype=out_dtype)

    if bsr.col_order is not None:
        # widest panel under the VMEM budget for a resident output panel
        # (fused seed panels are equally resident: divide the allowance)
        budget = COLMAJOR_VMEM_BUDGET // (1 + n_seeds)
        osz = jnp.dtype(out_dtype).itemsize
        cpanel = _COL_PANEL
        while (cpanel * 2 <= min(c, MAX_PANEL) and c % (cpanel * 2) == 0
               and n_pad * cpanel * 2 * osz <= budget):
            cpanel *= 2
        # col-major wins only when the budget doesn't force a NARROWER
        # panel than row-major uses — a shrunken panel re-streams the
        # blocks proportionally, which outweighs the slab savings
        # (measured: bs16 +8%, bs128 with 1024->256 shrink -6%)
        if n_pad * cpanel * osz <= budget and (cpanel >= panel
                                               or FORCE_COLMAJOR):
            return _colmajor_matmul(bsr, x2d, precision, high, cpanel,
                                    t_prev=t_prev, t_plus=t_plus,
                                    t_plus_dot=t_plus_dot,
                                    alpha=alpha, out_dtype=out_dtype)

    block_spec = lambda: pl.BlockSpec((1, BLOCK, BLOCK),
                                      lambda j, b, br, bc, fr: (b, 0, 0),
                                      memory_space=pltpu.VMEM)
    x_spec = lambda: pl.BlockSpec((BLOCK, panel),
                                  lambda j, b, br, bc, fr: (bc[b], j),
                                  memory_space=pltpu.VMEM)
    out_like_spec = lambda: pl.BlockSpec((BLOCK, panel),
                                         lambda j, b, br, bc, fr: (br[b], j),
                                         memory_space=pltpu.VMEM)
    if high:
        kernel = _make_spmm_kernel_bf16x3(alpha, has_m, has_p)
        lh = bsr.blocks.astype(jnp.bfloat16)
        ll = (bsr.blocks - lh.astype(jnp.float32)).astype(jnp.bfloat16)
        xh = x2d.astype(jnp.bfloat16)
        xl = (x2d - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        operands = [lh, ll, xh, xl]
        in_specs = [block_spec(), block_spec(), x_spec(), x_spec()]
        flops = 3 * 2 * nb * BLOCK * BLOCK * c
    else:
        kernel = _make_spmm_kernel(precision, alpha, has_m, has_p, has_pd)
        operands = [bsr.blocks, x2d]
        in_specs = [block_spec(), x_spec()]
        flops = 2 * nb * BLOCK * BLOCK * c
    for seed in (t_prev, t_plus):
        if seed is not None:
            operands.append(seed)
            in_specs.append(out_like_spec())
    if has_pd:
        gm2, wt = t_plus_dot
        f = wt.shape[0]
        operands.extend([gm2, wt])
        in_specs.extend([
            out_like_spec(),
            pl.BlockSpec((f, f), lambda j, b, br, bc, fr: (0, 0),
                         memory_space=pltpu.VMEM),
        ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(panels, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK, panel),
                               lambda j, b, br, bc, fr: (br[b], j),
                               memory_space=pltpu.VMEM),
    )
    bytes_accessed = (nb * BLOCK * BLOCK * bsr.blocks.dtype.itemsize
                      + n_pad * c * (x2d.dtype.itemsize
                                     + jnp.dtype(out_dtype).itemsize)
                      + (n_pad * c * t_plus_dot[0].dtype.itemsize
                         if has_pd else 0))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), out_dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            # column panels are independent; the block dim accumulates into
            # revisited output row-blocks and must stay sequential
            dimension_semantics=("parallel", "arbitrary")),
        interpret=INTERPRET,
    )(bsr.block_row, bsr.block_col, bsr.first, *operands)


def bsr_matmul(bsr: BlockSparseOperator, x2d: jnp.ndarray,
               precision=None) -> jnp.ndarray:
    """Differentiable y = L @ x (L symmetric: the VJP reuses the kernel)."""

    @jax.custom_vjp
    def mm(x):
        return _bsr_matmul_impl(bsr, x, precision)

    def fwd(x):
        return _bsr_matmul_impl(bsr, x, precision), None

    def bwd(_, g):
        # cotangent arrives f32 (kernel accumulates/emits f32); cast back to
        # the operand dtype so the bf16-block mode streams bf16 both ways
        return (_bsr_matmul_impl(bsr, g.astype(bsr.blocks.dtype), precision),)

    mm.defvjp(fwd, bwd)
    return mm(x2d)


def cheb_step(bsr: BlockSparseOperator, t1: jnp.ndarray, t0: jnp.ndarray,
              precision=None) -> jnp.ndarray:
    """Differentiable fused Chebyshev recurrence step
    T_k = 2 L T_{k-1} - T_{k-2}, entirely inside the SpMM kernel — the
    separate elementwise 2*y - t0 would round-trip the whole activation
    through HBM once per order. t1 may be pre-downcast to the operand
    dtype; t0 enters f32 (it seeds the f32 accumulator). VJP by global
    symmetry of L: dt1 = 2 L g, dt0 = -g."""
    op_dtype = bsr.blocks.dtype

    @jax.custom_vjp
    def step(a, b):
        return _bsr_matmul_impl(bsr, a, precision, t_prev=b, alpha=2.0)

    def fwd(a, b):
        return step(a, b), None

    def bwd(_, g):
        return (_bsr_matmul_impl(bsr, g.astype(op_dtype), precision,
                                 alpha=2.0),
                -g)

    step.defvjp(fwd, bwd)
    return step(t1, t0)


def _basis_mix(bsr: BlockSparseOperator, xt: jnp.ndarray, w2: jnp.ndarray,
               k: int, prec, state_dtype, op_dtype,
               input_grad: bool = True) -> jnp.ndarray:
    """Chebyshev basis + stacked mix with a FUSED custom backward.

    Forward: txs = [T_0..T_{k-1}] (fused recurrence steps), then one wide
    [n_pad, b, k*f_pad] @ [k*f_pad, f_out] dot.

    Backward: with c_j the mix cotangent of T_j and b_j the total cotangent
    of T_j, the reverse recurrence b_{j-1} = 2 L b_j + c_{j-1} - b_{j+1}
    (L symmetric) runs ENTIRELY inside the two-seed kernel — autodiff
    through the unrolled forward instead emits, per order, a kernel call
    plus two standalone elementwise passes (the += 2Lg accumulation and the
    -= g to the k-2 cotangent), each streaming the full activation through
    HBM three times. Final dx = L b_1 + c_0 - b_2 is one more fused call;
    zero standalone elementwise ops remain.

    input_grad=False skips the dx recurrence entirely (returns a zero
    cotangent) for convs whose input carries no gradient — the first
    encoder conv on raw data, crecon's frozen diff features. Autodiff
    prunes that chain automatically, but a custom_vjp's backward is
    opaque to both JAX's symbolic-zero pruning and XLA DCE (a pallas
    custom call is not provably side-effect-free), so without the flag
    the dead K-1 kernel calls re-stream the whole operator — measured
    -3.5% on the 20k/K=10 workload.
    """
    n_pad, b, f_pad = xt.shape
    f_out = w2.shape[-1]
    c = b * f_pad

    def _mm(a, alpha, p_plus, p_minus, p_plus_dot=None):
        r = lambda t: None if t is None else t.reshape(n_pad, c)
        return _bsr_matmul_impl(
            bsr, a.astype(op_dtype).reshape(n_pad, c), prec,
            t_prev=r(p_minus), t_plus=r(p_plus), t_plus_dot=p_plus_dot,
            alpha=alpha).reshape(n_pad, b, f_pad)

    def _forward(xt, w2):
        txs = [xt]
        if k > 1:
            txs.append(_mm(xt, 1.0, None, None))
        for _ in range(2, k):
            txs.append(_mm(txs[-1], 2.0, None, txs[-2]))
        txcat = jnp.concatenate(txs, axis=-1)  # [n_pad, b, k*f_pad]
        out = jax.lax.dot_general(
            txcat, w2.reshape(k * f_pad, f_out),
            (((2,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)  # [n_pad, b, f_out] f32
        return out, txcat

    @jax.custom_vjp
    def f(xt, w2):
        return _forward(xt, w2)[0]

    def fwd(xt, w2):
        # residual is the already-materialized concatenated basis, so the
        # backward's dW runs as ONE wide dot instead of K narrow ones
        out, txcat = _forward(xt, w2)
        return out, (txcat, w2)

    def bwd(res, g):  # g: [n_pad, b, f_out] f32
        txcat, w2 = res
        # one cast of the (small) output cotangent to the state dtype: the
        # mix-backward dots then run at operand width exactly as autodiff's
        # transpose rule would
        gm = g.astype(state_dtype)
        # ALL K dW dots as one [k*f_pad, f_out] contraction over (rows,
        # batch): gm streams from HBM once instead of K times
        dw = jax.lax.dot_general(
            txcat, gm, (((0, 1), (0, 1)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32
        ).reshape(k, f_pad, f_out).astype(w2.dtype)
        if not input_grad:
            return jnp.zeros((n_pad, b, f_pad), txcat.dtype), dw
        c_of = lambda j: jax.lax.dot_general(
            gm, w2[j], (((2,), (1,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32).astype(state_dtype)
        if k == 1:
            dx = c_of(0)
        elif FUSED_SEED_DOT and f_pad == f_out:
            # square mix: the per-order cotangents c_j = gm @ W_jᵀ fold
            # into the kernel's first-visit seed (t_plus_dot) — only
            # c_{k-1} materializes, as the adjoint recurrence's initial
            # gathered operand. Non-square mixes (and HIGH's pre-split
            # kernels) take the standalone-dot branch below.
            gm2 = gm.reshape(n_pad, c)
            wt = jnp.swapaxes(w2, 1, 2)  # [k, f_out, f_pad]
            u, prev_u = c_of(k - 1), None
            for j in range(k - 1, 1, -1):
                u, prev_u = _mm(u, 2.0, None, prev_u,
                                p_plus_dot=(gm2, wt[j - 1])), u
            dx = _mm(u, 1.0, None, prev_u, p_plus_dot=(gm2, wt[0]))
        else:
            # per-order cotangents as K narrow dots — each output lands
            # contiguous, directly feeding the kernel seed specs
            cs = [c_of(j) for j in range(k)]
            u, prev_u = cs[k - 1], None
            for j in range(k - 1, 1, -1):
                u, prev_u = _mm(u, 2.0, cs[j - 1], prev_u), u
            dx = _mm(u, 1.0, cs[0], prev_u)
        return dx.astype(state_dtype), dw

    f.defvjp(fwd, bwd)
    return f(xt, w2)


def _pad_amounts(n: int, b: int, f: int, n_pad: int | None = None):
    """Row/feature padding for the kernel layout. n_pad defaults to the
    128-block round-up; callers with a BSR operator pass its n_pad (which
    may carry extra zero row-blocks for the multi-row grouped kernel)."""
    if n_pad is None:
        n_pad = -(-n // BLOCK) * BLOCK
    assert n_pad >= n and n_pad % BLOCK == 0, (n, n_pad)
    f_pad = f
    while (b * f_pad) % _COL_PANEL != 0:
        f_pad += 1
    return n_pad, f_pad


def cheb_conv_pallas(x: jnp.ndarray, op, weight: jnp.ndarray,
                     bias: jnp.ndarray | None,
                     precision=None, input_grad: bool = True) -> jnp.ndarray:
    """Chebyshev conv with Pallas block-sparse propagation.

    x: [B, N, F_in] -> [B, N, F_out]. The recurrence runs in a padded
    [N_pad, B, F_pad] layout (one transpose in/out; the 2D reshape for the
    SpMM is free), with zero-padded weights so the channel mix stays exact.
    """
    bsr: BlockSparseOperator = op.bsr
    b, n, f_in = x.shape
    k, _, f_out = weight.shape
    n_pad, f_pad = _pad_amounts(n, b, f_in, n_pad=bsr.n_pad)

    op_dtype = bsr.blocks.dtype
    prec = _clamp_bf16_precision(precision, op_dtype)
    # With bf16 operator blocks the kernel emits bf16 (BF16_STATE), so the
    # whole recurrence state lives bf16: no per-order downcast op, and the
    # t_prev read / output write / mix-dot inputs stream at half width.
    # f32 blocks (HIGHEST/HIGH parity modes) keep an f32 state.
    state_dtype = (jnp.bfloat16
                   if BF16_STATE and op_dtype == jnp.bfloat16
                   and prec != jax.lax.Precision.HIGH else jnp.float32)
    xt = jnp.transpose(x, (1, 0, 2)).astype(state_dtype)  # [N, B, F]
    xt = jnp.pad(xt, ((0, n_pad - n), (0, 0), (0, f_pad - f_in)))
    w = jnp.pad(weight.astype(state_dtype),
                ((0, 0), (0, f_pad - f_in), (0, 0)))
    if FUSED_BWD:
        # recurrence + stacked mix under ONE custom VJP: the backward
        # runs the reverse Chebyshev recurrence as fused two-seed
        # kernel calls (see _basis_mix) instead of autodiff's
        # per-order kernel + two full-activation elementwise HBM
        # round-trips. (A whole-recurrence VMEM-resident variant was
        # built and hardware-retired in round 3 — per-grid-step overhead,
        # not bandwidth, binds at these shapes, and its VMEM-capped
        # 128-wide panel costs 8x the grid steps; design record and
        # measurements in docs/architecture.md "Retired kernels" and
        # BASELINE.md.)
        out = _basis_mix(bsr, xt, w, k, prec, state_dtype, op_dtype,
                         input_grad=input_grad)
    else:
        c = b * f_pad
        prop = lambda t: bsr_matmul(
            bsr, t.astype(op_dtype).reshape(n_pad, c),
            precision=prec).reshape(n_pad, b, f_pad)
        step = lambda t1, t0: cheb_step(
            bsr, t1.astype(op_dtype).reshape(n_pad, c),
            t0.reshape(n_pad, c), precision=prec).reshape(n_pad, b, f_pad)

        # recurrence first, then ONE wide channel mix over all K orders
        # (concat along features: [N, B, K*F] @ [K*F, F_out] — see
        # cheb.py). Orders >= 2 run the FUSED step (2 L t1 - t0 inside
        # the kernel).
        txs = [xt]
        if k > 1:
            txs.append(prop(xt))
        for _ in range(2, k):
            txs.append(step(txs[-1], txs[-2]))
        out = jax.lax.dot_general(
            jnp.concatenate(txs, axis=-1), w.reshape(k * f_pad, f_out),
            (((2,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)  # [N, B, F_out] f32 accum

    out = out[:n].astype(state_dtype)  # drop row padding
    out = jnp.transpose(out, (1, 0, 2))  # [B, N, F_out]
    if bias is not None:
        out = out + bias
    return out
