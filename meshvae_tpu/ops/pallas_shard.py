"""Vertex-sharded ("sp") Pallas SpMM: the distributed form of the Chebyshev
propagation kernel.

SURVEY.md §2c (SP row) calls for the Pallas kernel's operator row-blocks to
be distributable across devices — the graph analog of sequence parallelism.
This module delivers it: the 128-block CSR operator is repartitioned on host
into per-device row shards (`shard_block_sparse`), and `bsr_matmul_sharded`
runs the SpMM under `jax.shard_map` — each device all-gathers the (much
smaller) activation rows over the "sp" axis of the ICI mesh, multiplies its
own block rows with the single-chip kernel, and keeps its output rows local.
Batch columns stay sharded over "dp" throughout (the all-gather moves only
the sp axis), so dp x sp meshes compose.

The operator is globally symmetric (L = -D^{-1/2} A D^{-1/2}), so the
custom VJP is the same sharded product applied to the cotangent — autodiff
never differentiates through the shard_map body or the kernel.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .block_sparse import BLOCK, BlockSparseOperator


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedBlockSparse:
    """Row-sharded BSR: shard s owns global block-rows
    [s*rows_per_shard, (s+1)*rows_per_shard). Per-shard block lists are
    zero-padded to a common length so the stacked arrays are rectangular
    (SPMD-uniform); block_row is shard-local, block_col global."""

    blocks: jnp.ndarray      # [sp, nb_max, BLOCK, BLOCK] float32
    block_row: jnp.ndarray   # [sp, nb_max] int32 (local block-row)
    block_col: jnp.ndarray   # [sp, nb_max] int32 (global block-col)
    first: jnp.ndarray       # [sp, nb_max] int32
    n: int = dataclasses.field(metadata=dict(static=True))
    n_pad: int = dataclasses.field(metadata=dict(static=True))  # global, % (sp*BLOCK) == 0
    sp: int = dataclasses.field(metadata=dict(static=True))
    # row-grouped view per shard (see block_sparse.BlockSparseOperator):
    # local row r's real blocks at g_idx[s, r, :]; padded slots index
    # nb_max (the trace-time zero block) and alias the last real column
    g_idx: jnp.ndarray | None = None    # [sp, rows_per, G] int32
    g_bcol: jnp.ndarray | None = None   # [sp, rows_per * G] int32
    g_width: int = dataclasses.field(default=0,
                                     metadata=dict(static=True))

    @property
    def rows_per_shard(self) -> int:
        return self.n_pad // self.sp


def shard_block_sparse(bsr: BlockSparseOperator, sp: int) -> ShardedBlockSparse:
    """Repartition a square single-chip BSR into sp row shards (host-side,
    block granularity). The global padded dimension grows to a multiple of
    sp*BLOCK; every shard carries an explicit (zero) block for each of its
    block-rows so empty output rows still zero their accumulator."""
    op_dtype = bsr.blocks.dtype  # preserved: bf16 blocks keep streaming
    blocks = np.asarray(bsr.blocks.astype(jnp.float32))  # exact staging
    brow = np.asarray(bsr.block_row)
    bcol = np.asarray(bsr.block_col)

    total_block_rows = -(-bsr.n_pad // (sp * BLOCK)) * sp
    rows_per = total_block_rows // sp
    n_pad_global = total_block_rows * BLOCK

    shards = []
    for s in range(sp):
        r0, r1 = s * rows_per, (s + 1) * rows_per
        m = (brow >= r0) & (brow < r1)
        b, r, c = blocks[m], (brow[m] - r0), bcol[m]
        missing = sorted(set(range(rows_per)) - set(r.tolist()))
        if missing:
            b = np.concatenate(
                [b, np.zeros((len(missing), BLOCK, BLOCK), np.float32)])
            r = np.concatenate([r, np.array(missing, np.int64)])
            c = np.concatenate([c, np.zeros(len(missing), np.int64)])
        order = np.lexsort((c, r))
        shards.append((b[order], r[order].astype(np.int32),
                       c[order].astype(np.int32)))

    nb_max = max(s[0].shape[0] for s in shards)
    out = {"blocks": [], "block_row": [], "block_col": [], "first": []}
    for b, r, c in shards:
        pad = nb_max - b.shape[0]
        if pad:
            # zero blocks appended on the last local row keep the sort order
            b = np.concatenate([b, np.zeros((pad, BLOCK, BLOCK), np.float32)])
            r = np.concatenate([r, np.full(pad, rows_per - 1, np.int32)])
            c = np.concatenate([c, np.zeros(pad, np.int32)])
            order = np.lexsort((c, r))
            b, r, c = b[order], r[order], c[order]
        f = np.ones_like(r)
        f[1:] = (r[1:] != r[:-1]).astype(f.dtype)
        out["blocks"].append(b)
        out["block_row"].append(r)
        out["block_col"].append(c)
        out["first"].append(f)

    # row-grouped view (block_sparse.BlockSparseOperator.g_idx semantics):
    # only blocks with content join groups — the zero placeholders (missing
    # rows, nb_max padding) contribute nothing and would otherwise inflate
    # one row's group width
    from .block_sparse import MAX_GROUP

    nb_max = out["blocks"][0].shape[0]
    per_row_all = []
    g_max = 1
    for b, r, c in zip(out["blocks"], out["block_row"], out["block_col"]):
        per_row = [[] for _ in range(rows_per)]
        for i in range(nb_max):
            if np.any(b[i]):
                per_row[int(r[i])].append(i)
        per_row_all.append(per_row)
        g_max = max(g_max, max((len(v) for v in per_row), default=1))
    g_idx = g_bcol = None
    if g_max <= MAX_GROUP:
        g_idx = np.full((sp, rows_per, g_max), nb_max, np.int32)
        g_bcol = np.zeros((sp, rows_per, g_max), np.int32)
        for s, per_row in enumerate(per_row_all):
            c = out["block_col"][s]
            for r_, idxs in enumerate(per_row):
                for i, bi in enumerate(idxs):
                    g_idx[s, r_, i] = bi
                    g_bcol[s, r_, i] = c[bi]
                if idxs:
                    g_bcol[s, r_, len(idxs):] = c[idxs[-1]]

    return ShardedBlockSparse(
        blocks=jnp.asarray(np.stack(out["blocks"]), dtype=op_dtype),
        block_row=jnp.asarray(np.stack(out["block_row"])),
        block_col=jnp.asarray(np.stack(out["block_col"])),
        first=jnp.asarray(np.stack(out["first"])),
        n=bsr.n,
        n_pad=n_pad_global,
        sp=sp,
        g_idx=None if g_idx is None else jnp.asarray(g_idx),
        g_bcol=(None if g_bcol is None
                else jnp.asarray(g_bcol.reshape(sp, -1))),
        g_width=0 if g_idx is None else g_max,
    )


def _mapped_product(sbsr: ShardedBlockSparse, mesh, precision,
                    alpha: float, fuse_prev: bool, fuse_plus: bool = False,
                    fuse_plus_dot: bool = False):
    """shard_map'd y = alpha * (L @ x) [+ t_plus] [- t_prev]: activations
    all-gather over "sp", the local (rectangular) kernel computes this
    shard's rows. The seed operands (t_prev: the forward recurrence's
    -T_{k-2}; t_plus: the backward recurrence's +c_{j-1}) are already
    row-sharded like the output, so they stay local. fuse_plus_dot takes
    (gm row-sharded like the output, wT replicated) and computes the
    cotangent seed INSIDE the local kernel (pallas_cheb t_plus_dot)."""
    from .pallas_cheb import _bsr_matmul_impl

    rows_local = sbsr.rows_per_shard
    grouped = sbsr.g_idx is not None

    def local_op(blocks, brow, bcol, first, g_idx=None, g_bcol=None):
        return BlockSparseOperator(
            blocks=blocks[0], block_row=brow[0], block_col=bcol[0],
            first=first[0], n=rows_local, n_pad=rows_local,
            n_pad_cols=sbsr.n_pad,
            g_idx=None if g_idx is None else g_idx[0],
            g_bcol=None if g_bcol is None else g_bcol[0],
            g_width=sbsr.g_width if g_idx is not None else 0)

    op_specs = (P("sp", None, None, None), P("sp", None), P("sp", None),
                P("sp", None))
    if grouped:
        op_specs = op_specs + (P("sp", None, None), P("sp", None))
    n_op = len(op_specs)
    n_seeds = int(fuse_prev) + int(fuse_plus)

    def body(*args):
        ops_args, (x_shard, *seeds) = args[:n_op], args[n_op:]
        x_full = jax.lax.all_gather(x_shard, "sp", axis=0, tiled=True)
        tprev = seeds[0] if fuse_prev else None
        tplus = seeds[1 if fuse_prev else 0] if fuse_plus else None
        tpd = (seeds[n_seeds], seeds[n_seeds + 1]) if fuse_plus_dot else None
        return _bsr_matmul_impl(local_op(*ops_args),
                                x_full, precision, t_prev=tprev,
                                t_plus=tplus, t_plus_dot=tpd, alpha=alpha)

    in_specs = op_specs + (P("sp", "dp"),) * (1 + n_seeds)
    if fuse_plus_dot:
        in_specs = in_specs + (P("sp", "dp"), P(None, None))
    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=P("sp", "dp"), check_vma=False)


def bsr_matmul_sharded(sbsr: ShardedBlockSparse, x2d: jnp.ndarray, mesh,
                      precision=None) -> jnp.ndarray:
    """y = L @ x2d with rows of L (and y) sharded over "sp" and columns of
    x2d sharded over "dp". x2d: [n_pad_global, C_global]; C_global must
    split evenly over dp into panel-aligned chunks (cheb_conv_pallas_sharded
    pads for this)."""
    mapped = _mapped_product(sbsr, mesh, precision, alpha=1.0,
                             fuse_prev=False)
    args = (sbsr.blocks, sbsr.block_row, sbsr.block_col, sbsr.first)
    if sbsr.g_idx is not None:
        args = args + (sbsr.g_idx, sbsr.g_bcol)

    @jax.custom_vjp
    def mm(x):
        return mapped(*args, x)

    def fwd(x):
        return mm(x), None

    def bwd(_, g):
        # L is globally symmetric: dx = L^T g = L g — the same sharded
        # product on the cotangent; no transpose kernel needed
        return (mapped(*args, g),)

    mm.defvjp(fwd, bwd)
    return mm(x2d)


def cheb_step_sharded(sbsr: ShardedBlockSparse, t1: jnp.ndarray,
                      t0: jnp.ndarray, mesh, precision=None) -> jnp.ndarray:
    """Fused sharded recurrence step T_k = 2 L T_{k-1} - T_{k-2} (see
    pallas_cheb.cheb_step): the -T_{k-2} seed is row-sharded like the
    output, so it never crosses the mesh. VJP by symmetry: (2 L g, -g)."""
    op_dtype = sbsr.blocks.dtype
    fused = _mapped_product(sbsr, mesh, precision, alpha=2.0,
                            fuse_prev=True)
    double = _mapped_product(sbsr, mesh, precision, alpha=2.0,
                             fuse_prev=False)
    args = (sbsr.blocks, sbsr.block_row, sbsr.block_col, sbsr.first)
    if sbsr.g_idx is not None:
        args = args + (sbsr.g_idx, sbsr.g_bcol)

    @jax.custom_vjp
    def step(a, b):
        return fused(*args, a, b)

    def fwd(a, b):
        return step(a, b), None

    def bwd(_, g):
        return double(*args, g.astype(op_dtype)), -g

    step.defvjp(fwd, bwd)
    return step(t1, t0)


def _basis_mix_sharded(sbsr: ShardedBlockSparse, mesh, xt: jnp.ndarray,
                       w2: jnp.ndarray, k: int, prec, state_dtype,
                       op_dtype, input_grad: bool = True) -> jnp.ndarray:
    """Sharded basis + stacked mix with the FUSED custom backward (the
    distributed form of pallas_cheb._basis_mix): the adjoint recurrence
    b_{j-1} = 2 L b_j + c_{j-1} - b_{j+1} runs as two-seed sharded kernel
    calls — both seeds are row-sharded like the output, so only b_j itself
    all-gathers over "sp", exactly as in the forward."""
    n_pad, b, f_pad = xt.shape
    f_out = w2.shape[-1]
    c = b * f_pad

    prods = {}
    args = (sbsr.blocks, sbsr.block_row, sbsr.block_col, sbsr.first)
    if sbsr.g_idx is not None:
        args = args + (sbsr.g_idx, sbsr.g_bcol)

    def _mm(a, alpha, p_plus, p_minus, p_plus_dot=None):
        r = lambda t: t.reshape(n_pad, c)
        key = (alpha, p_minus is not None, p_plus is not None,
               p_plus_dot is not None)
        if key not in prods:
            prods[key] = _mapped_product(sbsr, mesh, prec, alpha, key[1],
                                         fuse_plus=key[2],
                                         fuse_plus_dot=key[3])
        seeds = [r(s) for s in (p_minus, p_plus) if s is not None]
        if p_plus_dot is not None:
            seeds.extend(p_plus_dot)
        return prods[key](*args, a.astype(op_dtype).reshape(n_pad, c),
                          *seeds).reshape(n_pad, b, f_pad)

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
            preferred_element_type=jnp.float32)
        return out, txcat

    @jax.custom_vjp
    def f(xt, w2):
        return _forward(xt, w2)[0]

    def fwd(xt, w2):
        # residual = the already-materialized concatenated basis (see
        # pallas_cheb._basis_mix: one wide dW dot, gm streamed once)
        out, txcat = _forward(xt, w2)
        return out, (txcat, w2)

    def bwd(res, g):
        txcat, w2 = res
        gm = g.astype(state_dtype)
        dw = jax.lax.dot_general(
            txcat, gm, (((0, 1), (0, 1)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32
        ).reshape(k, f_pad, f_out).astype(w2.dtype)
        if not input_grad:
            # see pallas_cheb._basis_mix: dead-dx chains inside a
            # custom_vjp are invisible to JAX pruning and XLA DCE
            return jnp.zeros((n_pad, b, f_pad), txcat.dtype), dw
        from .pallas_cheb import FUSED_SEED_DOT

        c_of = lambda j: jax.lax.dot_general(
            gm, w2[j], (((2,), (1,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32).astype(state_dtype)
        dp = mesh.shape["dp"]
        if k == 1:
            dx = c_of(0)
        elif (FUSED_SEED_DOT and f_pad == f_out
              and (c // dp) % f_pad == 0):
            # square mix: cotangent seeds fold into the local kernel
            # (see pallas_cheb._basis_mix); gm is row-sharded like the
            # output, wT replicated. The per-shard column chunk c/dp must
            # itself group into whole (batch item, f) pairs — the global
            # c = b*f divisibility does not imply the local one when
            # dp does not divide b
            gm2 = gm.reshape(n_pad, c)
            wt = jnp.swapaxes(w2, 1, 2)
            u, prev_u = c_of(k - 1), None
            for j in range(k - 1, 1, -1):
                u, prev_u = _mm(u, 2.0, None, prev_u,
                                p_plus_dot=(gm2, wt[j - 1])), u
            dx = _mm(u, 1.0, None, prev_u, p_plus_dot=(gm2, wt[0]))
        else:
            cs = [c_of(j) for j in range(k)]
            u, prev_u = cs[k - 1], None
            for j in range(k - 1, 1, -1):
                u, prev_u = _mm(u, 2.0, cs[j - 1], prev_u), u
            dx = _mm(u, 1.0, cs[0], prev_u)
        return dx.astype(state_dtype), dw

    f.defvjp(fwd, bwd)
    return f(xt, w2)


def cheb_conv_pallas_sharded(x: jnp.ndarray, op, weight: jnp.ndarray,
                             bias: jnp.ndarray | None, precision=None,
                             input_grad: bool = True) -> jnp.ndarray:
    """Chebyshev conv with the vertex-sharded kernel: the recurrence state
    lives row-sharded over "sp" (and batch-column-sharded over "dp"); each
    propagation all-gathers activations over ICI and computes local rows.
    Mirrors cheb_conv_pallas's stacked-mix structure."""
    sbsr: ShardedBlockSparse = op.bsr_sp
    mesh = op.mesh
    b, n, f_in = x.shape
    k, _, f_out = weight.shape
    n_pad = sbsr.n_pad
    dp = mesh.shape["dp"]

    # pad features so each dp shard's column chunk is panel-aligned
    f_pad = f_in
    while (b * f_pad) % (dp * 128) != 0:
        f_pad += 1

    from .pallas_cheb import _clamp_bf16_precision
    prec = _clamp_bf16_precision(precision, sbsr.blocks.dtype)
    # with bf16 operator blocks the kernel emits bf16 (pallas_cheb
    # BF16_STATE), so the recurrence state stays bf16 end-to-end — the
    # all-gather then also moves half the bytes over ICI; f32 blocks
    # (HIGHEST/HIGH parity modes) keep an f32 state
    from .pallas_cheb import BF16_STATE

    op_dtype = sbsr.blocks.dtype
    state_dtype = (jnp.bfloat16
                   if BF16_STATE and op_dtype == jnp.bfloat16
                   and prec != jax.lax.Precision.HIGH else jnp.float32)
    xt = jnp.transpose(x, (1, 0, 2)).astype(state_dtype)  # [N, B, F]
    xt = jnp.pad(xt, ((0, n_pad - n), (0, 0), (0, f_pad - f_in)))
    w = jnp.pad(weight.astype(state_dtype),
                ((0, 0), (0, f_pad - f_in), (0, 0)))
    from .pallas_cheb import FUSED_BWD

    if FUSED_BWD:
        out = _basis_mix_sharded(sbsr, mesh, xt, w, k, prec, state_dtype,
                                 op_dtype, input_grad=input_grad)
    else:
        c = b * f_pad
        prop = lambda t: bsr_matmul_sharded(
            sbsr, t.astype(op_dtype).reshape(n_pad, c), mesh,
            precision=prec).reshape(n_pad, b, f_pad)
        step = lambda t1, t0: cheb_step_sharded(
            sbsr, t1.astype(op_dtype).reshape(n_pad, c),
            t0.reshape(n_pad, c), mesh,
            precision=prec).reshape(n_pad, b, f_pad)

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

    out = out[:n].astype(state_dtype)
    out = jnp.transpose(out, (1, 0, 2))  # [B, N, F_out]
    if bias is not None:
        out = out + bias
    return out
