"""Fused Chebyshev conv kernel: block-sparse propagation + in-kernel
channel mix. RETIRED from the `cheb_method` surface — kept as a documented
negative result.

Honest measurement (BASELINE.md, docs/architecture.md) shows it strictly
dominated by the plain `pallas` kernel: bs16 3,106 vs 3,079 (tie), bs128
4,108 vs 4,802, 20k-vertex 254 vs 286 meshes/sec. The per-k HBM accumulator
round-trip (read+write at C_out width) outweighs the single T_k re-read it
saves. The tempting fix — k innermost over a row-block with a VMEM scratch
accumulator, spilling once per row — cannot work for this op: the SpMM mixes
rows globally, so producing any row-block of T_{k+1} requires ALL rows of
T_k; k cannot be innermost without keeping full-height T panels resident
(breaks past ~8k vertices). The module stays importable (and tested) so the
design record is executable, but it is not a selectable config method.

Original design:

The plain pallas path materializes every T_k to HBM and re-reads it for the
channel mix (out += T_k @ W_k), tripling T-traffic. This kernel computes
T_k = alpha * L @ T_{k-1} + beta * T_{k-2} AND accumulates the mix
contribution into the output in the same pass: at the last block of each
output row, the finished T_k row-block multiplies a block-diagonal weight
kron(I_batchchunk, W_k) (so a [row, B_chunk * F] panel mixes in ONE MXU
matmul without lane-splitting reshapes) and adds into the HBM-resident
accumulator via input/output aliasing. Net: T_k is written once and read
once (by the next recurrence step) — the mix costs no extra HBM traffic.

Backward is a custom VJP in closed form: dW_k = <T_k, g> contractions over
the saved T-stack, and dx via the adjoint recurrence
a_j = g_j + 2 L a_{j+1} - a_{j+2} (L symmetric; a_0 picks up L a_1 - a_2),
each L-apply reusing the plain block-sparse kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_cheb
from .block_sparse import BLOCK, BlockSparseOperator


def _pick_panel(c: int) -> int:
    panel = pallas_cheb._COL_PANEL
    while panel * 2 <= min(c, 1024) and c % (panel * 2) == 0:
        panel *= 2
    return panel


def _make_fused_kernel(alpha: float, use_tm2: bool, precision):
    def kernel(brow_ref, bcol_ref, first_ref, last_ref,
               l_ref, x_ref, tm2_ref, wblk_ref, acc_ref,
               t_out_ref, mix_ref):
        b = pl.program_id(1)
        contrib = alpha * jnp.dot(l_ref[0], x_ref[:],
                                  preferred_element_type=jnp.float32,
                                  precision=precision)

        @pl.when(first_ref[b] == 1)
        def _():
            if use_tm2:
                t_out_ref[:] = contrib - tm2_ref[:]
            else:
                t_out_ref[:] = contrib

        @pl.when(first_ref[b] == 0)
        def _():
            t_out_ref[:] = t_out_ref[:] + contrib

        @pl.when(last_ref[b] == 1)
        def _():
            mix_ref[:] = acc_ref[:] + jnp.dot(
                t_out_ref[:], wblk_ref[:],
                preferred_element_type=jnp.float32, precision=precision)

        @pl.when(last_ref[b] == 0)
        def _():
            mix_ref[:] = acc_ref[:]

    return kernel


def _fused_step(bsr: BlockSparseOperator, t_prev: jnp.ndarray,
                t_prev2: jnp.ndarray, wblk: jnp.ndarray, acc: jnp.ndarray,
                alpha: float, use_tm2: bool, precision):
    """One recurrence step: (T_k [n_pad, C], acc' [n_pad, C_out]).

    wblk: [panel, panel_out] — the same block-diagonal weight tile serves
    every column panel (panels differ only in which batch chunk they hold).
    """
    n_pad, c = t_prev.shape
    c_out = acc.shape[1]
    nb = bsr.num_blocks
    last = jnp.concatenate([bsr.first[1:], jnp.ones((1,), bsr.first.dtype)])

    panel = _pick_panel(c)
    panels = c // panel
    panel_out = (c_out * panel) // c
    assert wblk.shape == (panel, panel_out), (wblk.shape, panel, panel_out)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(panels, nb),
        in_specs=[
            pl.BlockSpec((1, BLOCK, BLOCK),
                         lambda j, b, br, bc, fr, la: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, panel),
                         lambda j, b, br, bc, fr, la: (bc[b], j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, panel),
                         lambda j, b, br, bc, fr, la: (br[b], j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((panel, panel_out),
                         lambda j, b, br, bc, fr, la: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, panel_out),
                         lambda j, b, br, bc, fr, la: (br[b], j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK, panel),
                         lambda j, b, br, bc, fr, la: (br[b], j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, panel_out),
                         lambda j, b, br, bc, fr, la: (br[b], j),
                         memory_space=pltpu.VMEM),
        ),
    )
    # aliasing: input indices count scalar-prefetch args first; acc is the
    # 9th positional input (index 8), aliased onto output 1 (the mix)
    t_k, acc_out = pl.pallas_call(
        _make_fused_kernel(alpha, use_tm2, precision),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, c_out), jnp.float32),
        ),
        input_output_aliases={8: 1},
        interpret=pallas_cheb.INTERPRET,
    )(bsr.block_row, bsr.block_col, bsr.first, last,
      bsr.blocks, t_prev, t_prev2, wblk, acc)
    return t_k, acc_out


def _pad_feature(b: int, f: int) -> int:
    """Smallest power-of-two f_pad >= f with (b * f_pad) % COL_PANEL == 0 —
    power-of-two so whole batch chunks tile a column panel exactly."""
    f_pad = 1
    while f_pad < f:
        f_pad *= 2
    while (b * f_pad) % pallas_cheb._COL_PANEL != 0:
        f_pad *= 2
    return f_pad


def cheb_conv_fused(x: jnp.ndarray, op, weight: jnp.ndarray,
                    bias: jnp.ndarray | None,
                    precision=None) -> jnp.ndarray:
    """Chebyshev conv with the fused propagate+mix kernel.

    x: [B, N, F_in] -> [B, N, F_out]."""
    from .cheb import resolve_precision

    bsr: BlockSparseOperator = op.bsr
    b, n, f_in = x.shape
    k = weight.shape[0]
    f_out = weight.shape[2]
    # the operator's padding, not roundup(n, BLOCK): to_block_sparse may
    # carry extra zero row-blocks for the multi-row grouped kernel
    n_pad = bsr.n_pad
    f_pad = _pad_feature(b, f_in)
    f_out_pad = _pad_feature(b, f_out)
    prec = resolve_precision(precision)

    xt = jnp.transpose(x, (1, 0, 2)).astype(jnp.float32)
    xt = jnp.pad(xt, ((0, n_pad - n), (0, 0), (0, f_pad - f_in)))
    w = jnp.pad(weight.astype(jnp.float32),
                ((0, 0), (0, f_pad - f_in), (0, f_out_pad - f_out)))
    x2d = xt.reshape(n_pad, b * f_pad)

    c = b * f_pad
    panel = _pick_panel(c)
    b_chunk = panel // f_pad
    assert b_chunk * f_pad == panel, (panel, f_pad)
    eye = jnp.eye(b_chunk, dtype=jnp.float32)

    @jax.custom_vjp
    def fused(x2d, w):
        out, _ = _fwd(x2d, w)
        return out

    def _fwd(x2d, w):
        wblks = [jnp.kron(eye, w[i]) for i in range(k)]
        acc = jnp.dot(
            x2d.reshape(n_pad, b, f_pad), w[0], precision=prec,
            preferred_element_type=jnp.float32).reshape(n_pad, b * f_out_pad)
        t_stack = []
        tkm1 = tkm2 = x2d
        if k > 1:
            t1, acc = _fused_step(bsr, x2d, x2d, wblks[1], acc,
                                  alpha=1.0, use_tm2=False, precision=prec)
            t_stack.append(t1)
            tkm1, tkm2 = t1, x2d
        for i in range(2, k):
            tk, acc = _fused_step(bsr, tkm1, tkm2, wblks[i], acc,
                                  alpha=2.0, use_tm2=True, precision=prec)
            t_stack.append(tk)
            tkm1, tkm2 = tk, tkm1
        return acc, (x2d, tuple(t_stack), w)

    def _vjp_fwd(x2d, w):
        return _fwd(x2d, w)

    def _vjp_bwd(res, g):
        x2d_r, t_stack, w = res
        g3 = g.reshape(n_pad, b, f_out_pad)

        def as3(t2d):
            return t2d.reshape(n_pad, b, f_pad)

        contract = lambda t3, gg: jnp.einsum(
            "nbf,nbg->fg", t3, gg, precision=prec)
        mix_back = lambda gg, wk: jnp.einsum(
            "nbg,fg->nbf", gg, wk, precision=prec)

        t3 = [as3(x2d_r)] + [as3(t) for t in t_stack]  # T_0 .. T_{k-1}
        dw = jnp.stack([contract(t3[i], g3) for i in range(k)])

        # cotangents of each T_j from the mix, back in the C-layout
        g_t = [mix_back(g3, w[j]).reshape(n_pad, c) for j in range(k)]

        # adjoint recurrence (top-down): a_j = g_j + 2 L a_{j+1} - a_{j+2}
        a_next = jnp.zeros_like(x2d_r)   # a_{j+2}
        a_cur = jnp.zeros_like(x2d_r)    # a_{j+1}
        for j in range(k - 1, 0, -1):
            a_j = g_t[j]
            if j < k - 1:
                a_j = a_j + 2.0 * pallas_cheb.bsr_matmul(bsr, a_cur,
                                                         precision=prec)
            if j < k - 2:
                a_j = a_j - a_next
            a_next, a_cur = a_cur, a_j
        dx = g_t[0]
        if k > 1:
            dx = dx + pallas_cheb.bsr_matmul(bsr, a_cur, precision=prec)
        if k > 2:
            dx = dx - a_next
        return dx, dw

    fused.defvjp(_vjp_fwd, _vjp_bwd)

    out2d = fused(x2d, w)
    out = out2d.reshape(n_pad, b, f_out_pad)[:n, :, :f_out]
    out = jnp.transpose(out, (1, 0, 2))
    if bias is not None:
        out = out + bias
    return out
