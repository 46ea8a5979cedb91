"""Mesh pool/unpool: applying a precomputed sampling matrix P per batch item.

out = P @ x, the math of the reference's `SurfacePool`
(/root/reference/nn/pool.py:13-23) and crecon's functional `Pool`
(/root/reference/models/cheb_cls.py:22-27). On TPU the downsampling matrices
are pure row selections (one-hot rows) -> a single gather; barycentric
upsampling rows have <= 3 entries -> 3 weighted gathers. A dense-matmul path
is kept for testing and as an XLA fallback.

The gather path carries a custom VJP: autodiff's transpose of a gather is
a scatter-add, which XLA lowers through a sort on TPU — measured as the
dominant backward-glue cost of the small-batch train step (8 pools per
forward, each a full-activation scatter in the backward). The backward
instead applies the precomputed ELL form of P^T (PoolOperator.t_idx/t_w):
dx = P^T @ g as weighted gathers, exactly the same sums in a
deterministic, MXU/VPU-friendly form.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .cheb import resolve_precision
from .graph import PoolOperator

# A/B knob: 0 restores autodiff's scatter-add backward (same math).
TRANSPOSE_GRAD = bool(int(os.environ.get("MESHVAE_POOL_TGRAD", "1")))


def _gather_apply(x: jnp.ndarray, idx: jnp.ndarray,
                  w: jnp.ndarray) -> jnp.ndarray:
    """sum_d w[:, d] * x[:, idx[:, d]] — padded slots carry weight 0."""
    if idx.shape[1] == 1:
        return jnp.take(x, idx[:, 0], axis=1) * w[None, :, 0, None]
    acc = None
    for d in range(idx.shape[1]):
        term = w[None, :, d, None] * jnp.take(x, idx[:, d], axis=1)
        acc = term if acc is None else acc + term
    return acc


def _bsr_transpose_apply(g: jnp.ndarray, t_bsr, out_n: int,
                         out_dtype) -> jnp.ndarray:
    """dx = P^T @ g through the block-sparse SpMM kernel (rectangular
    operator: output rows = pool inputs, columns = pool outputs)."""
    from .pallas_cheb import _COL_PANEL, _bsr_matmul_impl

    b, n_out, f = g.shape
    f_pad = f
    while (b * f_pad) % _COL_PANEL != 0:
        f_pad += 1
    gt = jnp.transpose(g, (1, 0, 2)).astype(t_bsr.blocks.dtype)
    gt = jnp.pad(gt, ((0, t_bsr.n_pad_cols - n_out), (0, 0),
                      (0, f_pad - f)))
    # bf16 blocks accumulate f32 on the MXU already; HIGHEST (fp32
    # contract precision) on bf16 operands does not lower on Mosaic
    # ("Bad lhs type") — resolve_precision(None) would default there
    prec = (jax.lax.Precision.HIGHEST
            if t_bsr.blocks.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = _bsr_matmul_impl(t_bsr, gt.reshape(t_bsr.n_pad_cols, b * f_pad),
                         precision=prec)
    y = y.reshape(t_bsr.n_pad, b, f_pad)[:out_n, :, :f]
    return jnp.transpose(y, (1, 0, 2)).astype(out_dtype)


def _use_kernel_transpose() -> bool:
    """The BSR transpose backward needs the Pallas kernel: real TPUs
    always qualify; the CPU backend only under interpret mode (tests).
    Otherwise the backward falls back to ELL gathers / autodiff."""
    from . import pallas_cheb

    return jax.default_backend() == "tpu" or pallas_cheb.INTERPRET


def pool_apply(x: jnp.ndarray, pool: PoolOperator, method: str = "gather",
               precision=None) -> jnp.ndarray:
    """x: [B, N_in, F] -> [B, N_out, F]."""
    if method == "dense":
        return jnp.einsum("mn,bnf->bmf", pool.dense, x,
                          precision=resolve_precision(precision))
    if method != "gather":
        raise ValueError(f"unknown pool method: {method}")

    from .pallas_cheb import _COL_PANEL

    # size gate shares the kernel's column-panel width: below one panel of
    # b*f columns the BSR kernel would pad most of its work away
    use_bsr = (pool.t_bsr is not None
               and x.shape[0] * x.shape[2] >= _COL_PANEL
               and _use_kernel_transpose())
    if not TRANSPOSE_GRAD or (pool.t_idx is None and not use_bsr):
        return _gather_apply(x, pool.idx, pool.w)  # autodiff backward

    @jax.custom_vjp
    def apply(x_):
        return _gather_apply(x_, pool.idx, pool.w)

    def fwd(x_):
        return apply(x_), None

    def bwd(_, g):
        if use_bsr:
            return (_bsr_transpose_apply(g, pool.t_bsr, pool.n_in,
                                         x.dtype),)
        return (_gather_apply(g, pool.t_idx,
                              pool.t_w).astype(x.dtype),)

    apply.defvjp(fwd, bwd)
    return apply(x)
