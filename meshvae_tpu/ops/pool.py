"""Mesh pool/unpool: applying a precomputed sampling matrix P per batch item.

out = P @ x, the math of the reference's `SurfacePool`
(/root/reference/nn/pool.py:13-23) and crecon's functional `Pool`
(/root/reference/models/cheb_cls.py:22-27). On TPU the downsampling matrices
are pure row selections (one-hot rows) -> a single gather; barycentric
upsampling rows have <= 3 entries -> 3 weighted gathers. A dense-matmul path
is kept for testing and as an XLA fallback.
"""
from __future__ import annotations

import jax.numpy as jnp

from .cheb import resolve_precision
from .graph import PoolOperator


def pool_apply(x: jnp.ndarray, pool: PoolOperator, method: str = "gather",
               precision=None) -> jnp.ndarray:
    """x: [B, N_in, F] -> [B, N_out, F]."""
    if method == "dense":
        return jnp.einsum("mn,bnf->bmf", pool.dense, x,
                          precision=resolve_precision(precision))
    if method != "gather":
        raise ValueError(f"unknown pool method: {method}")

    if pool.is_selection:
        sel = pool.idx[:, 0]
        gathered = jnp.take(x, sel, axis=1)
        return gathered * pool.w[None, :, 0, None]

    acc = None
    for d in range(pool.idx.shape[1]):
        term = pool.w[None, :, d, None] * jnp.take(x, pool.idx[:, d], axis=1)
        acc = term if acc is None else acc + term
    return acc
