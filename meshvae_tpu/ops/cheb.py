"""Chebyshev spectral graph convolution — the hot op.

Computes out = sum_k T_k(L_hat) x @ W_k (+ bias) with the recurrence
T_0 = x, T_1 = L_hat x, T_k = 2 L_hat T_{k-1} - T_{k-2}, exactly the math of
the reference's `ChebConv_batch.forward` (/root/reference/nn/conv.py:557-581)
but expressed as static-topology tensor algebra instead of scatter message
passing:

  * `method="dense"`: the propagation L_hat @ x is a dense [N, N] x [N, B*F]
    matmul — lands on the MXU, lets XLA fuse the channel-mix matmuls and the
    K-term accumulation.
  * `method="ell"`: gather-based SpMM over the padded neighbor list —
    bandwidth-bound, wins when N is large and the dense operator's O(N^2)
    zero-FLOPs dominate.
  * `method="pallas"`: fused Pallas kernel (see pallas_cheb.py) keeping the
    recurrence operands in VMEM.

x: [B, N, F_in]; weight: [K, F_in, F_out]; bias: [F_out] or None.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .graph import GraphOperator

_DEFAULT_METHOD = "dense"

# benchmarking A/B knob: set MESHVAE_FORCE_INPUT_GRAD=1 to make every conv
# emit the full dx backward even where the caller declared it dead
import os as _os
_FORCE_INPUT_GRAD = bool(int(_os.environ.get("MESHVAE_FORCE_INPUT_GRAD", "0")))

_PRECISION_NAMES = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def resolve_precision(precision):
    """Framework default is true-f32 matmuls (Precision.HIGHEST): XLA's
    DEFAULT on TPU (and this CPU build) truncates matmul operands to
    bfloat16, which breaks the <1e-4 parity targets. Pass "default" (or use
    bfloat16 compute_dtype) explicitly for the fast path."""
    if precision is None or precision == "":
        return jax.lax.Precision.HIGHEST
    if isinstance(precision, str):
        return _PRECISION_NAMES[precision.lower()]
    return precision


def propagate_dense(op: GraphOperator, x: jnp.ndarray,
                    precision=None) -> jnp.ndarray:
    """L_hat @ x over the vertex dim: [B, N, F] -> [B, N, F]."""
    return jnp.einsum("nm,bmf->bnf", op.dense, x,
                      precision=resolve_precision(precision))


def propagate_ell(op: GraphOperator, x: jnp.ndarray,
                  precision=None) -> jnp.ndarray:
    """Gather-based SpMM: out[b, i] = sum_d w[i, d] * x[b, idx[i, d]].

    One [B, N, D, F] neighbor gather + a weighted reduction over D, instead
    of D separate gathers — same HBM bytes, but a handful of HLOs per
    propagation rather than O(max_degree), which keeps compile time flat in
    the degree (the unrolled form failed to compile a 50-step bs128 scan
    within 20 minutes; see BASELINE.md Round 3)."""
    gathered = jnp.take(x, op.ell_idx, axis=1)        # [B, N, D, F]
    return jnp.einsum("nd,bndf->bnf", op.ell_w, gathered,
                      precision=resolve_precision(precision))


def cheb_conv(
    x: jnp.ndarray,
    op: GraphOperator,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    method: str = _DEFAULT_METHOD,
    precision=None,
    input_grad: bool = True,
) -> jnp.ndarray:
    """input_grad=False declares that no gradient will ever be demanded
    w.r.t. x (first conv on raw data / frozen features): the pallas path's
    custom backward then skips its dx recurrence — K-1 kernel calls that
    JAX pruning and XLA DCE cannot remove through an opaque custom_vjp
    (dense/ell are plain HLOs, where autodiff prunes automatically and
    the flag is a no-op). Setting it on a conv whose input DOES need
    gradients silently zeroes them — caller contract."""
    if _FORCE_INPUT_GRAD:   # A/B knob: disable the dx-skip optimization
        input_grad = True
    if method == "pallas_fused":
        raise ValueError(
            "cheb_method=pallas_fused was retired: it is strictly dominated "
            "by 'pallas' (see ops/pallas_fused.py docstring and BASELINE.md "
            "for the measurements). Use 'pallas', or 'dense' with "
            "compute_dtype=bfloat16 for maximum throughput.")

    k = weight.shape[0]
    prec = resolve_precision(precision)
    dot = lambda t, w: jnp.einsum("bnf,fg->bng", t, w, precision=prec)

    if op.active_n < op.n:
        # Operator rows/cols beyond active_n are empty (the embedded
        # final-conv quirk; the operand stores only the [active_n, active_n]
        # corner — embed_operator): those vertices sit at eigenvalue 0,
        # where the Chebyshev recurrence degenerates to T_k(0) =
        # (1, 0, -1, 0, ...), i.e. a single matmul with sum_k T_k(0) W_k —
        # so run the full recurrence (any method) on the active corner only
        # and one matmul on the rest.
        corner = GraphOperator(dense=op.dense, ell_idx=op.ell_idx,
                               ell_w=op.ell_w, bsr=op.bsr, n=op.active_n,
                               bsr_sp=op.bsr_sp, mesh=op.mesh)
        inner = cheb_conv(x[:, : op.active_n], corner, weight, bias,
                          method=method, precision=precision,
                          input_grad=input_grad)
        coeffs = [1.0 if i % 4 == 0 else (-1.0 if i % 4 == 2 else 0.0)
                  for i in range(k)]
        w_eff = sum(c * weight[i] for i, c in enumerate(coeffs) if c != 0.0)
        rest = dot(x[:, op.active_n:], w_eff.astype(x.dtype))
        if bias is not None:
            rest = rest + bias
        return jnp.concatenate([inner.astype(rest.dtype), rest], axis=1)

    if method == "pallas":
        if op.bsr_sp is not None:
            from .pallas_shard import cheb_conv_pallas_sharded

            return cheb_conv_pallas_sharded(x, op, weight, bias,
                                            precision=precision,
                                            input_grad=input_grad)
        if op.bsr is not None:
            from .pallas_cheb import cheb_conv_pallas

            return cheb_conv_pallas(x, op, weight, bias, precision=precision,
                                    input_grad=input_grad)
        # hybrid dispatch: levels below graph.PALLAS_MIN_N materialize a
        # dense operator instead of BSR (build_operators/layouts_for_method)
        # — the whole operator is tiny and XLA fuses the propagation into
        # the recurrence, where a Pallas call would pay launch overhead and
        # pad every level to 128 rows. Only that case may fall through:
        # a missing dense layout means the operator was built for another
        # method (e.g. cheb_method="ell") and must fail loudly, not crash
        # inside the dense einsum with an opaque None error.
        if op.dense is None:
            raise ValueError(
                "pallas layouts not materialized for this operator "
                f"(n={op.n}): it was built without BSR blocks and has no "
                "dense fallback — rebuild the operators with "
                "cheb_method='pallas' (build_operators)")
        method = "dense"

    if method == "dense":
        prop = lambda t: propagate_dense(op, t, precision=precision)
    elif method == "ell":
        prop = lambda t: propagate_ell(op, t, precision=precision)
    else:
        raise ValueError(f"unknown cheb method: {method}")

    # run the recurrence, then mix every order in ONE matmul: concatenating
    # the T_k along features turns K narrow [.., F]@[F, F_out] dots into a
    # single [.., K*F]@[K*F, F_out] — a wider contraction the MXU likes, and
    # one dW matmul instead of K in the backward pass
    txs = [x]
    if k > 1:
        txs.append(prop(x))
    for _ in range(2, k):
        txs.append(2.0 * prop(txs[-1]) - txs[-2])

    f_in = x.shape[-1]
    out = dot(jnp.concatenate(txs, axis=-1),
              weight.reshape(k * f_in, weight.shape[-1]))

    if bias is not None:
        out = out + bias
    return out
