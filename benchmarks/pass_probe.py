"""What limits the BSR SpMM kernel: MXU pass rate, HBM bandwidth, or
per-grid-step overhead? Same-session probes on the level-0 operator:

  base       bsr_matmul, real blocks (nb ~122), panel from MAX_PANEL
  half       same kernel, HALF the blocks (wrong math, right shape):
             time/blocks halving => pass-/step-bound, flat => bandwidth
  xla_dense  jnp.einsum on the dense operator (MXU sustained reference)

Usage: python benchmarks/pass_probe.py [--batch-size 128]
           [--compute-dtype bfloat16] [--iters 300]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--precision", default="default")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--f", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import TEMPLATE
    from meshvae_tpu.mesh.hierarchy import load_or_build_hierarchy
    from meshvae_tpu.mesh.io import load_obj
    from meshvae_tpu.models.operators import build_operators
    from meshvae_tpu.ops.cheb import resolve_precision
    from meshvae_tpu.ops.pallas_cheb import _bsr_matmul_impl

    hier = load_or_build_hierarchy(load_obj(TEMPLATE), [4, 4, 4, 4])
    op_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                else jnp.float32)
    ops = build_operators(hier, dtype=op_dtype, cheb_method="pallas",
                          pool_method="gather")
    bsr = ops.lap[0].bsr
    prec = resolve_precision(args.precision)

    rng = np.random.default_rng(0)
    c = args.batch_size * args.f
    x = jnp.asarray(rng.standard_normal((bsr.n_pad, c)),
                    jnp.float32).astype(op_dtype)
    S = args.iters

    def timed(name, fn, *fn_args):
        jfn = jax.jit(fn)
        out = float(np.asarray(jfn(*fn_args)).ravel()[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = float(np.asarray(jfn(*fn_args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        ms = best / S * 1e3
        print(f"  {name:12s} {ms:8.3f} ms/iter  (check={out:.6g})",
              file=sys.stderr)
        return ms

    def spmm_scan(b):
        def fn(t0):
            def step(t, _):
                y = _bsr_matmul_impl(b, t, prec)
                return y.astype(t.dtype), None
            tN, _ = jax.lax.scan(step, t0, jnp.arange(S))
            return jnp.sum(tN.astype(jnp.float32))
        return fn

    results = {"nb": bsr.num_blocks, "c": c}
    results["base"] = timed("base", spmm_scan(bsr), x)

    nb2 = bsr.num_blocks // 2
    # keep every second block: roughly preserves row coverage
    sel = np.arange(0, bsr.num_blocks, 2)
    # null the grouped metadata too: stale g_idx would silently dispatch
    # the grouped kernel against the ORIGINAL block count
    half = dataclasses.replace(
        bsr, blocks=bsr.blocks[sel], block_row=bsr.block_row[sel],
        block_col=bsr.block_col[sel],
        first=jnp.asarray(np.ones(len(sel), np.int32)),
        col_order=None, block_row_c=None, block_col_c=None,
        g_idx=None, g_bcol=None, g_width=0)
    results["half"] = timed("half", spmm_scan(half), x)
    results["nb_half"] = int(len(sel))

    # build dense from blocks on host (pull the metadata once, not per block)
    dn = np.zeros((bsr.n_pad, bsr.n_pad), np.float32)
    blocks = np.asarray(bsr.blocks, np.float32)
    block_row = np.asarray(bsr.block_row)
    block_col = np.asarray(bsr.block_col)
    for i in range(bsr.num_blocks):
        r = int(block_row[i]) * 128
        cc = int(block_col[i]) * 128
        dn[r:r + 128, cc:cc + 128] += blocks[i]
    dense = jnp.asarray(dn).astype(op_dtype)

    def dense_scan(t0):
        def step(t, _):
            y = jnp.dot(dense, t, precision=prec,
                        preferred_element_type=jnp.float32)
            return y.astype(t.dtype), None
        tN, _ = jax.lax.scan(step, t0, jnp.arange(S))
        return jnp.sum(tN.astype(jnp.float32))
    results["xla_dense"] = timed("xla_dense", dense_scan, x)

    meta = {"batch_size": args.batch_size,
            "compute_dtype": args.compute_dtype, "iters": S}
    print(json.dumps({**results, **meta}))


if __name__ == "__main__":
    main()
