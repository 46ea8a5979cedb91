"""Probe: what do the [B,N,F] <-> [N,B,F] transposes around the Pallas
conv cost on-chip?

cheb_conv_pallas takes batch-major [B, N, F] (the model's layout) and
transposes to vertex-major [N, B, F] for the kernel, then back — two
materialized full-activation copies per conv (a Pallas custom call needs
the physical layout; XLA cannot fuse through it). If the whole network
kept activations vertex-major those copies would vanish. This probe times
a chained scan of the level-0 conv in both forms to size that win before
committing to the model-wide layout change.

MEASURED (v5e, bs128 bf16, 30-iter scan, same window): batch_major
2.258 ms/iter vs vertex_major 2.250 ms/iter — 0.4%, inside noise. XLA
folds the transposes into the pad/cast copies that bracket the kernel
call anyway, so the model-wide vertex-major layout change buys nothing;
the model keeps its reference-shaped [B, N, F] API. (Executable negative
result, same standard as ops/pallas_fused.py.)

Usage: python benchmarks/layout_probe.py [--batch-size 128]
           [--compute-dtype bfloat16] [--iters 30]
"""
import argparse
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--polygon-order", type=int, default=6)
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
    from meshvae_tpu.ops.cheb import cheb_conv, resolve_precision
    import meshvae_tpu.ops.pallas_cheb as pc

    hier = load_or_build_hierarchy(load_obj(TEMPLATE), [4, 4, 4, 4])
    op_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                else jnp.float32)
    ops = build_operators(hier, dtype=op_dtype, cheb_method="pallas",
                          pool_method="gather")
    op = ops.lap[0]
    bsr = op.bsr
    prec = resolve_precision(args.precision)
    state_dtype = (jnp.bfloat16
                   if pc.BF16_STATE and op_dtype == jnp.bfloat16
                   and prec != jax.lax.Precision.HIGH else jnp.float32)

    rng = np.random.default_rng(0)
    b, n, k, f = args.batch_size, hier.levels[0], args.polygon_order, 16
    n_pad, f_pad = pc._pad_amounts(n, b, f, n_pad=bsr.n_pad)
    w = jnp.asarray(0.1 * rng.standard_normal((k, f, f)), state_dtype)
    x_bm = jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32)\
        .astype(state_dtype)                      # batch-major model layout
    x_vm = jnp.asarray(rng.standard_normal((n_pad, b, f_pad)),
                       jnp.float32).astype(state_dtype)  # vertex-major padded
    w_pad = jnp.pad(w, ((0, 0), (0, f_pad - f), (0, 0)))
    S = args.iters

    def timed(name, fn, x0):
        jfn = jax.jit(fn)
        out = float(np.asarray(jfn(x0)).ravel()[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = float(np.asarray(jfn(x0)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        ms = best / S * 1e3
        print(f"  {name:14s} {ms:8.3f} ms/iter (check={out:.4g})",
              file=sys.stderr)
        return ms

    def conv_batch_major(x0):
        # the shipping path: transpose in, kernel, transpose out
        def step(x, _):
            y = cheb_conv(x, op, w, None, method="pallas",
                          precision=args.precision)
            return y.astype(x.dtype), None
        xN, _ = jax.lax.scan(step, x0, jnp.arange(S))
        return jnp.sum(xN.astype(jnp.float32))

    def conv_vertex_major(x0):
        # the hypothetical layout: basis+mix directly on [N_pad, B, F_pad]
        def step(x, _):
            y = pc._basis_mix(bsr, x, w_pad, k, prec, state_dtype, op_dtype)
            y = jnp.pad(y, ((0, 0), (0, 0), (0, f_pad - y.shape[-1])))
            return y.astype(x.dtype), None
        xN, _ = jax.lax.scan(step, x0, jnp.arange(S))
        return jnp.sum(xN.astype(jnp.float32))

    results = {
        "batch_major": timed("batch_major", conv_batch_major, x_bm),
        "vertex_major": timed("vertex_major", conv_vertex_major, x_vm),
    }
    meta = {"batch_size": b, "compute_dtype": args.compute_dtype,
            "iters": S, "n0": int(n), "f": f}
    print(json.dumps({"layout_ms_per_iter": results, **meta}))


if __name__ == "__main__":
    main()
