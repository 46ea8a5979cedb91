"""Same-session A/B of the resident whole-recurrence kernels vs the
per-order kernels on the level-0 conv (fwd and fwd+grad), real chip.

The relay's dispatch throughput shifts ~±30% between windows, so both
variants run back-to-back in ONE process with the same scan discipline as
benchmarks/step_anatomy.py. Usage:

    python benchmarks/resident_ab.py [--batch-size 128]
        [--compute-dtype bfloat16] [--iters 30] [--polygon-order 6]
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
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--polygon-order", type=int, default=6)
    ap.add_argument("--f-in", type=int, default=16)
    ap.add_argument("--f-out", type=int, default=16)
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
    from meshvae_tpu.ops import pallas_resident as pr
    from meshvae_tpu.ops.cheb import cheb_conv, resolve_precision

    hier = load_or_build_hierarchy(load_obj(TEMPLATE), [4, 4, 4, 4])
    op_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                else jnp.float32)
    ops = build_operators(hier, dtype=op_dtype, cheb_method="pallas",
                          pool_method="gather")
    op = ops.lap[0]
    prec = resolve_precision(args.precision)
    state = op_dtype if args.compute_dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    b, n = args.batch_size, hier.levels[0]
    k = args.polygon_order
    x = jnp.asarray(rng.standard_normal((b, n, args.f_in)),
                    jnp.float32).astype(state)
    w = jnp.asarray(0.1 * rng.standard_normal((k, args.f_in, args.f_out)),
                    jnp.float32).astype(state)
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
        print(f"  {name:22s} {ms:8.3f} ms/iter  (check={out:.6g})",
              file=sys.stderr)
        return ms

    # one function object PER VARIANT: jax.jit caches on function identity,
    # so re-timing the same closure after flipping a module flag silently
    # reuses the first variant's executable (cost a bogus A/B in round 3)
    def make_fwd_scan(tag):
        def fwd_scan(xx, ww):
            def step(t, _):
                out = cheb_conv(t, op, ww, None, method="pallas",
                                precision=prec)
                # chain iterations through the timed tensor (XLA hoists
                # loop-invariant bodies) at negligible extra work
                return t + out[..., : t.shape[-1]] * 1e-6, None
            tN, _ = jax.lax.scan(step, xx, jnp.arange(S))
            return jnp.sum(tN.astype(jnp.float32))
        fwd_scan.__name__ = f"fwd_scan_{tag}"
        return fwd_scan

    def make_grad_scan(tag):
        def grad_scan(xx, ww):
            def loss(w_, t):
                out = cheb_conv(t, op, w_, None, method="pallas",
                                precision=prec)
                return jnp.sum(jnp.square(out.astype(jnp.float32)))

            def step(w_, _):
                l, gw = jax.value_and_grad(loss)(w_, xx)
                return w_ + gw.astype(w_.dtype) * 1e-9, None
            wN, _ = jax.lax.scan(step, ww, jnp.arange(S))
            return jnp.sum(wN.astype(jnp.float32))
        grad_scan.__name__ = f"grad_scan_{tag}"
        return grad_scan

    results = {}
    for flag, tag in ((False, "per_order"), (True, "resident")):
        pr.RESIDENT = flag
        panel = pr.resident_plan(op.bsr, b * args.f_in, state, prec)
        print(f"--- {tag} (resident_plan panel = {panel})", file=sys.stderr)
        results[f"fwd_{tag}"] = timed(f"fwd {tag}", make_fwd_scan(tag), x, w)
        results[f"grad_{tag}"] = timed(f"grad {tag}", make_grad_scan(tag),
                                       x, w)

    results["fwd_speedup"] = results["fwd_per_order"] / results["fwd_resident"]
    results["grad_speedup"] = (results["grad_per_order"]
                               / results["grad_resident"])
    meta = {"batch_size": b, "compute_dtype": args.compute_dtype,
            "precision": args.precision, "k": k,
            "f_in": args.f_in, "f_out": args.f_out, "iters": S}
    print(json.dumps({**results, **meta}))


if __name__ == "__main__":
    main()
