"""Kernel-knob autotuner: sweep the Pallas SpMM tuning knobs on the
CURRENT hardware and report the fastest settings for a workload.

The block-sparse Chebyshev kernel has three performance knobs whose best
values are hardware- and shape-dependent (see docs/architecture.md):

  MAX_PANEL              widest column panel (operator blocks re-stream
                         once per panel; wider = less operator traffic,
                         bigger double-buffered VMEM tiles)
  COLMAJOR_VMEM_BUDGET   VMEM allowance for the col-major resident output
                         panel; 0 forces the row-major orientation
  FUSED_SEED_DOT         in-kernel mix-cotangent seed (backward only)

This tool times the real hot op — a full level-0 ChebConv forward and
forward+backward, scanned on device exactly like benchmarks/step_anatomy
— for every knob combination, in ONE session (the relay's throughput
shifts ~±30% between sessions, so only same-session points are
comparable; see CLAUDE.md). Prints one JSON report with per-combo
ms/iter and the argmin.

Usage:
  python benchmarks/autotune.py [--batch-size 128]
      [--compute-dtype bfloat16] [--k 6] [--features 16] [--iters 30]
      [--panels 512,1024,2048] [--budgets 0,6291456,8388608]
      [--seed-dots 1,0] [--cpu]

On this relay each point pays a ~10 min remote kernel compile; a 3x3
sweep is ~1.5 h. On a local TPU compiles are seconds and the full grid
is cheap.
"""
import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--precision", default="default")
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--features", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--panels", default="512,1024,2048")
    ap.add_argument("--budgets", default="0," + str(6 * 1024 * 1024))
    ap.add_argument("--seed-dots", default="1")
    ap.add_argument("--components", default="fwd,grad",
                    help="comma list of fwd,grad")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend + interpret-mode kernels (plumbing "
                         "check only — timings are meaningless)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import meshvae_tpu.ops.pallas_cheb as pc
    from bench import TEMPLATE
    from meshvae_tpu.mesh.hierarchy import load_or_build_hierarchy
    from meshvae_tpu.mesh.io import load_obj
    from meshvae_tpu.models.operators import build_operators
    from meshvae_tpu.ops.cheb import cheb_conv, resolve_precision

    if args.cpu:
        pc.INTERPRET = True

    hier = load_or_build_hierarchy(load_obj(TEMPLATE), [4, 4, 4, 4])
    op_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                else jnp.float32)
    ops = build_operators(hier, dtype=op_dtype, cheb_method="pallas",
                          pool_method="gather")
    op0 = ops.lap[0]
    prec = resolve_precision(args.precision)
    cdt = op_dtype

    rng = np.random.default_rng(0)
    b, f, k = args.batch_size, args.features, args.k
    n0 = hier.levels[0]
    x = jnp.asarray(rng.standard_normal((b, n0, f)), jnp.float32).astype(cdt)
    w = jnp.asarray(0.1 * rng.standard_normal((k, f, f)),
                    jnp.float32).astype(cdt)
    S = args.iters

    def timed(fn, *fn_args):
        jfn = jax.jit(fn)
        float(np.asarray(jfn(*fn_args)).ravel()[0])  # compile + sync
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(jfn(*fn_args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best / S * 1e3

    def conv_loss(xx, ww):
        out = cheb_conv(xx, op0, ww, None, method="pallas", precision=prec)
        return jnp.sum(out.astype(jnp.float32))

    def fwd_scan(xx, ww):
        def step(acc, _):
            return acc + conv_loss(xx, ww), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(S))
        return acc

    def grad_scan(xx, ww):
        def step(acc, _):
            l, (gx, gw) = jax.value_and_grad(conv_loss, argnums=(0, 1))(
                xx, ww)
            return acc + l + 1e-12 * (
                jnp.sum(gx.astype(jnp.float32) ** 2)
                + jnp.sum(gw.astype(jnp.float32) ** 2)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(S))
        return acc

    scans = {"fwd": fwd_scan, "grad": grad_scan}
    want = [cmp for cmp in args.components.split(",") if cmp in scans]
    panels = [int(v) for v in args.panels.split(",")]
    budgets = [int(v) for v in args.budgets.split(",")]
    seed_dots = [bool(int(v)) for v in args.seed_dots.split(",")]

    saved = (pc.MAX_PANEL, pc.COLMAJOR_VMEM_BUDGET, pc.FUSED_SEED_DOT)
    combos = []
    fwd_cache = {}  # FUSED_SEED_DOT is backward-only: fwd depends on
    #                 (panel, budget) alone — don't pay a ~10 min remote
    #                 compile re-timing an identical forward per sd value
    try:
        for panel, budget, sd in itertools.product(panels, budgets,
                                                   seed_dots):
            pc.MAX_PANEL = panel
            pc.COLMAJOR_VMEM_BUDGET = budget
            pc.FUSED_SEED_DOT = sd
            row = {"max_panel": panel, "colmajor_budget": budget,
                   "fused_seed_dot": sd}
            for cmp in want:
                if cmp == "fwd" and (panel, budget) in fwd_cache:
                    row["fwd_ms"] = fwd_cache[(panel, budget)]
                    continue
                try:
                    row[f"{cmp}_ms"] = timed(scans[cmp], x, w)
                except Exception as exc:  # compile failures are data too
                    row[f"{cmp}_ms"] = None
                    row[f"{cmp}_error"] = f"{type(exc).__name__}: {exc}"[:200]
                if cmp == "fwd":
                    fwd_cache[(panel, budget)] = row["fwd_ms"]
            print(f"  {row}", file=sys.stderr)
            combos.append(row)
    finally:
        pc.MAX_PANEL, pc.COLMAJOR_VMEM_BUDGET, pc.FUSED_SEED_DOT = saved

    report = {
        "workload": {"n0": n0, "batch_size": b, "k": k, "features": f,
                     "compute_dtype": args.compute_dtype,
                     "precision": args.precision, "iters": S},
        "combos": combos,
    }
    for cmp in want:
        scored = [r for r in combos if r.get(f"{cmp}_ms") is not None]
        if scored:
            report[f"best_{cmp}"] = min(scored, key=lambda r: r[f"{cmp}_ms"])
    print(json.dumps(report))


if __name__ == "__main__":
    main()
