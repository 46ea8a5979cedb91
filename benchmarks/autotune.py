"""Kernel-knob autotuner: sweep the Pallas SpMM tuning knobs on the
CURRENT hardware and report the fastest settings for a workload.

The block-sparse Chebyshev kernel has these performance knobs whose best
values are hardware- and shape-dependent (see docs/architecture.md):

  GROUPED                row-grouped kernel (one step per output row-block)
                         vs the per-block kernels
  GROUP_MAX_PANEL        the grouped kernel's widest column panel
  MAX_PANEL              per-block kernels: widest column panel (operator
                         blocks re-stream once per panel)
  COLMAJOR_VMEM_BUDGET   VMEM allowance for the col-major resident output
                         panel; 0 forces the row-major orientation
  FUSED_SEED_DOT         in-kernel mix-cotangent seed (backward only)

Timing discipline (CLAUDE.md gotcha 9): iterations CHAIN through the
timed tensor (a loop-invariant body gets hoisted by XLA and measures
nothing), and every knob combo times a FRESH function object (jax.jit
caches on function identity — reusing one closure across combos reuses
the first combo's executable).

This tool times the real hot op — a full level-0 ChebConv forward and
forward+backward, scanned on device exactly like benchmarks/step_anatomy
— for every knob combination, in ONE session (the relay's throughput
shifts ~±30% between sessions, so only same-session points are
comparable; see CLAUDE.md). Prints one JSON report with per-combo
ms/iter and the argmin.

Usage:
  python benchmarks/autotune.py [--batch-size 128]
      [--compute-dtype bfloat16] [--k 6] [--features 16] [--iters 300]
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
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--panels", default="512,1024,2048")
    ap.add_argument("--budgets", default="0," + str(6 * 1024 * 1024))
    ap.add_argument("--seed-dots", default="1")
    ap.add_argument("--grouped", default="1",
                    help="comma list of 1/0: sweep the grouped kernel "
                         "(panels then drive GROUP_MAX_PANEL)")
    ap.add_argument("--group-rows", default="0",
                    help="comma list for GROUP_ROWS (row-blocks per grid "
                         "step; 0 = auto, 1 = single-row)")
    ap.add_argument("--components", default="fwd,grad",
                    help="comma list of fwd,grad")
    ap.add_argument("--workload", default="5k",
                    choices=["5k", "20k", "80k"],
                    help="template driving the level-0 operator shape "
                         "(scaled templates auto-generate; 20k/80k imply "
                         "K=10 unless --k is given explicitly)")
    ap.add_argument("--group-max-operands", type=int, default=0,
                    help="override pallas_cheb._GROUP_MAX_OPERANDS (the "
                         "multi-row kernel's slab-ref ceiling; needed for "
                         "GROUP_ROWS*g_width > 32, e.g. R=8 at 80k's g=8)")
    ap.add_argument("--group-budget", type=int, default=0,
                    help="override GROUP_VMEM_BUDGET (bytes); large "
                         "GROUP_ROWS values need more per-step VMEM than "
                         "the 12 MB default or the clamp degrades them")
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
    if args.group_max_operands:
        pc._GROUP_MAX_OPERANDS = args.group_max_operands
    if args.group_budget:
        pc.GROUP_VMEM_BUDGET = args.group_budget

    template_path = TEMPLATE
    if args.workload != "5k":
        from meshvae_tpu.tools.make_scaled_template import ensure_template
        template_path = os.path.join(os.path.dirname(TEMPLATE),
                                     f"template{args.workload}.obj")
        ensure_template(template_path)
        if args.k == 6:  # scaled configs run K=10 (files/scaled*.cfg)
            args.k = 10

    hier = load_or_build_hierarchy(load_obj(template_path), [4, 4, 4, 4])
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

    def make_fwd_scan(tag):
        def fwd_scan(xx, ww):
            def step(t, _):
                out = cheb_conv(t, op0, ww, None, method="pallas",
                                precision=prec)
                return t + out * 1e-6, None
            tN, _ = jax.lax.scan(step, xx, jnp.arange(S))
            return jnp.sum(tN.astype(jnp.float32))
        fwd_scan.__name__ = f"fwd_scan_{tag}"
        return fwd_scan

    def make_grad_scan(tag):
        # Differentiate wrt (w, x): a w-only grad never runs the dx
        # adjoint recurrence (dW is one wide contraction over the basis
        # residual), which is where the backward-path knobs
        # (FUSED_SEED_DOT, the fused reverse recurrence) actually live —
        # a w-only sweep measures them as pure noise.
        def grad_scan(xx, ww):
            def loss(w_, t):
                out = cheb_conv(t, op0, w_, None, method="pallas",
                                precision=prec)
                return jnp.sum(jnp.square(out.astype(jnp.float32)))

            def step(carry, _):
                w_, x_ = carry
                l, (gw, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
                    w_, x_)
                return (w_ + gw.astype(w_.dtype) * 1e-9,
                        x_ + gx.astype(x_.dtype) * 1e-9), None
            (wN, xN), _ = jax.lax.scan(step, (ww, xx), jnp.arange(S))
            return jnp.sum(wN.astype(jnp.float32)) + jnp.sum(
                xN.astype(jnp.float32)) * 1e-9
        grad_scan.__name__ = f"grad_scan_{tag}"
        return grad_scan

    scans = {"fwd": make_fwd_scan, "grad": make_grad_scan}
    want = [cmp for cmp in args.components.split(",") if cmp in scans]
    panels = [int(v) for v in args.panels.split(",")]
    budgets = [int(v) for v in args.budgets.split(",")]
    seed_dots = [bool(int(v)) for v in args.seed_dots.split(",")]
    groupeds = [bool(int(v)) for v in args.grouped.split(",")]
    group_rows = [int(v) for v in args.group_rows.split(",")]

    saved = (pc.MAX_PANEL, pc.COLMAJOR_VMEM_BUDGET, pc.FUSED_SEED_DOT,
             pc.GROUPED, pc.GROUP_MAX_PANEL, pc.GROUP_ROWS)
    combos = []
    fwd_cache = {}  # FUSED_SEED_DOT is backward-only: fwd depends on
    #                 (grouped, panel, budget) alone — don't pay a ~10 min
    #                 remote compile re-timing an identical forward per sd
    seen = set()
    try:
        for grouped, panel, budget, sd, gr in itertools.product(
                groupeds, panels, budgets, seed_dots, group_rows):
            if not grouped:
                gr = 0  # GROUP_ROWS is dead code off the grouped kernel
            if grouped:
                # COLMAJOR_VMEM_BUDGET is dead code behind the grouped
                # kernel — collapse it or every budget value re-compiles
                # (~10 min each) a byte-identical executable
                budget = 0
            if (grouped, panel, budget, sd, gr) in seen:
                continue
            seen.add((grouped, panel, budget, sd, gr))
            pc.GROUPED = grouped
            pc.GROUP_MAX_PANEL = panel
            pc.MAX_PANEL = panel
            pc.COLMAJOR_VMEM_BUDGET = budget
            pc.FUSED_SEED_DOT = sd
            pc.GROUP_ROWS = gr
            row = {"grouped": grouped, "max_panel": panel,
                   "colmajor_budget": None if grouped else budget,
                   "fused_seed_dot": sd, "group_rows": gr}
            tag = f"g{int(grouped)}_p{panel}_b{budget}_sd{int(sd)}_gr{gr}"
            for cmp in want:
                if (cmp == "fwd"
                        and (grouped, panel, budget, gr) in fwd_cache):
                    row["fwd_ms"] = fwd_cache[(grouped, panel, budget, gr)]
                    continue
                try:
                    row[f"{cmp}_ms"] = timed(scans[cmp](tag), x, w)
                except Exception as exc:  # compile failures are data too
                    row[f"{cmp}_ms"] = None
                    row[f"{cmp}_error"] = f"{type(exc).__name__}: {exc}"[:200]
                if cmp == "fwd":
                    fwd_cache[(grouped, panel, budget, gr)] = row["fwd_ms"]
            print(f"  {row}", file=sys.stderr)
            combos.append(row)
    finally:
        (pc.MAX_PANEL, pc.COLMAJOR_VMEM_BUDGET, pc.FUSED_SEED_DOT,
         pc.GROUPED, pc.GROUP_MAX_PANEL, pc.GROUP_ROWS) = saved

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
