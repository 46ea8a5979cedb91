#!/usr/bin/env python
"""Emitted-pipeline SpMM spike: the 80k grid-step roof's named escape.

BASELINE.md ("The 80k bandwidth roof") measured the grouped block-sparse
apply bound by per-grid-step cost (~0.45 us/step: output RMW + DMA issue
bookkeeping in the classic pallas_call pipeline), not HBM bytes, and named
"fewer grid steps per apply (emitted-pipeline / core-map kernels)" as the
one remaining escape. This probe implements that design as a single-shape
spike and A/Bs it against the shipping grouped kernel IN ONE SESSION:

  emitted kernel   ONE grid step per column panel; a manual fori_loop
                   inside the kernel walks all row-blocks with
                   double-buffered pltpu.make_async_copy DMAs (L row
                   groups + g x-slabs in, output rows out) — the
                   pipeline's per-step fixed cost is paid (c/panel)
                   times per apply instead of (c/panel) * (rows/R).
  grouped kernel   the shipping path (ops/pallas_cheb._grouped_matmul),
                   optionally with MESHVAE_GROUP_ROWS-style multi-row
                   packing via --group-rows.

Both compute y = L @ x for the level-0 operator of --workload and are
cross-checked numerically before timing. Timing discipline per CLAUDE.md
gotcha 9: scanned iterations chain through the timed tensor, one host
pull at the end, fresh function objects per variant.

Usage:
  python benchmarks/emitted_probe.py [--workload 80k] [--batch-size 32]
      [--compute-dtype bfloat16] [--iters 300] [--group-rows 0,4]
      [--cpu]   # CPU: interpret-mode correctness check only
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emitted_spmm(bsr, x2d, *, interpret: bool = False):
    """y = L @ x2d via ONE grid step per column panel with a manual
    double-buffered row-block loop (the "emitted pipeline").

    bsr: BlockSparseOperator with a grouped view (g_idx/g_bcol).
    x2d: [n_pad, c]; c must be a multiple of 128.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from meshvae_tpu.ops.block_sparse import BLOCK
    from meshvae_tpu.ops.pallas_cheb import (GROUP_VMEM_BUDGET,
                                             _gather_grouped)

    n_pad, c = x2d.shape
    g = bsr.g_width
    assert g >= 1 and bsr.g_idx is not None, "needs the grouped view"
    n_rows = n_pad // BLOCK
    op_dtype = bsr.blocks.dtype
    xb = x2d.dtype.itemsize

    # one panel sized to the VMEM budget (same rule as the grouped kernel)
    panel = 128
    while (panel * 2 <= c and c % (panel * 2) == 0
           and BLOCK * panel * 2 * (g * xb + 4) <= GROUP_VMEM_BUDGET):
        panel *= 2

    gl = _gather_grouped(bsr.blocks, bsr.g_idx)      # [n_rows, g, B, B]
    g_bcol = bsr.g_bcol.reshape(n_rows, g)

    def kernel(bcol_ref, gl_hbm, x_hbm, o_hbm, xbuf, lbuf, obuf,
               xsem, lsem, osem):
        j = pl.program_id(0)

        def start_row(r, slot):
            pltpu.make_async_copy(gl_hbm.at[r], lbuf.at[slot],
                                  lsem.at[slot]).start()
            for i in range(g):
                bc = bcol_ref[r, i]
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(bc * BLOCK, BLOCK),
                             pl.ds(j * panel, panel)],
                    xbuf.at[slot, i], xsem.at[slot, i]).start()

        def wait_row(r, slot):
            pltpu.make_async_copy(gl_hbm.at[r], lbuf.at[slot],
                                  lsem.at[slot]).wait()
            for i in range(g):
                bc = bcol_ref[r, i]
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(bc * BLOCK, BLOCK),
                             pl.ds(j * panel, panel)],
                    xbuf.at[slot, i], xsem.at[slot, i]).wait()

        def out_dma(r, slot):
            return pltpu.make_async_copy(
                obuf.at[slot],
                o_hbm.at[pl.ds(r * BLOCK, BLOCK), pl.ds(j * panel, panel)],
                osem.at[slot])

        start_row(0, 0)

        def body(r, _):
            slot = jax.lax.rem(r, 2)
            nxt = jax.lax.rem(r + 1, 2)

            @pl.when(r + 1 < n_rows)
            def _():
                start_row(r + 1, nxt)

            wait_row(r, slot)
            acc = jnp.dot(lbuf[slot, 0], xbuf[slot, 0],
                          preferred_element_type=jnp.float32)
            for i in range(1, g):
                acc += jnp.dot(lbuf[slot, i], xbuf[slot, i],
                               preferred_element_type=jnp.float32)

            # the obuf slot was last used by row r-2's output DMA
            @pl.when(r >= 2)
            def _():
                out_dma(r - 2, slot).wait()

            obuf[slot] = acc.astype(obuf.dtype)
            out_dma(r, slot).start()
            return _

        jax.lax.fori_loop(0, n_rows, body, None)
        out_dma(n_rows - 2, jax.lax.rem(n_rows - 2, 2)).wait()
        out_dma(n_rows - 1, jax.lax.rem(n_rows - 1, 2)).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // panel,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # gl (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # x (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, g, BLOCK, panel), x2d.dtype),   # xbuf
            pltpu.VMEM((2, g, BLOCK, BLOCK), op_dtype),    # lbuf
            pltpu.VMEM((2, BLOCK, panel), x2d.dtype),      # obuf
            pltpu.SemaphoreType.DMA((2, g)),               # xsem
            pltpu.SemaphoreType.DMA((2,)),                 # lsem
            pltpu.SemaphoreType.DMA((2,)),                 # osem
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=interpret,
    )(g_bcol, gl, x2d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="80k", choices=["5k", "20k", "80k"])
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--features", type=int, default=16)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--group-rows", default="0",
                    help="comma list: grouped-kernel GROUP_ROWS variants "
                         "to time against the emitted kernel")
    ap.add_argument("--group-max-operands", type=int, default=64)
    ap.add_argument("--group-budget", type=int, default=50331648)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import meshvae_tpu.ops.pallas_cheb as pc
    from meshvae_tpu.mesh.hierarchy import load_or_build_hierarchy
    from meshvae_tpu.mesh.io import load_obj
    from meshvae_tpu.models.operators import build_operators
    from meshvae_tpu.tools.make_scaled_template import ensure_template

    if args.cpu:
        pc.INTERPRET = True
    pc._GROUP_MAX_OPERANDS = args.group_max_operands
    pc.GROUP_VMEM_BUDGET = args.group_budget

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tname = ("template5k.obj" if args.workload == "5k"
             else f"template{args.workload}.obj")
    tpath = os.path.join(repo, "template", tname)
    ensure_template(tpath)
    hier = load_or_build_hierarchy(load_obj(tpath), [4, 4, 4, 4])
    op_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                else jnp.float32)
    ops = build_operators(hier, dtype=op_dtype, cheb_method="pallas",
                          pool_method="gather")
    bsr = ops.lap[0].bsr
    c = args.batch_size * args.features
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bsr.n_pad, c)),
                    jnp.float32).astype(op_dtype)
    print(f"level-0: n_pad {bsr.n_pad} rows {bsr.n_pad // 128} "
          f"g {bsr.g_width} c {c}", flush=True)

    # numerical cross-check before any timing
    y_emit = np.asarray(emitted_spmm(bsr, x, interpret=pc.INTERPRET),
                        np.float32)
    y_ref = np.asarray(pc._bsr_matmul_impl(bsr, x, None), np.float32)
    err = np.abs(y_emit - y_ref).max() / max(np.abs(y_ref).max(), 1e-9)
    print(f"emitted-vs-grouped rel err: {err:.2e}", flush=True)
    assert err < 2e-2 if op_dtype == jnp.bfloat16 else err < 1e-5

    if args.cpu:
        print(json.dumps({"ok": True, "interpret": True}))
        return

    S = args.iters

    def timed(fn, tag):
        def scan(xx):
            def step(t, _):
                out = fn(t.astype(op_dtype))
                return out.astype(jnp.float32) * 1e-3 + xx, None
            tN, _ = jax.lax.scan(step, xx.astype(jnp.float32),
                                 jnp.arange(S))
            return jnp.sum(tN)
        scan.__name__ = f"scan_{tag}"
        jfn = jax.jit(scan)
        float(np.asarray(jfn(x.astype(jnp.float32))))  # compile+sync
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(np.asarray(jfn(x.astype(jnp.float32))))
            best = min(best, time.perf_counter() - t0)
        return best / S * 1e3

    report = {"workload": args.workload, "c": c, "g": bsr.g_width,
              "rows": bsr.n_pad // 128}
    report["emitted_ms"] = timed(
        functools.partial(emitted_spmm, bsr), "emit")
    print(f"emitted: {report['emitted_ms']:.4f} ms", flush=True)
    for gr in [int(v) for v in args.group_rows.split(",")]:
        pc.GROUP_ROWS = gr
        report[f"grouped_gr{gr}_ms"] = timed(
            functools.partial(pc._bsr_matmul_impl, bsr, precision=None),
            f"gr{gr}")
        print(f"grouped gr={gr}: {report[f'grouped_gr{gr}_ms']:.4f} ms",
              flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
