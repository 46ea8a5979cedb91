"""Step anatomy: on-chip timing of the flagship train step's components.

The headline bench (bench.py) gives one number for the whole train step;
this tool decomposes it so kernel work is aimed at the actual bottleneck:

  full       fwd + bwd + Adam (the real step, minus metrics packing)
  step_real  the Trainer's ACTUAL _train_step_impl incl. the pose-error
             metric chain and packing — full's delta to this is the
             metrics tax the bench step pays
  pose_error the metric chain alone (denorm + inverse Procrustes +
             per-vertex error + packing)
  grad       fwd + bwd only (no optimizer)
  fwd        forward loss only
  encode     the 4-level encoder conv stack only
  decode     the decoder (dense heads + unpool/conv stack + final conv)
  conv_l0    ONE level-0 ChebConv forward (the hot op at full resolution)
  spmm_l0    ONE level-0 SpMM propagation (the kernel alone)
  adam       optimizer.update + apply_updates with fixed gradients

Every component runs as a jitted lax.scan of --iters iterations over
device-resident data (one dispatch, one host pull), timed best-of-two
windows — the same discipline as bench.py (jax.block_until_ready does not
await completion on this backend; the pull is the sync).

Usage: python benchmarks/step_anatomy.py [--batch-size 128]
           [--compute-dtype bfloat16] [--method pallas] [--iters 30]
Prints one JSON object of component -> ms per iteration.
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--method", default="pallas")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--precision", default="default")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--workload", default="default",
                    choices=["default", "scaled20k", "scaled80k"],
                    help="scaled templates run at K=10 (their BASELINE "
                         "config) unless --polygon-order overrides")
    ap.add_argument("--polygon-order", type=int, default=0,
                    help="0: 6 for the 5k workload, 10 for scaled ones")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--components", default="all",
                    help="comma list: full,step_real,pose_error,grad,fwd,"
                         "encode,conv_l0,spmm_l0,adam, plus opt-in "
                         "pools_grad (pool-chain grad, timed per "
                         "TRANSPOSE_GRAD setting)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from bench import TEMPLATE
    from meshvae_tpu.mesh.hierarchy import load_or_build_hierarchy
    from meshvae_tpu.mesh.io import load_obj
    from meshvae_tpu.models.operators import build_operators
    from meshvae_tpu.models.vae import MeshVAE, VAEConfig
    from meshvae_tpu.train.loop import Trainer

    template = TEMPLATE
    if args.workload != "default":
        from meshvae_tpu.tools.make_scaled_template import ensure_template

        template = os.path.join(
            os.path.dirname(TEMPLATE),
            f"template{args.workload[len('scaled'):]}.obj")
        ensure_template(template)
    k = args.polygon_order or (6 if args.workload == "default" else 10)

    hier = load_or_build_hierarchy(load_obj(template), [4, 4, 4, 4])
    config = {
        "num_conv_filters": [16, 16, 16, 32, 32],
        "polygon_order": [k] * 5,
        "n_layers": 4, "num_hidden": 512, "num_style": 16,
        "num_classes": 2, "dropout": 0.2,
        "cheb_method": args.method, "pool_method": "gather",
        "matmul_precision": args.precision,
        "compute_dtype": args.compute_dtype,
        "learning_rate": 1e-3, "weight_decay": 5e-4,
    }
    op_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                else jnp.float32)
    ops = build_operators(hier, dtype=op_dtype, cheb_method=args.method,
                          pool_method="gather")
    cfg = VAEConfig.from_config(config, coarse_verts=hier.levels[-1])
    model = MeshVAE(cfg)
    trainer = Trainer(model, ops, config)

    rng = np.random.default_rng(0)
    n0 = hier.levels[0]
    b = args.batch_size
    batch = {
        "x": jnp.asarray(rng.standard_normal((b, n0, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, b), jnp.int32),
        "mask": jnp.ones((b,), jnp.float32),
    }
    params = trainer.init_params(jax.random.key(0))
    opt_state = trainer.init_opt_state(params)
    key = jax.random.key(1)
    S = args.iters

    # Every timed call pays a fixed dispatch+relay-pull tax (~25 ms here)
    # regardless of S (CLAUDE.md gotcha 9a). Measure it once with an empty
    # S-iteration scan and subtract, so small components stay honest even
    # at modest --iters.
    def empty_scan(z):
        def step(c, _):
            return c * jnp.float32(1.0 + 1e-12), None
        cN, _ = jax.lax.scan(step, z, jnp.arange(S))
        return cN
    jempty = jax.jit(empty_scan)
    float(np.asarray(jempty(jnp.float32(1.0))))
    overhead = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(jempty(jnp.float32(1.0))))
        overhead = min(overhead, time.perf_counter() - t0)
    print(f"  overhead   {overhead * 1e3:8.3f} ms/call (subtracted)",
          file=sys.stderr)

    def timed(name, fn, *fn_args):
        """jit(fn), run once (compile + pull), then best-of-2 timed runs.
        fn must return ONE pullable array whose value depends on all S
        iterations (defeats DCE; the pull is the device sync). The scan
        body must chain through the carry — a body whose operands are all
        loop-invariant gets hoisted and times nothing (gotcha 9b)."""
        jfn = jax.jit(fn)
        out = float(np.asarray(jfn(*fn_args)).ravel()[0])  # compile + sync
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = float(np.asarray(jfn(*fn_args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        ms = max(best - overhead, 0.0) / S * 1e3
        print(f"  {name:10s} {ms:8.3f} ms/iter  (check={out:.4g})",
              file=sys.stderr)
        return ms

    want = (set(args.components.split(","))
            if args.components != "all"
            else {"full", "step_real", "pose_error", "grad", "fwd",
                  "encode", "decode", "conv_l0", "spmm_l0", "adam"})
    # "pools_grad" (opt-in): grad through the full pool/unpool chain,
    # timed once per TRANSPOSE_GRAD setting — quantifies the scatter-add
    # backward the precomputed P^T gathers replace (ops/pool.py).
    results = {}

    # batch/ops/grads ride as jit ARGUMENTS everywhere below: closure-
    # captured operators get embedded as module constants, which at 80k
    # exceeds the remote compiler's request-size limit (HTTP 413) and at
    # any scale constant-folds for minutes (CLAUDE.md gotcha 7)
    def loss_fn(p, rngs, batch_, ops_):
        return trainer._forward_loss(p, batch_, rngs, True, ops_)[0]

    def rngs_for(i):
        k = jax.random.fold_in(key, i)
        return {"latent": jax.random.fold_in(k, 0),
                "dropout": jax.random.fold_in(k, 1)}

    if "full" in want:
        def full_scan(p, o, batch_, ops_):
            def step(carry, i):
                p, o = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, rngs_for(i),
                                                          batch_, ops_)
                updates, o = trainer.optimizer.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), loss
            (_, _), losses = jax.lax.scan(step, (p, o), jnp.arange(S))
            return losses[-1]
        results["full"] = timed("full", full_scan, params, opt_state,
                                batch, ops)

    if "step_real" in want or "pose_error" in want:
        # the real step needs the pose-transform fields the loader carries
        full_batch = dict(batch)
        full_batch["r"] = jnp.asarray(rng.standard_normal((b, 3, 3)),
                                      jnp.float32)
        full_batch["s"] = jnp.ones((b,), jnp.float32)
        full_batch["m"] = jnp.zeros((b, 1, 3), jnp.float32)
        full_batch["original"] = jnp.asarray(
            rng.standard_normal((b, n0, 3)), jnp.float32)
        nm = jnp.zeros((n0, 3), jnp.float32)
        ns = jnp.ones((n0, 3), jnp.float32)

    if "step_real" in want:
        def step_real_scan(p, o, fb, nm_, ns_, ops_):
            def step(carry, i):
                p, o = carry
                p, o, metrics = trainer._train_step_impl(
                    p, o, fb, jax.random.fold_in(key, i), nm_, ns_, ops_)
                return (p, o), metrics[0]
            (_, _), losses = jax.lax.scan(step, (p, o), jnp.arange(S))
            return losses[-1]
        results["step_real"] = timed("step_real", step_real_scan, params,
                                     opt_state, full_batch, nm, ns, ops)

    if "pose_error" in want:
        def pose_scan(x0, fb, nm_, ns_):
            def step(x_, _):
                # chain iterations through the timed tensor (gotcha 9b)
                _, err = trainer._pose_error(x_, fb, nm_, ns_)
                return x_ * (1.0 + 1e-12 * jnp.mean(err)), None
            xN, _ = jax.lax.scan(step, x0, jnp.arange(S))
            return jnp.sum(xN)
        results["pose_error"] = timed("pose_error", pose_scan, batch["x"],
                                      full_batch, nm, ns)

    # grad/fwd chain the batch x through iterations: with a loop-invariant
    # x and p, the deterministic encoder conv stack depends on nothing that
    # varies per iteration (only dropout/latent rngs do), so XLA hoists it
    # out of the scan and the component under-measures by the whole
    # encoder (observed: fwd < encode + decode at 80k).
    if "grad" in want:
        def grad_scan(p, batch_, ops_):
            def step(x_, i):
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, rngs_for(i), {**batch_, "x": x_}, ops_)
                gs = jax.tree_util.tree_reduce(
                    lambda a, g: a + jnp.sum(jnp.square(
                        g.astype(jnp.float32))), grads, jnp.float32(0.0))
                return x_ * (1.0 + 1e-12 * (loss + gs)), None
            xN, _ = jax.lax.scan(step, batch_["x"], jnp.arange(S))
            return jnp.sum(xN)
        results["grad"] = timed("grad", grad_scan, params, batch, ops)

    if "fwd" in want:
        def fwd_scan(p, batch_, ops_):
            def step(x_, i):
                loss = loss_fn(p, rngs_for(i), {**batch_, "x": x_}, ops_)
                return x_ * (1.0 + 1e-12 * loss), None
            xN, _ = jax.lax.scan(step, batch_["x"], jnp.arange(S))
            return jnp.sum(xN)
        results["fwd"] = timed("fwd", fwd_scan, params, batch, ops)

    if "encode" in want:
        def enc_scan(p, x0, ops_):
            def step(x_, _):
                h = model.apply(p, x_, ops_, train=False,
                                method=type(model).encode)
                # chain iterations through the input (gotcha 9b): a body
                # with only loop-invariant operands gets hoisted
                return x_ * (1.0 + 1e-12 * jnp.mean(h.astype(jnp.float32))
                             ), None
            xN, _ = jax.lax.scan(step, x0, jnp.arange(S))
            return jnp.sum(xN)
        results["encode"] = timed("encode", enc_scan, params, batch["x"],
                                  ops)

    if "decode" in want:
        z0 = jnp.asarray(rng.standard_normal(
            (b, cfg.latent + cfg.num_classes)), jnp.float32)

        def dec_scan(p, z_, ops_):
            def step(zz, _):
                r = model.apply(p, zz, ops_, train=False,
                                method=type(model).decode)
                return zz * (1.0 + 1e-12 * jnp.mean(r)), None
            zN, _ = jax.lax.scan(step, z_, jnp.arange(S))
            return jnp.sum(zN)
        results["decode"] = timed("decode", dec_scan, params, z0, ops)

    if "conv_l0" in want:
        from meshvae_tpu.ops.cheb import cheb_conv
        w = jnp.asarray(0.1 * rng.standard_normal((k, 3, 16)), jnp.float32)
        x0 = batch["x"].astype(cfg.dtype)
        wd = w.astype(cfg.dtype)

        def conv_scan(xx, lap0):
            def step(x_, _):
                out = cheb_conv(x_, lap0, wd, None,
                                method=args.method, precision=cfg.precision)
                # feed 3 of the 16 output channels back in: chains the
                # iterations so the conv cannot be hoisted (gotcha 9b)
                return out[..., :3].astype(x_.dtype), None
            xN, _ = jax.lax.scan(step, xx, jnp.arange(S))
            return jnp.sum(xN.astype(jnp.float32))
        results["conv_l0"] = timed("conv_l0", conv_scan, x0, ops.lap[0])

    if "spmm_l0" in want and args.method == "pallas" \
            and ops.lap[0].bsr is not None:
        from meshvae_tpu.ops.pallas_cheb import bsr_matmul
        bsr = ops.lap[0].bsr
        c = b * 16
        t = jnp.asarray(rng.standard_normal((bsr.n_pad, c)),
                        jnp.float32).astype(bsr.blocks.dtype)

        def spmm_scan(t0, bsr_):
            def step(t, _):
                # feed the output back in: chains the scan iterations so
                # none can be elided, at the operand dtype the real
                # recurrence uses
                y = bsr_matmul(bsr_, t, precision=cfg.precision)
                return y.astype(t.dtype), None
            tN, _ = jax.lax.scan(step, t0, jnp.arange(S))
            return jnp.sum(tN.astype(jnp.float32))
        results["spmm_l0"] = timed("spmm_l0", spmm_scan, t, bsr)

    if "pools_grad" in want:
        from meshvae_tpu.ops import pool as pool_mod
        from meshvae_tpu.ops.pool import pool_apply
        xp = jnp.asarray(rng.standard_normal((b, n0, 16)),
                         jnp.float32).astype(cfg.dtype)

        def make_pools_grad(tag):
            def chain(x_, ops_):
                t = x_
                for p_ in ops_.down:
                    t = pool_apply(t, p_, method="gather")
                for p_ in reversed(ops_.up):
                    t = pool_apply(t, p_, method="gather")
                return jnp.sum(jnp.square(t.astype(jnp.float32)))

            def pools_scan(xx, ops_):
                def step(carry, _):
                    acc, x_ = carry
                    l, g = jax.value_and_grad(chain)(x_, ops_)
                    return (acc + l, x_ + g.astype(x_.dtype) * 1e-9), None
                (acc, _), _ = jax.lax.scan(step, (jnp.float32(0.0), xx),
                                           jnp.arange(S))
                return acc
            pools_scan.__name__ = f"pools_scan_{tag}"  # distinct per knob:
            # jit caches on function identity (CLAUDE.md gotcha 9d)
            return pools_scan

        for tg in (True, False):
            old_tg = pool_mod.TRANSPOSE_GRAD
            pool_mod.TRANSPOSE_GRAD = tg
            try:
                results[f"pools_grad_tgrad{int(tg)}"] = timed(
                    f"pools_t{int(tg)}", make_pools_grad(int(tg)), xp, ops)
            finally:
                pool_mod.TRANSPOSE_GRAD = old_tg

    if "adam" in want:
        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 1e-4), params)

        def adam_scan(p, o, g):
            def step(carry, _):
                p, o = carry
                updates, o = trainer.optimizer.update(g, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), None
            (p, o), _ = jax.lax.scan(step, (p, o), jnp.arange(S))
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), p,
                jnp.float32(0.0))
        results["adam"] = timed("adam", adam_scan, params, opt_state,
                                grads)

    meta = {"batch_size": b, "method": args.method,
            "compute_dtype": args.compute_dtype, "iters": S,
            "n0": int(n0)}
    print(json.dumps({"anatomy_ms_per_iter": results, **meta}))


if __name__ == "__main__":
    main()
