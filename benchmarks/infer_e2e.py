#!/usr/bin/env python
"""END-TO-END inference CLI throughput (BASELINE config 4).

bench.py's config-4 row times the jitted *step*; the thing a user runs is
run_inference — dataset staging, the scanned dispatch, the packed fetches,
JSON/obj writes. This harness times that whole pipeline (the function behind
`python inference.py`, reference surface /root/reference/inference.py:63-157)
on a synthetic dataset: first call pays compile, the reported number is the
best of the following warm calls.

Usage:
  python benchmarks/infer_e2e.py [--batch-size 128] [--samples 512]
      [--method pallas] [--compute-dtype bfloat16] [--save-meshes]
      [--repeats 3]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--method", default="pallas")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--precision", default="")
    ap.add_argument("--save-meshes", action="store_true",
                    help="include the recon/gt/oppo .obj writes in the "
                         "timed pipeline (default: --no-meshes mode)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--reuse-engine", action="store_true",
                    help="share one InferenceEngine across repeats (the "
                         "fold-sweep / serving-loop pattern): skips the "
                         "~5.7s per-call jax retrace+lowering)")
    ap.add_argument("--serve", action="store_true",
                    help="time the warm MeshServer path instead "
                         "(inference.py --serve): one directory request of "
                         "all samples per repeat, after warmup()")
    ap.add_argument("--wire-dtype", default="float16",
                    help="--serve chunk upload dtype for x (float16 | "
                         "float32): the f16-vs-f32 wire A/B knob")
    ap.add_argument("--artifact", action="store_true",
                    help="with --serve: export the packed serving step to "
                         "a jax.export artifact (pallas custom calls "
                         "allowed), reload it, and serve THROUGH the "
                         "artifact — proves the AOT path at the "
                         "production config and times it")
    ap.add_argument("--data", default="/tmp/infer_e2e")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax

    from meshvae_tpu.config import default_config
    from meshvae_tpu.data.synthetic import generate_synthetic_dataset
    from meshvae_tpu.infer.driver import run_inference
    from meshvae_tpu.mesh.io import load_obj
    from meshvae_tpu.train.driver import build_model_and_ops, make_trainer

    config = default_config()
    config.update(
        template=os.path.join(REPO, "template/template5k.obj"),
        root_dir=os.path.join(args.data, "data"),
        checkpoint_dir=os.path.join(args.data, "ckpt/"),
        batch_size=args.batch_size,
        cheb_method=args.method,
        compute_dtype=args.compute_dtype,
        matmul_precision=args.precision,
    )
    # run_inference's test dataset reads the fold's norm stats from
    # checkpoint_dir (the train CLI writes them); identity stats here —
    # this harness times the pipeline, not a trained model
    os.makedirs(config["checkpoint_dir"], exist_ok=True)

    template = load_obj(config["template"])
    data_dir = config["root_dir"]
    marker = os.path.join(data_dir, f".done_{args.samples}")
    if not os.path.exists(marker):
        shutil.rmtree(data_dir, ignore_errors=True)
        generate_synthetic_dataset(template, data_dir,
                                   n_samples=args.samples, seed=3)
        open(marker, "w").close()

    model, ops, hier, template = build_model_and_ops(config)
    trainer = make_trainer(config, model, ops)
    params = trainer.init_params(jax.random.key(0))
    n0 = int(np.asarray(template.v).shape[0])
    mean = np.zeros((n0, 3), np.float32)
    std = np.ones((n0, 3), np.float32)
    np.savez(os.path.join(config["checkpoint_dir"], "norm"),
             mean=mean.astype(np.float64), std=std.astype(np.float64))

    out_dir = os.path.join(args.data, "out")
    times = []
    engine = None
    if args.serve:
        from meshvae_tpu.infer.serve import MeshServer, list_request_meshes

        serving_step = None
        if args.artifact:
            import jax.numpy as jnp

            from meshvae_tpu.infer.export import (export_packed_serving_step,
                                                  load_serving_step)
            t0 = time.time()
            data = export_packed_serving_step(
                model, ops, params, mean, std,
                batch_size=args.batch_size,
                num_vertices=int(np.asarray(template.v).shape[0]),
                collect_meshes=args.save_meshes,
                wire_dtype=jnp.dtype(args.wire_dtype),
                allow_custom_calls=args.method == "pallas")
            print(f"export: {time.time() - t0:.2f}s "
                  f"({len(data) / 1e6:.1f} MB)", flush=True)
            serving_step = load_serving_step(data)
        server = MeshServer(
            None if serving_step else model,
            None if serving_step else ops,
            None if serving_step else params, mean, std,
            template=np.asarray(template.v), faces=np.asarray(template.f),
            batch_size=args.batch_size, output_path=out_dir,
            save_meshes=args.save_meshes,
            mesh=None if serving_step else trainer.mesh,
            wire_dtype=np.dtype(args.wire_dtype),
            serving_step=serving_step)
        print(f"warmup: {server.warmup():.2f}s", flush=True)
        paths = [p for p in list_request_meshes(data_dir)
                 if not os.path.basename(p).startswith(".")]
        assert len(paths) == args.samples, (len(paths), args.samples)
        for i in range(args.repeats):
            t0 = time.time()
            results = server.handle(paths)
            dt = time.time() - t0
            assert len(results) == args.samples
            times.append(dt)
            print(f"request {i}: {dt:.3f}s "
                  f"({args.samples / dt:.1f} meshes/sec)", flush=True)
        times = [float("inf")] + times  # warm = min over the requests
    else:
        if args.reuse_engine:
            from meshvae_tpu.infer.driver import InferenceEngine

            engine = InferenceEngine(model, ops, mesh=trainer.mesh)
        for i in range(args.repeats + 1):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = time.time()
            run_inference(params, model, ops, out_dir, mean, std, config,
                          template=np.asarray(template.v),
                          batch_size=args.batch_size,
                          faces=np.asarray(template.f),
                          save_meshes=args.save_meshes, mesh=trainer.mesh,
                          engine=engine)
            dt = time.time() - t0
            times.append(dt)
            print(f"run {i}: {dt:.3f}s "
                  f"({args.samples / dt:.1f} meshes/sec)", flush=True)

    warm = min(times[1:])
    result = {
        "metric": ("serving_loop_meshes_per_sec" if args.serve
                   else "inference_pipeline_meshes_per_sec"),
        "value": round(args.samples / warm, 1),
        "unit": "meshes/sec",
        "samples": args.samples,
        "batch_size": args.batch_size,
        "method": args.method,
        "compute_dtype": args.compute_dtype,
        "save_meshes": bool(args.save_meshes),
        "wire_dtype": args.wire_dtype if args.serve else None,
        "reuse_engine": bool(args.reuse_engine),
        "serve": bool(args.serve),
        "warm_s": round(warm, 3),
        "cold_s": None if args.serve else round(times[0], 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
