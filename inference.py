#!/usr/bin/env python
"""Batch inference CLI — compatible with the reference's
`python inference.py -c cfg -d data_dir -o out -n fold [-p key value]`
(/root/reference/inference.py:224-239), plus the real `--error_list` /
`--inference` / `--pred` selection flags the reference README advertises but
never implemented (its JSON outputs are unconditional; with no selection
flags given, all three are written, preserving that behavior)."""
import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="TPU Mesh-VAE Inference")
    parser.add_argument("-c", "--conf", help="path of config file")
    parser.add_argument("-p", "--parameter", metavar=("parameter", "value"),
                        action="append", nargs=2, help="config parameters")
    parser.add_argument("-o", "--output_path", type=str, default=" ")
    parser.add_argument("-d", "--data_dir", type=str, default=" ")
    parser.add_argument("-n", "--model", type=int, default=1,
                        help="fold number of the checkpoint to load")
    parser.add_argument("--pred", action="store_true",
                        help="write pred.json (default: write all outputs)")
    parser.add_argument("--error_list", action="store_true",
                        help="write error_list.json")
    parser.add_argument("--inference", action="store_true",
                        help="write inference.json")
    parser.add_argument("--no-meshes", action="store_true",
                        help="skip writing recon/gt/oppo .obj files")
    parser.add_argument("--serve", action="store_true",
                        help="start a warm-engine serving loop instead of a "
                             "one-shot run: reads mesh/directory paths line "
                             "by line from stdin, answers JSON lines on "
                             "stdout (compile once, serve many; see "
                             "meshvae_tpu/infer/serve.py)")
    parser.add_argument("--export", metavar="PATH", default=None,
                        help="instead of running inference, serialize the "
                             "whole jitted serving step (params + operators "
                             "baked in) to a self-contained jax.export "
                             "artifact at PATH and exit")
    parser.add_argument("--export-serve", metavar="PATH", default=None,
                        help="like --export but with the SERVING LOOP's "
                             "step contract (packed pred/err scalars, "
                             "on-device ground-truth recompute, f16 wire; "
                             "mesh outputs unless --no-meshes): the file "
                             "that --serve --artifact loads")
    parser.add_argument("--artifact", metavar="PATH", default=None,
                        help="with --serve: load a --export-serve artifact "
                             "instead of building the model — skips the "
                             "hierarchy/operator build, the checkpoint "
                             "load, and the ~5.7 s jax retrace on every "
                             "fresh process (needs only the config, the "
                             "template mesh, and norm.npz)")
    parser.add_argument("--export-platforms", default=None,
                        help="comma-separated lowering platforms for "
                             "--export (e.g. cpu,tpu); default: current "
                             "backend")
    parser.add_argument("--cpu", action="store_true", help="force cpu")
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from meshvae_tpu.config import apply_overrides, read_config
    from meshvae_tpu.infer.driver import run_inference
    from meshvae_tpu.train.checkpoint import checkpoint_path, load_params
    from meshvae_tpu.train.driver import (build_model_and_ops,
                                          maybe_init_multihost, make_trainer)

    if args.conf is None:
        args.conf = os.path.join(os.path.dirname(__file__), "files",
                                 "default.cfg")
        print("configuration file not specified, trying to load "
              "it from current directory", args.conf)

    config = apply_overrides(read_config(args.conf), args.parameter)

    # reference quirk: checkpoint_dir resolves relative to the config file
    # (inference.py:176-177)
    config["checkpoint_dir"] = os.path.join(os.path.dirname(args.conf),
                                            config["checkpoint_dir"])
    config["root_dir"] = args.data_dir

    maybe_init_multihost(config)

    if args.serve and args.artifact:
        # artifact cold start: no hierarchy, no operators, no checkpoint,
        # no trace — deserialize + compile (XLA-cache-hit) and serve
        import json
        import sys

        from meshvae_tpu.infer.export import load_serving_step
        from meshvae_tpu.infer.serve import MeshServer
        from meshvae_tpu.mesh.io import load_obj
        from meshvae_tpu.tools.make_scaled_template import ensure_template

        ensure_template(config["template"])
        template = load_obj(config["template"])
        norm = np.load(os.path.join(config["checkpoint_dir"], "norm.npz"),
                       allow_pickle=True)
        wire = config.get("serve_wire_dtype", "float16")
        server = MeshServer(
            None, None, None,
            norm["mean"].astype(np.float32), norm["std"].astype(np.float32),
            template=np.asarray(template.v), faces=np.asarray(template.f),
            batch_size=int(config["batch_size"]),
            output_path=args.output_path, save_meshes=not args.no_meshes,
            wire_dtype=np.dtype(wire),
            serving_step=load_serving_step(args.artifact))
        sec = server.warmup()
        print(json.dumps({"ready": True, "warmup_sec": round(sec, 2),
                          "batch_size": server.batch_size,
                          "artifact": args.artifact}), flush=True)
        server.serve_forever(sys.stdin, sys.stdout)
        return

    model, ops, hier, template = build_model_and_ops(config)
    trainer = make_trainer(config, model, ops)

    import jax
    params_target = trainer.init_params(jax.random.key(0))
    ckpt = checkpoint_path(config["checkpoint_dir"], args.model)
    from meshvae_tpu.train.checkpoint import load_checkpoint
    restored = load_checkpoint(ckpt, params_target,
                               trainer.init_opt_state(params_target))
    params = restored["params"]

    norm = np.load(os.path.join(config["checkpoint_dir"], "norm.npz"),
                   allow_pickle=True)
    mean = norm["mean"].astype(np.float32)
    std = norm["std"].astype(np.float32)

    if args.export or args.export_serve:
        import jax.numpy as jnp
        from meshvae_tpu.infer.export import (export_packed_serving_step,
                                              export_serving_step,
                                              save_serving_artifact)
        platforms = (args.export_platforms.split(",")
                     if args.export_platforms else None)
        allow_cc = config.get("cheb_method", "dense") == "pallas"
        nv = int(np.asarray(template.v).shape[0])
        if args.export:
            data = export_serving_step(
                model, ops, params, mean, std,
                batch_size=int(config["batch_size"]), num_vertices=nv,
                platforms=platforms, allow_custom_calls=allow_cc)
            save_serving_artifact(args.export, data)
            print(f"serving artifact written to {args.export} "
                  f"({len(data) / 1e6:.1f} MB)")
        if args.export_serve:
            wire = config.get("serve_wire_dtype", "float16")
            data = export_packed_serving_step(
                model, ops, params, mean, std,
                batch_size=int(config["batch_size"]), num_vertices=nv,
                collect_meshes=not args.no_meshes,
                wire_dtype=jnp.dtype(wire),
                platforms=platforms, allow_custom_calls=allow_cc)
            save_serving_artifact(args.export_serve, data)
            print(f"serve artifact written to {args.export_serve} "
                  f"({len(data) / 1e6:.1f} MB)")
        return

    if args.serve:
        import json
        import sys

        from meshvae_tpu.infer.serve import MeshServer
        server = MeshServer(
            model, ops, params, mean, std,
            template=np.asarray(template.v), faces=np.asarray(template.f),
            batch_size=int(config["batch_size"]),
            output_path=args.output_path, save_meshes=not args.no_meshes,
            mesh=trainer.mesh,
            wire_dtype=np.dtype(config.get("serve_wire_dtype", "float16")))
        sec = server.warmup()
        print(json.dumps({"ready": True, "warmup_sec": round(sec, 2),
                          "batch_size": server.batch_size}), flush=True)
        server.serve_forever(sys.stdin, sys.stdout)
        return

    any_selected = args.pred or args.error_list or args.inference
    run_inference(
        params, model, ops, args.output_path, mean, std, config,
        template=np.asarray(template.v), batch_size=int(config["batch_size"]),
        faces=np.asarray(template.f),
        write_pred=args.pred or not any_selected,
        write_error_list=args.error_list or not any_selected,
        write_inference=args.inference or not any_selected,
        save_meshes=not args.no_meshes,
        mesh=trainer.mesh,  # dp/sp mesh from data_parallel/seq_parallel
    )


if __name__ == "__main__":
    main()
