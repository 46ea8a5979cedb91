"""Multi-host worker: one OS process of a simulated multi-host deployment.

Launched by tests/test_multihost.py as N processes, each owning
--local-devices virtual CPU devices, joined through
jax.distributed.initialize with gloo CPU collectives. Runs one jitted train
step, a scanned epoch, and an eval pass over a global dp mesh that spans all
processes, then prints a JSON result line. With --num-processes 1 it runs
the identical workload single-process (the golden the multi-host run must
match — data parallelism may not change the math).

The reference is strictly single-device (SURVEY.md §2c); this is the
TPU-native multi-host story: per-process jax.distributed.initialize, a
global Mesh over all hosts' devices, batches assembled from process-local
shards, gradient psum over ICI/DCN inserted by GSPMD.
"""
import argparse
import json
import os
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--local-devices", type=int, default=2)
    parser.add_argument("--port", type=int, default=19743)
    parser.add_argument("--driver-dir", default="",
                        help="run the FULL k-fold train/test driver against "
                             "this prepared env dir (template.obj + data/ + "
                             "ckpt dir) instead of the step-level checks")
    args = parser.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(tests_dir))  # repo root -> meshvae_tpu
    sys.path.insert(0, tests_dir)
    from conftest import make_grid_mesh

    from meshvae_tpu.parallel.sharding import (initialize_multihost,
                                               make_device_mesh)

    if args.num_processes > 1:
        initialize_multihost(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
            cpu_collectives="gloo",
        )
        assert jax.process_count() == args.num_processes
        assert len(jax.devices()) == args.num_processes * args.local_devices

    import numpy as np

    import jax.numpy as jnp

    if args.driver_dir:
        run_driver(args)
        return

    from meshvae_tpu.mesh.hierarchy import build_hierarchy
    from meshvae_tpu.models.operators import build_operators
    from meshvae_tpu.models.vae import MeshVAE, VAEConfig
    from meshvae_tpu.train.loop import Trainer, unpack_metrics

    hier = build_hierarchy(make_grid_mesh(8, jitter=0.05), [2, 2])
    ops = build_operators(hier)
    config = {
        "num_conv_filters": [8, 16, 16],
        "polygon_order": [3, 3, 3],
        "n_layers": 2,
        "num_hidden": 32,
        "num_style": 8,
        "num_classes": 2,
        "dropout": 0.0,
        "learning_rate": 1e-3,
        "weight_decay": 5e-4,
        "matmul_precision": "highest",
    }
    cfg = VAEConfig.from_config(config, coarse_verts=hier.levels[-1])
    model = MeshVAE(cfg)

    total_devices = args.num_processes * args.local_devices
    mesh = (make_device_mesh(dp=total_devices)
            if total_devices > 1 else None)
    trainer = Trainer(model, ops, config, mesh=mesh)

    # every process computes the SAME global batch (deterministic seed); in
    # multi-process mode put_sharded slices out each process's local shards
    rng = np.random.default_rng(0)
    n0 = hier.levels[0]
    bs = 8

    def make_batch():
        return {
            "x": rng.standard_normal((bs, n0, 3)).astype(np.float32),
            "label": rng.integers(0, 2, bs).astype(np.int32),
            "r": np.tile(np.eye(3, dtype=np.float32), (bs, 1, 1)),
            "s": np.ones(bs, np.float32),
            "m": np.zeros((bs, 1, 3), np.float32),
            "original": rng.standard_normal((bs, n0, 3)).astype(np.float32),
            "mask": np.ones(bs, np.float32),
        }

    batches = [make_batch() for _ in range(3)]

    params = trainer.init_params(jax.random.key(0))
    opt_state = trainer.init_opt_state(params)
    mean = jnp.zeros((n0, 3), jnp.float32)
    std = jnp.ones((n0, 3), jnp.float32)

    params = trainer.maybe_replicate(params)
    opt_state = trainer.maybe_replicate(opt_state)
    params, opt_state, packed = trainer._train_step(
        params, opt_state, trainer._put(batches[0]), jax.random.key(1),
        mean, std)
    step_metrics = unpack_metrics(packed)

    params, opt_state, epoch_avg = trainer.train_epoch_scanned(
        params, opt_state, batches[1:], jax.random.key(2), mean, std)

    eval_avg, errors = trainer.evaluate(params, [batches[0]], mean, std)

    print(json.dumps({
        "process_id": args.process_id,
        "step_loss": step_metrics["loss"],
        "step_error": step_metrics["error"],
        "epoch_loss": epoch_avg["loss"],
        "eval_loss": eval_avg["loss"],
        "eval_error_mean": float(errors.mean()),
        "eval_error_shape": list(errors.shape),
    }))


def run_driver(args):
    """The FULL k-fold train+test driver under a multi-host deployment:
    every process runs run() on the shared env dir; only the primary
    writes artifacts (checkpoints / history / logs / norm stats), barriers
    order the writes before cross-process reads, and the per-fold test
    results must agree across processes."""
    import json as _json
    import os as _os

    from meshvae_tpu.config import default_config
    from meshvae_tpu.train.driver import run

    d = args.driver_dir
    total = args.num_processes * args.local_devices
    config = default_config()
    config.update({
        "checkpoint_dir": _os.path.join(d, "ckpt"),
        "template": _os.path.join(d, "template.obj"),
        "root_dir": _os.path.join(d, "data"),
        "log_file": _os.path.join(d, "ckpt", "log.txt"),
        "folds": 2,
        "test_size": 0.25,
        "n_layers": 2,
        "num_hidden": 16,
        "num_style": 4,
        "downsampling_factors": [2, 2],
        "polygon_order": [3, 3, 3],
        "num_conv_filters": [8, 16, 16],
        "batch_size": 4,
        "epoch": 2,
        "data_parallel": total,
        "hierarchy_cache_dir": _os.path.join(d, "cache"),
    })
    results = run(config, do_train=True, do_test=True)
    print(_json.dumps({"process_id": args.process_id, "results": results}))


if __name__ == "__main__":
    main()
