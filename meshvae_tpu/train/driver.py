"""K-fold training/testing driver — the body behind the `main.py` CLI.

Orchestration parity with /root/reference/main.py:181-325: repeated
stratified k-fold over the mesh listing, per-fold reset to a shared
initial-weights snapshot, per-epoch train + validate with the step LR
schedule, best-validation-loss checkpointing, history JSON, text log, and the
test path with sex-change mesh dumps. Fold resets and data handling stay in
Python; only the steps are jitted (one compilation for the whole run).
"""
from __future__ import annotations

import copy
import os
import time

import numpy as np
from sklearn.model_selection import RepeatedStratifiedKFold, train_test_split

import jax
import jax.numpy as jnp

from ..config import read_config
from ..data.dataset import BatchIterator, MeshDataset, list_meshes
from ..mesh.hierarchy import load_or_build_hierarchy
from ..mesh.io import load_obj, save_obj
from ..models.operators import build_operators
from ..models.vae import MeshVAE, VAEConfig
from ..parallel.sharding import make_device_mesh
from .checkpoint import (checkpoint_path, load_checkpoint, load_params,
                         save_checkpoint, save_params)
from .loop import Trainer, lr_for_epoch, set_learning_rate
from .metrics import (RunLog, epoch_line, history_record, is_profiled,
                      maybe_profile, write_history)


def build_model_and_ops(config: dict, dtype=None):
    """Template -> hierarchy -> static operators -> model (the role of the
    reference's get_model factory, /root/reference/model.py:35-118).

    dtype None follows the config's compute_dtype: bfloat16 stores the graph
    operands at half width (operator streaming is the hot path's bandwidth
    bill) and the model computes in bf16 with f32 accumulation."""
    if dtype is None:
        dtype = (jnp.bfloat16
                 if str(config.get("compute_dtype", "")) == "bfloat16"
                 else jnp.float32)
    # scaled templates (template20k.obj, files/scaled20k.cfg) regenerate
    # from the vendored template5k by deterministic subdivision. Called
    # unconditionally: its barrier participation must not depend on whether
    # this process observed the file before or after the primary wrote it.
    from ..tools.make_scaled_template import ensure_template

    ensure_template(config["template"])
    template = load_obj(config["template"])
    cache_dir = config.get("hierarchy_cache_dir") or None
    hier = load_or_build_hierarchy(template, config["downsampling_factors"],
                                   cache_dir=cache_dir,
                                   mode=config.get("hierarchy_mode", "fast"))
    # preflight BEFORE any device work: device-mesh fit, batch divisibility,
    # and the measured ELL crash envelope (meshvae_tpu/validate.py) — all
    # three CLIs route through here
    from ..validate import validate_config

    validate_config(config, num_nodes=hier.levels)
    ops = build_operators(
        hier, dtype=dtype,
        final_conv_adjacency=config.get("final_conv_adjacency",
                                        "reference_quirk"),
        cheb_method=config.get("cheb_method", "dense"),
        pool_method=config.get("pool_method", "gather"),
    )
    if str(config.get("type", "cheb_VAE")) == "joint_VAE":
        # BASELINE config 3: disentangled VAE + cheb_cls jointly trained
        # with latent-split supervision
        from ..models.joint import build_joint_model

        model = build_joint_model(config, coarse_verts=hier.levels[-1],
                                  num_features=template.v.shape[1])
    else:
        cfg = VAEConfig.from_config(config, coarse_verts=hier.levels[-1],
                                    num_features=template.v.shape[1])
        model = MeshVAE(cfg)
    return model, ops, hier, template


def maybe_init_multihost(config: dict) -> None:
    """jax.distributed.initialize when the config asks for multi-host (one
    process per host of a TPU slice); after it, jax.devices() spans all
    hosts and the dp/sp mesh lays over the global device set. Must run
    before any backend touch, so drivers call it before building models."""
    if not config.get("multihost"):
        return
    from ..parallel.sharding import initialize_multihost

    initialize_multihost(
        coordinator_address=config.get("coordinator_address") or None,
        num_processes=int(config.get("num_processes") or 0) or None,
        process_id=(int(config["process_id"])
                    if int(config.get("process_id", -1)) >= 0 else None),
    )


def make_trainer(config: dict, model, ops) -> Trainer:
    dp = int(config.get("data_parallel", 1))
    sp = int(config.get("seq_parallel", 1))
    mesh = make_device_mesh(dp=dp, sp=sp) if dp * sp > 1 else None
    from ..models.joint import JointMeshVAE

    if isinstance(model, JointMeshVAE):
        from .joint import JointTrainer

        return JointTrainer(model, ops, config, mesh=mesh)
    return Trainer(model, ops, config, mesh=mesh)


def run(config: dict, do_train: bool, do_test: bool, vis: bool = False):
    maybe_init_multihost(config)
    checkpoint_dir = config["checkpoint_dir"]
    os.makedirs(checkpoint_dir, exist_ok=True)

    seed = int(config["random_seeds"])
    n_splits = int(config["folds"])
    test_size = float(config["test_size"])
    batch_size = int(config["batch_size"])
    total_epochs = int(config["epoch"])
    base_lr = float(config["learning_rate"])

    model, ops, hier, template = build_model_and_ops(config)
    trainer = make_trainer(config, model, ops)
    faces = np.asarray(template.f)

    log = RunLog(config["log_file"])
    log.print("model type:", config["type"])
    log.print("optimizer type", config["optimizer"])
    log.print("learning rate:", base_lr)

    init_params = trainer.init_params(jax.random.key(seed))
    init_path = os.path.join(checkpoint_dir, "initial_weight.msgpack")
    save_params(init_path, init_params)
    # multi-host: the primary wrote the snapshot every process reloads at
    # each fold start — order the write before those reads
    from ..parallel.sharding import sync_processes
    sync_processes("initial_weights")

    dataset_index, labels = list_meshes(config)
    if not dataset_index:
        raise RuntimeError(f"no meshes found under {config['root_dir']}")

    # working resume (the reference's resume path references undefined names
    # and crashes, main.py:229-238): restore params/opt-state/epoch into the
    # first fold; later folds start fresh from the initial snapshot.
    resume = None
    if config.get("checkpoint_file"):
        resume = load_checkpoint(config["checkpoint_file"],
                                 copy.deepcopy(init_params),
                                 trainer.init_opt_state(init_params))
        log.print("resuming from", config["checkpoint_file"],
                  "at epoch", resume["epoch_num"])

    skf = RepeatedStratifiedKFold(n_splits=n_splits, n_repeats=1,
                                  random_state=seed)
    y_dummy = np.ones(len(dataset_index))

    results = []
    n = 0
    for train_index, test_index in skf.split(dataset_index, y_dummy):
        train_names, valid_names = train_test_split(
            np.array(dataset_index)[train_index], test_size=test_size,
            random_state=seed)
        n += 1
        params = load_params(init_path, copy.deepcopy(init_params))
        opt_state = trainer.init_opt_state(params)
        start_epoch = 1
        if resume is not None and n == 1:
            params = resume["params"]
            opt_state = resume["opt_state"]
            start_epoch = int(resume["epoch_num"]) + 1
        history = []

        if do_train:
            train_ds = MeshDataset(list(train_names), config, labels,
                                   template=np.asarray(template.v),
                                   dtype="train")
            # the train split's constructor wrote this fold's norm.npz
            # (primary only); barrier before every process reads it back
            # while building the eval splits
            sync_processes(f"norm_stats_fold{n}")
            valid_ds = MeshDataset(list(valid_names), config, labels,
                                   template=np.asarray(template.v),
                                   dtype="test")
            train_loader = BatchIterator(train_ds, batch_size, shuffle=True,
                                         seed=seed + n)
            valid_loader = BatchIterator(valid_ds, batch_size, shuffle=False)
            mean, std = train_ds.mean, train_ds.std
            best_loss = float("inf")
            epoch_rng = jax.random.key(seed * 1000 + n)
            scan = bool(config.get("scan_epoch", True))
            # epoch pipelining (scan mode): dispatch epoch N+1's train+eval
            # scans BEFORE fetching epoch N's metrics, so the ~25ms-per-
            # round-trip relay latency of the fetches overlaps device
            # compute instead of serializing with it (2-3 round trips per
            # epoch otherwise). Checkpoint decisions run one epoch late,
            # from an on-device snapshot taken before donation.
            pipeline = scan and bool(config.get("pipeline_epochs", True))
            if scan:
                # one upload per fold; epochs reshuffle on device instead of
                # re-shipping batches through the host->device relay
                staged_train = trainer.stage_batches(train_loader) or []
                staged_valid = trainer.stage_batches(valid_loader) or []
                shuffle_rng = jax.random.key(seed * 7919 + n)

            pending = None

            def consume_pending():
                """Finalize the in-flight epoch: fetch its metrics, run the
                NaN halt / best-val checkpoint / history logic."""
                nonlocal best_loss, pending
                if pending is None:
                    return
                p, pending = pending, None
                epoch = p["epoch"]
                train_avg, (valid_avg, mean_val_error) = (p["train_thunk"](),
                                                          p["valid_thunk"]())
                # measured after the blocking metric fetch so it covers the
                # epoch's device execution; with pipelining, consecutive
                # durations overlap by the next epoch's dispatch time
                duration = time.time() - p["begin"]

                if not (np.isfinite(train_avg["loss"])
                        and np.isfinite(valid_avg["loss"])):
                    # failure detection (SURVEY.md §5.3: the reference has
                    # none — a NaN silently poisons every later epoch and
                    # checkpoint): halt with a pointer to the last good
                    # checkpoint, which `checkpoint_file` resumes from
                    msg = (f"non-finite loss at fold {n} epoch {epoch} "
                           f"(train {train_avg['loss']}, "
                           f"val {valid_avg['loss']})")
                    log.print(msg)
                    # keep the failing epoch in the flushed history so the
                    # post-mortem tools can see where it blew up
                    history.append(history_record(epoch, p["begin"], duration,
                                                  train_avg, valid_avg,
                                                  mean_val_error))
                    write_history(checkpoint_dir, n, history)
                    if config.get("halt_on_nonfinite", True):
                        ckpt = checkpoint_path(checkpoint_dir, n)
                        hint = (f"; best checkpoint so far: {ckpt}"
                                if os.path.exists(ckpt)
                                else "; no finite epoch completed — no "
                                     "checkpoint was saved")
                        raise RuntimeError(
                            msg + hint + " (set halt_on_nonfinite = False "
                            "to keep training through it)")
                    # record already appended + flushed above — fall out
                    # before the unconditional append below duplicates it
                    return

                if valid_avg["loss"] <= best_loss:
                    # unlike the reference (which stores the fold number in
                    # epoch_num, main.py:279), store the real epoch so
                    # resume restarts where the checkpoint was taken
                    ck_params, ck_opt = p["snapshot"]
                    save_checkpoint(checkpoint_path(checkpoint_dir, n),
                                    ck_params, ck_opt, epoch,
                                    train_avg["loss"], valid_avg["loss"])
                    best_loss = valid_avg["loss"]

                history.append(history_record(epoch, p["begin"], duration,
                                              train_avg, valid_avg,
                                              mean_val_error))
                if epoch % 10 == 0:
                    log.print(epoch_line(epoch, train_avg, valid_avg,
                                         mean_val_error))

            for epoch in range(start_epoch, total_epochs + 1):
                begin = time.time()
                lr = lr_for_epoch(epoch, base_lr, config["learning_rates"],
                                  config["learning_rates_epochs"])
                opt_state = set_learning_rate(opt_state, lr)

                # a traced epoch must be consumed inside the trace context:
                # the pipelined dispatch returns before the device runs, so
                # an async-only block would capture almost no execution
                profiled = is_profiled(config.get("profile_dir"), epoch)
                with maybe_profile(config.get("profile_dir"), epoch):
                    if scan:
                        params, opt_state, packed = (
                            trainer.train_epoch_scanned_async(
                                params, opt_state, staged_train,
                                jax.random.fold_in(epoch_rng, epoch), mean,
                                std,
                                shuffle_key=jax.random.fold_in(shuffle_rng,
                                                               epoch)))
                        # light variant: per-epoch validation needs only the
                        # per-mesh-mean error in the packed scalars, so the
                        # [S, B, N] error stack is never materialized
                        eval_pending = trainer.evaluate_scanned_async(
                            params, staged_valid, mean, std,
                            with_errors=False)
                        # the checkpoint copy must exist before the NEXT
                        # epoch's scan donates these buffers (one extra
                        # device dispatch)
                        snapshot = (trainer.snapshot((params, opt_state))
                                    if pipeline else (params, opt_state))
                        train_thunk = (lambda pk=packed:
                                       trainer.finalize_train_metrics(pk))

                        def valid_thunk(ep=eval_pending):
                            avg, _ = trainer.finalize_eval_scanned(
                                ep, with_errors=False)
                            return avg, float(avg.get("error", 0.0))
                    else:
                        params, opt_state, train_avg = trainer.train_epoch(
                            params, opt_state, train_loader,
                            jax.random.fold_in(epoch_rng, epoch), mean, std)
                        valid_avg, errors = trainer.evaluate(
                            params, valid_loader, mean, std)
                        mve = float(errors.mean()) if errors.size else 0.0
                        snapshot = (params, opt_state)
                        train_thunk = (lambda ta=train_avg: ta)
                        valid_thunk = (lambda va=valid_avg, e=mve: (va, e))

                    consume_pending()
                    pending = {"epoch": epoch, "begin": begin,
                               "train_thunk": train_thunk,
                               "valid_thunk": valid_thunk,
                               "snapshot": snapshot}
                    if not pipeline or profiled:
                        consume_pending()

            consume_pending()
            write_history(checkpoint_dir, n, history)

        if do_test:
            # order the primary's checkpoint / norm.npz writes (made during
            # training) before every process reads them back
            sync_processes(f"fold{n}_artifacts")
            test_ds = MeshDataset(
                list(np.array(dataset_index)[test_index]), config, labels,
                template=np.asarray(template.v), dtype="test")
            test_loader = BatchIterator(test_ds, batch_size, shuffle=False)
            norm = np.load(os.path.join(checkpoint_dir, "norm.npz"),
                           allow_pickle=True)
            mean, std = (norm["mean"].astype(np.float32),
                         norm["std"].astype(np.float32))

            ckpt = load_checkpoint(checkpoint_path(checkpoint_dir, n),
                                   copy.deepcopy(init_params),
                                   trainer.init_opt_state(init_params))
            params = ckpt["params"]

            if config.get("scan_epoch", True):
                # one dispatch + a handful of pulls for the whole test set
                # (the per-batch evaluate() pays ~5 relay round-trips per
                # batch when collecting meshes)
                test_avg, errors, meshes = trainer.evaluate_scanned(
                    params, test_loader, mean, std, collect_meshes=True)
            else:
                test_avg, errors, meshes = trainer.evaluate(
                    params, test_loader, mean, std, collect_meshes=True)

            if vis:
                from ..parallel.sharding import is_primary

                if is_primary():  # multi-host: one writer of the .obj dumps
                    _save_sex_change_meshes(checkpoint_dir, n, test_ds,
                                            meshes, faces)

            log.print(
                "round {} test loss {},  mean error: {}, train sigma {}, "
                "classification acc {}, sex change rate {}".format(
                    n, test_avg["loss"], float(errors.mean()),
                    float(errors.std()), test_avg["accuracy"],
                    test_avg["sex_change_success_rate"]))
            results.append({"fold": n, **{k: float(v) for k, v in
                                          test_avg.items()},
                            "mean_error": float(errors.mean())})

    log.close()
    return results


def _save_sex_change_meshes(checkpoint_dir: str, fold: int,
                            dataset: MeshDataset, meshes: dict,
                            faces: np.ndarray) -> None:
    """Write recon/gt/oppo .obj triples into mesh{fold}/sex_change_{S,F}
    (reference main.py:113-122,163-177)."""
    save_path = os.path.join(checkpoint_dir, f"mesh{fold}")
    success_path = os.path.join(save_path, "sex_change_S")
    failed_path = os.path.join(save_path, "sex_change_F")
    os.makedirs(success_path, exist_ok=True)
    os.makedirs(failed_path, exist_ok=True)

    for i in range(meshes["index"].shape[0]):
        ds_idx = int(meshes["index"][i])
        stem = os.path.basename(dataset.filenames[ds_idx]).split(".")[0]
        out_dir = (success_path if meshes["oppo_pred"][i] ==
                   meshes["oppo_label"][i] else failed_path)
        save_obj(os.path.join(out_dir, stem + "_recon.obj"),
                 meshes["recon"][i], faces)
        save_obj(os.path.join(out_dir, stem + "_gt.obj"),
                 dataset.original[ds_idx], faces)
        save_obj(os.path.join(out_dir, stem + ".obj"),
                 meshes["oppo"][i], faces)
