"""End-to-end training tests on a tiny synthetic dataset (the reference's
fake-dataset validation strategy, README.md:27-30) plus unit tests for the
LR schedule, optimizer semantics, checkpointing, and data pipeline."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshvae_tpu.config import default_config
from meshvae_tpu.data.dataset import BatchIterator, MeshDataset, list_meshes
from meshvae_tpu.data.synthetic import generate_synthetic_dataset
from meshvae_tpu.mesh.io import save_obj
from meshvae_tpu.train.checkpoint import (checkpoint_path, load_checkpoint,
                                          save_checkpoint)
from meshvae_tpu.train.driver import run
from meshvae_tpu.train.loop import Trainer, lr_for_epoch, make_optimizer

from conftest import make_grid_mesh


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    """Grid-mesh template + synthetic dataset + small config."""
    root = tmp_path_factory.mktemp("tiny")
    template = make_grid_mesh(8, jitter=0.05)
    template_path = os.path.join(root, "template.obj")
    save_obj(template_path, template.v, template.f)

    data_dir = os.path.join(root, "data")
    generate_synthetic_dataset(template, data_dir, n_samples=20, seed=0)

    config = default_config()
    config.update({
        "checkpoint_dir": os.path.join(root, "ckpt"),
        "template": template_path,
        "root_dir": data_dir,
        "log_file": os.path.join(root, "ckpt", "log.txt"),
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
        "hierarchy_cache_dir": os.path.join(root, "cache"),
    })
    return config, template, root


class TestSchedule:
    def test_lr_step_schedule(self):
        lrs, lre = [1e-4, 5e-5], [500, 10000]
        assert lr_for_epoch(1, 1e-3, lrs, lre) == 1e-3
        assert lr_for_epoch(500, 1e-3, lrs, lre) == 1e-3
        assert lr_for_epoch(501, 1e-3, lrs, lre) == 1e-4
        assert lr_for_epoch(10001, 1e-3, lrs, lre) == 5e-5


class TestOptimizer:
    def test_matches_torch_adam_semantics(self):
        """First Adam step with L2 decay: update = -lr * g'/( sqrt(v^)+eps )
        with g' = g + wd*p folded in before the moments."""
        lr, wd = 1e-2, 0.1
        opt = make_optimizer(lr, wd)
        params = {"w": jnp.asarray([1.0, -2.0])}
        grads = {"w": jnp.asarray([0.5, 0.25])}
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        g = np.array([0.5, 0.25]) + wd * np.array([1.0, -2.0])
        # bias-corrected first step: m_hat = g, v_hat = g^2
        expected = -lr * g / (np.abs(g) + 1e-8)
        np.testing.assert_allclose(np.asarray(updates["w"]), expected,
                                   rtol=1e-5)


class TestDataPipeline:
    def test_list_meshes_labels_and_rejection(self, tiny_env, tmp_path):
        config, template, root = tiny_env
        idx, labels = list_meshes(config)
        assert len(idx) == 20
        assert all(labels[n] == (0 if "_f_" in n else 1) for n in idx)

        err_file = os.path.join(tmp_path, "err.txt")
        with open(err_file, "w") as fp:
            fp.write(idx[0] + " bad\n" + idx[1] + "\n")
        cfg2 = dict(config, error_file=err_file)
        idx2, _ = list_meshes(cfg2)
        assert len(idx2) == 18 and idx[0] not in idx2

    def test_dataset_normalization_and_inverse(self, tiny_env):
        config, template, root = tiny_env
        idx, labels = list_meshes(config)
        ds = MeshDataset(idx[:6], config, labels,
                         template=np.asarray(template.v), dtype="train")
        assert ds.x.shape == (6, 64, 3)
        # normalized train data has ~zero mean
        assert abs(ds.x.mean()) < 0.2
        # inverse transform recovers the original pose
        recovered = np.einsum("bnj,bjk->bnk",
                              ds.aligned * ds.s[:, None, None], ds.r) + ds.m
        np.testing.assert_allclose(recovered, ds.original, atol=1e-3)

    def test_batch_iterator_pads_and_masks(self, tiny_env):
        config, template, root = tiny_env
        idx, labels = list_meshes(config)
        ds = MeshDataset(idx[:6], config, labels,
                         template=np.asarray(template.v), dtype="train")
        batches = list(BatchIterator(ds, batch_size=4))
        assert len(batches) == 2
        assert batches[0]["mask"].sum() == 4
        assert batches[1]["mask"].sum() == 2
        assert batches[1]["x"].shape == (4, 64, 3)


class TestEndToEnd:
    def test_kfold_train_and_test(self, tiny_env):
        config, template, root = tiny_env
        results = run(config, do_train=True, do_test=True, vis=True)
        ckpt_dir = config["checkpoint_dir"]

        # artifacts: initial weights, per-fold checkpoints + history, norm.npz
        assert os.path.exists(os.path.join(ckpt_dir, "initial_weight.msgpack"))
        assert os.path.exists(os.path.join(ckpt_dir, "norm.npz"))
        for fold in (1, 2):
            assert os.path.exists(checkpoint_path(ckpt_dir, fold))
            with open(os.path.join(ckpt_dir, f"history{fold}.json")) as fp:
                history = json.load(fp)
            assert len(history) == 2
            rec = history[0]
            assert set(rec) == {"epoch", "begin", "duration", "finalized",
                                "training", "validation"}
            assert set(rec["validation"]) == {
                "loss", "kld", "reconstruction_loss", "accuracy", "error",
                "sex_change_success_rate"}
            assert np.isfinite(rec["training"]["loss"])

        # test results for both folds
        assert len(results) == 2
        assert all(np.isfinite(r["loss"]) for r in results)
        # vis artifacts exist
        assert os.path.isdir(os.path.join(ckpt_dir, "mesh1"))

    def test_halts_on_nonfinite_loss(self, tiny_env, tmp_path):
        """Failure detection (SURVEY.md §5.3: the reference has none): an
        exploding run halts with a pointer to the last good checkpoint
        instead of silently poisoning every later epoch."""
        config, template, root = tiny_env
        cfg = dict(config)
        cfg.update({
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "log_file": str(tmp_path / "ckpt" / "log.txt"),
            "learning_rate": 1e18,  # guaranteed blow-up
            "learning_rates": [1e18],
            "learning_rates_epochs": [0],
            "epoch": 4,
            "folds": 2,
        })
        with pytest.raises(RuntimeError, match="non-finite loss"):
            run(cfg, do_train=True, do_test=False)

        cfg["halt_on_nonfinite"] = False  # opt-out trains through it
        cfg["checkpoint_dir"] = str(tmp_path / "ckpt2")
        cfg["log_file"] = str(tmp_path / "ckpt2" / "log.txt")
        run(cfg, do_train=True, do_test=False)
        # each epoch appears exactly once even when its loss was non-finite
        # (the NaN branch used to append its record a second time)
        with open(os.path.join(cfg["checkpoint_dir"], "history1.json")) as f:
            hist = json.load(f)
        assert [rec["epoch"] for rec in hist] == list(range(1, 5))

    def test_overfits_single_batch(self, tiny_env):
        """Optimization sanity: 40 Adam steps on one batch reduce the loss."""
        config, template, root = tiny_env
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer
        model, ops, hier, _ = build_model_and_ops(config)
        trainer = make_trainer(dict(config, learning_rate=0.01), model, ops)
        idx, labels = list_meshes(config)
        ds = MeshDataset(idx[:4], config, labels,
                         template=np.asarray(template.v), dtype="train")
        batch = next(iter(BatchIterator(ds, batch_size=4)))
        mean, std = jnp.asarray(ds.mean), jnp.asarray(ds.std)

        params = trainer.init_params(jax.random.key(0))
        opt_state = trainer.init_opt_state(params)
        losses = []
        for step in range(100):
            params, opt_state, metrics = trainer._train_step(
                params, opt_state, trainer._put(batch),
                jax.random.fold_in(jax.random.key(1), step), mean, std)
            losses.append(float(np.asarray(metrics)[0]))
        assert losses[-1] < losses[0] - 2.0, (losses[0], losses[-1])


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, tiny_env):
        config, _, _ = tiny_env
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer
        model, ops, hier, template = build_model_and_ops(config)
        trainer = make_trainer(config, model, ops)
        params = trainer.init_params(jax.random.key(0))
        opt_state = trainer.init_opt_state(params)
        path = os.path.join(tmp_path, "ck.msgpack")
        save_checkpoint(path, params, opt_state, 7, 1.5, 2.5)
        restored = load_checkpoint(path, params, opt_state)
        assert restored["epoch_num"] == 7
        assert restored["val_loss"] == 2.5
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(restored["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestResume:
    def test_resume_from_checkpoint(self, tiny_env):
        """checkpoint_file resumes fold 1 at epoch_num + 1 (the reference's
        resume path is broken; ours must work)."""
        config, template, root = tiny_env
        ckpt_dir = os.path.join(root, "resume_ckpt")
        cfg1 = dict(config, checkpoint_dir=ckpt_dir, folds=2, epoch=2,
                    log_file=os.path.join(ckpt_dir, "log.txt"))
        run(cfg1, do_train=True, do_test=False)
        with open(os.path.join(ckpt_dir, "history1.json")) as fp:
            assert len(json.load(fp)) == 2

        # resume: total epochs becomes 4; fold 1 restarts at the
        # checkpoint's saved epoch + 1, fold 2 trains from scratch
        with open(checkpoint_path(ckpt_dir, 1) + ".meta.json") as fp:
            saved_epoch = json.load(fp)["epoch_num"]
        cfg2 = dict(cfg1, epoch=4,
                    checkpoint_file=checkpoint_path(ckpt_dir, 1))
        run(cfg2, do_train=True, do_test=False)
        with open(os.path.join(ckpt_dir, "history1.json")) as fp:
            hist1 = json.load(fp)
        assert [h["epoch"] for h in hist1] == list(range(saved_epoch + 1, 5))
        with open(os.path.join(ckpt_dir, "history2.json")) as fp:
            hist2 = json.load(fp)
        assert [h["epoch"] for h in hist2] == [1, 2, 3, 4]


class TestScanPaths:
    def test_evaluate_scanned_matches_unscanned(self, tiny_env):
        config, template, root = tiny_env
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer
        model, ops, hier, _ = build_model_and_ops(config)
        trainer = make_trainer(config, model, ops)
        idx, labels = list_meshes(config)
        ds = MeshDataset(idx[:10], config, labels,
                         template=np.asarray(template.v), dtype="train")
        loader = BatchIterator(ds, batch_size=4)  # 3 batches, last padded
        params = trainer.init_params(jax.random.key(0))

        avg_a, err_a = trainer.evaluate(params, loader, ds.mean, ds.std)
        avg_b, err_b = trainer.evaluate_scanned(params, loader, ds.mean,
                                                ds.std)
        for k in ("loss", "kld", "rec_loss", "accuracy",
                  "sex_change_success_rate", "count"):
            assert avg_b[k] == pytest.approx(avg_a[k], rel=1e-5), k
        np.testing.assert_allclose(err_b, err_a, rtol=1e-5, atol=1e-6)

    def test_evaluate_scanned_collects_meshes(self, tiny_env):
        """The scan path's mesh collection (driver test-with-vis) matches
        the per-batch evaluate(collect_meshes=True) output exactly."""
        config, template, root = tiny_env
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer
        model, ops, hier, _ = build_model_and_ops(config)
        trainer = make_trainer(config, model, ops)
        idx, labels = list_meshes(config)
        ds = MeshDataset(idx[:10], config, labels,
                         template=np.asarray(template.v), dtype="train")
        loader = BatchIterator(ds, batch_size=4)  # 3 batches, last padded
        params = trainer.init_params(jax.random.key(0))

        avg_a, err_a, mesh_a = trainer.evaluate(params, loader, ds.mean,
                                                ds.std, collect_meshes=True)
        avg_b, err_b, mesh_b = trainer.evaluate_scanned(
            params, loader, ds.mean, ds.std, collect_meshes=True)
        assert avg_b["loss"] == pytest.approx(avg_a["loss"], rel=1e-5)
        np.testing.assert_allclose(err_b, err_a, rtol=1e-5, atol=1e-6)
        for k in ("recon", "oppo", "oppo_pred", "oppo_label", "index"):
            np.testing.assert_allclose(np.asarray(mesh_b[k], np.float64),
                                       np.asarray(mesh_a[k], np.float64),
                                       rtol=1e-5, atol=1e-6, err_msg=k)
        assert mesh_b["recon"].shape == (10, template.v.shape[0], 3)

    def test_train_epoch_scanned_matches_loop(self, tiny_env):
        """Same rng, same batches: the scanned epoch equals the python-loop
        epoch (identical math, one dispatch)."""
        config, template, root = tiny_env
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer
        model, ops, hier, _ = build_model_and_ops(config)
        trainer = make_trainer(config, model, ops)
        idx, labels = list_meshes(config)
        ds = MeshDataset(idx[:8], config, labels,
                         template=np.asarray(template.v), dtype="train")
        loader = BatchIterator(ds, batch_size=4)
        rng = jax.random.key(7)

        p0 = trainer.init_params(jax.random.key(0))
        o0 = trainer.init_opt_state(p0)
        p_loop, _, avg_loop = trainer.train_epoch(p0, o0, loader, rng,
                                                  ds.mean, ds.std)
        p1 = trainer.init_params(jax.random.key(0))
        o1 = trainer.init_opt_state(p1)
        p_scan, _, avg_scan = trainer.train_epoch_scanned(p1, o1, loader, rng,
                                                          ds.mean, ds.std)
        assert avg_scan["loss"] == pytest.approx(avg_loop["loss"], rel=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_loop),
                        jax.tree_util.tree_leaves(p_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_staged_epoch_matches_loader_epoch(self, tiny_env):
        """stage_batches + identity shuffle reproduces the loader-fed
        scanned epoch exactly (the dataset uploads once per fold and later
        epochs reshuffle on device); a shuffle_key permutes the batch
        composition but preserves the sample population (count/metrics
        stay a weighted average over the same meshes)."""
        config, template, root = tiny_env
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer
        model, ops, hier, _ = build_model_and_ops(config)
        trainer = make_trainer(config, model, ops)
        idx, labels = list_meshes(config)
        ds = MeshDataset(idx[:10], config, labels,
                         template=np.asarray(template.v), dtype="train")
        loader = BatchIterator(ds, batch_size=4)  # 3 batches, last padded
        rng = jax.random.key(7)

        p0 = trainer.init_params(jax.random.key(0))
        o0 = trainer.init_opt_state(p0)
        p_ref, _, avg_ref = trainer.train_epoch_scanned(p0, o0, loader, rng,
                                                        ds.mean, ds.std)
        staged = trainer.stage_batches(loader)
        p1 = trainer.init_params(jax.random.key(0))
        o1 = trainer.init_opt_state(p1)
        p_staged, _, avg_staged = trainer.train_epoch_scanned(
            p1, o1, staged, rng, ds.mean, ds.std)
        assert avg_staged["loss"] == pytest.approx(avg_ref["loss"], rel=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_staged)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

        # staged eval matches loader eval bit-for-bit too
        avg_e1, err_e1 = trainer.evaluate_scanned(p_staged, loader, ds.mean,
                                                  ds.std)
        avg_e2, err_e2 = trainer.evaluate_scanned(p_staged, staged, ds.mean,
                                                  ds.std)
        assert avg_e2["loss"] == pytest.approx(avg_e1["loss"], rel=1e-6)
        np.testing.assert_allclose(err_e2, err_e1, rtol=1e-6, atol=1e-7)

        # shuffled: same sample population, different composition
        p2 = trainer.init_params(jax.random.key(0))
        o2 = trainer.init_opt_state(p2)
        _, _, avg_shuf = trainer.train_epoch_scanned(
            p2, o2, staged, rng, ds.mean, ds.std,
            shuffle_key=jax.random.key(3))
        assert avg_shuf["count"] == avg_ref["count"]
        assert np.isfinite(avg_shuf["loss"])


class TestEpochPipeline:
    """The driver's epoch pipeline (pipeline_epochs, train/driver.py)
    defers each epoch's metric fetches until the next epoch is dispatched
    and checkpoints from an on-device snapshot. It must be a pure latency
    optimization: identical history metrics and an identical best
    checkpoint vs the synchronous path."""

    def _run_driver(self, root, pipeline: bool):
        from meshvae_tpu.train.driver import run
        from conftest import make_grid_mesh

        os.makedirs(root, exist_ok=True)
        template = make_grid_mesh(6, jitter=0.05)
        template_path = os.path.join(root, "template.obj")
        save_obj(template_path, template.v, template.f)
        data_dir = os.path.join(root, "data")
        generate_synthetic_dataset(template, data_dir, n_samples=8, seed=3)
        config = default_config()
        config.update({
            "checkpoint_dir": os.path.join(root, "ckpt"),
            "template": template_path,
            "root_dir": data_dir,
            "log_file": os.path.join(root, "ckpt", "log.txt"),
            "folds": 2,
            "test_size": 0.25,
            "n_layers": 2,
            "num_hidden": 8,
            "num_style": 4,
            "downsampling_factors": [2, 2],
            "polygon_order": [3, 3, 3],
            "num_conv_filters": [4, 8, 8],
            "batch_size": 4,
            "epoch": 3,
            "hierarchy_cache_dir": os.path.join(root, "cache"),
            "pipeline_epochs": pipeline,
        })
        run(config, do_train=True, do_test=False)
        hist_path = os.path.join(config["checkpoint_dir"], "history1.json")
        with open(hist_path) as f:
            history = json.load(f)
        from meshvae_tpu.train.checkpoint import load_checkpoint
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer

        model, ops, _, _ = build_model_and_ops(config)
        trainer = make_trainer(config, model, ops)
        init = trainer.init_params(jax.random.key(int(config["random_seeds"])))
        ckpt = load_checkpoint(
            os.path.join(config["checkpoint_dir"], "checkpoint_1.msgpack"),
            init, trainer.init_opt_state(init))
        return history, ckpt

    def test_pipeline_matches_synchronous(self, tmp_path):
        hist_p, ckpt_p = self._run_driver(str(tmp_path / "pipe"), True)
        hist_s, ckpt_s = self._run_driver(str(tmp_path / "sync"), False)
        assert len(hist_p) == len(hist_s) == 3
        for rp, rs in zip(hist_p, hist_s):
            for k in ("loss", "kld", "reconstruction_loss", "accuracy",
                      "error"):
                for split in ("training", "validation"):
                    if k in rp[split]:
                        assert rp[split][k] == pytest.approx(
                            rs[split][k], rel=1e-6), (k, split)
        assert ckpt_p["epoch_num"] == ckpt_s["epoch_num"]
        for a, b in zip(jax.tree_util.tree_leaves(ckpt_p["params"]),
                        jax.tree_util.tree_leaves(ckpt_s["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)


class TestQualityEquivalence:
    """The throughput-record training path must LEARN as well as the
    parity path (VERDICT r3 #1): same tiny synthetic problem, 30 epochs,
    the bf16 + scan + pipelined configuration must reach the f32 HIGHEST
    path's validation error within tolerance. The hardware-scale twin of
    this assertion (template5k, 300 epochs, pallas kernels, real TPU) is
    the committed RESULTS.md campaign."""

    def _train(self, tiny_env, tmp_path, name, **overrides):
        config, template, root = tiny_env
        cfg = dict(config)
        cfg.update({
            "checkpoint_dir": os.path.join(tmp_path, name),
            "log_file": os.path.join(tmp_path, name, "log.txt"),
            "epoch": 30,
            "folds": 2,
            "scan_epoch": True,
        })
        cfg.update(overrides)
        run(cfg, do_train=True, do_test=False)
        folds = []
        for fold in (1, 2):
            with open(os.path.join(cfg["checkpoint_dir"],
                                   f"history{fold}.json")) as f:
                hist = json.load(f)
            folds.append({
                "train_loss": [rec["training"]["loss"] for rec in hist],
                "train_acc": [rec["training"]["accuracy"] for rec in hist],
                "val_acc": [rec["validation"]["accuracy"] for rec in hist],
                "val_error": [rec["validation"]["error"] for rec in hist],
            })
        return folds

    def test_bf16_record_path_reaches_f32_val_error(self, tiny_env, tmp_path):
        f32 = self._train(tiny_env, str(tmp_path), "f32",
                          cheb_method="dense",
                          matmul_precision="highest")
        b16 = self._train(tiny_env, str(tmp_path), "bf16",
                          cheb_method="dense",
                          compute_dtype="bfloat16",
                          matmul_precision="default")
        for ff, bb in zip(f32, b16):
            # Both learn. The tiny fixture's loss carries the fixed-sigma
            # NLL floor (~381, SURVEY §3.2), so relative loss drops are
            # ~0.1%: the live learning signals here are the classifier
            # climbing from chance to perfect and the loss going DOWN at
            # all; the full-scale twin of this assertion (template5k,
            # 300 epochs, real TPU, val error 3.06 -> 1.42) is RESULTS.md.
            for leg in (ff, bb):
                assert leg["train_acc"][0] < 1.0, leg["train_acc"]
                assert leg["train_acc"][-1] == 1.0, leg["train_acc"]
                assert leg["val_acc"][-1] == 1.0, leg["val_acc"]
                assert leg["train_loss"][-1] < leg["train_loss"][0], leg
            # and the record path's converged val error lands within 10%
            # of the parity path's
            assert bb["val_error"][-1] < 1.10 * ff["val_error"][-1], (
                bb["val_error"][-1], ff["val_error"][-1])
