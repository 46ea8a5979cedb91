"""CLI-pipeline tests on the tiny synthetic environment: inference driver,
crecon second stage, report/plot tools."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# trained_env (session-scoped tiny train run) lives in conftest.py —
# shared with tests/test_serve.py


class TestInference:
    def test_inference_driver_outputs(self, trained_env):
        from meshvae_tpu.infer.driver import run_inference
        from meshvae_tpu.train.checkpoint import (checkpoint_path,
                                                  load_checkpoint)
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer

        config, template, root = trained_env
        model, ops, hier, tmpl = build_model_and_ops(config)
        trainer = make_trainer(config, model, ops)
        target = trainer.init_params(jax.random.key(0))
        ck = load_checkpoint(checkpoint_path(config["checkpoint_dir"], 1),
                             target, trainer.init_opt_state(target))
        norm = np.load(os.path.join(config["checkpoint_dir"], "norm.npz"))
        out_dir = os.path.join(root, "inference_out")

        results = run_inference(
            ck["params"], model, ops, out_dir,
            norm["mean"].astype(np.float32), norm["std"].astype(np.float32),
            config, template=np.asarray(tmpl.v), batch_size=4,
            faces=np.asarray(tmpl.f))

        assert len(results) == 16
        for name in ("pred.json", "error_list.json", "inference.json"):
            assert os.path.exists(os.path.join(out_dir, name))
        with open(os.path.join(out_dir, "inference.json")) as fp:
            inf = json.load(fp)
        sample = next(iter(inf.values()))
        assert set(sample) == {"sex", "reconstruction_error"}
        assert sample["sex"] in (0, 1)
        assert sample["reconstruction_error"]["max"] >= \
            sample["reconstruction_error"]["mean"] >= 0
        # recon/gt/oppo triples
        objs = os.listdir(os.path.join(out_dir, "sex_change"))
        assert len(objs) == 3 * 16

    def test_report_cli(self, trained_env):
        config, template, root = trained_env
        out_dir = os.path.join(root, "inference_out")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "report.py"),
             os.path.join(out_dir, "inference.json"), "-p", "-e"],
            capture_output=True, text=True)
        assert proc.returncode == 0, proc.stderr
        assert "16 predictions" in proc.stdout
        assert "Accuracy" in proc.stdout
        assert "Sorted max errors:" in proc.stdout


class TestCrecon:
    def test_crecon_train_and_test(self, trained_env):
        from meshvae_tpu.train import crecon_driver

        config, template, root = trained_env
        crecon_config = dict(config)
        crecon_config.update({
            "type": "cheb_GCN",
            "checkpoint_file": os.path.join(config["checkpoint_dir"],
                                            "checkpoint_1.msgpack"),
            "checkpoint_dir": os.path.join(root, "crecon_ckpt"),
            "log_file": os.path.join(root, "crecon_ckpt", "log.txt"),
            "epoch": 2,
            "learning_rate": 1e-4,
        })
        results = crecon_driver.run(crecon_config, do_train=True, do_test=True)
        assert len(results) == 5  # crecon always runs 5 folds (reference)
        assert all(np.isfinite(r["test_loss"]) for r in results)
        assert all(0.0 <= r["test_acc"] <= 1.0 for r in results)
        assert os.path.exists(os.path.join(root, "crecon_ckpt",
                                           "checkpoint_1.msgpack"))

    def test_crecon_requires_vae_checkpoint(self, trained_env):
        from meshvae_tpu.train import crecon_driver
        config, _, root = trained_env
        bad = dict(config, checkpoint_file=os.path.join(root, "missing.msgpack"),
                   checkpoint_dir=os.path.join(root, "crecon_bad"))
        with pytest.raises(FileNotFoundError):
            crecon_driver.run(bad, do_train=True, do_test=False)

    def test_estimate_diff_semantics(self, trained_env):
        """diff = concat(x - recon_oppo, x - recon_same); train conditions on
        true labels, eval on predictions."""
        from meshvae_tpu.train.crecon_driver import estimate_diff
        from meshvae_tpu.train.checkpoint import (checkpoint_path,
                                                  load_checkpoint)
        from meshvae_tpu.train.driver import build_model_and_ops, make_trainer

        config, template, root = trained_env
        model, ops, hier, tmpl = build_model_and_ops(config)
        trainer = make_trainer(config, model, ops)
        target = trainer.init_params(jax.random.key(0))
        ck = load_checkpoint(checkpoint_path(config["checkpoint_dir"], 1),
                             target, trainer.init_opt_state(target))
        params = ck["params"]

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, hier.levels[0], 3))
                        .astype(np.float32))
        labels = jnp.asarray([0, 1, 0])
        diff, correct, pred = estimate_diff(model, params, x, labels, ops,
                                            train=True)
        assert diff.shape == (3, hier.levels[0], 6)
        assert 0 <= int(correct) <= 3

        # reconstructing the recon from the diff halves: x - diff[..., 3:]
        # must equal the same-label reconstruction
        h = model.apply(params, x, ops, method=type(model).encode)
        onehot = jax.nn.one_hot(labels, 2)
        hy = jnp.concatenate([onehot, h], axis=-1)
        mu = model.apply(params, hy, method=lambda m, v: m.z_mean(v))
        recon = model.apply(params, onehot, mu, ops, method=type(model).sample)
        np.testing.assert_allclose(np.asarray(x - diff[..., 3:]),
                                   np.asarray(recon), rtol=1e-5, atol=1e-5)


class TestPlotLosses:
    def test_plot_cli(self, trained_env):
        config, template, root = trained_env
        out_png = os.path.join(root, "hist.png")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "plotLosses.py"),
             os.path.join(config["checkpoint_dir"], "history1.json"),
             "-o", out_png],
            capture_output=True, text=True)
        assert proc.returncode == 0, proc.stderr
        assert os.path.getsize(out_png) > 10_000


class TestBenchAutoDegradation:
    """bench.py auto mode must survive a local-comparison-leg crash.

    The 80k ell leg reproducibly kills the TPU worker mid-scan (XLA gather
    fault at [B, 80k, deg, F]); the pallas number was already measured in
    its own subprocess, so the bench degrades to reporting it without the
    loss cross-check rather than dying with no JSON line."""

    def _run_main(self, monkeypatch, capsys, local_fails):
        import types

        sys.path.insert(0, REPO)
        try:
            import bench
        finally:
            sys.path.pop(0)
        import meshvae_tpu.mesh.hierarchy as hierarchy_mod

        fake_hier = types.SimpleNamespace(levels=[4998, 1250, 313, 79, 20])
        monkeypatch.setattr(hierarchy_mod, "load_or_build_hierarchy",
                            lambda template, factors: fake_hier)
        monkeypatch.setattr(
            bench, "try_pallas_subprocess",
            lambda args, polygon_order, mode="train": (123.4, 1.5))

        if local_fails:
            def measure(*a, **k):
                raise RuntimeError("TPU worker process crashed")
        else:
            def measure(*a, **k):
                parity = k.get("parity")
                if parity is not None:
                    parity.update(recon=np.zeros((2, 3), np.float32),
                                  grad_norm=1.0, loss=1.5)
                return 50.0, 1.5
        monkeypatch.setattr(bench, "measure_jax", measure)
        monkeypatch.setattr(bench, "step_cost_model",
                            lambda *a, **k: (1e9, 1e8))
        monkeypatch.setattr(sys, "argv",
                            ["bench.py", "--cpu", "--skip-torch",
                             "--steps", "2"])
        bench.main()
        out = capsys.readouterr().out.strip().splitlines()[-1]
        return json.loads(out)

    def test_local_leg_crash_reports_pallas(self, monkeypatch, capsys):
        rec = self._run_main(monkeypatch, capsys, local_fails=True)
        assert rec["value"] == 123.4
        assert rec["local_leg_failed"] == "RuntimeError"
        # a self-comparison must not masquerade as a dense cross-check
        assert "compiled_pallas_matches_dense" not in rec
        assert rec["loss"] == 1.5

    def test_local_leg_ok_keeps_cross_check(self, monkeypatch, capsys):
        rec = self._run_main(monkeypatch, capsys, local_fails=False)
        assert rec["value"] == 123.4  # pallas leg wins
        assert rec["compiled_pallas_matches_dense"] is True
        assert "local_leg_failed" not in rec
