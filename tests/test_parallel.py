"""Multi-device tests on the virtual 8-device CPU mesh: dp/sp sharded
training steps compile, run, and match the single-device result."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshvae_tpu.data.synthetic import generate_synthetic_dataset
from meshvae_tpu.mesh.hierarchy import build_hierarchy
from meshvae_tpu.models.operators import build_operators
from meshvae_tpu.models.vae import MeshVAE, VAEConfig
from meshvae_tpu.parallel.sharding import (batch_sharding, make_device_mesh,
                                           shard_operators)
from meshvae_tpu.train.loop import Trainer

from conftest import make_grid_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    mesh = make_grid_mesh(8, jitter=0.05)
    hier = build_hierarchy(mesh, [2, 2])
    ops = build_operators(hier)
    config = {
        "num_conv_filters": [8, 16, 16],
        "polygon_order": [3, 3, 3],
        "n_layers": 2,
        "num_hidden": 32,
        "num_style": 8,
        "num_classes": 2,
        "dropout": 0.0,  # rng-free so dp and single-device paths compare
        "learning_rate": 1e-3,
        "weight_decay": 5e-4,
    }
    cfg = VAEConfig.from_config(config, coarse_verts=hier.levels[-1])
    model = MeshVAE(cfg)
    rng = np.random.default_rng(0)
    n0 = hier.levels[0]
    batch_size = 8
    batch = {
        "x": rng.standard_normal((batch_size, n0, 3)).astype(np.float32),
        "label": rng.integers(0, 2, batch_size).astype(np.int32),
        "r": np.tile(np.eye(3, dtype=np.float32), (batch_size, 1, 1)),
        "s": np.ones(batch_size, np.float32),
        "m": np.zeros((batch_size, 1, 3), np.float32),
        "original": rng.standard_normal((batch_size, n0, 3)).astype(np.float32),
        "mask": np.ones(batch_size, np.float32),
    }
    mean = np.zeros((n0, 3), np.float32)
    std = np.ones((n0, 3), np.float32)
    return model, ops, config, batch, mean, std


def _one_step(model, ops, config, batch, mean, std, mesh):
    trainer = Trainer(model, ops, config, mesh=mesh)
    params = trainer.init_params(jax.random.key(0))
    opt_state = trainer.init_opt_state(params)
    params = trainer.maybe_replicate(params)
    opt_state = trainer.maybe_replicate(opt_state)
    m = trainer.maybe_replicate(jnp.asarray(mean))
    s = trainer.maybe_replicate(jnp.asarray(std))
    params, opt_state, metrics = trainer._train_step(
        params, opt_state, trainer._put(dict(batch)), jax.random.key(1), m, s)
    from meshvae_tpu.train.loop import unpack_metrics
    return params, unpack_metrics(metrics)


class TestDataParallel:
    def test_dp8_matches_single_device(self, setup):
        model, ops, config, batch, mean, std = setup
        p_single, m_single = _one_step(model, ops, config, batch, mean, std,
                                       mesh=None)
        dmesh = make_device_mesh(dp=8)
        p_dp, m_dp = _one_step(model, ops, config, batch, mean, std,
                               mesh=dmesh)
        assert m_dp["loss"] == pytest.approx(m_single["loss"], rel=1e-4)
        assert m_dp["error"] == pytest.approx(m_single["error"], rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p_single),
                        jax.tree_util.tree_leaves(p_dp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_dp4_sp2_matches_single_device(self, setup):
        """Vertex-sharded operators (sp axis) produce the same step."""
        model, ops, config, batch, mean, std = setup
        p_single, m_single = _one_step(model, ops, config, batch, mean, std,
                                       mesh=None)
        dmesh = make_device_mesh(dp=4, sp=2)
        p_sp, m_sp = _one_step(model, ops, config, batch, mean, std,
                               mesh=dmesh)
        assert m_sp["loss"] == pytest.approx(m_single["loss"], rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p_single),
                        jax.tree_util.tree_leaves(p_sp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_batch_actually_sharded(self, setup):
        model, ops, config, batch, mean, std = setup
        dmesh = make_device_mesh(dp=8)
        sharded = jax.device_put(jnp.asarray(batch["x"]),
                                 batch_sharding(dmesh))
        assert len(sharded.sharding.device_set) == 8

    def test_operators_row_sharded(self, setup):
        model, ops, config, batch, mean, std = setup
        dmesh = make_device_mesh(dp=4, sp=2)
        sharded_ops = shard_operators(ops, dmesh)
        dense0 = sharded_ops.lap[0].dense
        spec = dense0.sharding.spec
        assert spec[0] == "sp" or dense0.shape[0] % 2 != 0

    def test_pallas_method_under_mesh(self, setup):
        """cheb_method=pallas under a dp4 x sp2 mesh runs the DISTRIBUTED
        kernel (shard_operators converts BSR to per-device row shards and
        the propagation shard_maps over "sp", ops/pallas_shard.py); the
        step must equal the single-device step (interpreter-mode kernel on
        the CPU mesh)."""
        import meshvae_tpu.ops.graph as graph_mod
        import meshvae_tpu.ops.pallas_cheb as pc
        from meshvae_tpu.mesh.hierarchy import build_hierarchy
        from meshvae_tpu.models.operators import build_operators
        from conftest import make_grid_mesh

        model, _, config, batch, mean, std = setup
        hier = build_hierarchy(make_grid_mesh(8, jitter=0.05), [2, 2])
        saved = graph_mod.PALLAS_MIN_N
        graph_mod.PALLAS_MIN_N = 0
        pc.INTERPRET = True
        try:
            ops = build_operators(hier, cheb_method="pallas",
                                  pool_method="gather")
            cfg = dict(config)
            cfg["cheb_method"] = "pallas"
            from meshvae_tpu.models.vae import MeshVAE, VAEConfig
            pmodel = MeshVAE(VAEConfig.from_config(
                cfg, coarse_verts=hier.levels[-1]))
            p_single, m_single = _one_step(pmodel, ops, cfg, batch, mean,
                                           std, mesh=None)
            dmesh = make_device_mesh(dp=4, sp=2)
            p_mesh, m_mesh = _one_step(pmodel, ops, cfg, batch, mean, std,
                                       mesh=dmesh)
        finally:
            graph_mod.PALLAS_MIN_N = saved
            pc.INTERPRET = False
        for k in m_single:
            np.testing.assert_allclose(m_mesh[k], m_single[k], rtol=1e-5,
                                       atol=1e-6, err_msg=k)
        # post-update params certify the BACKWARD pass (the fused adjoint
        # recurrence in _basis_mix_sharded), not just the forward loss
        for a, b in zip(jax.tree_util.tree_leaves(p_single),
                        jax.tree_util.tree_leaves(p_mesh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestScannedPathsUnderMesh:
    """The driver defaults to scan_epoch=True — the scanned epoch/eval paths
    must be proven under sharding, not just the single step."""

    def _loader(self, batch, steps=3):
        rng = np.random.default_rng(7)
        out = []
        for s in range(steps):
            b = dict(batch)
            b["x"] = batch["x"] + 0.01 * s
            b["label"] = rng.integers(0, 2, batch["label"].shape[0]).astype(
                np.int32)
            out.append(b)
        return out

    def test_train_epoch_scanned_dp_matches_single(self, setup):
        model, ops, config, batch, mean, std = setup
        loader = self._loader(batch)

        def run(mesh):
            trainer = Trainer(model, ops, config, mesh=mesh)
            params = trainer.init_params(jax.random.key(0))
            opt_state = trainer.init_opt_state(params)
            params, opt_state, avg = trainer.train_epoch_scanned(
                params, opt_state, list(loader), jax.random.key(1),
                jnp.asarray(mean), jnp.asarray(std))
            return params, avg

        p1, avg1 = run(None)
        p8, avg8 = run(make_device_mesh(dp=8))
        assert avg8["loss"] == pytest.approx(avg1["loss"], rel=1e-4)
        assert avg8["error"] == pytest.approx(avg1["error"], rel=1e-4)
        assert avg8["count"] == avg1["count"]
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_train_epoch_scanned_dp_sp(self, setup):
        model, ops, config, batch, mean, std = setup
        loader = self._loader(batch)
        trainer = Trainer(model, ops, config, mesh=make_device_mesh(dp=4, sp=2))
        params = trainer.init_params(jax.random.key(0))
        opt_state = trainer.init_opt_state(params)
        params, opt_state, avg = trainer.train_epoch_scanned(
            params, opt_state, loader, jax.random.key(1),
            jnp.asarray(mean), jnp.asarray(std))
        assert np.isfinite(avg["loss"])

    def test_evaluate_scanned_dp_matches_single(self, setup):
        model, ops, config, batch, mean, std = setup
        loader = self._loader(batch)

        def run(mesh):
            trainer = Trainer(model, ops, config, mesh=mesh)
            params = trainer.init_params(jax.random.key(0))
            return trainer.evaluate_scanned(params, list(loader),
                                            jnp.asarray(mean),
                                            jnp.asarray(std))

        avg1, err1 = run(None)
        avg8, err8 = run(make_device_mesh(dp=8))
        assert avg8["loss"] == pytest.approx(avg1["loss"], rel=1e-4)
        assert avg8["accuracy"] == avg1["accuracy"]
        assert avg8["sex_change_success_rate"] == avg1["sex_change_success_rate"]
        np.testing.assert_allclose(err8, err1, rtol=1e-4, atol=1e-5)


class TestInferencePipelineParallel:
    """BASELINE config 4 (batch inference) under dp/sp sharding: the
    InferenceEngine step must equal the single-device result."""

    def _infer_batch(self, batch):
        return {k: batch[k] for k in ("x", "r", "s", "m", "original", "mask")}

    def _run(self, model, ops, batch, mean, std, dmesh):
        from meshvae_tpu.infer.driver import InferenceEngine

        engine = InferenceEngine(model, ops, mesh=dmesh)
        params = model.init({"params": jax.random.key(0)},
                            jnp.zeros((1,) + batch["x"].shape[1:]),
                            jnp.zeros((1, 2)), ops, train=False)
        params = engine.replicate(params)
        out = engine.step(params, engine.put_batch(self._infer_batch(batch)),
                          engine.replicate(jnp.asarray(mean)),
                          engine.replicate(jnp.asarray(std)))
        from meshvae_tpu.parallel.sharding import fetch
        return {k: fetch(v) for k, v in out.items()}

    def test_dp8_matches_single_device(self, setup):
        model, ops, config, batch, mean, std = setup
        out1 = self._run(model, ops, batch, mean, std, None)
        out8 = self._run(model, ops, batch, mean, std, make_device_mesh(dp=8))
        for k in ("pred", "recon_orig", "oppo_orig", "err_mean", "err_max"):
            np.testing.assert_allclose(out8[k], out1[k], rtol=1e-4,
                                       atol=1e-5, err_msg=k)

    def test_dp4_sp2_matches_single_device(self, setup):
        model, ops, config, batch, mean, std = setup
        out1 = self._run(model, ops, batch, mean, std, None)
        outm = self._run(model, ops, batch, mean, std,
                         make_device_mesh(dp=4, sp=2))
        for k in ("pred", "recon_orig", "err_mean"):
            np.testing.assert_allclose(outm[k], out1[k], rtol=1e-4,
                                       atol=1e-5, err_msg=k)


class TestCreconParallel:
    """The crecon second-stage step (BASELINE config 2) under dp/sp: train
    step and scanned epoch must equal single-device."""

    def _build(self, setup, dmesh):
        from meshvae_tpu.mesh.hierarchy import build_hierarchy
        from meshvae_tpu.models.gcn import ChebGCN, GCNConfig
        from meshvae_tpu.train.crecon_driver import CreconTrainer

        model, ops, config, batch, mean, std = setup
        hier = build_hierarchy(make_grid_mesh(8, jitter=0.05), [2, 2])
        cfg = dict(config, learning_rate=1e-4, scan_epoch=True)
        gcn = ChebGCN(GCNConfig.from_config(cfg, coarse_verts=hier.levels[-1],
                                            num_features=6))
        trainer = CreconTrainer(gcn, model, ops, cfg, mesh=dmesh)
        vae_params = model.init({"params": jax.random.key(0)},
                                jnp.zeros((1,) + batch["x"].shape[1:]),
                                jnp.zeros((1, 2)), ops, train=False)
        return trainer, vae_params

    def _epoch(self, setup, dmesh):
        model, ops, config, batch, mean, std = setup
        trainer, vae_params = self._build(setup, dmesh)
        params = trainer.init_params(jax.random.key(1))
        opt_state = trainer.optimizer.init(params)
        loader = [{k: batch[k] for k in ("x", "label", "mask")}
                  for _ in range(3)]
        params, opt_state, loss, acc = trainer.run_epoch(
            params, opt_state, vae_params, loader, train=True)
        return params, loss, acc

    def test_dp8_epoch_matches_single_device(self, setup):
        p1, loss1, acc1 = self._epoch(setup, None)
        p8, loss8, acc8 = self._epoch(setup, make_device_mesh(dp=8))
        assert loss8 == pytest.approx(loss1, rel=1e-4)
        assert acc8 == pytest.approx(acc1, abs=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_dp4_sp2_epoch_matches_single_device(self, setup):
        p1, loss1, acc1 = self._epoch(setup, None)
        pm, lossm, accm = self._epoch(setup, make_device_mesh(dp=4, sp=2))
        assert lossm == pytest.approx(loss1, rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(pm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestJointParallel:
    """The joint disentangled VAE + classifier (BASELINE config 3) under
    dp/sp: one optimizer step must equal single-device — inheritance from
    Trainer is machinery, not evidence, so the composed model (two decode
    passes + gradient reversal + live diff-feature GCN) gets its own
    equivalence class like crecon/inference."""

    def _build(self, setup):
        from meshvae_tpu.models.joint import build_joint_model

        model, ops, config, batch, mean, std = setup
        hier = build_hierarchy(make_grid_mesh(8, jitter=0.05), [2, 2])
        cfg = dict(config, latent_split=2, sup_weight=1.0, adv_weight=0.1,
                   cls_weight=1.0)
        joint = build_joint_model(cfg, coarse_verts=hier.levels[-1])
        return joint, cfg

    def _one_step(self, setup, dmesh):
        from meshvae_tpu.train.joint import JointTrainer

        model, ops, config, batch, mean, std = setup
        joint, cfg = self._build(setup)
        trainer = JointTrainer(joint, ops, cfg, mesh=dmesh)
        params = trainer.init_params(jax.random.key(0))
        opt_state = trainer.init_opt_state(params)
        params = trainer.maybe_replicate(params)
        opt_state = trainer.maybe_replicate(opt_state)
        m = trainer.maybe_replicate(jnp.asarray(mean))
        s = trainer.maybe_replicate(jnp.asarray(std))
        params, opt_state, metrics = trainer._train_step(
            params, opt_state, trainer._put(dict(batch)), jax.random.key(1),
            m, s)
        from meshvae_tpu.train.loop import unpack_metrics

        return params, unpack_metrics(metrics)

    def test_dp8_matches_single_device(self, setup):
        p1, m1 = self._one_step(setup, None)
        p8, m8 = self._one_step(setup, make_device_mesh(dp=8))
        assert m8["loss"] == pytest.approx(m1["loss"], rel=1e-4)
        assert m8["error"] == pytest.approx(m1["error"], rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_dp4_sp2_matches_single_device(self, setup):
        p1, m1 = self._one_step(setup, None)
        pm, mm = self._one_step(setup, make_device_mesh(dp=4, sp=2))
        assert mm["loss"] == pytest.approx(m1["loss"], rel=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(pm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_eval_scanned_dp8_matches_single_device(self, setup):
        """The joint eval path (extra sup/adv scalars) under dp."""
        from meshvae_tpu.train.joint import JointTrainer

        model, ops, config, batch, mean, std = setup
        joint, cfg = self._build(setup)
        loader = [dict(batch) for _ in range(2)]

        def run(dmesh):
            trainer = JointTrainer(joint, ops, cfg, mesh=dmesh)
            params = trainer.init_params(jax.random.key(0))
            return trainer.evaluate_scanned(params, list(loader),
                                            jnp.asarray(mean),
                                            jnp.asarray(std))

        avg1, err1 = run(None)
        avg8, err8 = run(make_device_mesh(dp=8))
        for k in ("loss", "accuracy", "sup_accuracy", "adv_accuracy",
                  "sex_change_success_rate"):
            assert avg8[k] == pytest.approx(avg1[k], rel=1e-4), k
        np.testing.assert_allclose(err8, err1, rtol=1e-4, atol=1e-5)


class TestServeParallel:
    """The warm serving loop (infer/serve.py) under dp/sp sharding: a
    multi-chunk request through the pipelined handle() must score each
    mesh identically to the unsharded server."""

    @pytest.fixture(scope="class")
    def serve_env(self, tmp_path_factory):
        template = make_grid_mesh(8, jitter=0.05)
        hier = build_hierarchy(template, [2, 2])
        ops = build_operators(hier)
        cfg = VAEConfig.from_config({
            "num_conv_filters": [8, 16, 16], "polygon_order": [3, 3, 3],
            "n_layers": 2, "num_hidden": 32, "num_style": 8,
            "num_classes": 2, "dropout": 0.0,
        }, coarse_verts=hier.levels[-1])
        model = MeshVAE(cfg)
        n0 = hier.levels[0]
        params = model.init({"params": jax.random.key(0)},
                            jnp.zeros((1, n0, 3)), jnp.zeros((1, 2)), ops,
                            train=False)
        data_dir = str(tmp_path_factory.mktemp("serve_par"))
        generate_synthetic_dataset(template, data_dir, n_samples=12, seed=2)
        import os
        paths = sorted(os.path.join(data_dir, f) for f in os.listdir(data_dir)
                       if f.endswith(".obj"))
        mean = np.zeros((n0, 3), np.float32)
        std = np.ones((n0, 3), np.float32)
        return model, ops, params, template, paths, mean, std

    def _scores(self, serve_env, dmesh):
        from meshvae_tpu.infer.serve import MeshServer

        model, ops, params, template, paths, mean, std = serve_env
        server = MeshServer(model, ops, params, mean, std,
                            template=np.asarray(template.v),
                            faces=np.asarray(template.f), batch_size=8,
                            save_meshes=False, mesh=dmesh)
        return server.handle(paths)  # 12 meshes / bs8 -> 2 pipelined chunks

    def test_dp8_matches_single_device(self, serve_env):
        res1 = self._scores(serve_env, None)
        res8 = self._scores(serve_env, make_device_mesh(dp=8))
        assert [r["file"] for r in res8] == [r["file"] for r in res1]
        for r8, r1 in zip(res8, res1):
            assert r8["sex"] == r1["sex"]
            np.testing.assert_allclose(
                r8["reconstruction_error"]["mean"],
                r1["reconstruction_error"]["mean"], rtol=1e-4)
            np.testing.assert_allclose(
                r8["reconstruction_error"]["max"],
                r1["reconstruction_error"]["max"], rtol=1e-4)

    def test_dp4_sp2_matches_single_device(self, serve_env):
        res1 = self._scores(serve_env, None)
        resm = self._scores(serve_env, make_device_mesh(dp=4, sp=2))
        for rm, r1 in zip(resm, res1):
            assert rm["sex"] == r1["sex"]
            np.testing.assert_allclose(
                rm["reconstruction_error"]["mean"],
                r1["reconstruction_error"]["mean"], rtol=1e-4)


class TestMultihostInit:
    """maybe_init_multihost plumbs config -> jax.distributed.initialize
    (auto-detect when fields are unset, explicit otherwise)."""

    def test_off_by_default(self, monkeypatch):
        from meshvae_tpu.train.driver import maybe_init_multihost
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        maybe_init_multihost({"multihost": False})
        assert calls == []

    def test_auto_detect(self, monkeypatch):
        from meshvae_tpu.train.driver import maybe_init_multihost
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        maybe_init_multihost({"multihost": True, "coordinator_address": "",
                              "num_processes": 0, "process_id": -1})
        assert calls == [{}]

    def test_explicit(self, monkeypatch):
        from meshvae_tpu.train.driver import maybe_init_multihost
        calls = []
        monkeypatch.setattr(jax.distributed, "initialize",
                            lambda **kw: calls.append(kw))
        maybe_init_multihost({"multihost": True,
                              "coordinator_address": "10.0.0.1:1234",
                              "num_processes": 4, "process_id": 2})
        assert calls == [{"coordinator_address": "10.0.0.1:1234",
                          "num_processes": 4, "process_id": 2}]

    def test_config_keys_parse(self, tmp_path):
        from meshvae_tpu.config import read_config
        cfg = tmp_path / "mh.cfg"
        cfg.write_text("[Input Output]\nmultihost = true\n"
                       "coordinator_address = host:9999\n"
                       "num_processes = 8\nprocess_id = 3\n")
        config = read_config(str(cfg))
        assert config["multihost"] is True
        assert config["coordinator_address"] == "host:9999"
        assert config["num_processes"] == 8
        assert config["process_id"] == 3
