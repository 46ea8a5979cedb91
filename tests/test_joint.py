"""Joint disentangled VAE + classifier (BASELINE.json config 3).

Covers: the gradient-reversal primitive, forward/loss plumbing (gradients
reach every head AND both submodels), latent-split supervision actually
concentrating sex information in the supervised slice, training
convergence, and the k-fold driver end-to-end with type=joint_VAE."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshvae_tpu.config import default_config
from meshvae_tpu.data.dataset import BatchIterator, MeshDataset, list_meshes
from meshvae_tpu.data.synthetic import generate_synthetic_dataset
from meshvae_tpu.mesh.io import save_obj
from meshvae_tpu.models.joint import (JointMeshVAE, build_joint_model,
                                      grad_reverse, joint_loss, masked_ce)
from meshvae_tpu.train.joint import JointTrainer

from conftest import make_grid_mesh


@pytest.fixture(scope="module")
def joint_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("joint")
    template = make_grid_mesh(8, jitter=0.05)
    template_path = os.path.join(root, "template.obj")
    save_obj(template_path, template.v, template.f)
    data_dir = os.path.join(root, "data")
    # stronger class signature + no pose noise keeps the tiny training
    # budget deterministic
    generate_synthetic_dataset(template, data_dir, n_samples=24, seed=0,
                               class_scale=0.06, pose=False)
    config = default_config()
    config.update({
        "checkpoint_dir": os.path.join(root, "ckpt"),
        "template": template_path,
        "root_dir": data_dir,
        "log_file": os.path.join(root, "ckpt", "log.txt"),
        "type": "joint_VAE",
        "folds": 2,
        "test_size": 0.25,
        "n_layers": 2,
        "num_hidden": 16,
        "num_style": 6,
        "latent_split": 2,
        "downsampling_factors": [2, 2],
        "polygon_order": [3, 3, 3],
        "num_conv_filters": [8, 16, 16],
        "batch_size": 8,
        "epoch": 2,
        "hierarchy_cache_dir": os.path.join(root, "cache"),
    })
    return config, template, root


def _build(config):
    from meshvae_tpu.train.driver import build_model_and_ops, make_trainer
    model, ops, hier, template = build_model_and_ops(config)
    trainer = make_trainer(config, model, ops)
    assert isinstance(model, JointMeshVAE)
    assert isinstance(trainer, JointTrainer)
    return model, ops, trainer


class TestGradReverse:
    def test_identity_forward_negated_backward(self):
        x = jnp.arange(6.0).reshape(2, 3)
        np.testing.assert_allclose(grad_reverse(x), x)
        g = jax.grad(lambda v: jnp.sum(grad_reverse(v) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), -2.0 * np.asarray(x))


class TestJointModel:
    def test_forward_outputs_and_gradients(self, joint_env):
        config, template, root = joint_env
        model, ops, trainer = _build(config)
        b, n0 = 4, template.v.shape[0]
        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.standard_normal((b, n0, 3)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 2, b), jnp.int32),
            "mask": jnp.ones(b, jnp.float32),
        }
        params = trainer.init_params(jax.random.key(0))
        y = jax.nn.one_hot(batch["label"], 2)
        out = model.apply(params, batch["x"], y, ops, train=False)
        assert out["sup_logits"].shape == (b, 2)
        assert out["adv_logits"].shape == (b, 2)
        assert out["cls_logits"].shape == (b, 2)
        assert out["recon"].shape == (b, n0, 3)
        assert out["recon_oppo"].shape == (b, n0, 3)

        loss, (out2, aux, _) = trainer._forward_loss(params, batch, None,
                                                     False, ops)
        assert np.isfinite(float(loss))
        for k in ("sup_loss", "adv_loss", "cls_loss", "kld", "rec_loss"):
            assert np.all(np.isfinite(np.asarray(aux[k]))), k

        # every submodel receives gradient: vae, gcn, and both latent heads
        grads = jax.grad(lambda p: trainer._forward_loss(
            p, batch, None, False, ops)[0])(params)
        gp = grads["params"]
        for branch in ("vae", "gcn", "sup_head", "adv_head"):
            norms = [float(jnp.abs(l).max()) for l in
                     jax.tree_util.tree_leaves(gp[branch])]
            assert max(norms) > 0.0, f"no gradient reaches {branch}"

    def test_latent_split_validation(self, joint_env):
        config, _, _ = joint_env
        bad = dict(config, latent_split=config["num_style"])
        model = build_joint_model(bad, coarse_verts=5)
        x = jnp.zeros((1, 4, 3))
        y = jnp.zeros((1, 2))
        with pytest.raises(ValueError, match="latent_split"):
            # operators unused before the validation fires
            model.init({"params": jax.random.key(0)}, x, y, None,
                       train=False)

    def test_masked_ce_ignores_padding(self):
        logits = jnp.asarray([[2.0, -2.0], [5.0, -5.0], [-9.0, 9.0]])
        labels = jnp.asarray([0, 0, 0])
        mask = jnp.asarray([1.0, 1.0, 0.0])
        loss_m, correct_m = masked_ce(logits, labels, mask)
        loss_2, correct_2 = masked_ce(logits[:2], labels[:2], None)
        assert float(loss_m) == pytest.approx(float(loss_2), rel=1e-6)
        assert float(correct_m) == 2.0


class TestJointTraining:
    def test_supervised_slice_learns_sex(self, joint_env):
        """Train briefly: loss drops and the latent-split head predicts the
        label from ONLY the supervised slice of mu (the disentanglement
        contract of config 3). The jointly-trained GCN learns too."""
        config, template, root = joint_env
        model, ops, trainer = _build(config)
        idx, labels = list_meshes(config)
        ds = MeshDataset(idx, config, labels,
                         template=np.asarray(template.v), dtype="train")
        loader = BatchIterator(ds, batch_size=8, shuffle=True, seed=0)

        params = trainer.init_params(jax.random.key(0))
        opt_state = trainer.init_opt_state(params)
        rng = jax.random.key(1)
        first_loss = None
        # ~100 epochs is where the tiny 2->2 supervised head saturates
        # (epochs are 3 jitted steps each; the loop is seconds post-compile)
        for epoch in range(120):
            params, opt_state, avg = trainer.train_epoch(
                params, opt_state, loader, jax.random.fold_in(rng, epoch),
                ds.mean, ds.std)
            if first_loss is None:
                first_loss = avg["loss"]
        assert avg["loss"] < first_loss

        # evaluate the heads on the training set in eval mode
        batch = next(iter(BatchIterator(ds, batch_size=len(ds))))
        y = jax.nn.one_hot(jnp.asarray(batch["label"]), 2)
        out = model.apply(params, jnp.asarray(batch["x"]), y, ops,
                          train=False)
        sup_acc = float(np.mean(np.argmax(np.asarray(out["sup_logits"]), -1)
                                == batch["label"]))
        cls_acc = float(np.mean(np.argmax(np.asarray(out["cls_logits"]), -1)
                                == batch["label"]))
        assert sup_acc >= 0.9, f"supervised slice failed to learn: {sup_acc}"
        assert cls_acc >= 0.9, f"joint GCN failed to learn: {cls_acc}"

        # scanned epoch path produces the same metrics layout
        p2 = trainer.init_params(jax.random.key(0))
        o2 = trainer.init_opt_state(p2)
        _, _, avg_scan = trainer.train_epoch_scanned(
            p2, o2, loader, jax.random.fold_in(rng, 0), ds.mean, ds.std)
        assert set(avg_scan) == set(avg)

    def test_inference_engine_drives_joint_model(self, joint_env):
        """The batch inference pipeline works on a joint checkpoint (the
        engine reaches the model through encode/classify/z_mean/sample)."""
        config, template, root = joint_env
        from meshvae_tpu.infer.driver import InferenceEngine
        model, ops, trainer = _build(config)
        engine = InferenceEngine(model, ops)
        params = trainer.init_params(jax.random.key(0))
        b, n0 = 4, template.v.shape[0]
        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.standard_normal((b, n0, 3)), jnp.float32),
            "r": jnp.tile(jnp.eye(3, dtype=jnp.float32), (b, 1, 1)),
            "s": jnp.ones(b, jnp.float32),
            "m": jnp.zeros((b, 1, 3), jnp.float32),
            "original": jnp.asarray(rng.standard_normal((b, n0, 3)),
                                    jnp.float32),
            "mask": jnp.ones(b, jnp.float32),
        }
        out = engine.step(params, batch, jnp.zeros((n0, 3)),
                          jnp.ones((n0, 3)))
        assert out["recon_orig"].shape == (b, n0, 3)
        assert np.all(np.isfinite(np.asarray(out["err_mean"])))

    def test_driver_end_to_end(self, joint_env):
        config, template, root = joint_env
        from meshvae_tpu.train.driver import run

        results = run(dict(config), do_train=True, do_test=True)
        assert len(results) == 2
        for r in results:
            assert np.isfinite(r["loss"])
            assert 0.0 <= r["accuracy"] <= 1.0
            assert "sex_change_success_rate" in r
            # disentanglement observability rides through the eval path
            assert 0.0 <= r["sup_accuracy"] <= 1.0
            assert 0.0 <= r["adv_accuracy"] <= 1.0
        ckpt_dir = config["checkpoint_dir"]
        import json
        hist = json.load(open(os.path.join(ckpt_dir, "history1.json")))
        assert "sup_accuracy" in hist[0]["validation"]
        assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_1.msgpack"))
