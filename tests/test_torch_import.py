"""Torch-checkpoint importer: reference state_dict names -> flax params."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from meshvae_tpu.mesh.hierarchy import build_hierarchy
from meshvae_tpu.models.operators import build_operators
from meshvae_tpu.models.vae import MeshVAE, VAEConfig
from meshvae_tpu.train.torch_import import import_torch_vae_state

from conftest import make_grid_mesh


@pytest.fixture(scope="module")
def setup():
    mesh = make_grid_mesh(8, jitter=0.05)
    hier = build_hierarchy(mesh, [2, 2])
    ops = build_operators(hier)
    cfg = VAEConfig(num_features=3, filters=(8, 16, 16),
                    polygon_order=(3, 3, 3), n_layers=2, num_hidden=32,
                    latent=4, num_classes=2, dropout=0.2,
                    coarse_verts=hier.levels[-1])
    model = MeshVAE(cfg)
    x = jnp.zeros((1, hier.levels[0], 3))
    y = jnp.zeros((1, 2))
    params = model.init({"params": jax.random.key(0)}, x, y, ops, train=False)
    return model, params, ops, hier, cfg


def make_reference_state_dict(params, seed=0):
    """Synthesize a state_dict with the *reference's* parameter names
    (cheb.{i}.weight, enc_lin.weight [out,in], ... incl. the dead dec_lin_1)
    shaped to match `params`."""
    gen = torch.Generator().manual_seed(seed)
    sd = {}
    p = params["params"]
    for i in (0, 1):
        w = p[f"cheb_enc_{i}"]["weight"]
        sd[f"cheb.{i}.weight"] = torch.randn(*w.shape, generator=gen)
        sd[f"cheb.{i}.bias"] = torch.randn(w.shape[-1], generator=gen)
    for i in (0, 1, 2):
        w = p[f"cheb_dec_{i}"]["weight"]
        sd[f"cheb_dec.{i}.weight"] = torch.randn(*w.shape, generator=gen)
        if "bias" in p[f"cheb_dec_{i}"]:
            sd[f"cheb_dec.{i}.bias"] = torch.randn(w.shape[-1], generator=gen)
    for lin in ("enc_lin", "dec_lin", "dec_lin_2", "classifier_layer",
                "z_mean", "z_log_var"):
        k = p[lin]["kernel"]  # [in, out]
        sd[f"{lin}.weight"] = torch.randn(k.shape[1], k.shape[0],
                                          generator=gen)
        sd[f"{lin}.bias"] = torch.randn(k.shape[1], generator=gen)
    # dead head present in real reference checkpoints (cheb_VAE.py:165)
    sd["dec_lin_1.weight"] = torch.randn(3, 3, generator=gen)
    sd["dec_lin_1.bias"] = torch.randn(3, generator=gen)
    return sd


class TestImport:
    def test_values_land_in_right_places(self, setup):
        model, params, ops, hier, cfg = setup
        sd = make_reference_state_dict(params)
        imported = import_torch_vae_state(sd, params)
        p = imported["params"]
        np.testing.assert_array_equal(
            np.asarray(p["cheb_enc_0"]["weight"]),
            sd["cheb.0.weight"].numpy())
        np.testing.assert_array_equal(
            np.asarray(p["cheb_dec_1"]["bias"]), sd["cheb_dec.1.bias"].numpy())
        # linear weights transposed into kernels
        np.testing.assert_array_equal(
            np.asarray(p["z_mean"]["kernel"]), sd["z_mean.weight"].numpy().T)
        np.testing.assert_array_equal(
            np.asarray(p["enc_lin"]["bias"]), sd["enc_lin.bias"].numpy())
        # final decoder conv stays bias-free
        assert "bias" not in p["cheb_dec_2"]

    def test_imported_model_runs(self, setup):
        model, params, ops, hier, cfg = setup
        sd = make_reference_state_dict(params, seed=1)
        imported = import_torch_vae_state(sd, params)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, hier.levels[0], 3))
                        .astype(np.float32))
        y = jax.nn.one_hot(jnp.array([0, 1]), 2)
        out = model.apply(imported, x, y, ops, train=False)
        assert np.all(np.isfinite(np.asarray(out["recon"])))

    def test_shape_mismatch_raises(self, setup):
        model, params, ops, hier, cfg = setup
        sd = make_reference_state_dict(params)
        sd["enc_lin.weight"] = torch.randn(5, 7)
        with pytest.raises(ValueError, match="shape mismatch"):
            import_torch_vae_state(sd, params)


class TestImportEndToEnd:
    """The full migration story: weights trained against the REFERENCE's
    hierarchy (hierarchy_mode=reference is bit-exact to the reference's
    QSlim — test_hierarchy_golden) import into this framework and reproduce
    the source model's eval outputs to <1e-4."""

    def test_gcn_import_reproduces_outputs(self):
        """The crecon-stage cheb_GCN import path: a torch GCN serialized
        under the reference's parameter names imports and reproduces its
        logits (the VAE path is covered below; the GCN mapping —
        cheb.{i}.*, enc_lin, cls_layer — was previously untested)."""
        from benchmarks.torch_cpu_baseline import TorchChebGCN
        from meshvae_tpu.models.gcn import ChebGCN, GCNConfig

        mesh = make_grid_mesh(10, jitter=0.05)
        hier = build_hierarchy(mesh, [2, 2, 2, 2], mode="reference")
        ops = build_operators(hier)

        filters, K = [8, 8, 8, 16, 16], [4, 4, 4, 4, 4]
        torch.manual_seed(5)
        tmodel = TorchChebGCN(hier, filters=filters, K=K, num_feature=6,
                              hidden=32)
        tmodel.eval()

        sd = {}
        for i, (w, b) in enumerate(zip(tmodel.cheb_w, tmodel.cheb_b)):
            sd[f"cheb.{i}.weight"] = w.detach()
            sd[f"cheb.{i}.bias"] = b.detach()
        for lin in ("enc_lin", "cls_layer"):
            sd[f"{lin}.weight"] = getattr(tmodel, lin).weight.detach()
            sd[f"{lin}.bias"] = getattr(tmodel, lin).bias.detach()

        cfg = GCNConfig(num_features=6, filters=tuple(filters),
                        polygon_order=tuple(K), n_layers=4, hidden=32,
                        num_classes=2, coarse_verts=hier.levels[-1])
        model = ChebGCN(cfg)
        x0 = jnp.zeros((1, hier.levels[0], 6), jnp.float32)
        target = model.init(jax.random.key(0), x0, ops)
        imported = import_torch_vae_state(sd, target, model_type="cheb_GCN")

        rng = np.random.default_rng(13)
        x = rng.standard_normal((4, hier.levels[0], 6)).astype(np.float32)
        t_logits = tmodel(torch.from_numpy(x)).detach().numpy()
        j_logits = np.asarray(model.apply(imported, jnp.asarray(x), ops))
        np.testing.assert_allclose(j_logits, t_logits, rtol=1e-5, atol=1e-5)

    def test_reference_hierarchy_checkpoint_reproduces_outputs(self):
        from benchmarks.torch_cpu_baseline import TorchChebVAE
        from parity_utils import torch_eval_forward

        mesh = make_grid_mesh(10, jitter=0.05)
        hier = build_hierarchy(mesh, [2, 2, 2, 2], mode="reference")
        ops = build_operators(hier)

        filters, K = [8, 8, 8, 16, 16], [4, 4, 4, 4, 4]
        torch.manual_seed(3)
        tmodel = TorchChebVAE(hier, filters=filters, K=K, num_hidden=32,
                              latent=6, num_classes=2, dropout=0.2)
        tmodel.eval()

        # serialize the torch twin with the REFERENCE's parameter names
        sd = {}
        for i, (w, b) in enumerate(zip(tmodel.enc_w, tmodel.enc_b)):
            sd[f"cheb.{i}.weight"] = w.detach()
            sd[f"cheb.{i}.bias"] = b.detach()
        for i, w in enumerate(tmodel.dec_w):
            sd[f"cheb_dec.{i}.weight"] = w.detach()
            if i < len(tmodel.dec_w) - 1:
                sd[f"cheb_dec.{i}.bias"] = tmodel.dec_b[i].detach()
        for lin in ("enc_lin", "dec_lin", "dec_lin_2", "classifier_layer",
                    "z_mean", "z_log_var"):
            sd[f"{lin}.weight"] = getattr(tmodel, lin).weight.detach()
            sd[f"{lin}.bias"] = getattr(tmodel, lin).bias.detach()

        cfg = VAEConfig(num_features=3, filters=tuple(filters),
                        polygon_order=tuple(K), n_layers=4, num_hidden=32,
                        latent=6, num_classes=2, dropout=0.2,
                        coarse_verts=hier.levels[-1])
        model = MeshVAE(cfg)
        x0 = jnp.zeros((1, hier.levels[0], 3), jnp.float32)
        y0 = jnp.zeros((1, 2), jnp.float32)
        target = model.init({"params": jax.random.key(0)}, x0, y0, ops,
                            train=False)
        imported = import_torch_vae_state(sd, target)

        rng = np.random.default_rng(11)
        x = rng.standard_normal((4, hier.levels[0], 3)).astype(np.float32)
        y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 4)]
        t_recon, t_yhat, t_mu, _, _ = torch_eval_forward(tmodel, x, y)
        out = model.apply(imported, jnp.asarray(x), jnp.asarray(y), ops,
                          train=False)
        np.testing.assert_allclose(np.asarray(out["mu"]), t_mu,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["y_hat"]), t_yhat,
                                   rtol=1e-5, atol=1e-5)
        assert np.abs(np.asarray(out["recon"]) - t_recon).max() < 1e-4
