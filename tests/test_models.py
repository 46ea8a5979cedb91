"""Model-level tests: VAE forward semantics, losses vs closed forms, GCN."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshvae_tpu.models.gcn import ChebGCN, GCNConfig
from meshvae_tpu.models.losses import (
    fixed_log_sigma, gaussian_nll, kld, softclip, vae_loss,
)
from meshvae_tpu.models.operators import build_operators
from meshvae_tpu.models.vae import MeshVAE, VAEConfig
from meshvae_tpu.mesh.hierarchy import build_hierarchy

from conftest import make_grid_mesh


@pytest.fixture(scope="module")
def small_setup():
    mesh = make_grid_mesh(8, jitter=0.05)  # 64 verts
    hier = build_hierarchy(mesh, [2, 2])   # 64 -> 32 -> 16
    ops = build_operators(hier)
    # reference-style filter chain: last two widths equal (the reference's
    # enc_lin sizing relies on filters[-1] == filters[-2], cheb_VAE.py:161)
    cfg = VAEConfig(
        num_features=3,
        filters=(8, 16, 16),
        polygon_order=(3, 3, 3),
        n_layers=2,
        num_hidden=32,
        latent=4,
        num_classes=2,
        dropout=0.2,
        coarse_verts=hier.levels[-1],
    )
    model = MeshVAE(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, hier.levels[0], 3)).astype(np.float32))
    y = jax.nn.one_hot(jnp.array([0, 1, 0, 1]), 2)
    params = model.init({"params": jax.random.key(0)}, x, y, ops, train=False)
    return model, params, ops, x, y, hier


class TestLosses:
    def test_kld_closed_form(self):
        rng = np.random.default_rng(0)
        mu = rng.standard_normal((3, 5)).astype(np.float32)
        logvar = rng.standard_normal((3, 5)).astype(np.float32)
        expected = -0.5 * np.sum(1 + logvar - mu**2 - np.exp(logvar), axis=-1)
        np.testing.assert_allclose(np.asarray(kld(jnp.asarray(mu), jnp.asarray(logvar))),
                                   expected, rtol=1e-5)

    def test_kld_zero_at_prior(self):
        z = jnp.zeros((2, 4))
        np.testing.assert_allclose(np.asarray(kld(z, z)), 0.0, atol=1e-7)

    def test_gaussian_nll(self):
        # N(0,1): nll at x=0 is 0.5*log(2*pi)
        val = gaussian_nll(jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        np.testing.assert_allclose(float(val), 0.5 * np.log(2 * np.pi), rtol=1e-6)

    def test_softclip_and_fixed_sigma(self):
        # reference trains with softclip(1, -6) ~ 1.000912
        assert abs(fixed_log_sigma() - 1.0009118819656134) < 1e-6
        assert float(softclip(-100.0, -6.0)) == pytest.approx(-6.0, abs=1e-4)

    def test_vae_loss_assembly(self):
        rng = np.random.default_rng(1)
        b, n = 3, 10
        x = rng.standard_normal((b, n, 3)).astype(np.float32)
        recon = rng.standard_normal((b, n, 3)).astype(np.float32)
        mu = rng.standard_normal((b, 4)).astype(np.float32)
        logvar = rng.standard_normal((b, 4)).astype(np.float32)
        y = np.eye(2)[[0, 1, 0]].astype(np.float32)
        y_hat = np.full((b, 2), 0.5, dtype=np.float32)
        loss, aux = vae_loss(*map(jnp.asarray, (x, recon, mu, logvar, y, y_hat)))

        ls = fixed_log_sigma()
        rec = (0.5 * ((x - recon) / np.exp(ls)) ** 2 + ls
               + 0.5 * np.log(2 * np.pi)).sum((-1, -2))
        kl = -0.5 * np.sum(1 + logvar - mu**2 - np.exp(logvar), -1)
        expected = np.mean(kl + rec - 2 * np.log(0.5))
        np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
        assert int(aux["correct"]) in range(b + 1)


class TestMeshVAE:
    def test_output_shapes(self, small_setup):
        model, params, ops, x, y, hier = small_setup
        out = model.apply(params, x, y, ops, train=False)
        assert out["recon"].shape == x.shape
        assert out["y_hat"].shape == (4, 2)
        assert out["mu"].shape == (4, 4)
        assert out["z"].shape == (4, 4)
        np.testing.assert_allclose(np.asarray(out["y_hat"].sum(-1)), 1.0, rtol=1e-5)

    def test_eval_deterministic_uses_mu(self, small_setup):
        model, params, ops, x, y, _ = small_setup
        o1 = model.apply(params, x, y, ops, train=False)
        o2 = model.apply(params, x, y, ops, train=False)
        np.testing.assert_array_equal(np.asarray(o1["recon"]), np.asarray(o2["recon"]))
        np.testing.assert_array_equal(np.asarray(o1["z"]), np.asarray(o1["mu"]))

    def test_train_mode_samples(self, small_setup):
        model, params, ops, x, y, _ = small_setup
        rngs = {"latent": jax.random.key(1), "dropout": jax.random.key(2)}
        out = model.apply(params, x, y, ops, train=True, rngs=rngs)
        assert not np.array_equal(np.asarray(out["z"]), np.asarray(out["mu"]))

    def test_label_conditioning_changes_recon(self, small_setup):
        model, params, ops, x, y, _ = small_setup
        out_a = model.apply(params, x, y, ops, train=False)
        out_b = model.apply(params, x, 1.0 - y, ops, train=False)
        assert np.abs(np.asarray(out_a["recon"]) - np.asarray(out_b["recon"])).max() > 1e-6

    def test_sample_matches_decode_of_mu(self, small_setup):
        model, params, ops, x, y, _ = small_setup
        out = model.apply(params, x, y, ops, train=False)
        sampled = model.apply(params, y, out["mu"], ops, method=MeshVAE.sample)
        np.testing.assert_allclose(np.asarray(sampled), np.asarray(out["recon"]),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_flow(self, small_setup):
        model, params, ops, x, y, _ = small_setup

        def loss_fn(p):
            out = model.apply(p, x, y, ops, train=False)
            loss, _ = vae_loss(x, out["recon"], out["mu"], out["logvar"], y,
                               out["y_hat"])
            return loss

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)

    def test_param_shapes_match_reference_heads(self, small_setup):
        model, params, ops, x, y, hier = small_setup
        p = params["params"]
        flat = hier.levels[-1] * 16
        assert p["enc_lin"]["kernel"].shape == (flat, 32)
        assert p["dec_lin"]["kernel"].shape == (4 + 2, 32)
        assert p["dec_lin_2"]["kernel"].shape == (32, flat)
        assert p["z_mean"]["kernel"].shape == (32 + 2, 4)
        assert p["classifier_layer"]["kernel"].shape == (32, 2)
        # final decoder conv has no bias (reference cheb_VAE.py:135)
        assert "bias" not in p["cheb_dec_2"]
        assert p["cheb_dec_0"]["weight"].shape == (3, 16, 16)


class TestChebGCN:
    def test_forward_and_grads(self, small_setup):
        _, _, ops, _, _, hier = small_setup
        cfg = GCNConfig(
            num_features=6,
            filters=(8, 8, 16),
            polygon_order=(3, 3, 3),
            n_layers=2,
            num_classes=2,
            coarse_verts=hier.levels[-1],
            hidden=16,
        )
        model = ChebGCN(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, hier.levels[0], 6)).astype(np.float32))
        params = model.init(jax.random.key(0), x, ops)
        logits = model.apply(params, x, ops)
        assert logits.shape == (4, 2)

        labels = jnp.array([0, 1, 1, 0])

        def loss_fn(p):
            lg = model.apply(p, x, ops)
            return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(4), labels])

        grads = jax.grad(loss_fn)(params)
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree_util.tree_leaves(grads))

    def test_flatten_uses_last_conv_width(self, small_setup):
        _, _, ops, _, _, hier = small_setup
        cfg = GCNConfig(num_features=6, filters=(8, 8, 16), polygon_order=(3, 3, 3),
                        n_layers=2, num_classes=2, coarse_verts=hier.levels[-1])
        model = ChebGCN(cfg)
        x = jnp.zeros((1, hier.levels[0], 6))
        params = model.init(jax.random.key(0), x, ops)
        # chain (6, 8, 8, 16): convs output filters[-2] == 8; flat = 16 verts * 8
        assert params["params"]["enc_lin"]["kernel"].shape[0] == hier.levels[-1] * 8


class TestPallasModelPath:
    def test_vae_forward_with_pallas_method(self, small_setup):
        """The full MeshVAE wiring through cheb_method='pallas' (interpreter
        mode on CPU) matches the dense-path forward."""
        import meshvae_tpu.ops.pallas_cheb as pc
        from meshvae_tpu.models.vae import MeshVAE, VAEConfig

        model, params, ops, x, y, hier = small_setup
        cfg_p = VAEConfig(**{**model.cfg.__dict__, "cheb_method": "pallas"})
        model_p = MeshVAE(cfg_p)
        pc.INTERPRET = True
        try:
            out_p = model_p.apply(params, x, y, ops, train=False)
        finally:
            pc.INTERPRET = False
        out_d = model.apply(params, x, y, ops, train=False)
        np.testing.assert_allclose(np.asarray(out_p["recon"]),
                                   np.asarray(out_d["recon"]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_p["mu"]),
                                   np.asarray(out_d["mu"]),
                                   rtol=1e-4, atol=1e-4)


class TestComputeDtype:
    """compute_dtype=bfloat16: bf16 activations/operands with f32
    accumulation and f32 outputs — bounded divergence from the f32 path."""

    def test_bf16_forward_close_to_f32(self, grid_mesh):
        import jax
        import jax.numpy as jnp
        from meshvae_tpu.mesh.hierarchy import build_hierarchy
        from meshvae_tpu.models.operators import build_operators
        from meshvae_tpu.models.vae import MeshVAE, VAEConfig

        hier = build_hierarchy(grid_mesh, [2, 2])
        base = dict(num_features=3, filters=(8, 8, 16),
                    polygon_order=(4, 4, 4), n_layers=2, num_hidden=32,
                    latent=6, num_classes=2, dropout=0.2,
                    coarse_verts=hier.levels[-1])
        f32_model = MeshVAE(VAEConfig(**base))
        bf16_model = MeshVAE(VAEConfig(**base, compute_dtype="bfloat16",
                                       precision="default"))
        ops32 = build_operators(hier)
        ops16 = build_operators(hier, dtype=jnp.bfloat16)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, hier.levels[0], 3)),
                        jnp.float32)
        y = jnp.asarray(np.eye(2, dtype=np.float32)[rng.integers(0, 2, 4)])
        params = f32_model.init({"params": jax.random.key(0)}, x, y, ops32,
                                train=False)

        out32 = f32_model.apply(params, x, y, ops32, train=False)
        out16 = bf16_model.apply(params, x, y, ops16, train=False)
        # outputs are f32 regardless of compute dtype
        assert out16["recon"].dtype == jnp.float32
        assert out16["mu"].dtype == jnp.float32
        r32, r16 = np.asarray(out32["recon"]), np.asarray(out16["recon"])
        assert np.isfinite(r16).all()
        scale = np.abs(r32).max()
        assert np.abs(r16 - r32).max() < 0.05 * max(scale, 1.0), (
            np.abs(r16 - r32).max(), scale)

    def test_bf16_trains(self, grid_mesh):
        import jax
        import jax.numpy as jnp
        from meshvae_tpu.mesh.hierarchy import build_hierarchy
        from meshvae_tpu.models.operators import build_operators
        from meshvae_tpu.models.vae import MeshVAE, VAEConfig
        from meshvae_tpu.train.loop import Trainer

        hier = build_hierarchy(grid_mesh, [2, 2])
        config = {
            "num_conv_filters": [8, 8, 16], "polygon_order": [4, 4, 4],
            "n_layers": 2, "num_hidden": 32, "num_style": 6,
            "num_classes": 2, "dropout": 0.2, "compute_dtype": "bfloat16",
            "learning_rate": 1e-3, "weight_decay": 5e-4,
        }
        cfg = VAEConfig.from_config(config, coarse_verts=hier.levels[-1])
        assert cfg.compute_dtype == "bfloat16"
        assert cfg.precision == "default"  # auto-selected for bf16
        model = MeshVAE(cfg)
        ops = build_operators(hier, dtype=jnp.bfloat16)
        trainer = Trainer(model, ops, config)
        params = trainer.init_params(jax.random.key(0))
        # master params stay f32
        assert params["params"]["enc_lin"]["kernel"].dtype == jnp.float32
        opt_state = trainer.init_opt_state(params)
        rng = np.random.default_rng(1)
        n0 = hier.levels[0]
        batch = {
            "x": jnp.asarray(rng.standard_normal((4, n0, 3)), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 2, 4).astype(np.int32)),
            "r": jnp.tile(jnp.eye(3, dtype=jnp.float32), (4, 1, 1)),
            "s": jnp.ones(4, jnp.float32),
            "m": jnp.zeros((4, 1, 3), jnp.float32),
            "original": jnp.asarray(rng.standard_normal((4, n0, 3)),
                                    jnp.float32),
            "mask": jnp.ones(4, jnp.float32),
        }
        mean = jnp.zeros((n0, 3), jnp.float32)
        std = jnp.ones((n0, 3), jnp.float32)
        losses = []
        for i in range(8):
            params, opt_state, metrics = trainer._train_step(
                params, opt_state, dict(batch), jax.random.fold_in(
                    jax.random.key(2), i), mean, std)
            losses.append(float(np.asarray(metrics)[0]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
