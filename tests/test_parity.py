"""Cross-framework golden parity: the JAX model vs an independent PyTorch
implementation of the reference math (benchmarks/torch_cpu_baseline.py),
with identical weights, in eval mode (z = mu, dropout off) — the regime the
BASELINE parity targets are defined in (<1e-4 vertex recon delta, matching
latent stats)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from meshvae_tpu.mesh.hierarchy import build_hierarchy
from meshvae_tpu.models.operators import build_operators
from meshvae_tpu.models.vae import MeshVAE, VAEConfig
from meshvae_tpu.models.losses import vae_loss

from benchmarks.torch_cpu_baseline import TorchChebVAE

from conftest import make_grid_mesh
from parity_utils import copy_torch_weights, torch_eval_forward


@pytest.fixture(scope="module")
def paired_models():
    mesh = make_grid_mesh(10, jitter=0.05)  # 100 verts
    hier = build_hierarchy(mesh, [2, 2, 2, 2])
    ops = build_operators(hier)

    filters = [8, 8, 8, 16, 16]
    K = [4, 4, 4, 4, 4]
    torch.manual_seed(0)
    tmodel = TorchChebVAE(hier, filters=filters, K=K, num_hidden=32,
                          latent=6, num_classes=2, dropout=0.2)
    tmodel.eval()

    cfg = VAEConfig(num_features=3, filters=tuple(filters),
                    polygon_order=tuple(K), n_layers=4, num_hidden=32,
                    latent=6, num_classes=2, dropout=0.2,
                    coarse_verts=hier.levels[-1])
    jmodel = MeshVAE(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, hier.levels[0], 3), jnp.float32)
    y0 = jnp.zeros((1, 2), jnp.float32)
    params = copy_torch_weights(
        tmodel,
        jmodel.init({"params": jax.random.key(0)}, x0, y0, ops, train=False))

    batch = 4
    x = rng.standard_normal((batch, hier.levels[0], 3)).astype(np.float32)
    y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, batch)]
    return tmodel, jmodel, params, ops, x, y, hier


_torch_eval_forward = torch_eval_forward


class TestCrossFrameworkParity:
    def test_eval_forward_parity(self, paired_models):
        tmodel, jmodel, params, ops, x, y, hier = paired_models
        t_recon, t_yhat, t_mu, t_logvar, t_h = _torch_eval_forward(tmodel, x, y)
        out = jmodel.apply(params, jnp.asarray(x), jnp.asarray(y), ops,
                           train=False)

        # latent statistics: effectively bitwise (float32 round-off only)
        np.testing.assert_allclose(np.asarray(out["mu"]), t_mu,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["logvar"]), t_logvar,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["y_hat"]), t_yhat,
                                   rtol=1e-5, atol=1e-5)
        # per-vertex reconstruction delta below the 1e-4 target
        delta = np.abs(np.asarray(out["recon"]) - t_recon)
        assert delta.max() < 1e-4, delta.max()

    def test_loss_parity(self, paired_models):
        tmodel, jmodel, params, ops, x, y, hier = paired_models
        t_recon, t_yhat, t_mu, t_logvar, _ = _torch_eval_forward(tmodel, x, y)
        out = jmodel.apply(params, jnp.asarray(x), jnp.asarray(y), ops,
                           train=False)
        loss, aux = vae_loss(jnp.asarray(x), out["recon"], out["mu"],
                             out["logvar"], jnp.asarray(y), out["y_hat"])

        log_sigma = 1.0009118819656134
        t_kld = -0.5 * np.sum(1 + t_logvar - t_mu**2 - np.exp(t_logvar), -1)
        t_rec = (0.5 * ((t_recon - x) / np.exp(log_sigma)) ** 2 + log_sigma
                 + 0.5 * np.log(2 * np.pi)).sum(-1).sum(-1)
        t_logqy = np.log((t_yhat * y).sum(-1))
        t_loss = (t_kld + t_rec - 2 * t_logqy).mean()
        np.testing.assert_allclose(float(loss), t_loss, rtol=1e-5)

    def test_ell_path_same_parity(self, paired_models):
        """The gather (ELL) compute path hits the same parity target."""
        tmodel, jmodel, params, ops, x, y, hier = paired_models
        t_recon, _, t_mu, _, _ = _torch_eval_forward(tmodel, x, y)
        cfg_ell = VAEConfig(**{**jmodel.cfg.__dict__, "cheb_method": "ell"})
        jmodel_ell = MeshVAE(cfg_ell)
        out = jmodel_ell.apply(params, jnp.asarray(x), jnp.asarray(y), ops,
                               train=False)
        assert np.abs(np.asarray(out["recon"]) - t_recon).max() < 1e-4
        np.testing.assert_allclose(np.asarray(out["mu"]), t_mu, rtol=1e-5,
                                   atol=1e-5)
