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
    params = jmodel.init({"params": jax.random.key(0)}, x0, y0, ops,
                         train=False)

    # copy the torch weights into the flax param tree
    p = {k: dict(v) for k, v in params["params"].items()}

    def t2n(t):
        return np.asarray(t.detach().numpy(), dtype=np.float32)

    for i in range(len(tmodel.enc_w)):
        p[f"cheb_enc_{i}"]["weight"] = jnp.asarray(t2n(tmodel.enc_w[i]))
        p[f"cheb_enc_{i}"]["bias"] = jnp.asarray(t2n(tmodel.enc_b[i]))
    for i in range(len(tmodel.dec_w)):
        p[f"cheb_dec_{i}"]["weight"] = jnp.asarray(t2n(tmodel.dec_w[i]))
        if "bias" in p[f"cheb_dec_{i}"]:
            p[f"cheb_dec_{i}"]["bias"] = jnp.asarray(t2n(tmodel.dec_b[i]))
    for tname, jname in (("enc_lin", "enc_lin"), ("dec_lin", "dec_lin"),
                         ("dec_lin_2", "dec_lin_2"),
                         ("classifier_layer", "classifier_layer"),
                         ("z_mean", "z_mean"), ("z_log_var", "z_log_var")):
        lin = getattr(tmodel, tname)
        p[jname]["kernel"] = jnp.asarray(t2n(lin.weight).T)
        p[jname]["bias"] = jnp.asarray(t2n(lin.bias))

    params = {"params": p}
    batch = 4
    x = rng.standard_normal((batch, hier.levels[0], 3)).astype(np.float32)
    y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, batch)]
    return tmodel, jmodel, params, ops, x, y, hier


def _torch_eval_forward(tmodel, x, y):
    """Eval-mode forward of the torch twin returning intermediates
    (z = mu, no sampling)."""
    with torch.no_grad():
        xt = torch.tensor(x)
        yt = torch.tensor(y)
        b = xt.shape[0]
        h = xt
        for i in range(tmodel.n_layers):
            h = torch.relu(tmodel._cheb(h, tmodel.lap[i], tmodel.enc_w[i],
                                        tmodel.enc_b[i]))
            h = tmodel._pool(h, tmodel.down[i])
        h = torch.relu(tmodel.enc_lin(h.reshape(b, -1)))
        y_hat = torch.softmax(tmodel.classifier_layer(h), dim=1)
        hy = torch.cat([yt, h], -1)
        mu = tmodel.z_mean(hy)
        logvar = tmodel.z_log_var(hy)
        d = torch.relu(tmodel.dec_lin(torch.cat([yt, mu], -1)))
        d = torch.relu(tmodel.dec_lin_2(d))
        d = d.reshape(b, tmodel.coarse, tmodel.chain[-1])
        for i in range(tmodel.n_layers):
            d = tmodel._pool(d, tmodel.up[-i - 1])
            d = torch.relu(tmodel._cheb(d, tmodel.lap[tmodel.n_layers - i - 1],
                                        tmodel.dec_w[i], tmodel.dec_b[i]))
        recon = tmodel._cheb(d, tmodel.lap_final, tmodel.dec_w[-1], None)
        return (recon.numpy(), y_hat.numpy(), mu.numpy(), logvar.numpy(),
                h.numpy())


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
