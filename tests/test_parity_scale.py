"""Cross-framework parity AT REAL SCALE: the full template5k with the
default.cfg shapes (/root/reference/files/default.cfg:15-22 — 4 layers,
factors 4,4,4,4, K=6, filters 16,16,16,32,32, hidden 512, z=16), same
weights, eval mode. Round 1 only asserted parity on a 100-vertex toy grid;
this is the regime the <1e-4 BASELINE target is defined for. The pallas
(interpret) compute path goes through the same assert."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from meshvae_tpu.mesh.hierarchy import load_or_build_hierarchy
from meshvae_tpu.models.operators import build_operators
from meshvae_tpu.models.vae import MeshVAE, VAEConfig

from benchmarks.torch_cpu_baseline import TorchChebVAE
from parity_utils import copy_torch_weights, torch_eval_forward

pytestmark = pytest.mark.slow  # full-template fixture: minutes of compile

FILTERS = [16, 16, 16, 32, 32]
K = [6, 6, 6, 6, 6]


@pytest.fixture(scope="module")
def scale_env(template_mesh):
    hier = load_or_build_hierarchy(template_mesh, [4, 4, 4, 4])
    ops = build_operators(hier)

    torch.manual_seed(0)
    tmodel = TorchChebVAE(hier, filters=FILTERS, K=K, num_hidden=512,
                          latent=16, num_classes=2, dropout=0.2)
    tmodel.eval()

    cfg = VAEConfig(num_features=3, filters=tuple(FILTERS),
                    polygon_order=tuple(K), n_layers=4, num_hidden=512,
                    latent=16, num_classes=2, dropout=0.2,
                    coarse_verts=hier.levels[-1])
    jmodel = MeshVAE(cfg)
    x0 = jnp.zeros((1, hier.levels[0], 3), jnp.float32)
    y0 = jnp.zeros((1, 2), jnp.float32)
    params = copy_torch_weights(
        tmodel,
        jmodel.init({"params": jax.random.key(0)}, x0, y0, ops, train=False))

    rng = np.random.default_rng(42)
    batch = 2
    x = rng.standard_normal((batch, hier.levels[0], 3)).astype(np.float32)
    y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, batch)]
    golden = torch_eval_forward(tmodel, x, y)
    return jmodel, params, ops, x, y, golden


def _assert_parity(out, golden):
    t_recon, t_yhat, t_mu, t_logvar, _ = golden
    np.testing.assert_allclose(np.asarray(out["mu"]), t_mu,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["logvar"]), t_logvar,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["y_hat"]), t_yhat,
                               rtol=1e-5, atol=1e-5)
    delta = np.abs(np.asarray(out["recon"]) - t_recon).max()
    assert delta < 1e-4, f"recon delta {delta} at 5k vertices"


class TestParityAtScale:
    def test_dense_path(self, scale_env):
        jmodel, params, ops, x, y, golden = scale_env
        out = jmodel.apply(params, jnp.asarray(x), jnp.asarray(y), ops,
                           train=False)
        _assert_parity(out, golden)

    def test_ell_path(self, scale_env):
        jmodel, params, ops, x, y, golden = scale_env
        cfg = VAEConfig(**{**jmodel.cfg.__dict__, "cheb_method": "ell"})
        out = MeshVAE(cfg).apply(params, jnp.asarray(x), jnp.asarray(y), ops,
                                 train=False)
        _assert_parity(out, golden)

    def test_pallas_interpret_path(self, scale_env):
        import meshvae_tpu.ops.pallas_cheb as pc

        jmodel, params, ops, x, y, golden = scale_env
        cfg = VAEConfig(**{**jmodel.cfg.__dict__, "cheb_method": "pallas"})
        pc.INTERPRET = True
        try:
            out = MeshVAE(cfg).apply(params, jnp.asarray(x), jnp.asarray(y),
                                     ops, train=False)
        finally:
            pc.INTERPRET = False
        _assert_parity(out, golden)

    def test_pallas_high_precision_path(self, scale_env):
        """matmul_precision=high (bf16x3, 3 MXU passes) must STILL meet the
        <1e-4 recon-delta parity bar at full 5k scale — this is what
        licenses HIGH as the throughput default (BASELINE.md)."""
        import meshvae_tpu.ops.pallas_cheb as pc

        jmodel, params, ops, x, y, golden = scale_env
        cfg = VAEConfig(**{**jmodel.cfg.__dict__, "cheb_method": "pallas",
                           "precision": "high"})
        pc.INTERPRET = True
        try:
            out = MeshVAE(cfg).apply(params, jnp.asarray(x), jnp.asarray(y),
                                     ops, train=False)
        finally:
            pc.INTERPRET = False
        t_recon = golden[0]
        delta = np.abs(np.asarray(out["recon"]) - t_recon).max()
        assert delta < 1e-4, f"HIGH recon delta {delta} at 5k vertices"
        np.testing.assert_allclose(np.asarray(out["mu"]), golden[2],
                                   rtol=1e-3, atol=1e-4)
