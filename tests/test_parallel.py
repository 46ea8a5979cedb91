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
