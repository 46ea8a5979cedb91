"""Serving-export tests: `jax.export` round-trip of the full inference step
(meshvae_tpu/infer/export.py). The artifact must reproduce the live engine's
outputs exactly, and the optional-ground-truth refactor of the engine step
must keep the error outputs on the driver path."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshvae_tpu.config import default_config
from meshvae_tpu.infer.driver import InferenceEngine
from meshvae_tpu.infer.export import (export_serving_step, load_serving_step,
                                      make_serving_step,
                                      save_serving_artifact)
from meshvae_tpu.mesh.io import save_obj
from meshvae_tpu.train.driver import build_model_and_ops, make_trainer

from conftest import make_grid_mesh


@pytest.fixture(scope="module")
def small_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("export"))
    template = make_grid_mesh(8, jitter=0.05)
    template_path = os.path.join(root, "template.obj")
    save_obj(template_path, template.v, template.f)
    config = default_config()
    config.update({
        "template": template_path,
        "checkpoint_dir": os.path.join(root, "ckpt"),
        "n_layers": 2,
        "num_hidden": 16,
        "num_style": 4,
        "downsampling_factors": [2, 2],
        "polygon_order": [3, 3, 3],
        "num_conv_filters": [8, 16, 16],
        "batch_size": 4,
        "hierarchy_cache_dir": os.path.join(root, "cache"),
    })
    model, ops, _, tmpl = build_model_and_ops(config)
    trainer = make_trainer(config, model, ops)
    params = trainer.init_params(jax.random.key(0))
    return config, model, ops, tmpl, params


def _fake_batch(n, b, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, n, 3)).astype(np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((b, 3, 3)))
    r = q.astype(np.float32)
    s = (1.0 + rng.random(b)).astype(np.float32)
    m = rng.standard_normal((b, 1, 3)).astype(np.float32)
    return x, r, s, m


class TestServingExport:
    def test_round_trip_matches_live_engine(self, small_setup, tmp_path):
        config, model, ops, template, params = small_setup
        n = np.asarray(template.v).shape[0]
        b = 4
        rng = np.random.default_rng(7)
        mean = 0.01 * rng.standard_normal((n, 3)).astype(np.float32)
        std = (1.0 + 0.1 * rng.random((n, 3))).astype(np.float32)
        x, r, s, m = _fake_batch(n, b)

        data = export_serving_step(model, ops, params, mean, std,
                                   batch_size=b, num_vertices=n)
        path = os.path.join(str(tmp_path), "serve.jaxexp")
        save_serving_artifact(path, data)
        assert os.path.getsize(path) > 0

        call = load_serving_step(path)
        out = call(x, r, s, m)

        serve = make_serving_step(model, ops, params, mean, std)
        ref = jax.jit(serve)(x, r, s, m)
        assert set(out) == {"pred", "recon_orig", "oppo_orig"}
        for k in sorted(out):
            np.testing.assert_allclose(np.asarray(out[k]),
                                       np.asarray(ref[k]),
                                       rtol=1e-6, atol=1e-6)

    def test_multi_platform_artifact(self, small_setup):
        """One artifact lowered for BOTH cpu and tpu — the actual serving
        deliverable (dev-box + TPU slice from the same bytes). Execution is
        checked on cpu; the tpu lowering is carried alongside."""
        import jax.export as jax_export
        config, model, ops, template, params = small_setup
        n = np.asarray(template.v).shape[0]
        mean = np.zeros((n, 3), np.float32)
        std = np.ones((n, 3), np.float32)
        data = export_serving_step(model, ops, params, mean, std,
                                   batch_size=2, num_vertices=n,
                                   platforms=("cpu", "tpu"))
        exported = jax_export.deserialize(data)
        assert exported.platforms == ("cpu", "tpu")
        x, r, s, m = _fake_batch(n, 2, seed=5)
        out = exported.call(x, r, s, m)
        assert np.asarray(out["recon_orig"]).shape == (2, n, 3)

    def test_engine_step_still_reports_errors(self, small_setup):
        """The serving refactor made ground truth optional — the driver path
        (batch WITH "original") must still emit err_mean/err_max."""
        config, model, ops, template, params = small_setup
        n = np.asarray(template.v).shape[0]
        b = 4
        x, r, s, m = _fake_batch(n, b, seed=11)
        engine = InferenceEngine(model, ops)
        batch = {"x": jnp.asarray(x), "r": jnp.asarray(r),
                 "s": jnp.asarray(s), "m": jnp.asarray(m),
                 "original": jnp.asarray(x) * 2.0}
        mean = jnp.zeros((n, 3), jnp.float32)
        std = jnp.ones((n, 3), jnp.float32)
        out = engine.step(params, batch, mean, std)
        assert {"pred", "recon_orig", "oppo_orig", "err_mean",
                "err_max"} <= set(out)
        assert np.asarray(out["err_mean"]).shape == (b,)
        assert np.all(np.isfinite(np.asarray(out["err_mean"])))
        # the serving trace (no "original") omits the error outputs
        no_gt = {k: v for k, v in batch.items() if k != "original"}
        out2 = engine.step(params, no_gt, mean, std)
        assert set(out2) == {"pred", "recon_orig", "oppo_orig"}
