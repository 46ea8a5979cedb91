"""Config preflight (meshvae_tpu/validate.py): reject configs that cannot
run in this environment BEFORE any device work — notably the measured
ELL-at-scale TPU worker crash (BASELINE.md "The ELL method at 80k")."""
import os

import pytest

from meshvae_tpu.config import apply_overrides, read_config
from meshvae_tpu.validate import (ConfigError, ELL_SAFE_BATCH_VERTICES,
                                  validate_config)

FILES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "files")


def base(**kw):
    cfg = {"data_parallel": 1, "seq_parallel": 1, "batch_size": 16,
           "cheb_method": "dense"}
    cfg.update(kw)
    return cfg


class TestDeviceMesh:
    def test_mesh_exceeds_devices(self):
        with pytest.raises(ConfigError, match="8 devices.*only 1"):
            validate_config(base(data_parallel=4, seq_parallel=2),
                            n_devices=1, platform="tpu")

    def test_mesh_fits(self):
        validate_config(base(data_parallel=4, seq_parallel=2), n_devices=8,
                        platform="tpu")

    def test_real_device_count_used_by_default(self):
        # conftest forces 8 virtual CPU devices; 16 must not fit
        with pytest.raises(ConfigError, match="16 devices"):
            validate_config(base(data_parallel=16))
        validate_config(base(data_parallel=8))

    def test_nonpositive_axes(self):
        with pytest.raises(ConfigError, match=">= 1"):
            validate_config(base(data_parallel=0), n_devices=8)

    def test_batch_divisibility(self):
        with pytest.raises(ConfigError, match="divisible by data_parallel"):
            validate_config(base(data_parallel=3, batch_size=16), n_devices=8,
                            platform="tpu")


class TestEllEnvelope:
    N80K = 79_968

    def test_80k_ell_rejected_on_tpu(self):
        with pytest.raises(ConfigError, match="crashes the TPU worker"):
            validate_config(base(cheb_method="ell", batch_size=32),
                            num_nodes=[self.N80K, 19992], n_devices=1,
                            platform="tpu")

    def test_80k_ell_small_batch_allowed(self):
        # bs4 at 80k completed on hardware (BASELINE.md)
        validate_config(base(cheb_method="ell", batch_size=4),
                        num_nodes=[self.N80K], n_devices=1, platform="tpu")

    def test_20k_ell_bs64_allowed(self):
        # the measured-safe record point (BASELINE.md round 3 ELL rows)
        validate_config(base(cheb_method="ell", batch_size=64),
                        num_nodes=[19_992], n_devices=1, platform="tpu")

    def test_two_regime_boundaries(self):
        # round-5 probes: 20k x 96 = 1.92M batch-vertices completes while
        # 80k x 24 (the SAME product) kills the worker — the envelope is
        # template-scale-conditioned, not a pure product
        validate_config(base(cheb_method="ell", batch_size=96),
                        num_nodes=[19_992], n_devices=1, platform="tpu")
        with pytest.raises(ConfigError, match="measured-safe envelope"):
            validate_config(base(cheb_method="ell", batch_size=24),
                            num_nodes=[self.N80K], n_devices=1,
                            platform="tpu")
        # large-N regime admits only the measured-safe 0.32M band
        with pytest.raises(ConfigError, match="measured-safe envelope"):
            validate_config(base(cheb_method="ell", batch_size=8),
                            num_nodes=[self.N80K], n_devices=1,
                            platform="tpu")

    def test_envelope_is_per_chip(self):
        # dp spreads the batch: 8 chips x 32/chip stays per-chip safe at 20k
        validate_config(base(cheb_method="ell", batch_size=256,
                             data_parallel=8),
                        num_nodes=[19_992], n_devices=8, platform="tpu")

    def test_cpu_backend_exempt(self):
        # tests/benches run big ELL shapes on the CPU backend: no TPU
        # worker exists to crash there
        validate_config(base(cheb_method="ell", batch_size=32),
                        num_nodes=[self.N80K], n_devices=1, platform="cpu")

    def test_pallas_at_scale_allowed(self):
        validate_config(base(cheb_method="pallas", batch_size=32),
                        num_nodes=[self.N80K], n_devices=1, platform="tpu")

    def test_scaled80k_cfg_with_ell_override_fails_fast(self):
        # the verdict's exact scenario:
        #   main.py -c files/scaled80k.cfg -p cheb_method ell
        cfg = read_config(os.path.join(FILES, "scaled80k.cfg"))
        cfg = apply_overrides(cfg, [("cheb_method", "ell")])
        with pytest.raises(ConfigError, match="measured-safe envelope"):
            validate_config(cfg, num_nodes=[self.N80K], n_devices=1,
                            platform="tpu")

    def test_scaled80k_cfg_defaults_run_single_chip(self):
        # round-3 finding: the shipped defaults (dp=8, bs=256) could not run
        # on any hardware this repo has touched; they are now single-chip
        cfg = read_config(os.path.join(FILES, "scaled80k.cfg"))
        validate_config(cfg, num_nodes=[self.N80K], n_devices=1,
                        platform="tpu")

    def test_scaled20k_cfg_defaults_run_single_chip(self):
        cfg = read_config(os.path.join(FILES, "scaled20k.cfg"))
        validate_config(cfg, num_nodes=[19_992], n_devices=1, platform="tpu")


def test_sp_nondivisible_warns():
    with pytest.warns(UserWarning, match="not divisible by"):
        validate_config(base(seq_parallel=4, batch_size=16,
                             data_parallel=1),
                        num_nodes=[4998], n_devices=8, platform="tpu")


def test_driver_integration(grid_mesh, tmp_path):
    """build_model_and_ops runs the preflight (all CLIs route through it)."""
    import numpy as np

    from meshvae_tpu.config import default_config
    from meshvae_tpu.mesh.io import save_obj
    from meshvae_tpu.train.driver import build_model_and_ops

    template = tmp_path / "grid.obj"
    save_obj(str(template), np.asarray(grid_mesh.v), np.asarray(grid_mesh.f))
    cfg = default_config()
    cfg.update(template=str(template), downsampling_factors=[2, 2],
               polygon_order=[2, 2, 2], num_conv_filters=[4, 4, 4],
               data_parallel=64)  # only 8 virtual devices exist
    with pytest.raises(ConfigError, match="64 devices"):
        build_model_and_ops(cfg)
