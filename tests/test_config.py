"""Config-system tests: the reference's own .cfg files parse correctly,
defaults and overrides behave, and the default-writer round-trips."""
import os

import pytest

from meshvae_tpu.config import (apply_overrides, default_config, read_config,
                                write_default_config)

REF = "/root/reference/files"


class TestReferenceCompat:
    @pytest.mark.skipif(not os.path.exists(f"{REF}/default.cfg"),
                        reason="reference not mounted")
    def test_reads_reference_default_cfg(self):
        cfg = read_config(f"{REF}/default.cfg")
        assert cfg["type"] == "cheb_VAE"
        assert cfg["num_style"] == 16
        assert cfg["downsampling_factors"] == [4, 4, 4, 4]
        assert cfg["polygon_order"] == [6, 6, 6, 6, 6]
        assert cfg["num_conv_filters"] == [16, 16, 16, 32, 32]
        assert cfg["learning_rates"] == [1e-4, 5e-5]
        assert cfg["learning_rates_epochs"] == [500, 10000]
        assert cfg["weight_decay"] == 5e-4
        assert cfg["random_seeds"] == 666
        # the log_file-under-checkpoint_dir quirk
        assert cfg["log_file"].startswith(cfg["checkpoint_dir"])

    @pytest.mark.skipif(not os.path.exists(f"{REF}/crecon.cfg"),
                        reason="reference not mounted")
    def test_reads_reference_crecon_cfg(self):
        """The reference's own read_config crashes on crecon.cfg (keys live
        in the 'wrong' sections); the tolerant reader must not."""
        cfg = read_config(f"{REF}/crecon.cfg")
        assert cfg["type"] == "cheb_GCN"
        assert cfg["learning_rate"] == 1e-4       # from Learning Parameters
        assert cfg["random_seeds"] == 666         # from ChebModel section
        assert cfg["test_size"] == 0.3            # from ChebModel section
        assert cfg["folds"] == 5                  # missing -> typed default
        # unknown keys pass through as strings
        assert cfg["nb_patient"] == "1076"


class TestConfigBehavior:
    def test_defaults_complete(self):
        cfg = default_config()
        for key in ("cheb_method", "scan_epoch", "data_parallel",
                    "matmul_precision", "final_conv_adjacency"):
            assert key in cfg
        assert cfg["scan_epoch"] is True

    def test_overrides_json_coercion(self):
        cfg = default_config()
        out = apply_overrides(cfg, [("epoch", "42"), ("dropout", "0.5"),
                                    ("type", "cheb_GCN"),
                                    ("downsampling_factors", "[2, 2]")])
        assert out["epoch"] == 42 and isinstance(out["epoch"], int)
        assert out["dropout"] == 0.5
        assert out["type"] == "cheb_GCN"
        assert out["downsampling_factors"] == [2, 2]

    def test_write_default_roundtrip(self, tmp_path):
        path = os.path.join(tmp_path, "d.cfg")
        write_default_config(path)
        cfg = read_config(path)
        ref = default_config()
        for key in ("n_layers", "num_conv_filters", "batch_size",
                    "cheb_method", "final_conv_adjacency"):
            assert cfg[key] == ref[key], key

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            read_config("/nonexistent/x.cfg")

    def test_empty_values_fall_back(self, tmp_path):
        path = os.path.join(tmp_path, "e.cfg")
        with open(path, "w") as fp:
            fp.write("[Input Output]\nroot_dir =\nfolds =\n")
        cfg = read_config(path)
        assert cfg["root_dir"] == ""
        assert cfg["folds"] == 5


class TestShippedConfigs:
    def test_joint_cfg_parses(self):
        import os
        from meshvae_tpu.config import read_config
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        config = read_config(os.path.join(root, "files", "joint.cfg"))
        assert config["type"] == "joint_VAE"
        assert config["latent_split"] == 2
        assert config["sup_weight"] == 1.0
        assert config["adv_weight"] == 0.1
        assert config["cls_weight"] == 1.0
        assert config["num_style"] == 16

    def test_scaled20k_cfg_parses(self):
        import os
        from meshvae_tpu.config import read_config
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        config = read_config(os.path.join(root, "files", "scaled20k.cfg"))
        assert config["polygon_order"] == [10] * 5
        assert config["cheb_method"] == "pallas"
        assert config["template"].endswith("template20k.obj")

    def test_scaled80k_cfg_parses(self):
        import os
        from meshvae_tpu.config import read_config
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        config = read_config(os.path.join(root, "files", "scaled80k.cfg"))
        assert config["polygon_order"] == [10] * 5
        assert config["cheb_method"] == "pallas"
        assert config["template"].endswith("template80k.obj")
        # the first checked-in cfg pairing bf16 compute with default
        # matmul precision (HIGHEST would force multi-pass emulation)
        assert config["compute_dtype"] == "bfloat16"
        assert config["matmul_precision"] == "default"
