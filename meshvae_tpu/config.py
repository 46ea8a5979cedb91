"""Config system: INI-compatible flat config with the reference's key names.

Reads the same .cfg files as the reference's read_config
(/root/reference/config_parser.py:49-89) — including its quirks (log_file is
joined under checkpoint_dir, list keys are CSV strings) — but tolerantly:
keys are looked up across *all* sections (the reference's crecon.cfg scatters
Learning keys into the ChebModel section and relies on a fixed lookup table),
missing keys fall back to typed defaults, and unknown keys are preserved as
strings so new framework options (cheb_method, compute_dtype, ...) flow
through the same files.
"""
from __future__ import annotations

import configparser
import json
import os
from typing import Any, Callable


def _bool(value) -> bool:
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() in ("1", "true", "yes", "on")


def _csv(cast: Callable):
    def parse(value: str):
        return [cast(x) for x in str(value).split(",")]
    return parse


# key -> (parser, default). Defaults mirror files/default.cfg where sensible.
_SCHEMA: dict[str, tuple[Callable, Any]] = {
    "root_dir": (str, ""),
    "checkpoint_dir": (str, "./results/exp/"),
    "template": (str, "./template/template5k.obj"),
    "error_file": (str, ""),
    "log_file": (str, "log.txt"),
    "type": (str, "cheb_VAE"),
    "num_classes": (int, 2),
    "num_style": (int, 16),
    "model": (str, "optimal_sigma_VAE"),
    "folds": (int, 5),
    "test_size": (float, 0.3),
    "random_seeds": (int, 666),
    "checkpoint_file": (str, ""),
    "n_layers": (int, 4),
    "num_hidden": (int, 512),
    "downsampling_factors": (_csv(int), [4, 4, 4, 4]),
    "num_conv_filters": (_csv(int), [16, 16, 16, 32, 32]),
    "workers_thread": (int, 6),
    "polygon_order": (_csv(int), [6, 6, 6, 6, 6]),
    "optimizer": (str, "adam"),
    "batch_size": (int, 16),
    "learning_rate": (float, 1e-3),
    "learning_rates": (_csv(float), [1e-4, 5e-5]),
    "learning_rates_epochs": (_csv(float), [500, 10000]),
    "learning_rate_decay": (float, 0.99),
    "weight_decay": (float, 5e-4),
    "dropout": (float, 0.2),
    "epoch": (int, 300),
    # --- joint disentangled VAE + classifier (BASELINE config 3) ---------
    "latent_split": (int, 2),            # supervised latent dims (type=joint_VAE)
    "sup_weight": (float, 1.0),          # CE weight: supervised latent slice
    "adv_weight": (float, 0.1),          # CE weight: adversarial free slice
    "cls_weight": (float, 1.0),          # CE weight: joint GCN classifier
    # --- framework-specific additions (absent from reference configs) ---
    "cheb_method": (str, "dense"),       # dense | ell | pallas
    "pool_method": (str, "gather"),      # gather | dense
    "compute_dtype": (str, "float32"),   # float32 | bfloat16
    "matmul_precision": (str, ""),       # "" | default | highest
    "final_conv_adjacency": (str, "reference_quirk"),  # reference_quirk | finest
    "hierarchy_mode": (str, "fast"),     # fast | reference (bit-exact QSlim)
    "data_parallel": (int, 1),           # devices along the batch axis
    "seq_parallel": (int, 1),            # devices along the vertex axis
    "multihost": (_bool, False),         # jax.distributed.initialize first
    "coordinator_address": (str, ""),    # host:port ("" = auto-detect)
    "num_processes": (int, 0),           # 0 = auto-detect
    "process_id": (int, -1),             # -1 = auto-detect
    "scan_epoch": (_bool, True),         # whole epoch in one device dispatch
    "serve_wire_dtype": (str, "float16"),  # serving-chunk x upload dtype
                                           # (float16 | float32): x is the
                                           # ~whole upload and is normalized
                                           # ~N(0,1), so f16 halves the
                                           # ~50 MB/s relay bytes at ~5e-4
                                           # relative error; r/s/m stay f32
    "hierarchy_cache_dir": (str, ""),
    "profile_dir": (str, ""),            # jax.profiler trace output ("" = off)
    "halt_on_nonfinite": (_bool, True),  # stop on NaN/inf loss (driver)
}


def read_config(fname: str) -> dict:
    """INI file -> flat typed dict (reference-compatible key set + defaults)."""
    if not os.path.exists(fname):
        raise FileNotFoundError(f"Config not found: {fname}")

    parser = configparser.RawConfigParser()
    parser.read(fname)

    raw: dict[str, str] = {}
    for section in parser.sections():
        for key, value in parser.items(section):
            raw[key] = value

    config: dict[str, Any] = {}
    for key, (parse, default) in _SCHEMA.items():
        if key in raw and str(raw[key]).strip() != "":
            config[key] = parse(raw[key])
        else:
            config[key] = default
    # pass through unknown keys as raw strings
    for key, value in raw.items():
        if key not in config:
            config[key] = value

    # reference quirk: log_file is resolved relative to checkpoint_dir
    # (/root/reference/config_parser.py:62)
    config["log_file"] = os.path.join(config["checkpoint_dir"], config["log_file"])
    return config


def default_config() -> dict:
    config = {key: default for key, (_, default) in _SCHEMA.items()}
    config["log_file"] = os.path.join(config["checkpoint_dir"], config["log_file"])
    return config


def apply_overrides(config: dict, overrides: list[tuple[str, str]] | None) -> dict:
    """CLI `-p key value` overrides with JSON coercion for non-string targets
    (reference inference.py:167-171)."""
    if not overrides:
        return config
    for key, value in overrides:
        current = config.get(key)
        if current is not None and not isinstance(current, str):
            value = json.loads(value)
        config[key] = value
    return config


def write_default_config(fname: str) -> None:
    """Emit a default .cfg in the reference's three-section layout."""
    parser = configparser.RawConfigParser()
    sections = {
        "Input Output": [
            "checkpoint_dir", "template", "root_dir", "error_file", "log_file",
            "type", "num_classes", "num_style", "model", "folds", "test_size",
            "random_seeds",
        ],
        "ChebModel  Parameters": [
            "checkpoint_file", "n_layers", "num_hidden", "downsampling_factors",
            "polygon_order", "num_conv_filters", "workers_thread",
        ],
        "Learning Parameters": [
            "optimizer", "batch_size", "learning_rate", "learning_rates",
            "learning_rates_epochs", "learning_rate_decay", "weight_decay",
            "dropout", "epoch",
        ],
        "TPU Parameters": [
            "cheb_method", "pool_method", "compute_dtype", "matmul_precision",
            "final_conv_adjacency", "hierarchy_mode", "data_parallel",
        ],
    }
    for section, keys in sections.items():
        parser.add_section(section)
        for key in keys:
            _, default = _SCHEMA[key]
            if isinstance(default, list):
                value = ", ".join(str(x) for x in default)
            else:
                value = str(default)
            parser.set(section, key, value)
    with open(fname, "w") as fp:
        parser.write(fp)
