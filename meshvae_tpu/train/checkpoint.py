"""Checkpoint save/load with the reference's logical contents.

The reference pickles {state_dict, optimizer, epoch_num, train_loss,
val_loss} per fold (/root/reference/main.py:32-39) plus an initial-weights
snapshot reloaded at the start of every fold (model.py:60, main.py:250), and
keeps normalization stats in a separate `norm.npz` (data.py:173). This module
stores the same logical contents as flax-serialized msgpack (exact pytree
round-trip including optimizer NamedTuple state), and — unlike the
reference, whose resume path crashes on undefined names (main.py:229-238) —
restore actually works.
"""
from __future__ import annotations

import json
import os
from typing import Any

from flax import serialization


def save_checkpoint(path: str, params: Any, opt_state: Any, epoch: int,
                    train_loss: float, val_loss: float) -> None:
    from ..parallel.sharding import is_primary

    if not is_primary():  # multi-host: one writer per shared-FS artifact
        return
    payload = {
        "params": params,
        "opt_state": opt_state,
        "epoch_num": epoch,
        "train_loss": float(train_loss),
        "val_loss": float(val_loss),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fp:
        fp.write(serialization.to_bytes(payload))
    with open(path + ".meta.json", "w") as fp:
        json.dump({"epoch_num": epoch, "train_loss": float(train_loss),
                   "val_loss": float(val_loss)}, fp)


def _require(path: str) -> None:
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint not found: {path} — train first "
            "(python main.py -c <cfg> -t), or check the fold number (-n) "
            "and the config's checkpoint_dir")


def load_checkpoint(path: str, params_target: Any, opt_state_target: Any) -> dict:
    """Restore into the given target pytrees; returns the full payload dict."""
    _require(path)
    target = {
        "params": params_target,
        "opt_state": opt_state_target,
        "epoch_num": 0,
        "train_loss": 0.0,
        "val_loss": 0.0,
    }
    with open(path, "rb") as fp:
        return serialization.from_bytes(target, fp.read())


def save_params(path: str, params: Any) -> None:
    from ..parallel.sharding import is_primary

    if not is_primary():  # multi-host: one writer per shared-FS artifact
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fp:
        fp.write(serialization.to_bytes(params))


def load_params(path: str, params_target: Any) -> Any:
    _require(path)
    with open(path, "rb") as fp:
        return serialization.from_bytes(params_target, fp.read())


def checkpoint_path(checkpoint_dir: str, fold: int) -> str:
    """checkpoint_{fold} naming, as in the reference (main.py:39)."""
    return os.path.join(checkpoint_dir, f"checkpoint_{fold}.msgpack")
