"""History records, log file, and profiling hooks.

Emits the same artifacts as the reference driver: per-epoch
`history{fold}.json` with training/validation records
(/root/reference/main.py:282-310) and a plain-text log file written every 10
epochs (main.py:303-307). Adds structured per-step timing and optional
jax.profiler traces (the reference has no tracing at all, SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import json
import os
import time

import jax


def history_record(epoch: int, begin: float, duration: float,
                   train: dict, valid: dict, mean_val_error: float) -> dict:
    """Schema note on timing: `begin` is the epoch's DISPATCH timestamp and
    `finalized` (= begin + duration) the moment its metrics were fetched.
    With pipelined epochs (train/driver.py) the next epoch dispatches before
    this one finalizes, so consecutive `duration`s overlap and do NOT
    partition wall time — tools must difference `begin`s (as plotLosses.py
    does) or use `finalized` - previous `finalized`."""
    record = {
        "epoch": epoch,
        "begin": begin,
        "duration": duration,
        "finalized": begin + duration,
        "training": {
            "loss": train["loss"],
            "kld": train["kld"],
            "reconstruction_loss": train["rec_loss"],
            "accuracy": train["accuracy"],
            "error": train["error"],
        },
        "validation": {
            "loss": valid["loss"],
            "kld": valid["kld"],
            "reconstruction_loss": valid["rec_loss"],
            "accuracy": valid["accuracy"],
            "error": mean_val_error,
            "sex_change_success_rate": valid["sex_change_success_rate"],
        },
    }
    # model-specific extras (e.g. the joint model's supervised-slice and
    # adversarial-head accuracies) ride through under their own names
    known = {"loss", "kld", "rec_loss", "accuracy", "error", "count",
             "sex_change_success_rate"}
    for key, value in valid.items():
        if key not in known:
            record["validation"][key] = value
    return record


def write_history(checkpoint_dir: str, fold: int, history: list[dict]) -> None:
    from ..parallel.sharding import is_primary

    if not is_primary():  # multi-host: one writer per shared-FS artifact
        return
    with open(os.path.join(checkpoint_dir, f"history{fold}.json"), "w") as fp:
        json.dump(history, fp)


class RunLog:
    """Append-style text log mirroring the reference's my_log file. In a
    multi-host run only process 0 opens the file and prints (every process
    computes identical metrics; N interleaved writers corrupt the log)."""

    def __init__(self, path: str):
        from ..parallel.sharding import is_primary

        self._primary = is_primary()
        if self._primary:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fp = open(path, "w")
        else:
            self._fp = None

    def print(self, *args) -> None:
        if self._fp is None:
            return
        text = " ".join(str(a) for a in args)
        print(text)
        print(text, file=self._fp, flush=True)

    def close(self) -> None:
        if self._fp is not None:
            self._fp.close()


# Epochs maybe_profile traces (epoch 1 pays compiles; 2 is the first clean
# one). ONE constant shared by is_profiled and maybe_profile: if they ever
# disagreed, the driver's forced-synchronous consumption would desync from
# the actual trace and capture an empty profile under pipelining.
PROFILE_EPOCHS = (2,)


def is_profiled(profile_dir: str | None, epoch: int,
                profile_epochs: tuple = PROFILE_EPOCHS) -> bool:
    """True when maybe_profile would trace this epoch. The driver uses
    this to force synchronous metric consumption for traced epochs: with
    the epoch pipeline, the dispatch alone returns immediately and the
    trace would otherwise capture almost none of the device execution."""
    return bool(profile_dir) and epoch in profile_epochs


@contextlib.contextmanager
def maybe_profile(profile_dir: str | None, epoch: int,
                  profile_epochs: tuple = PROFILE_EPOCHS):
    """Capture a jax.profiler trace for selected epochs when enabled."""
    if is_profiled(profile_dir, epoch, profile_epochs):
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


def epoch_line(epoch: int, train: dict, valid: dict, mean_val_error: float) -> str:
    return (
        "Epoch {}, train loss {}(kld {}, recon loss {}, train acc {}) || "
        "valid loss {}(error {}, rec_loss {}, valid acc {}, sex change acc {})"
    ).format(epoch, train["loss"], train["kld"], train["rec_loss"],
             train["accuracy"], valid["loss"], mean_val_error,
             valid["rec_loss"], valid["accuracy"],
             valid["sex_change_success_rate"])
