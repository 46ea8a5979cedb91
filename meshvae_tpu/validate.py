"""Config preflight: fail fast, with actionable messages, before any device
work.

The reference has no validation at all (a bad config dies wherever it first
explodes); worse, this framework has one *measured* landmine the reference
cannot have: `cheb_method = ell` beyond its safe envelope reproducibly
crashes the TPU worker process mid-run (a kernel fault in the big
[B, N, D, F] neighbor gather — it compiles, then kills the backend; see
BASELINE.md "The ELL method at 80k"). A framework must reject that config up
front, not let a user's `main.py -c files/scaled80k.cfg -p cheb_method ell`
take down the chip.

Called by `train.driver.build_model_and_ops` (all three CLIs route through
it) once the hierarchy is known.
"""
from __future__ import annotations

import warnings


class ConfigError(ValueError):
    """A config that cannot run in this environment (clear, early)."""


# Measured ELL envelope (BASELINE.md; round-5 bisection probes). The
# fault is NOT a pure batch x vertices product: 20k x 96 and 80k x 24
# are the same 1.92M batch-vertices, yet the former completes (384
# meshes/sec, finite loss) and the latter reproducibly kills the TPU
# worker. Two regimes, each bounded by runs on both sides:
#   N <= ~20k vertices: safe through 1.92M batch-vertices
#          (20k x 64 r3, 20k x 72 + 20k x 96 r5); nothing above probed,
#          so the limit stays at the measured boundary.
#   N  > ~20k vertices: 80k x 4 = 0.32M completes (r3); 80k x 24 =
#          1.92M and 80k x 32 = 2.56M fault (r5/r3). Only the
#          measured-safe 0.32M is admitted — the 0.32M-1.92M band is
#          unprobed and a crash takes down the whole worker process.
ELL_SAFE_BATCH_VERTICES = 1_920_000
ELL_LARGE_N = 32_768           # above this, the conservative regime
ELL_SAFE_BATCH_VERTICES_LARGE_N = 320_000


def _device_info(n_devices, platform):
    if n_devices is not None:
        return n_devices, platform or "tpu"
    import jax

    devices = jax.devices()
    return len(devices), devices[0].platform


def validate_config(config: dict, num_nodes=None, n_devices: int | None = None,
                    platform: str | None = None) -> None:
    """Raise ConfigError for configs that cannot run here; warn for configs
    that run but lose a documented optimization.

    num_nodes: per-level vertex counts (hierarchy.levels) when known —
    enables the vertex-dependent checks (ELL envelope, sp divisibility).
    n_devices/platform override jax.devices() for tests.
    """
    dp = int(config.get("data_parallel", 1))
    sp = int(config.get("seq_parallel", 1))
    batch_size = int(config.get("batch_size", 16))
    method = str(config.get("cheb_method", "dense"))

    if dp < 1 or sp < 1:
        raise ConfigError(
            f"data_parallel ({dp}) and seq_parallel ({sp}) must be >= 1")

    n_dev, platform = _device_info(n_devices, platform)
    if dp * sp > n_dev:
        raise ConfigError(
            f"config asks for a {dp}x{sp} device mesh (data_parallel x "
            f"seq_parallel = {dp * sp} devices) but only {n_dev} "
            f"{platform} device(s) are available. Lower data_parallel/"
            f"seq_parallel to fit, or launch on a larger slice (multi-host: "
            f"set multihost = true so jax.devices() spans all hosts).")

    if batch_size % dp != 0:
        raise ConfigError(
            f"batch_size ({batch_size}) must be divisible by data_parallel "
            f"({dp}): batches shard their leading axis evenly over the dp "
            f"mesh axis.")

    if num_nodes is not None and sp > 1 and int(num_nodes[0]) % sp != 0:
        warnings.warn(
            f"vertex count {int(num_nodes[0])} is not divisible by "
            f"seq_parallel ({sp}): staged vertex arrays will be replicated "
            f"instead of sharded over sp (extra HBM + ICI traffic). Pick sp "
            f"dividing the vertex count for the fully sharded path.",
            stacklevel=2)

    if method == "ell" and num_nodes is not None and platform != "cpu":
        per_chip_batch = batch_size // dp
        n0 = int(num_nodes[0])
        work = per_chip_batch * n0
        limit = (ELL_SAFE_BATCH_VERTICES_LARGE_N if n0 > ELL_LARGE_N
                 else ELL_SAFE_BATCH_VERTICES)
        if work > limit:
            raise ConfigError(
                f"cheb_method = ell at batch {per_chip_batch}/chip x "
                f"{n0} vertices ({work:,} batch-vertices) is outside the "
                f"measured-safe envelope ({limit:,} at this vertex count): "
                f"the level-0 neighbor gather reproducibly crashes the TPU "
                f"worker process mid-run at 80k vertices x batch >= 24 "
                f"(kernel fault after a successful compile; BASELINE.md "
                f"'the ELL crash envelope'). Use cheb_method = pallas "
                f"(faster at every measured scale), or shrink batch_size / "
                f"raise data_parallel to get back under the envelope.")
