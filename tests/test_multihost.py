"""Multi-host verification: a REAL multi-process deployment (2 OS processes
x 2 virtual CPU devices each, gloo collectives, jax.distributed.initialize)
must produce the same training/eval numbers as a single-process run.

The reference is strictly single-device (SURVEY.md §2c); this proves the
TPU-native multi-host path — global mesh over all processes' devices,
batches assembled from process-local shards (put_sharded), dp-sharded
outputs gathered back (fetch) — end to end, without TPU hardware."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns real multi-process deployments

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")
RESULT_KEYS = ("step_loss", "step_error", "epoch_loss", "eval_loss",
               "eval_error_mean")


def _free_port() -> int:
    """Ask the kernel for a free TCP port (bind port 0). The port is
    released before the workers bind it — a tiny race remains, which the
    retry loop in run_workers absorbs."""
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_workers(num_processes: int, local_devices: int, port: int = 0,
                extra_args=(), _attempts: int = 3):
    """Launch the worker N times; return the parsed JSON result lines.
    The coordinator port comes from the kernel (bind port 0); a bind clash
    with a concurrent run retries on a fresh port."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    for attempt in range(_attempts):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER,
                 "--process-id", str(i),
                 "--num-processes", str(num_processes),
                 "--local-devices", str(local_devices),
                 "--port", str(port), *extra_args],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env)
            for i in range(num_processes)
        ]
        results = []
        failed = None
        for proc in procs:
            out, err = proc.communicate(timeout=600)
            if proc.returncode != 0:
                failed = (proc.returncode, err)
                continue
            line = [l for l in out.strip().splitlines()
                    if l.startswith("{")][-1]
            results.append(json.loads(line))
        if failed is None:
            return results
        rc, err = failed
        clash = ("Address already in use" in err or "EADDRINUSE" in err)
        assert clash and attempt < _attempts - 1, (
            f"worker failed (rc={rc}):\n{err[-4000:]}")
    raise AssertionError("unreachable")


def test_two_process_matches_single_process():
    single = run_workers(1, 1)[0]
    multi = run_workers(2, 2)

    # every process reports the same replicated metrics
    for key in RESULT_KEYS:
        np.testing.assert_allclose(multi[0][key], multi[1][key], rtol=1e-6,
                                   err_msg=f"processes disagree on {key}")

    # and the 2-process x 2-device dp=4 run matches single-device math;
    # tolerance covers all-reduce summation-order differences
    for key in RESULT_KEYS:
        np.testing.assert_allclose(multi[0][key], single[key], rtol=2e-4,
                                   err_msg=f"multi-host diverges on {key}")

    # eval errors were gathered across processes to full global shape
    assert multi[0]["eval_error_shape"] == single["eval_error_shape"]


def test_full_driver_two_processes(tmp_path):
    """The ENTIRE k-fold train+test driver under a real 2-process
    deployment: primary-only artifact writes, write-before-read barriers,
    staged scan epochs, gathered eval — per-fold test results must agree
    across processes and all artifacts must exist exactly once."""
    import numpy as np

    # prepare the shared env (single-process, before any worker starts)
    env = {k: v for k, v in os.environ.items()}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    prep = ("import sys; sys.path.insert(0, %r); sys.path.insert(0, %r)\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from conftest import make_grid_mesh\n"
            "from meshvae_tpu.mesh.io import save_obj\n"
            "from meshvae_tpu.data.synthetic import generate_synthetic_dataset\n"
            "m = make_grid_mesh(8, jitter=0.05)\n"
            "save_obj(%r, m.v, m.f)\n"
            "generate_synthetic_dataset(m, %r, n_samples=16, seed=3)\n"
            ) % (os.path.dirname(WORKER),
                 os.path.dirname(os.path.dirname(os.path.abspath(WORKER))),
                 str(tmp_path / "template.obj"), str(tmp_path / "data"))
    subprocess.run([sys.executable, "-c", prep], check=True, env=env,
                   timeout=300)

    results = run_workers(2, 2,
                          extra_args=("--driver-dir", str(tmp_path)))
    r0, r1 = results[0]["results"], results[1]["results"]
    assert len(r0) == 2 and len(r1) == 2
    for a, b in zip(r0, r1):
        for key in a:
            np.testing.assert_allclose(a[key], b[key], rtol=1e-5,
                                       err_msg=key)

    ckpt = tmp_path / "ckpt"
    for artifact in ("initial_weight.msgpack", "norm.npz", "log.txt",
                     "checkpoint_1.msgpack", "checkpoint_2.msgpack",
                     "history1.json", "history2.json"):
        assert (ckpt / artifact).exists(), artifact
