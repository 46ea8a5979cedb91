"""Multi-host verification: a REAL multi-process deployment (2 OS processes
x 2 virtual CPU devices each, gloo collectives, jax.distributed.initialize)
must produce the same training/eval numbers as a single-process run.

The reference is strictly single-device (SURVEY.md §2c); this proves the
TPU-native multi-host path — global mesh over all processes' devices,
batches assembled from process-local shards (put_sharded), dp-sharded
outputs gathered back (fetch) — end to end, without TPU hardware."""
import json
import os
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")
RESULT_KEYS = ("step_loss", "step_error", "epoch_loss", "eval_loss",
               "eval_error_mean")


def run_workers(num_processes: int, local_devices: int, port: int):
    """Launch the worker N times; return the parsed JSON result lines."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--process-id", str(i),
             "--num-processes", str(num_processes),
             "--local-devices", str(local_devices),
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(num_processes)
    ]
    results = []
    for proc in procs:
        out, err = proc.communicate(timeout=600)
        assert proc.returncode == 0, (
            f"worker failed (rc={proc.returncode}):\n{err[-4000:]}")
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    return results


def test_two_process_matches_single_process():
    single = run_workers(1, 1, port=19744)[0]
    multi = run_workers(2, 2, port=19745)

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
