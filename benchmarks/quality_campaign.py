#!/usr/bin/env python
"""Training-to-quality campaign: prove the record-throughput configs LEARN.

The reference's whole validation story is "train on the fake dataset and
inspect losses/accuracy" (/root/reference/README.md:27-30, history JSON
/root/reference/main.py:282-310). This campaign is that story executed
end-to-end on TPU hardware for the paths whose throughput records BASELINE.md
claims:

  parity_f32    dense + matmul_precision=highest  (the numerics anchor)
  record_high   pallas + HIGH (bf16x3)            (BASELINE config-1 record)
  flagship_bf16 pallas + compute_dtype=bfloat16, bs128  (the flagship record)
  joint_high    joint_VAE, pallas + HIGH          (BASELINE config 3)
  scaled20k     pallas bf16 bs64 on the 20k template  (BASELINE config 5)
  scaled80k     pallas bf16 bs32 on the 80k template  (the scale demo)

Each leg drives the real `main.py` CLI (train + test) as a subprocess on a
shared synthetic dataset, then the summary collates history{fold}.json curves
and the test-fold metrics into one JSON blob that RESULTS.md quotes.

Usage:
  python benchmarks/quality_campaign.py [--legs parity_f32,record_high,...]
      [--out /tmp/campaign] [--epochs 300] [--samples 640] [--folds 2]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

LEGS: dict[str, dict] = {
    "parity_f32": {
        "cfg": "files/default.cfg",
        "overrides": {"cheb_method": "dense", "matmul_precision": "highest"},
    },
    "record_high": {
        "cfg": "files/default.cfg",
        "overrides": {"cheb_method": "pallas", "matmul_precision": "high"},
    },
    "flagship_bf16": {
        "cfg": "files/default.cfg",
        # matmul_precision=default matches the bench record config exactly
        # (bench.py clamps HIGHEST on bf16 operands the same way the
        # kernel-level _clamp_bf16_precision now does).
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "128"},
    },
    "joint_high": {
        "cfg": "files/joint.cfg",
        "overrides": {"cheb_method": "pallas", "matmul_precision": "high"},
    },
    "scaled20k": {
        "cfg": "files/scaled20k.cfg",
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "64",
                      "data_parallel": "1", "seq_parallel": "1"},
        "template": "20k",
    },
    "scaled80k": {
        "cfg": "files/scaled80k.cfg",
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "32",
                      "data_parallel": "1", "seq_parallel": "1"},
        "template": "80k",
    },
    # ---- round-5 legs -------------------------------------------------
    # Equal-optimizer-step anchor for the flagship: parity numerics (dense
    # HIGHEST) at the flagship's batch size, so both make 5 steps/epoch.
    # Isolates bf16 numerics from step-count in the final-error gap
    # (RESULTS.md conclusion 3).
    "parity_bs128": {
        "cfg": "files/default.cfg",
        "overrides": {"cheb_method": "dense", "matmul_precision": "highest",
                      "batch_size": "128"},
    },
    # Capacity sweep on the scaled legs: the committed 80k test-fold
    # sex-change spread (0.54/0.81, RESULTS.md) was attributed to latent
    # capacity without a test. These legs vary latent width (num_style)
    # and dataset size at the 300-epoch / folds=2 protocol so every
    # number is directly comparable to the round-4 table.
    "scaled80k_ns32": {
        "cfg": "files/scaled80k.cfg",
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "32",
                      "data_parallel": "1", "seq_parallel": "1",
                      "num_style": "32"},
        "template": "80k",
    },
    "scaled80k_ns64": {
        "cfg": "files/scaled80k.cfg",
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "32",
                      "data_parallel": "1", "seq_parallel": "1",
                      "num_style": "64"},
        "template": "80k",
    },
    "scaled80k_data2x": {
        "cfg": "files/scaled80k.cfg",
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "32",
                      "data_parallel": "1", "seq_parallel": "1"},
        "template": "80k",
        "samples": 384,
    },
    "scaled80k_ns8": {
        "cfg": "files/scaled80k.cfg",
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "32",
                      "data_parallel": "1", "seq_parallel": "1",
                      "num_style": "8"},
        "template": "80k",
    },
    "scaled20k_ns8": {
        "cfg": "files/scaled20k.cfg",
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "64",
                      "data_parallel": "1", "seq_parallel": "1",
                      "num_style": "8"},
        "template": "20k",
    },
    "scaled20k_ns32": {
        "cfg": "files/scaled20k.cfg",
        "overrides": {"cheb_method": "pallas", "compute_dtype": "bfloat16",
                      "matmul_precision": "default", "batch_size": "64",
                      "data_parallel": "1", "seq_parallel": "1",
                      "num_style": "32"},
        "template": "20k",
    },
}

TEST_LINE = re.compile(
    r"round (\d+) test loss ([\d.eE+-]+),\s+mean error: ([\d.eE+-]+), "
    r"train sigma ([\d.eE+-]+), classification acc ([\d.eE+-]+), "
    r"sex change rate ([\d.eE+-]+)")


def ensure_dataset(out_dir: str, n_samples: int, seed: int,
                   template_path: str) -> str:
    """Generate the synthetic dataset once (the reference's fake-data trick)."""
    data_dir = os.path.join(out_dir, "data")
    marker = os.path.join(data_dir, f".done_{n_samples}_{seed}")
    if os.path.exists(marker):
        return data_dir
    from meshvae_tpu.data.synthetic import generate_synthetic_dataset
    from meshvae_tpu.mesh.io import load_obj
    from meshvae_tpu.tools.make_scaled_template import ensure_template

    ensure_template(template_path)
    t = load_obj(template_path)
    generate_synthetic_dataset(t, data_dir, n_samples=n_samples, seed=seed)
    open(marker, "w").close()
    return data_dir


def run_leg(name: str, leg: dict, data_dir: str, out_dir: str, epochs: int,
            folds: int, timeout: int) -> dict:
    ckpt_dir = os.path.join(out_dir, name) + "/"
    os.makedirs(ckpt_dir, exist_ok=True)
    cmd = [sys.executable, os.path.join(REPO, "main.py"),
           "-c", os.path.join(REPO, leg["cfg"]), "-t", "-s",
           "-p", "root_dir", data_dir,
           "-p", "checkpoint_dir", ckpt_dir,
           "-p", "epoch", str(epochs),
           "-p", "folds", str(folds)]
    for k, v in leg["overrides"].items():
        cmd += ["-p", k, v]
    log_path = os.path.join(out_dir, f"{name}.log")
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                              cwd=REPO, timeout=timeout)
    wall = time.time() - t0
    result = {"leg": name, "returncode": proc.returncode, "wall_s": wall,
              "log": log_path, "checkpoint_dir": ckpt_dir}
    result["folds"] = collate_histories(ckpt_dir, folds)
    result["test"] = parse_test_lines(log_path)
    return result


def collate_histories(ckpt_dir: str, folds: int) -> list[dict]:
    out = []
    for n in range(1, folds + 1):
        path = os.path.join(ckpt_dir, f"history{n}.json")
        if not os.path.exists(path):
            out.append({"fold": n, "missing": True})
            continue
        with open(path) as fp:
            hist = json.load(fp)
        val_loss = [h["validation"]["loss"] for h in hist]
        val_err = [h["validation"]["error"] for h in hist]
        best = min(range(len(val_loss)), key=val_loss.__getitem__)
        # milestone curve: epoch -> (val loss, val error) at 1/10/30/...
        marks = sorted({1, 10, 30, 100, len(hist)} & set(
            range(1, len(hist) + 1)))
        out.append({
            "fold": n,
            "epochs": len(hist),
            "curve": {m: {"val_loss": val_loss[m - 1],
                          "val_error": val_err[m - 1]} for m in marks},
            "best_epoch": hist[best]["epoch"],
            "best_val_loss": val_loss[best],
            "best_val_error": val_err[best],
            "final_val_loss": val_loss[-1],
            "final_val_error": val_err[-1],
            "final_val_accuracy": hist[-1]["validation"]["accuracy"],
            "final_sex_change_rate":
                hist[-1]["validation"]["sex_change_success_rate"],
        })
    return out


def parse_test_lines(log_path: str) -> list[dict]:
    out = []
    with open(log_path) as fp:
        for line in fp:
            m = TEST_LINE.search(line)
            if m:
                out.append({"fold": int(m.group(1)),
                            "test_loss": float(m.group(2)),
                            "mean_error": float(m.group(3)),
                            "accuracy": float(m.group(5)),
                            "sex_change_rate": float(m.group(6))})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="parity_f32,record_high,flagship_bf16,"
                                      "joint_high")
    ap.add_argument("--out", default="/tmp/campaign")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--samples", type=int, default=640)
    ap.add_argument("--samples-20k", type=int, default=256)
    ap.add_argument("--samples-80k", type=int, default=192)
    ap.add_argument("--folds", type=int, default=2)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--timeout", type=int, default=5400, help="per leg, s")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    data5k = ensure_dataset(args.out, args.samples, args.seed,
                            os.path.join(REPO, "template/template5k.obj"))
    results = []
    for name in args.legs.split(","):
        name = name.strip()
        leg = LEGS[name]
        scale = leg.get("template")
        if scale:
            n = leg.get(
                "samples", {"20k": args.samples_20k,
                            "80k": args.samples_80k}[scale])
            # custom sample counts get their own dataset dir so the
            # default-sized dataset is never mixed with or overwritten by
            # a larger one
            sub = scale if "samples" not in leg else f"{scale}_{n}"
            data_dir = ensure_dataset(
                os.path.join(args.out, sub), n, args.seed,
                os.path.join(REPO, f"template/template{scale}.obj"))
        else:
            data_dir = data5k
        print(f"=== leg {name} ===", flush=True)
        try:
            res = run_leg(name, leg, data_dir, args.out, args.epochs,
                          args.folds, args.timeout)
        except subprocess.TimeoutExpired:
            res = {"leg": name, "returncode": "timeout"}
        print(json.dumps(res, indent=2), flush=True)
        results.append(res)
        with open(os.path.join(args.out, "campaign.json"), "w") as fp:
            json.dump(results, fp, indent=2)
    print("campaign done:", os.path.join(args.out, "campaign.json"))


if __name__ == "__main__":
    main()
