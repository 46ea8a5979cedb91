"""Warm-engine serving loop behind `inference.py --serve`.

The reference's deployment story ends at a batch CLI
(/root/reference/inference.py:63-157): every invocation re-imports the
stack, rebuilds the hierarchy, and re-traces the model. A production TPU
deployment wants the opposite shape — a long-lived process that compiles
once and answers requests at the reused-engine rate (BASELINE.md
"whole-pipeline inference": 61.8 meshes/sec fresh process vs 223 warm).

This module is that process. Protocol: line-oriented stdio, so it composes
with any supervisor, socket wrapper, or shell pipe and is trivially
testable:

  stdin   one request per line — a path to an ``.obj`` mesh, or a
          directory (every ``*.obj`` directly inside). Blank lines are
          ignored. EOF shuts the server down.
  stdout  one JSON line per input mesh::

              {"file": ..., "sex": 0|1,
               "reconstruction_error": {"mean": ..., "max": ...},
               "recon": path, "oppo": path}     # paths with save_meshes

          then one ``{"done": N, "sec": T}`` line per request line.
          Malformed requests answer ``{"error": ...}`` and keep serving.

TPU-first mechanics: requests pad to the engine's static batch size
(static shapes by design — no per-size recompiles), larger requests chunk,
and the per-batch device pulls are packed into one ``[3, B]`` scalar slab
(pred / err_mean / err_max) so a request costs one ~25 ms relay round-trip
plus the optional mesh stacks, not five (the round-3 inference-CLI lesson,
see infer/driver.py). Multi-chunk requests run a two-lane software
pipeline: host preprocessing of chunk i+1 overlaps the device lane's
upload/step/pull of chunk i (see ``handle``)."""
from __future__ import annotations

import functools
import json
import os
import time
from concurrent import futures

import numpy as np

import jax
import jax.numpy as jnp

from ..mesh.io import load_obj, save_obj
from ..mesh.procrustes import apply_inverse_similarity, procrustes_align
from .driver import InferenceEngine


def list_request_meshes(path: str) -> list[str]:
    """A request line resolves to mesh paths: one .obj, or a directory's
    top-level *.obj files (sorted for deterministic output order)."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".obj"))
    return [path]


class MeshServer:
    """One warm InferenceEngine + preprocessing, shared across requests.

    Owns the request lifecycle: OBJ ingest -> Procrustes align to the
    training template -> normalize with the fold's stats -> pad/chunk to
    the static batch -> one jitted step per chunk -> packed pull -> JSON
    results (+ optional recon/oppo/gt mesh triples, mirroring
    run_inference's sex_change/ layout)."""

    def __init__(self, model, ops, params, norm_mean, norm_std, template,
                 faces, batch_size: int, output_path: str = ".",
                 save_meshes: bool = False, mesh=None, engine=None,
                 wire_dtype=np.float16, serving_step=None):
        # serving_step: a pre-compiled (x, r, s, m) -> {packed, ...}
        # callable, typically a deserialized jax.export artifact
        # (infer/export.py::load_packed_serving_step) — the server then
        # never traces, and model/ops/params may all be None (artifact
        # cold-start path; single-process only, the artifact has the
        # dp/sp layout of the exporting process baked in).
        self._artifact_step = serving_step
        if serving_step is None:
            self.engine = engine or InferenceEngine(model, ops, mesh=mesh)
            self.params = self.engine.replicate(params)
            self.mean_dev = self.engine.replicate(jnp.asarray(norm_mean))
            self.std_dev = self.engine.replicate(jnp.asarray(norm_std))
            # two step variants: the light one never materializes the mesh
            # stacks (XLA DCEs the decoder outputs' original-pose
            # transform)
            self._steps = {
                True: jax.jit(functools.partial(self._serve_impl,
                                                collect=True)),
                False: jax.jit(functools.partial(self._serve_impl,
                                                 collect=False)),
            }
        self.mean = np.asarray(norm_mean, np.float32)
        self.std = np.asarray(norm_std, np.float32)
        self.template = np.asarray(template, np.float32)
        self.faces = faces
        self.batch_size = int(batch_size)
        self.output_path = output_path
        self.save_meshes = save_meshes
        self.mesh_dir = os.path.join(output_path, "sex_change")
        # x is ~the whole chunk upload (B*N*3 vs B*40 for r/s/m) and is
        # normalized ~N(0,1): f16 on the wire halves the ~50 MB/s relay
        # bytes at ~5e-4 relative error (upcast on device); r/s/m stay
        # f32 — m is an absolute translation whose f16 rounding would
        # shift the emitted meshes
        self.wire_dtype = np.dtype(wire_dtype)
        # single-worker device lane: overlaps relay upload/step/pull of
        # chunk i with the main thread's preprocess of chunk i+1 while
        # keeping every jax call on one thread (see handle())
        self._device_lane = futures.ThreadPoolExecutor(max_workers=1)

    # --- device side ------------------------------------------------------

    def _serve_impl(self, params, batch, mean, std, ops, collect: bool):
        # the wire may carry x as f16 (see __init__); all compute is f32
        batch = dict(batch, x=batch["x"].astype(jnp.float32))
        # the ground-truth pose tensor is recomputed on-device from the
        # staged x (the infer/driver.py scan trick): aligned @ R * s + m
        # with aligned = x * std + mean — shipping it would double the
        # chunk upload through the ~50 MB/s relay
        batch = dict(batch, original=apply_inverse_similarity(
            batch["x"] * std + mean, batch["r"], batch["s"], batch["m"]))
        out = self.engine._step_impl(params, batch, mean, std, ops)
        res = {"packed": jnp.stack([out["pred"].astype(jnp.float32),
                                    out["err_mean"], out["err_max"]])}
        if collect:
            res["recon_orig"] = out["recon_orig"]
            res["oppo_orig"] = out["oppo_orig"]
        return res

    # --- host side --------------------------------------------------------

    def preprocess(self, paths: list[str]) -> dict:
        """Host ingest for one chunk: align + normalize each mesh.
        Vertex counts must match the training template (static shapes)."""
        xs, rs, ss, ms, orig = [], [], [], [], []
        n = self.template.shape[0]
        for p in paths:
            points = np.asarray(load_obj(p).v)
            if points.shape[0] != n:
                raise ValueError(
                    f"{p}: {points.shape[0]} vertices, template has {n}")
            aligned, (r, s, m), _ = procrustes_align(self.template, points)
            xs.append(((aligned - self.mean) / self.std).astype(
                self.wire_dtype))
            orig.append(points.astype(np.float32))
            rs.append(r.astype(np.float32))
            ss.append(np.float32(s))
            ms.append(m.astype(np.float32))
        return {"x": np.stack(xs), "r": np.stack(rs),
                "s": np.asarray(ss, np.float32), "m": np.stack(ms),
                "original": np.stack(orig)}

    def _device_chunk(self, host: dict) -> dict:
        """Upload one padded chunk, run the jitted step, pull the results.
        Runs on the single device-lane thread: all relay traffic (upload,
        dispatch, pulls) serializes there, overlapping the main thread's
        OBJ ingest + Procrustes of the NEXT chunk."""
        if self._artifact_step is not None:
            out = self._artifact_step(
                jax.device_put(host["x"]), jax.device_put(host["r"]),
                jax.device_put(host["s"]), jax.device_put(host["m"]))
        else:
            batch = self.engine.put_batch(
                {k: v for k, v in host.items() if k != "original"})
            out = self._steps[self.save_meshes](
                self.params, batch, self.mean_dev, self.std_dev,
                self.engine.ops)
        if self.save_meshes and "recon_orig" not in out:
            raise RuntimeError(
                "serving artifact was exported without mesh outputs "
                "(save_meshes=False); re-export with meshes or serve "
                "with --no-meshes")
        pulled = {"packed": np.asarray(out["packed"])}  # ONE scalar pull
        if self.save_meshes:
            pulled["recon"] = np.asarray(out["recon_orig"])
            pulled["oppo"] = np.asarray(out["oppo_orig"])
        return pulled

    def _emit(self, pulled: dict, chunk: list[str], host: dict) -> list[dict]:
        """Result dicts (+ recon/gt/oppo writes) for one finished chunk;
        padding rows (indices past len(chunk)) never emit."""
        results = []
        packed = pulled["packed"]
        for i, p in enumerate(chunk):
            name = os.path.basename(p)
            res = {
                "file": name,
                "sex": int(packed[0, i]),
                "reconstruction_error": {"mean": float(packed[1, i]),
                                         "max": float(packed[2, i])},
            }
            if self.save_meshes:
                stem = name.rsplit(".", 1)[0]
                rp = os.path.join(self.mesh_dir, stem + "_recon.obj")
                op = os.path.join(self.mesh_dir, stem + ".obj")
                save_obj(rp, pulled["recon"][i], self.faces)
                save_obj(os.path.join(self.mesh_dir, stem + "_gt.obj"),
                         host["original"][i], self.faces)
                save_obj(op, pulled["oppo"][i], self.faces)
                res["recon"] = rp
                res["oppo"] = op
            results.append(res)
        return results

    def handle(self, paths: list[str]) -> list[dict]:
        """Run one request (any number of meshes); returns one result dict
        per input path, writing mesh triples when save_meshes.

        Two-lane software pipeline: the main thread preprocesses chunk
        i+1 (OBJ parse + Procrustes, the long pole at ~0.45 s per bs128
        chunk) while the device lane ships chunk i through the relay and
        runs the step — multi-chunk requests cost ~max(host, device) per
        chunk instead of their sum. One worker thread means all jax calls
        stay serialized."""
        results = []
        if self.save_meshes:
            os.makedirs(self.mesh_dir, exist_ok=True)
        bs = self.batch_size
        pending = None  # (future, chunk, host) for the in-flight chunk
        for start in range(0, len(paths), bs):
            chunk = paths[start:start + bs]
            host = self.preprocess(chunk)
            pad = bs - len(chunk)
            if pad:  # static batch: repeat the last row, mask via slicing
                host = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                        for k, v in host.items()}
            fut = self._device_lane.submit(self._device_chunk, host)
            if pending is not None:
                results.extend(self._emit(pending[0].result(), *pending[1:]))
            pending = (fut, chunk, host)
        if pending is not None:
            results.extend(self._emit(pending[0].result(), *pending[1:]))
        return results

    def warmup(self) -> float:
        """Trace + compile the serving step before the first request (a
        fresh engine pays ~5.7 s of retrace; see BASELINE.md). Returns
        seconds spent."""
        t0 = time.perf_counter()
        n = self.template.shape[0]
        bs = self.batch_size
        host = {
            "x": np.zeros((bs, n, 3), self.wire_dtype),
            "r": np.tile(np.eye(3, dtype=np.float32), (bs, 1, 1)),
            "s": np.ones((bs,), np.float32),
            "m": np.zeros((bs, 1, 3), np.float32),
        }
        out = self._device_chunk(host)
        np.asarray(out["packed"])  # block until the executable really ran
        return time.perf_counter() - t0

    def serve_forever(self, fin, fout) -> None:
        """Blocking stdio loop; EOF on fin ends it."""
        for line in fin:
            req = line.strip()
            if not req:
                continue
            t0 = time.perf_counter()
            try:
                paths = list_request_meshes(req)
                if not paths:
                    raise FileNotFoundError(f"no .obj meshes at {req}")
                results = self.handle(paths)
            except Exception as exc:  # keep serving across bad requests
                fout.write(json.dumps({"error": f"{req}: {exc}"}) + "\n")
                fout.flush()
                continue
            for res in results:
                fout.write(json.dumps(res) + "\n")
            fout.write(json.dumps(
                {"done": len(results),
                 "sec": round(time.perf_counter() - t0, 4)}) + "\n")
            fout.flush()
