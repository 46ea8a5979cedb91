"""AOT serving export: the whole inference step as one portable artifact.

The reference has no deployment story — its `inference.py` (reference
inference.py:63-157) is a per-mesh python loop that needs the full training
stack (torch, psbody, configs, hierarchy preprocessing) wherever it runs. A
production TPU framework wants the opposite: compile once, ship one
artifact. `export_serving_step` serializes the ENTIRE jitted serving
computation — encoder, classifier, predicted-label-conditioned
reconstruction, sex-swap counterfactual, denormalization, and the batched
inverse-Procrustes back to original pose — with the trained parameters,
normalization stats, and graph operators baked in as constants, to a
self-contained StableHLO artifact via `jax.export`. The artifact reloads
with `load_serving_step` and executes with no flax, no config files, and no
mesh preprocessing; `platforms` may name several lowerings (e.g.
``("cpu", "tpu")``) so the same bytes serve on a dev box and a TPU slice.

Practical notes:

- Export with ``cheb_method = pallas`` (compact BSR blocks) or ``ell``; the
  dense method embeds the O(N^2) operators as literals, which bloats the
  artifact and slows the export-time compile (see CLAUDE.md on big jnp
  constants).
- Pallas kernels lower to a TPU custom call, which `jax.export` rejects by
  default because custom-call ABI stability is not guaranteed across
  compiler releases; pass ``allow_custom_calls=True`` to opt in (the
  artifact is then only as portable as the Mosaic ABI).
- The exported function takes ``(x, r, s, m)`` — normalized aligned
  vertices [B, N, 3] plus the per-mesh inverse-similarity (rotation [B, 3,
  3], scale [B], translation [B, 1, 3]) from `procrustes_align` — and
  returns ``{"pred", "recon_orig", "oppo_orig"}``. Short batches must be
  padded to the exported batch size (shapes are static on TPU by design).
"""
from __future__ import annotations

import jax
import jax.export as jax_export
import jax.numpy as jnp

from .driver import InferenceEngine


def make_serving_step(model, ops, params, norm_mean, norm_std):
    """The serving function (x, r, s, m) -> {pred, recon_orig, oppo_orig}
    with params / norm stats / operators closed over as constants."""
    engine = InferenceEngine(model, ops)
    mean = jnp.asarray(norm_mean)
    std = jnp.asarray(norm_std)

    def serve(x, r, s, m):
        batch = {"x": x, "r": r, "s": s, "m": m}  # no "original": no errors
        return engine._step_impl(params, batch, mean, std, engine.ops)

    return serve


def export_serving_step(model, ops, params, norm_mean, norm_std,
                        batch_size: int, num_vertices: int,
                        platforms=None,
                        allow_custom_calls: bool = False) -> bytes:
    """Serialize the jitted serving step for `batch_size` x `num_vertices`
    meshes. `platforms`: lowering platforms (default: current backend)."""
    serve = make_serving_step(model, ops, params, norm_mean, norm_std)
    f32 = jnp.float32
    args = (
        jax.ShapeDtypeStruct((batch_size, num_vertices, 3), f32),  # x
        jax.ShapeDtypeStruct((batch_size, 3, 3), f32),             # r
        jax.ShapeDtypeStruct((batch_size,), f32),                  # s
        jax.ShapeDtypeStruct((batch_size, 1, 3), f32),             # m
    )
    checks = ([jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
              if allow_custom_calls else [])
    exp = jax_export.export(jax.jit(serve), platforms=platforms,
                            disabled_checks=checks)(*args)
    return exp.serialize()


def make_packed_serving_step(model, ops, params, norm_mean, norm_std,
                             collect_meshes: bool):
    """The SERVING-LOOP step (serve.MeshServer._serve_impl's contract):
    (x, r, s, m) -> {"packed": [3, B] (pred / err_mean / err_max),
    "recon_orig", "oppo_orig" when collect_meshes}. Ground truth is
    recomputed on-device from x, exactly like the warm server, so the
    artifact answers with reconstruction errors — the plain
    make_serving_step contract has no errors (no ground truth input)."""
    from ..mesh.procrustes import apply_inverse_similarity

    engine = InferenceEngine(model, ops)
    mean = jnp.asarray(norm_mean)
    std = jnp.asarray(norm_std)

    def serve(x, r, s, m):
        x = x.astype(jnp.float32)  # wire may be f16 (serve.py wire_dtype)
        batch = {"x": x, "r": r, "s": s, "m": m,
                 "original": apply_inverse_similarity(
                     x * std + mean, r, s, m)}
        out = engine._step_impl(params, batch, mean, std, engine.ops)
        res = {"packed": jnp.stack([out["pred"].astype(jnp.float32),
                                    out["err_mean"], out["err_max"]])}
        if collect_meshes:
            res["recon_orig"] = out["recon_orig"]
            res["oppo_orig"] = out["oppo_orig"]
        return res

    return serve


def export_packed_serving_step(model, ops, params, norm_mean, norm_std,
                               batch_size: int, num_vertices: int,
                               collect_meshes: bool = True,
                               wire_dtype=jnp.float16,
                               platforms=None,
                               allow_custom_calls: bool = False) -> bytes:
    """Serialize the serving-loop step for `inference.py --serve
    --artifact`: a fresh serve process then deserializes + compiles
    (XLA-cache-hit) instead of rebuilding model/operators/params and
    re-tracing (~5.7 s, BASELINE.md). `wire_dtype` must match the
    server's chunk upload dtype (serve_wire_dtype; default f16)."""
    serve = make_packed_serving_step(model, ops, params, norm_mean,
                                     norm_std, collect_meshes)
    f32 = jnp.float32
    args = (
        jax.ShapeDtypeStruct((batch_size, num_vertices, 3), wire_dtype),
        jax.ShapeDtypeStruct((batch_size, 3, 3), f32),             # r
        jax.ShapeDtypeStruct((batch_size,), f32),                  # s
        jax.ShapeDtypeStruct((batch_size, 1, 3), f32),             # m
    )
    checks = ([jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
              if allow_custom_calls else [])
    exp = jax_export.export(jax.jit(serve), platforms=platforms,
                            disabled_checks=checks)(*args)
    return exp.serialize()


def save_serving_artifact(path: str, data: bytes) -> None:
    with open(path, "wb") as fp:
        fp.write(data)


def load_serving_step(path_or_bytes):
    """Deserialize an artifact; returns a callable (x, r, s, m) ->
    {pred, recon_orig, oppo_orig} executing the embedded computation."""
    data = path_or_bytes
    if isinstance(data, str):
        with open(data, "rb") as fp:
            data = fp.read()
    exported = jax_export.deserialize(data)
    return exported.call
