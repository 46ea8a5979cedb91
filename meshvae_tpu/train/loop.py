"""Jitted train/eval steps and the epoch loop.

TPU-first rework of the reference's train/evaluate functions
(/root/reference/main.py:54-179):
  * the whole step — forward, loss, backward, Adam update, *and* the
    denormalization + inverse-Procrustes original-pose per-vertex error —
    runs on device under one jit (the reference pulls every batch to CPU for
    the error math, main.py:83-94);
  * optimizer is optax with torch-Adam-equivalent semantics (L2 decay added
    to the gradient *before* the moment updates, matching
    torch.optim.Adam(weight_decay=...), not AdamW);
  * the epoch-granular step LR schedule (main.py:266-269) is injected as an
    optax hyperparameter, so changing it does not retrace;
  * data parallelism: batches sharded over the mesh "dp" axis; GSPMD inserts
    the gradient all-reduce over ICI.
"""
from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..mesh.procrustes import apply_inverse_similarity
from ..models.losses import vae_loss
from ..parallel.sharding import fetch, put_sharded


# order of the packed per-step metrics vector returned by the train step
METRIC_NAMES = ("loss", "kld", "rec_loss", "error", "correct", "count")


def unpack_metrics(arr) -> dict:
    arr = np.asarray(arr, dtype=np.float64).reshape(-1)
    return dict(zip(METRIC_NAMES, arr))


def reshuffle_batches(batches: dict, perm) -> dict:
    """Re-draw a staged epoch's batch composition on device: flatten the
    [S, B] sample grid, gather by perm, restack. Padding samples (mask 0)
    ride along wherever they land. Shared by the VAE and crecon scan
    paths."""
    steps, bs = batches["mask"].shape[:2]

    def gather(a):
        flat = a.reshape((steps * bs,) + a.shape[2:])
        return jnp.take(flat, perm, axis=0).reshape(
            (steps, bs) + a.shape[2:])

    return {k: gather(v) for k, v in batches.items()}


def lr_for_epoch(epoch: int, base_lr: float, learning_rates: list[float],
                 learning_rates_epochs: list[float]) -> float:
    """Reference step schedule: the *last* threshold the epoch exceeds wins
    (main.py:266-269)."""
    lr = base_lr
    for i, threshold in enumerate(learning_rates_epochs):
        if epoch > threshold:
            lr = learning_rates[i]
    return lr


def make_optimizer(learning_rate: float, weight_decay: float):
    """torch.optim.Adam-equivalent with injected (mutable) learning rate."""

    def build(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def call_synced(jit_fn, aot_cache: dict, cache_key, *args):
    """Multi-process: compile ahead-of-time, BARRIER, then execute the
    compiled object. The backend's sub-communicator handshake has a
    short deadline (gloo: 30 s) and fires on the first execution of
    each compiled collective; per-process compile-time skew of a big
    scan can exceed it, so execution must start in lockstep.
    Single-process: the plain jit call."""
    if jax.process_count() == 1:
        return jit_fn(*args)
    compiled = aot_cache.get(cache_key)
    if compiled is None:
        compiled = jit_fn.lower(*args).compile()
        from ..parallel.sharding import sync_processes
        sync_processes(f"compiled_{cache_key}")
        aot_cache[cache_key] = compiled
    return compiled(*args)


def stage_batch_arrays(loader, mesh, keys: tuple,
                       with_index: bool = False):
    """Upload a loader's batches ONCE as stacked [S, B, ...] device arrays
    (None for an empty loader) — the shared staging path behind
    Trainer.stage_batches and the inference pipeline.

    Keys absent from the batches are skipped. "mask" is additionally kept
    host-side as "mask_host" (saves a ~25ms relay round-trip per consumer),
    and with_index stashes dataset indices as a HOST "index" array."""
    batch_list = list(loader)
    if not batch_list:
        return None
    stacked = {k: np.stack([b[k] for b in batch_list]) for k in keys
               if k in batch_list[0]}
    mask_host = stacked["mask"]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P(None, "dp"))
        # Vertex-shaped arrays [S, B, N, 3] stage 2-D-sharded (batch
        # over dp AND vertices over sp): the sp-sharded step consumes
        # them with the vertex dim sharded, and GSPMD cannot convert
        # batch-sharded -> vertex-sharded efficiently (it emits an
        # "involuntary full rematerialization" — replicate, then
        # re-slice — once per scanned epoch/eval compile). Staging in
        # the consumer's layout removes that (see
        # parallel.sharding.shard_batch for the per-step analog).
        from ..parallel.sharding import VERTEX_KEYS, vertex_dim_shardable

        sh_vert = NamedSharding(mesh, P(None, "dp", "sp"))
        staged = {
            k: put_sharded(
                v,
                sh_vert if k in VERTEX_KEYS
                and vertex_dim_shardable(v, mesh, 2) else sh)
            for k, v in stacked.items()
        }
    else:
        staged = {k: jnp.asarray(v) for k, v in stacked.items()}
    staged["mask_host"] = mask_host
    if with_index:
        staged["index"] = np.stack([b["index"] for b in batch_list])
    return staged


class Trainer:
    """Owns the jitted steps for one (model, operators, config) triple.

    Subclasses can surface model-specific eval metrics: override
    `extra_scalar_names` (rate names) and `_extra_scalars(aux)` (matching
    correct-counts); they append to the packed eval scalars and come back
    as <name> = count/total in the eval averages (and, via history_record's
    passthrough, in history{fold}.json)."""

    extra_scalar_names: tuple = ()

    def _extra_scalars(self, aux) -> list:
        return []

    def __init__(self, model, ops, config: dict, mesh=None):
        self.model = model
        self.ops = ops
        self.config = config
        self.mesh = mesh
        self.num_classes = int(config["num_classes"])
        self.optimizer = make_optimizer(
            float(config["learning_rate"]), float(config["weight_decay"])
        )

        # ops ride as an explicit jit argument (not a closure constant):
        # keeps the big dense Laplacians out of the HLO constant pool, so XLA
        # neither constant-folds through them nor re-hashes them per trace.
        # Under a device mesh, arrays are committed to their shardings before
        # the call (batch over "dp", operators row-sharded over "sp", params
        # replicated) and GSPMD partitions the step around them.
        self._train_step_fn = jax.jit(self._train_step_impl,
                                      donate_argnums=(0, 1))
        self._train_scan_fn = jax.jit(self._train_scan_impl,
                                      donate_argnums=(0, 1))
        self._eval_step_fn = jax.jit(self._eval_step_impl)
        # three pre-bound variants instead of static arguments: the
        # multi-process path executes AOT-compiled objects (call_synced),
        # which accept only traced arguments. The "light" variant drops the
        # [S, B, N] per-vertex error stack from the outputs entirely (XLA
        # then DCEs its materialization) — the driver's per-epoch validation
        # needs only the per-mesh-mean error that rides in the packed
        # scalars, and with the epoch pipeline two epochs of that stack
        # would otherwise sit in HBM at once.
        self._eval_scan_fn = jax.jit(
            functools.partial(self._eval_scan_impl, collect=False))
        self._eval_scan_collect_fn = jax.jit(
            functools.partial(self._eval_scan_impl, collect=True))
        self._eval_scan_light_fn = jax.jit(
            functools.partial(self._eval_scan_impl, collect=False,
                              with_errors=False))
        if mesh is not None:
            from ..parallel.sharding import shard_operators
            self._ops_on_device = shard_operators(ops, mesh)
        else:
            self._ops_on_device = ops
        self._aot = {}  # multi-process AOT executables (see _call_synced)

        def _clone(x):
            if x.dtype == jnp.bool_:
                return jnp.logical_or(x, False)
            return x + jnp.zeros((), x.dtype)

        # ONE dispatch that returns fresh device buffers for a pytree: the
        # epoch pipeline (train/driver.py) checkpoints from this copy after
        # the originals were donated into the NEXT epoch's scan
        self._snapshot_fn = jax.jit(
            lambda t: jax.tree_util.tree_map(_clone, t))

    def snapshot(self, tree):
        """On-device copy of a pytree (one dispatch, ~params-sized) whose
        buffers survive later donation of the originals."""
        return self._snapshot_fn(tree)

    def _call_synced(self, jit_fn, cache_key, *args):
        return call_synced(jit_fn, self._aot, cache_key, *args)

    def maybe_replicate(self, tree):
        """Commit a pytree (params/opt state/norm stats) as replicated over
        the mesh; no-op on single device or already-placed arrays."""
        from ..parallel.sharding import replicate_tree

        return replicate_tree(tree, self.mesh)

    # the per-step (non-scan) paths go through call_synced too: multi-process
    # compile skew on the FIRST step would otherwise trip the backend's
    # first-collective handshake deadline (see call_synced)
    def _train_step(self, params, opt_state, batch, rng, norm_mean, norm_std):
        return self._call_synced(
            self._train_step_fn, ("train_step", batch["mask"].shape),
            params, opt_state, batch, rng, norm_mean, norm_std,
            self._ops_on_device)

    def _eval_step(self, params, batch, norm_mean, norm_std):
        return self._call_synced(
            self._eval_step_fn, ("eval_step", batch["mask"].shape),
            params, batch, norm_mean, norm_std, self._ops_on_device)

    # ------------------------------------------------------------------
    def init_params(self, rng_key) -> Any:
        n0 = self.ops.num_nodes[0]
        x = jnp.zeros((1, n0, int(self.model.cfg.num_features)), jnp.float32)
        y = jnp.zeros((1, self.num_classes), jnp.float32)
        return self.model.init({"params": rng_key}, x, y, self.ops, train=False)

    def init_opt_state(self, params) -> Any:
        return self.optimizer.init(params)

    # ------------------------------------------------------------------
    def _forward_loss(self, params, batch, rngs, train: bool, ops):
        y = jax.nn.one_hot(batch["label"], self.num_classes, dtype=batch["x"].dtype)
        out = self.model.apply(params, batch["x"], y, ops, train=train,
                               rngs=rngs)
        loss, aux = vae_loss(batch["x"], out["recon"], out["mu"], out["logvar"],
                             y, out["y_hat"], mask=batch["mask"])
        return loss, (out, aux, y)

    def _pose_error(self, recon, batch, norm_mean, norm_std):
        """Denormalize + inverse Procrustes + per-vertex euclidean error, all
        on device. Returns [B, N].

        The ground-truth pose is recomputed from x through the SAME
        transform chain as the reconstruction (the dataset's `original` is
        exactly aligned @ R * s + m with aligned = x * std + mean, see
        mesh/procrustes.py) — equal within f32 round-off, and it keeps the
        [S, B, N, 3] original tensor off the device entirely: at the 80k
        workload that tensor is ~27 MB per batch of staged HBM and
        relay upload for a value x already determines."""
        recon_mesh = recon * norm_std + norm_mean
        def to_orig(t):
            return apply_inverse_similarity(t, batch["r"], batch["s"],
                                            batch["m"])
        recon_orig = to_orig(recon_mesh)
        gt_orig = to_orig(batch["x"] * norm_std + norm_mean)
        err = jnp.sqrt(jnp.sum((recon_orig - gt_orig) ** 2, axis=-1))
        return recon_orig, err

    def _train_step_impl(self, params, opt_state, batch, rng, norm_mean,
                         norm_std, ops):
        rngs = {"latent": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}
        (loss, (out, aux, _)), grads = jax.value_and_grad(
            self._forward_loss, has_aux=True
        )(params, batch, rngs, True, ops)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        mask = batch["mask"]
        denom = jnp.maximum(mask.sum(), 1.0)
        _, err = self._pose_error(out["recon"], batch, norm_mean, norm_std)
        # metrics packed into ONE array: each device->host transfer costs a
        # full host round-trip (~25ms through the TPU tunnel), so the step
        # returns a single pullable vector instead of six scalars
        metrics = jnp.stack([
            loss,
            (aux["kld"] * mask).sum() / denom,
            (aux["rec_loss"] * mask).sum() / denom,
            (err.mean(axis=-1) * mask).sum() / denom,
            aux["correct"].astype(jnp.float32),
            mask.sum(),
        ])
        return params, opt_state, metrics

    def _eval_step_impl(self, params, batch, norm_mean, norm_std, ops):
        loss, (out, aux, y) = self._forward_loss(params, batch, None, False, ops)
        mask = batch["mask"]
        denom = jnp.maximum(mask.sum(), 1.0)
        recon_orig, err = self._pose_error(out["recon"], batch, norm_mean,
                                           norm_std)

        # sex-change counterfactual (reference main.py:149-155): decode with
        # the opposite label from the same latent, re-classify the result
        oppo = 1.0 - y
        x_oppo = self.model.apply(params, oppo, out["z"], ops,
                                  method=type(self.model).sample)
        h2 = self.model.apply(params, x_oppo, ops,
                              method=type(self.model).encode)
        y_hat2 = self.model.apply(params, h2, method=type(self.model).classify)
        oppo_pred = jnp.argmax(y_hat2, axis=-1)
        oppo_label = jnp.argmax(oppo, axis=-1)
        sc_correct = ((oppo_pred == oppo_label) * mask).sum()
        oppo_orig, _ = self._pose_error(x_oppo, batch, norm_mean, norm_std)

        scalars = jnp.stack([
            loss,
            (aux["kld"] * mask).sum() / denom,
            (aux["rec_loss"] * mask).sum() / denom,
            aux["correct"].astype(jnp.float32),
            mask.sum(),
            sc_correct,
            # per-mesh-mean pose error, summed over the batch: lets the
            # validation path average errors WITHOUT fetching the full
            # [S, B, N] tensor through the relay every epoch
            (err.mean(axis=-1) * mask).sum(),
        ] + [jnp.asarray(s, jnp.float32) for s in self._extra_scalars(aux)])
        return {
            "scalars": scalars,            # [7+]: loss,kld,rec,correct,count,sc,err_mean(,extras) — indexed by finalize_eval_scanned/evaluate
            "errors": err,                 # [B, N] per-vertex original-pose error
            "recon_orig": recon_orig,      # [B, N, 3]
            "oppo_orig": oppo_orig,        # [B, N, 3]
            "oppo_pred": oppo_pred,        # [B]
            "oppo_label": oppo_label,      # [B]
            "y_hat": out["y_hat"],
            "z": out["z"],
        }

    # ------------------------------------------------------------------
    def _train_scan_impl(self, params, opt_state, batches, perm, rng,
                         norm_mean, norm_std, ops):
        """A whole epoch (stacked batches [S, B, ...]) in one dispatch via
        lax.scan — eliminates per-step host->device dispatch latency, which
        dominates at small batch sizes."""
        steps = batches["mask"].shape[0]
        batches = reshuffle_batches(batches, perm)

        def body(carry, inp):
            params, opt_state = carry
            batch, step = inp
            params, opt_state, metrics = self._train_step_impl(
                params, opt_state, batch, jax.random.fold_in(rng, step),
                norm_mean, norm_std, ops)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), (batches, jnp.arange(steps)))
        return params, opt_state, metrics

    # ------------------------------------------------------------------
    def _put(self, batch: dict) -> dict:
        from ..parallel.sharding import shard_batch

        # "original" stays on host: _pose_error recomputes it from x
        return shard_batch({k: v for k, v in batch.items()
                            if k not in ("index", "original")},
                           self.mesh)

    def train_epoch(self, params, opt_state, loader, rng, norm_mean, norm_std):
        """One pass over the loader; returns (params, opt_state, averages)."""
        totals = {"loss": 0.0, "kld": 0.0, "rec_loss": 0.0, "error": 0.0}
        correct = 0.0
        count = 0.0
        params = self.maybe_replicate(params)
        opt_state = self.maybe_replicate(opt_state)
        norm_mean = self.maybe_replicate(jnp.asarray(norm_mean))
        norm_std = self.maybe_replicate(jnp.asarray(norm_std))
        for step, batch in enumerate(loader):
            step_rng = jax.random.fold_in(rng, step)
            params, opt_state, packed = self._train_step(
                params, opt_state, self._put(batch), step_rng, norm_mean, norm_std
            )
            metrics = unpack_metrics(packed)  # ONE device->host pull
            n = metrics["count"]
            for k in totals:
                totals[k] += metrics[k] * n
            correct += metrics["correct"]
            count += n
        avg = {k: v / max(count, 1.0) for k, v in totals.items()}
        avg["accuracy"] = correct / max(count, 1.0)
        avg["count"] = count
        return params, opt_state, avg

    def stage_batches(self, loader, with_index: bool = False):
        """Upload a whole epoch of batches ONCE as stacked [S, B, ...]
        device arrays (None for an empty loader). Pass the result to
        train_epoch_scanned / evaluate_scanned in place of the loader:
        subsequent epochs reshuffle ON DEVICE (shuffle_key) instead of
        re-shipping the data — host->device moves ~50 MB/s through the TPU
        relay here, so per-epoch shipment dominates real training runs.

        with_index additionally stashes the dataset indices as a HOST
        "index" array [S, B] (needed by evaluate_scanned's mesh
        collection to name output files; never shipped to the device)."""
        # "original" is not staged: _pose_error recomputes it from x
        return stage_batch_arrays(loader, self.mesh,
                                  ("x", "label", "r", "s", "m", "mask"),
                                  with_index=with_index)

    # host-side staging keys that must never reach a jitted call
    _HOST_KEYS = ("index", "mask_host")

    def train_epoch_scanned_async(self, params, opt_state, loader, rng,
                                  norm_mean, norm_std, shuffle_key=None):
        """Dispatch one scanned train epoch WITHOUT fetching its metrics:
        returns (params, opt_state, packed) where `packed` is the [S, 6]
        per-step metrics array still on device (None for an empty loader).
        Pass it to finalize_train_metrics later — dispatching the next
        epoch (and/or the eval scan) first hides the ~25ms-per-round-trip
        relay latency behind device compute (the epoch pipeline,
        train/driver.py)."""
        stacked = loader if isinstance(loader, dict) else \
            self.stage_batches(loader)
        if stacked is None:
            return params, opt_state, None
        stacked = {k: v for k, v in stacked.items()
                   if k not in self._HOST_KEYS}
        n_samples = int(np.prod(stacked["mask"].shape[:2]))
        if shuffle_key is not None:
            perm = jax.random.permutation(shuffle_key, n_samples)
        else:
            perm = jnp.arange(n_samples)

        params = self.maybe_replicate(params)
        opt_state = self.maybe_replicate(opt_state)
        norm_mean = self.maybe_replicate(jnp.asarray(norm_mean))
        norm_std = self.maybe_replicate(jnp.asarray(norm_std))
        params, opt_state, packed = self._call_synced(
            self._train_scan_fn, ("train_scan", stacked["mask"].shape),
            params, opt_state, stacked, perm, rng, norm_mean, norm_std,
            self._ops_on_device)
        return params, opt_state, packed

    @staticmethod
    def finalize_train_metrics(packed) -> dict:
        """Fetch + reduce a train scan's packed [S, 6] metrics (the ONE
        device->host pull of the epoch)."""
        if packed is None:
            return {"loss": 0.0, "kld": 0.0, "rec_loss": 0.0, "error": 0.0,
                    "accuracy": 0.0, "count": 0.0}
        arr = fetch(packed).astype(np.float64)      # [S, 6], ONE pull
        metrics = {k: arr[:, i] for i, k in enumerate(METRIC_NAMES)}
        counts = metrics["count"]
        total = float(counts.sum())
        avg = {
            k: float((metrics[k] * counts).sum()) / max(total, 1.0)
            for k in ("loss", "kld", "rec_loss", "error")
        }
        avg["accuracy"] = float(metrics["correct"].sum()) / max(total, 1.0)
        avg["count"] = total
        return avg

    def train_epoch_scanned(self, params, opt_state, loader, rng, norm_mean,
                            norm_std, shuffle_key=None):
        """train_epoch with the whole epoch in ONE device dispatch
        (lax.scan over stacked batches). Identical math and metrics; one
        recompile per distinct number-of-batches. `loader` is either a
        host batch iterable or the device-staged dict from stage_batches;
        shuffle_key (optional) re-draws the batch composition on device."""
        params, opt_state, packed = self.train_epoch_scanned_async(
            params, opt_state, loader, rng, norm_mean, norm_std,
            shuffle_key=shuffle_key)
        return params, opt_state, self.finalize_train_metrics(packed)

    def _eval_scan_impl(self, params, batches, norm_mean, norm_std, ops,
                        collect: bool = False, with_errors: bool = True):
        keep = (("scalars", "errors", "recon_orig", "oppo_orig", "oppo_pred",
                 "oppo_label") if collect
                else ("scalars", "errors") if with_errors
                else ("scalars",))

        def body(carry, batch):
            out = self._eval_step_impl(params, batch, norm_mean, norm_std, ops)
            return carry, {k: out[k] for k in keep}

        _, outs = jax.lax.scan(body, None, batches)
        return outs

    def evaluate_scanned_async(self, params, loader, norm_mean, norm_std,
                               collect_meshes: bool = False,
                               with_errors: bool = True):
        """Dispatch the eval scan WITHOUT fetching its outputs. Returns an
        opaque dict for finalize_eval_scanned (None for an empty loader) —
        the epoch-pipeline analog of train_epoch_scanned_async.
        with_errors=False dispatches the light variant, which never
        materializes the [S, B, N] error stack on device (finalize must
        then also be called with with_errors=False)."""
        if isinstance(loader, dict):
            stacked = loader
        else:
            stacked = self.stage_batches(loader, with_index=collect_meshes)
        if stacked is None:
            return None
        index = stacked.get("index")
        if collect_meshes and index is None:
            raise ValueError("collect_meshes needs a loader or a dict from "
                             "stage_batches(..., with_index=True)")
        device_batches = {k: v for k, v in stacked.items()
                          if k not in self._HOST_KEYS}
        params = self.maybe_replicate(params)
        norm_mean = self.maybe_replicate(jnp.asarray(norm_mean))
        norm_std = self.maybe_replicate(jnp.asarray(norm_std))
        keep_errors = collect_meshes or with_errors
        outs = self._call_synced(
            self._eval_scan_collect_fn if collect_meshes
            else self._eval_scan_fn if with_errors
            else self._eval_scan_light_fn,
            ("eval_scan", device_batches["mask"].shape, collect_meshes,
             keep_errors),
            params, device_batches, norm_mean, norm_std, self._ops_on_device)
        return {"outs": outs, "index": index, "collect": collect_meshes,
                "mask_host": stacked.get("mask_host"),
                "mask_dev": device_batches["mask"]}

    _EVAL_EMPTY = {"loss": 0.0, "kld": 0.0, "rec_loss": 0.0, "error": 0.0,
                   "accuracy": 0.0, "sex_change_success_rate": 0.0,
                   "count": 0.0}

    def finalize_eval_scanned(self, pending, with_errors: bool = True):
        """Fetch + reduce a dispatched eval scan. with_errors=False skips
        the [S, B, N] per-vertex error fetch entirely (the driver's
        per-epoch validation needs only the mean, which rides in the
        packed scalars) — at 5k vertices that tensor is ~0.3 MB per batch
        through a ~50 MB/s relay, by far the largest eval pull."""
        if pending is None:
            avg = dict(self._EVAL_EMPTY)
            for name in self.extra_scalar_names:
                avg[name] = 0.0
            return (avg, np.zeros((0, 1))) if with_errors else (avg, None)
        outs = pending["outs"]
        if with_errors and "errors" not in outs:
            raise ValueError(
                "eval scan was dispatched with with_errors=False (light "
                "variant): per-vertex errors were never materialized")
        sc = fetch(outs["scalars"]).astype(np.float64)         # [S, 7+]
        counts = sc[:, 4]
        total = float(counts.sum())
        avg = {
            "loss": float((sc[:, 0] * counts).sum()) / max(total, 1.0),
            "kld": float((sc[:, 1] * counts).sum()) / max(total, 1.0),
            "rec_loss": float((sc[:, 2] * counts).sum()) / max(total, 1.0),
            "accuracy": float(sc[:, 3].sum()) / max(total, 1.0),
            "sex_change_success_rate": float(sc[:, 5].sum()) / max(total, 1.0),
            "error": float(sc[:, 6].sum()) / max(total, 1.0),
            "count": total,
        }
        for i, name in enumerate(self.extra_scalar_names):
            avg[name] = float(sc[:, 7 + i].sum()) / max(total, 1.0)
        if not with_errors and not pending["collect"]:
            return avg, None
        mask_host = pending["mask_host"]
        mask = ((np.asarray(mask_host) if mask_host is not None
                 else fetch(pending["mask_dev"])) > 0)          # [S, B]
        err = fetch(outs["errors"])                            # [S, B, N]
        errors = err[mask]                                     # [valid, N]
        if pending["collect"]:
            meshes = {
                "recon": fetch(outs["recon_orig"])[mask],
                "oppo": fetch(outs["oppo_orig"])[mask],
                "oppo_pred": fetch(outs["oppo_pred"])[mask],
                "oppo_label": fetch(outs["oppo_label"])[mask],
                "index": np.asarray(pending["index"])[mask],
            }
            return avg, errors, meshes
        return avg, errors

    def evaluate_scanned(self, params, loader, norm_mean, norm_std,
                         collect_meshes: bool = False):
        """evaluate() as one device dispatch + a handful of device->host
        pulls (scalars [S, 7+], errors [S, B, N]; with collect_meshes also
        the recon/oppo mesh stacks — instead of evaluate()'s ~5 pulls *per
        batch* at ~25 ms each through the relay).
        `loader` is a host batch iterable or a stage_batches dict (staged
        with with_index=True when collect_meshes)."""
        pending = self.evaluate_scanned_async(params, loader, norm_mean,
                                              norm_std,
                                              collect_meshes=collect_meshes)
        result = self.finalize_eval_scanned(pending, with_errors=True)
        if collect_meshes and pending is None:
            return result + ({k: np.zeros((0,)) for k in
                              ("recon", "oppo", "oppo_pred", "oppo_label",
                               "index")},)
        return result

    def evaluate(self, params, loader, norm_mean, norm_std,
                 collect_meshes: bool = False):
        """Full-dataset eval; returns averages + concatenated per-vertex error
        matrix + sex-change success rate (+ meshes if requested)."""
        totals = {"loss": 0.0, "kld": 0.0, "rec_loss": 0.0}
        correct = sc_correct = count = err_sum = 0.0
        extra = [0.0] * len(self.extra_scalar_names)
        errors = []
        meshes = {"recon": [], "oppo": [], "oppo_pred": [], "oppo_label": [],
                  "index": []}
        params = self.maybe_replicate(params)
        norm_mean = self.maybe_replicate(jnp.asarray(norm_mean))
        norm_std = self.maybe_replicate(jnp.asarray(norm_std))
        for batch in loader:
            out = self._eval_step(params, self._put(batch), norm_mean, norm_std)
            sc = fetch(out["scalars"]).astype(np.float64)      # ONE pull
            n = float(sc[4])
            for i, k in enumerate(("loss", "kld", "rec_loss")):
                totals[k] += float(sc[i]) * n
            correct += float(sc[3])
            sc_correct += float(sc[5])
            err_sum += float(sc[6])
            for i in range(len(extra)):
                extra[i] += float(sc[7 + i])
            count += n
            keep = np.asarray(batch["mask"]) > 0
            errors.append(fetch(out["errors"])[keep])
            if collect_meshes:
                meshes["recon"].append(fetch(out["recon_orig"])[keep])
                meshes["oppo"].append(fetch(out["oppo_orig"])[keep])
                meshes["oppo_pred"].append(fetch(out["oppo_pred"])[keep])
                meshes["oppo_label"].append(fetch(out["oppo_label"])[keep])
                meshes["index"].append(np.asarray(batch["index"])[keep])
        avg = {k: v / max(count, 1.0) for k, v in totals.items()}
        avg["accuracy"] = correct / max(count, 1.0)
        avg["sex_change_success_rate"] = sc_correct / max(count, 1.0)
        avg["error"] = err_sum / max(count, 1.0)
        for i, name in enumerate(self.extra_scalar_names):
            avg[name] = extra[i] / max(count, 1.0)
        avg["count"] = count
        errors = np.concatenate(errors, axis=0) if errors else np.zeros((0, 1))
        if collect_meshes:
            meshes = {k: (np.concatenate(v) if v else np.zeros((0,)))
                      for k, v in meshes.items()}
            return avg, errors, meshes
        return avg, errors
