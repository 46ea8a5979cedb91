"""Second-stage reconstruction-difference classifier driver (crecon).

Pipeline parity with /root/reference/crecon.py: a frozen pretrained VAE
produces difference features diff = concat(x - recon_oppo, x - recon_same)
([B, N, 6], crecon.py:162-201; train mode conditions on the true label, eval
on the prediction), and a Chebyshev GCN is trained on them with
CrossEntropy over a 5-fold split, best-validation-accuracy checkpointing.

TPU-first: estimate_diff + GCN forward + loss + grads + Adam update run in a
single jitted step (the reference runs the frozen VAE under no_grad and the
GCN step separately); the frozen VAE params ride as ordinary device arrays
(stop_gradient keeps them out of the grad)."""
from __future__ import annotations

import copy
import dataclasses
import os
import time

import numpy as np
from sklearn.model_selection import RepeatedStratifiedKFold, train_test_split

import jax
import jax.numpy as jnp
import optax

from ..data.dataset import BatchIterator, MeshDataset, list_meshes
from ..models.gcn import ChebGCN, GCNConfig
from ..models.vae import MeshVAE
from .checkpoint import (checkpoint_path, load_checkpoint, save_checkpoint,
                         save_params, load_params)
from .driver import build_model_and_ops
from .loop import make_optimizer, set_learning_rate
from .metrics import RunLog


def estimate_diff(vae: MeshVAE, vae_params, x, labels, ops, train: bool):
    """Frozen-VAE difference features (reference crecon.py:162-201).

    x: [B, N, 3] normalized; labels: [B] int. Returns (diff [B, N, 6],
    correct scalar, pred [B])."""
    h = vae.apply(vae_params, x, ops, method=type(vae).encode)
    y_hat = vae.apply(vae_params, h, method=type(vae).classify)
    pred = jnp.argmax(y_hat, axis=-1)
    correct = jnp.sum(pred == labels)

    cond = labels if train else pred
    onehot = jax.nn.one_hot(cond, y_hat.shape[-1], dtype=x.dtype)
    hy = jnp.concatenate([onehot, h], axis=-1)
    mu = vae.apply(vae_params, hy, method=lambda m, v: m.z_mean(v))
    # same-label + opposite-label decodes as ONE 2B decoder pass (the
    # models/joint.py trick): half the dispatches, and each decoder SpMM
    # streams its operator once for 2B columns
    b = x.shape[0]
    y2 = jnp.concatenate([onehot, 1.0 - onehot], axis=0)
    mu2 = jnp.concatenate([mu, mu], axis=0)
    both = vae.apply(vae_params, y2, mu2, ops, method=type(vae).sample)
    recon, recon_oppo = both[:b], both[b:]
    diff = jnp.concatenate([x - recon_oppo, x - recon], axis=-1)
    return jax.lax.stop_gradient(diff), correct, pred


class CreconTrainer:
    """mesh: optional ("dp", "sp") device mesh — batches shard over dp,
    operators row-shard over sp, params/frozen-VAE weights replicate,
    exactly the VAE Trainer's layout (the reference is single-device,
    crecon.py:34; distribution is framework-added)."""

    def __init__(self, gcn: ChebGCN, vae: MeshVAE, ops, config: dict,
                 mesh=None):
        self.gcn = gcn
        self.vae = vae
        self.mesh = mesh
        self.scan_epoch = bool(config.get("scan_epoch", True))
        self.optimizer = make_optimizer(float(config["learning_rate"]),
                                        float(config["weight_decay"]))
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._train_scan = jax.jit(self._train_scan_impl, donate_argnums=(0, 1))
        self._eval_scan = jax.jit(self._eval_scan_impl)
        if mesh is not None:
            from ..parallel.sharding import shard_operators

            self.ops = shard_operators(ops, mesh)
        else:
            self.ops = ops
        self._aot = {}  # multi-process AOT executables (loop.call_synced)

    def maybe_replicate(self, tree):
        from ..parallel.sharding import replicate_tree

        return replicate_tree(tree, self.mesh)

    def _put(self, batch: dict) -> dict:
        from ..parallel.sharding import shard_batch

        return shard_batch(batch, self.mesh)

    def init_params(self, rng_key):
        n0 = self.ops.num_nodes[0]
        x = jnp.zeros((1, n0, int(self.gcn.cfg.num_features)), jnp.float32)
        return self.gcn.init(rng_key, x, self.ops)

    def _loss(self, params, diff, labels, mask, ops):
        logits = self.gcn.apply(params, diff, ops)
        nll = -jax.nn.log_softmax(logits)[jnp.arange(labels.shape[0]), labels]
        loss = jnp.sum(nll * mask) / jnp.maximum(mask.sum(), 1.0)
        return loss, logits

    # Steps return metrics packed into ONE array [loss, correct, count]: each
    # device->host transfer is a full relay round-trip (~25ms), so the host
    # pulls a single vector per step — the same treatment as the VAE loop
    # (loop.py METRIC_NAMES), which this driver originally skipped.
    def _train_step_impl(self, params, opt_state, vae_params, batch, ops):
        diff, _, _ = estimate_diff(self.vae, vae_params, batch["x"],
                                   batch["label"], ops, train=True)
        (loss, logits), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, diff, batch["label"], batch["mask"], ops)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        pred = jnp.argmax(jax.nn.softmax(logits), axis=-1)
        correct = jnp.sum((pred == batch["label"]) * batch["mask"])
        return params, opt_state, jnp.stack([loss, correct, batch["mask"].sum()])

    def _eval_step_impl(self, params, vae_params, batch, ops):
        diff, _, _ = estimate_diff(self.vae, vae_params, batch["x"],
                                   batch["label"], ops, train=False)
        loss, logits = self._loss(params, diff, batch["label"], batch["mask"],
                                  ops)
        pred = jnp.argmax(jax.nn.softmax(logits), axis=-1)
        correct = jnp.sum((pred == batch["label"]) * batch["mask"])
        return jnp.stack([loss, correct, batch["mask"].sum()])

    def _train_scan_impl(self, params, opt_state, vae_params, batches, perm,
                         ops):
        """Whole epoch (stacked batches [S, B, ...]) in one device dispatch;
        perm re-draws the batch composition on device (staged datasets)."""
        from .loop import reshuffle_batches

        batches = reshuffle_batches(batches, perm)

        def body(carry, batch):
            params, opt_state = carry
            params, opt_state, m = self._train_step_impl(
                params, opt_state, vae_params, batch, ops)
            return (params, opt_state), m

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), batches)
        return params, opt_state, metrics  # [S, 3]

    def _eval_scan_impl(self, params, vae_params, batches, ops):
        def body(carry, batch):
            return carry, self._eval_step_impl(params, vae_params, batch, ops)

        _, metrics = jax.lax.scan(body, None, batches)
        return metrics  # [S, 3]

    @staticmethod
    def _averages(per_step: np.ndarray):
        """per_step: [S, 3] of (batch_loss, correct, count). The reference
        reports sum-of-batch-losses / num_batches (crecon.py:100,150)."""
        steps = per_step.shape[0]
        avg_loss = float(per_step[:, 0].sum()) / max(steps, 1)
        count = float(per_step[:, 2].sum())
        acc = float(per_step[:, 1].sum()) / max(count, 1.0)
        return avg_loss, acc

    def stage_batches(self, loader):
        """Upload a whole epoch of batches once as stacked [S, B, ...]
        device arrays (None when empty); run_epoch takes the result in
        place of a loader so later epochs skip the host->device shipment.
        Under a mesh the batch axis shards over dp."""
        keys = ("x", "label", "mask")
        batch_list = list(loader)
        if not batch_list:
            return None
        stacked = {k: np.stack([b[k] for b in batch_list]) for k in keys}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import put_sharded

            from ..parallel.sharding import vertex_dim_shardable

            sh = NamedSharding(self.mesh, P(None, "dp"))
            # x [S, B, N, 3] stages 2-D-sharded (vertices over sp) so the
            # sp-sharded step never pays GSPMD's involuntary full
            # rematerialization converting batch-sharded -> vertex-sharded
            # (see Trainer.stage_batches); sp=1 degenerates to `sh`.
            sh_vert = NamedSharding(self.mesh, P(None, "dp", "sp"))
            return {k: put_sharded(
                v, sh_vert if k == "x"
                and vertex_dim_shardable(v, self.mesh, 2) else sh)
                for k, v in stacked.items()}
        return {k: jnp.asarray(v) for k, v in stacked.items()}

    def run_epoch(self, params, opt_state, vae_params, loader, train: bool,
                  shuffle_key=None):
        from ..parallel.sharding import fetch
        from .loop import call_synced

        keys = ("x", "label", "mask")
        params = self.maybe_replicate(params)
        opt_state = self.maybe_replicate(opt_state)
        vae_params = self.maybe_replicate(vae_params)
        if self.scan_epoch:
            stacked = (loader if isinstance(loader, dict)
                       else self.stage_batches(loader))
            if stacked is None:
                return params, opt_state, 0.0, 0.0
            if train:
                n_samples = int(np.prod(stacked["mask"].shape[:2]))
                perm = (jax.random.permutation(shuffle_key, n_samples)
                        if shuffle_key is not None
                        else jnp.arange(n_samples))
                params, opt_state, m = call_synced(
                    self._train_scan, self._aot,
                    ("crecon_train_scan", stacked["mask"].shape),
                    params, opt_state, vae_params, stacked, perm, self.ops)
            else:
                m = call_synced(
                    self._eval_scan, self._aot,
                    ("crecon_eval_scan", stacked["mask"].shape),
                    params, vae_params, stacked, self.ops)
            avg_loss, acc = self._averages(fetch(m).astype(np.float64))
            return params, opt_state, avg_loss, acc

        rows = []
        for batch in loader:
            jb = self._put({k: batch[k] for k in keys})
            # per-step path rides call_synced too: multi-process compile
            # skew on the first step would trip the first-collective
            # handshake deadline (loop.call_synced)
            if train:
                params, opt_state, m = call_synced(
                    self._train_step, self._aot,
                    ("crecon_train_step", jb["mask"].shape),
                    params, opt_state, vae_params, jb, self.ops)
            else:
                m = call_synced(
                    self._eval_step, self._aot,
                    ("crecon_eval_step", jb["mask"].shape),
                    params, vae_params, jb, self.ops)
            rows.append(fetch(m).astype(np.float64))  # one pull per step
        if not rows:
            return params, opt_state, 0.0, 0.0
        avg_loss, acc = self._averages(np.stack(rows))
        return params, opt_state, avg_loss, acc


def run(config: dict, do_train: bool, do_test: bool):
    from .driver import maybe_init_multihost

    maybe_init_multihost(config)
    checkpoint_dir = config["checkpoint_dir"]
    os.makedirs(checkpoint_dir, exist_ok=True)
    seed = int(config["random_seeds"])
    batch_size = int(config["batch_size"])
    total_epochs = int(config["epoch"])

    # the VAE and the GCN share the template/hierarchy
    vae, ops, hier, template = build_model_and_ops(config)
    gcn_cfg = GCNConfig.from_config(
        config, coarse_verts=hier.levels[-1],
        num_features=2 * template.v.shape[1])
    # the diff features come from the FROZEN VAE — no gradient ever flows
    # back into them, so the first conv's pallas backward may skip dx
    gcn_cfg = dataclasses.replace(gcn_cfg, input_grad=False)
    gcn = ChebGCN(gcn_cfg)
    from ..parallel.sharding import make_device_mesh

    dp = int(config.get("data_parallel", 1))
    sp = int(config.get("seq_parallel", 1))
    device_mesh = make_device_mesh(dp=dp, sp=sp) if dp * sp > 1 else None
    trainer = CreconTrainer(gcn, vae, ops, config, mesh=device_mesh)

    # load the frozen pretrained VAE (crecon.py:240-246)
    vae_ckpt = config["checkpoint_file"]
    if not vae_ckpt or not os.path.exists(vae_ckpt):
        raise FileNotFoundError(
            f"crecon needs a pretrained VAE checkpoint; checkpoint_file="
            f"{vae_ckpt!r} not found")
    from .loop import Trainer
    vae_trainer = Trainer(vae, ops, config)
    vae_params_target = vae_trainer.init_params(jax.random.key(0))
    restored = load_checkpoint(vae_ckpt, vae_params_target,
                               vae_trainer.init_opt_state(vae_params_target))
    vae_params = restored["params"]

    log = RunLog(config["log_file"])
    log.print("model type:", config["type"])

    init_params = trainer.init_params(jax.random.key(seed))
    init_path = os.path.join(checkpoint_dir, "initial_weight_gcn.msgpack")
    save_params(init_path, init_params)
    from ..parallel.sharding import sync_processes
    sync_processes("initial_weights_gcn")  # write-before-read (multi-host)

    dataset_index, labels = list_meshes(config)
    skf = RepeatedStratifiedKFold(n_splits=5, n_repeats=1, random_state=seed)
    y_dummy = np.ones(len(dataset_index))
    test_size = float(config["test_size"])

    results = []
    n = 0
    for train_index, test_index in skf.split(dataset_index, y_dummy):
        train_names, valid_names = train_test_split(
            np.array(dataset_index)[train_index], test_size=test_size,
            random_state=seed)
        n += 1
        params = load_params(init_path, copy.deepcopy(init_params))
        opt_state = trainer.optimizer.init(params)

        if do_train:
            train_ds = MeshDataset(list(train_names), config, labels,
                                   template=np.asarray(template.v),
                                   dtype="train")
            # norm.npz write-before-read barrier (primary wrote it in the
            # train-split constructor; eval splits read it back)
            sync_processes(f"norm_stats_gcn_fold{n}")
            valid_ds = MeshDataset(list(valid_names), config, labels,
                                   template=np.asarray(template.v),
                                   dtype="test")
            train_loader = BatchIterator(train_ds, batch_size, shuffle=True,
                                         seed=seed + n)
            valid_loader = BatchIterator(valid_ds, batch_size, shuffle=False)
            if trainer.scan_epoch:
                # one upload per fold (diff features derive on device from
                # the frozen VAE each step; only x/label/mask ship)
                train_loader = trainer.stage_batches(train_loader) or []
                valid_loader = trainer.stage_batches(valid_loader) or []

            best_val_acc = 0.0
            shuffle_rng = jax.random.key(seed * 7919 + n)
            for epoch in range(1, total_epochs + 1):
                params, opt_state, tr_loss, tr_acc = trainer.run_epoch(
                    params, opt_state, vae_params, train_loader, train=True,
                    shuffle_key=(jax.random.fold_in(shuffle_rng, epoch)
                                 if trainer.scan_epoch else None))
                _, _, va_loss, va_acc = trainer.run_epoch(
                    params, opt_state, vae_params, valid_loader, train=False)
                if va_acc >= best_val_acc:
                    save_checkpoint(checkpoint_path(checkpoint_dir, n), params,
                                    opt_state, n, tr_loss, va_loss)
                    best_val_acc = va_acc
                log.print("epoch ", epoch, " Train loss ", tr_loss,
                          "train acc", tr_acc, " Val loss ", va_loss,
                          "acc ", va_acc)

        if do_test:
            # order the primary's checkpoint / norm.npz writes before the
            # reads below (same treatment as the VAE driver)
            sync_processes(f"gcn_fold{n}_artifacts")
            if not do_train:
                ck = load_checkpoint(checkpoint_path(checkpoint_dir, n),
                                     copy.deepcopy(init_params),
                                     trainer.optimizer.init(init_params))
                params = ck["params"]
            test_ds = MeshDataset(list(np.array(dataset_index)[test_index]),
                                  config, labels,
                                  template=np.asarray(template.v),
                                  dtype="test")
            test_loader = BatchIterator(test_ds, batch_size, shuffle=False)
            _, _, te_loss, te_acc = trainer.run_epoch(
                params, opt_state, vae_params, test_loader, train=False)
            log.print("test loss ", te_loss, "test acc", te_acc)
            results.append({"fold": n, "test_loss": te_loss,
                            "test_acc": te_acc})

    log.close()
    return results
