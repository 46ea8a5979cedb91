"""Trainer for the joint disentangled VAE + classifier (BASELINE config 3).

A thin subclass of the VAE Trainer: the same jitted step machinery (scan
epochs, staged datasets, dp/sp sharding, packed single-pull metrics, the
sex-change eval counterfactual — which drives the joint model through its
MeshVAE delegations) with the forward/loss swapped for the joint objective
(models/joint.py). "accuracy" in metrics/history is the jointly-trained
GCN classifier's accuracy — the headline classifier of this config; the
VAE head's own accuracy rides in aux as vae_correct."""
from __future__ import annotations

import jax

from ..models.joint import joint_loss
from .loop import Trainer


class JointTrainer(Trainer):
    # disentanglement observability: how well the supervised latent slice
    # predicts sex, and how well the adversarial head reads the free slice
    # (lower = better scrubbed) — surfaced in eval averages and history
    extra_scalar_names = ("sup_accuracy", "adv_accuracy")

    def _extra_scalars(self, aux) -> list:
        return [aux["sup_correct"], aux["adv_correct"]]

    def __init__(self, model, ops, config: dict, mesh=None):
        super().__init__(model, ops, config, mesh=mesh)
        self.sup_weight = float(config.get("sup_weight", 1.0))
        self.adv_weight = float(config.get("adv_weight", 0.1))
        self.cls_weight = float(config.get("cls_weight", 1.0))

    def _forward_loss(self, params, batch, rngs, train: bool, ops):
        y = jax.nn.one_hot(batch["label"], self.num_classes,
                           dtype=batch["x"].dtype)
        out = self.model.apply(params, batch["x"], y, ops, train=train,
                               rngs=rngs)
        loss, aux = joint_loss(batch["x"], out, y, batch["label"],
                               mask=batch["mask"],
                               sup_weight=self.sup_weight,
                               adv_weight=self.adv_weight,
                               cls_weight=self.cls_weight)
        return loss, (out, aux, y)
