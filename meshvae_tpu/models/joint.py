"""Joint disentangled VAE + Chebyshev-GCN classifier with latent-split
supervision (BASELINE.json config 3).

The reference ships the two halves separately — the VAE's own classifier
head (/root/reference/models/cheb_VAE.py:253-258) and the cheb_cls
second-stage classifier trained on frozen-VAE difference features
(/root/reference/models/cheb_cls.py:55-114, crecon.py:162-201). This module
composes them into ONE jointly-trained model:

  * the conditional VAE runs as usual (encode -> classify -> posterior ->
    reparameterize -> label-conditioned decode);
  * **latent-split supervision**: the latent is split into a supervised
    slice z[:, :split] — trained through a linear head to predict the sex
    label — and a free slice z[:, split:], pushed toward label-INDEPENDENCE
    by an adversarial head behind a gradient-reversal layer. Sex
    information is thereby concentrated in the supervised coordinates (the
    "disentangled representation" of the paper's title, expressed as an
    explicit architectural split);
  * a cheb_cls-style GCN classifies the same reconstruction-difference
    features as crecon (diff = concat(x - recon_oppo, x - recon_same)),
    but trained JOINTLY — its gradients flow back through the decoder and
    encoder, shaping reconstructions to be sex-discriminative rather than
    reading a frozen model.

TPU-first: the whole thing — both decodes, the GCN, three CE terms, the
reversal — is one fused computation under a single jit'ed train step
(train/joint.py); the gradient reversal is a jax.custom_vjp, free at
forward time and a sign flip in the backward pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gcn import ChebGCN, GCNConfig
from .losses import vae_loss
from .operators import ModelOperators
from .vae import MeshVAE, VAEConfig, _dense


@jax.custom_vjp
def grad_reverse(x):
    """Identity forward, negated gradient backward (the adversarial
    "gradient reversal layer"): the head above it learns to predict the
    label while the encoder below it learns to make that impossible."""
    return x


def _grad_reverse_fwd(x):
    return x, None


def _grad_reverse_bwd(_, g):
    return (-g,)


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)


class JointMeshVAE(nn.Module):
    """MeshVAE + latent-split heads + jointly-trained ChebGCN classifier.

    split: number of leading latent coordinates carrying the supervised
    (sex) factor; the remaining latent - split coordinates are the free
    slice. Requires 0 < split < latent."""

    cfg: VAEConfig
    gcn_cfg: GCNConfig
    split: int

    def setup(self):
        c = self.cfg
        if not 0 < self.split < c.latent:
            raise ValueError(
                f"latent_split must be in (0, num_style): got split="
                f"{self.split} with latent={c.latent}")
        self.vae = MeshVAE(c)
        self.gcn = ChebGCN(self.gcn_cfg)
        self.sup_head = _dense(c.num_classes, self.split, name="sup_head",
                               precision=c.precision, dtype=c.dtype)
        self.adv_head = _dense(c.num_classes, c.latent - self.split,
                               name="adv_head", precision=c.precision,
                               dtype=c.dtype)

    # --- delegations so the Trainer's eval path (sex-change counterfactual,
    # inference engine) drives the joint model like a plain MeshVAE --------

    def encode(self, x, ops: ModelOperators, train: bool = False):
        return self.vae.encode(x, ops, train=train)

    def classify(self, h, train: bool = False):
        return self.vae.classify(h, train=train)

    def decode(self, z, ops: ModelOperators, train: bool = False):
        return self.vae.decode(z, ops, train=train)

    def sample(self, y, z, ops: ModelOperators, train: bool = False):
        return self.vae.sample(y, z, ops, train=train)

    def z_mean(self, hy):
        """Posterior-mean head passthrough — the InferenceEngine and crecon
        drivers reach the model via `m.z_mean(v)` (MeshVAE exposes it as a
        submodule attribute; here it delegates)."""
        return self.vae.z_mean(hy)

    # ----------------------------------------------------------------------

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, ops: ModelOperators,
                 train: bool = False) -> dict:
        """Returns the MeshVAE-style output dict extended with sup_logits,
        adv_logits, cls_logits (all f32) and recon_oppo."""
        vae = self.vae
        h = vae.encode(x, ops, train=train)
        y_hat = vae.classify(h, train=train)
        hy = jnp.concatenate([y.astype(h.dtype), h], axis=-1)
        mu = vae.z_mean(hy).astype(jnp.float32)
        logvar = vae.z_log_var(hy).astype(jnp.float32)
        z = vae.reparameterize(mu, logvar) if train else mu

        sup_logits = self.sup_head(mu[:, : self.split]).astype(jnp.float32)
        adv_logits = self.adv_head(
            grad_reverse(mu[:, self.split:])).astype(jnp.float32)

        # crecon's difference features (crecon.py:195-198), but live: both
        # decodes share the latent and backprop into the whole VAE. The
        # true-label and opposite-label decodes run as ONE decoder pass at
        # 2B batch — twice the MXU batch dimension instead of two
        # dispatch-bound passes (dropout draws stay independent per row)
        yz = jnp.concatenate([
            jnp.concatenate([y, z], axis=-1),
            jnp.concatenate([1.0 - y, z], axis=-1),
        ], axis=0)
        both = vae.decode(yz, ops, train=train)
        recon, recon_oppo = jnp.split(both, 2, axis=0)

        diff = jnp.concatenate([x - recon_oppo, x - recon], axis=-1)
        cls_logits = self.gcn(diff, ops)

        return {"recon": recon, "y_hat": y_hat, "mu": mu, "logvar": logvar,
                "z": z, "sup_logits": sup_logits, "adv_logits": adv_logits,
                "cls_logits": cls_logits, "recon_oppo": recon_oppo}


def masked_ce(logits: jnp.ndarray, labels: jnp.ndarray,
              mask: jnp.ndarray | None):
    """Masked-mean cross entropy + correct count: ([B, C], [B]) -> scalars."""
    nll = -jax.nn.log_softmax(logits)[jnp.arange(labels.shape[0]), labels]
    hits = (jnp.argmax(logits, axis=-1) == labels)
    if mask is None:
        return jnp.mean(nll), jnp.sum(hits)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom, jnp.sum(hits * mask)


def joint_loss(x, out: dict, y, labels, mask=None,
               sup_weight: float = 1.0, adv_weight: float = 0.1,
               cls_weight: float = 1.0):
    """Total objective: the reference VAE loss + weighted CE terms for the
    supervised latent slice, the adversarial free slice (reversed
    gradients), and the joint GCN classifier.

    Returns (loss, aux); aux carries the vae_loss aux plus
    sup_loss/adv_loss/cls_loss and the per-head correct counts, with
    aux["correct"] = the GCN classifier's correct count (the headline
    classifier of this config) and aux["vae_correct"] the VAE head's.
    """
    base, aux = vae_loss(x, out["recon"], out["mu"], out["logvar"], y,
                         out["y_hat"], mask=mask)
    sup_loss, sup_correct = masked_ce(out["sup_logits"], labels, mask)
    adv_loss, adv_correct = masked_ce(out["adv_logits"], labels, mask)
    cls_loss, cls_correct = masked_ce(out["cls_logits"], labels, mask)
    loss = (base + sup_weight * sup_loss + adv_weight * adv_loss
            + cls_weight * cls_loss)
    aux = dict(aux, vae_correct=aux["correct"], correct=cls_correct,
               sup_loss=sup_loss, adv_loss=adv_loss, cls_loss=cls_loss,
               sup_correct=sup_correct, adv_correct=adv_correct)
    return loss, aux


def build_joint_model(config: dict, coarse_verts: int,
                      num_features: int = 3) -> JointMeshVAE:
    """Config dict -> JointMeshVAE (mirrors VAEConfig.from_config)."""
    cfg = VAEConfig.from_config(config, coarse_verts=coarse_verts,
                                num_features=num_features)
    gcn_cfg = GCNConfig.from_config(config, coarse_verts=coarse_verts,
                                    num_features=2 * num_features)
    split = int(config.get("latent_split", config.get("num_classes", 2)))
    return JointMeshVAE(cfg, gcn_cfg, split)
