"""Loss / log-pdf library.

Closed forms matching the reference's logpdf module
(/root/reference/logpdf.py) and the cheb_VAE loss assembly
(/root/reference/models/cheb_VAE.py:321-346).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def kld(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q(z|x) || N(0, I)) summed over the latent dim: [B, Z] -> [B]."""
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=-1)


def gaussian_nll(mu: jnp.ndarray, log_sigma: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-element negative log-likelihood of x under N(mu, exp(log_sigma)^2)."""
    return 0.5 * jnp.square((x - mu) / jnp.exp(log_sigma)) + log_sigma + _HALF_LOG_2PI


def bernoulli_nll(x_hat: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return -(jnp.log(x_hat + eps) * x + jnp.log(1.0 - x_hat + eps) * (1.0 - x)).sum(-1).sum(-1)


def softclip(value, min_value: float):
    """Soft lower clip: min + softplus(value - min)."""
    return min_value + jax.nn.softplus(value - min_value)


def fixed_log_sigma() -> float:
    """The reference trains with a *constant* observation log-sigma of
    softclip(1.0, -6) ~= 1.00091 (/root/reference/models/cheb_VAE.py:328-329).
    Computed in pure python so it stays a compile-time constant under jit."""
    return -6.0 + math.log1p(math.exp(1.0 - (-6.0)))


def vae_loss(
    x: jnp.ndarray,          # [B, N, 3] ground truth (normalized frame)
    recon: jnp.ndarray,      # [B, N, 3]
    mu: jnp.ndarray,         # [B, Z]
    logvar: jnp.ndarray,     # [B, Z]
    y: jnp.ndarray,          # [B, C] one-hot labels
    y_hat: jnp.ndarray,      # [B, C] softmax classifier output
    log_sigma: float | jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
):
    """Total objective: mean_B( KLD + sum_{N,3} NLL - 2 log q(y) ).

    `mask` [B] (1.0 = real sample, 0.0 = batch padding) turns the batch mean
    into a masked mean so statically-shaped padded batches reproduce the
    reference's ragged-batch averages exactly.

    Returns (loss, aux) with aux = dict(kld [B], rec_loss [B], correct scalar).
    """
    if log_sigma is None:
        log_sigma = fixed_log_sigma()
    kl = kld(mu, logvar)
    rec = gaussian_nll(recon, jnp.asarray(log_sigma, dtype=x.dtype), x).sum(-1).sum(-1)
    logqy = jnp.log(jnp.sum(y_hat * y, axis=-1))
    per_sample = kl + rec - 2.0 * logqy
    hits = (jnp.argmax(y_hat, axis=-1) == jnp.argmax(y, axis=-1))
    if mask is None:
        loss = jnp.mean(per_sample)
        correct = jnp.sum(hits)
    else:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        loss = jnp.sum(per_sample * mask) / denom
        correct = jnp.sum(hits * mask)
    return loss, {"kld": kl, "rec_loss": rec, "correct": correct, "logqy": logqy}
