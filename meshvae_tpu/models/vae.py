"""Disentangled, label-conditioned mesh VAE (flax.linen).

Architecture parity with the reference's cheb_VAE
(/root/reference/models/cheb_VAE.py:104-351):

  encoder   : n_layers x (ChebConv -> ReLU -> downsample-pool), flatten,
              ReLU(enc_lin), dropout                               -> h [B, H]
  classifier: softmax(Linear(dropout(h)))                          -> y_hat
  posterior : z_mean/z_log_var(Linear(concat[y, h]))               -> mu, logvar
  decoder   : ReLU(dec_lin(concat[y, z])), dropout, ReLU(dec_lin_2),
              dropout, reshape [B, n_coarse, F_last],
              n_layers x (unpool -> ChebConv -> ReLU),
              final bias-free ChebConv fed the coarse-level operator
              (reference quirk, cheb_VAE.py:288; switchable)       -> recon

Weight init matches torch semantics: Chebyshev weights/biases ~ N(0, 0.1)
(/root/reference/nn/conv.py:535-538), enc_lin/dec_lin kernels ~ N(0, 0.1)
(cheb_VAE.py:349-351), everything else torch-Linear default
U(+-1/sqrt(fan_in)). Eval mode uses z = mu and no dropout
(cheb_VAE.py:215-221).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.cheb import cheb_conv
from ..ops.graph import GraphOperator
from ..ops.pool import pool_apply
from .operators import ModelOperators


def _normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # flax Dense kernel is [fan_in, fan_out]
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class ChebConvLayer(nn.Module):
    """One Chebyshev graph convolution; the operator is passed at call time.

    dtype is the computation dtype (params stay f32 master weights; with
    bfloat16 the inputs/weights are downcast and the MXU accumulates f32)."""

    in_features: int
    out_features: int
    k: int
    use_bias: bool = True
    method: str = "dense"
    precision: str | None = None
    dtype: jnp.dtype = jnp.float32
    # False ONLY for convs whose input never needs a gradient (first
    # encoder conv on raw data) — see cheb_conv's caller contract
    input_grad: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, op: GraphOperator) -> jnp.ndarray:
        weight = self.param(
            "weight", _normal_init(0.1), (self.k, self.in_features, self.out_features)
        )
        bias = (
            self.param("bias", _normal_init(0.1), (self.out_features,))
            if self.use_bias
            else None
        )
        return cheb_conv(x.astype(self.dtype), op, weight.astype(self.dtype),
                         None if bias is None else bias.astype(self.dtype),
                         method=self.method, precision=self.precision,
                         input_grad=self.input_grad)


def _dense(features: int, fan_in: int, kernel_init=None, name: str | None = None,
           precision=None, dtype=jnp.float32):
    from ..ops.cheb import resolve_precision

    return nn.Dense(
        features,
        kernel_init=kernel_init or _torch_linear_kernel_init,
        bias_init=_torch_linear_bias_init(fan_in),
        precision=resolve_precision(precision),
        dtype=dtype,   # computation dtype; params stay f32
        name=name,
    )


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    num_features: int          # per-vertex feature dim (3)
    filters: tuple             # conv filter widths, e.g. (16, 16, 16, 32, 32)
    polygon_order: tuple       # Chebyshev order per layer
    n_layers: int
    num_hidden: int
    latent: int                # z dim ("num_style")
    num_classes: int
    dropout: float
    coarse_verts: int          # vertex count at the coarsest level
    cheb_method: str = "dense"
    pool_method: str = "gather"
    precision: str | None = None
    compute_dtype: str = "float32"   # float32 | bfloat16 (f32 accumulation)

    @staticmethod
    def from_config(cfg: dict, coarse_verts: int, num_features: int = 3) -> "VAEConfig":
        compute_dtype = str(cfg.get("compute_dtype", "float32") or "float32")
        precision = cfg.get("matmul_precision")
        if compute_dtype == "bfloat16" and not precision:
            # HIGHEST on bf16 operands would force multi-pass emulation,
            # defeating the speed mode; bf16 runs at DEFAULT unless the
            # config explicitly overrides
            precision = "default"
        return VAEConfig(
            num_features=num_features,
            filters=tuple(cfg["num_conv_filters"]),
            polygon_order=tuple(cfg["polygon_order"]),
            n_layers=int(cfg["n_layers"]),
            num_hidden=int(cfg["num_hidden"]),
            latent=int(cfg["num_style"]),
            num_classes=int(cfg["num_classes"]),
            dropout=float(cfg["dropout"]),
            coarse_verts=coarse_verts,
            cheb_method=str(cfg.get("cheb_method", "dense")),
            pool_method=str(cfg.get("pool_method", "gather")),
            precision=precision,
            compute_dtype=compute_dtype,
        )

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class MeshVAE(nn.Module):
    cfg: VAEConfig

    def setup(self):
        c = self.cfg
        # filter chain with input features prepended: [F_in, f1, ..., fL]
        filters = (c.num_features,) + tuple(c.filters)
        self.filters = filters
        enc_specs = [
            (filters[i], filters[i + 1], c.polygon_order[i])
            for i in range(len(filters) - 2)
        ]
        dec_specs = [
            (filters[-i - 1], filters[-i - 2], c.polygon_order[i])
            for i in range(len(filters) - 1)
        ]
        kw = dict(method=c.cheb_method, precision=c.precision, dtype=c.dtype)
        # cheb_enc_0 consumes the raw (normalized) vertices — nothing ever
        # demands d loss/d x, so its pallas backward can skip the dx
        # recurrence (input_grad=False; see cheb_conv)
        self.cheb = [
            ChebConvLayer(i, o, k, **kw, name=f"cheb_enc_{n}",
                          input_grad=(n != 0))
            for n, (i, o, k) in enumerate(enc_specs)
        ]
        self.cheb_dec = [
            ChebConvLayer(i, o, k, use_bias=(n != len(dec_specs) - 1), **kw,
                          name=f"cheb_dec_{n}")
            for n, (i, o, k) in enumerate(dec_specs)
        ]

        flat = c.coarse_verts * filters[-1]
        p, dt = c.precision, c.dtype
        self.enc_lin = _dense(c.num_hidden, flat, kernel_init=_normal_init(0.1),
                              name="enc_lin", precision=p, dtype=dt)
        self.dec_lin = _dense(c.num_hidden, c.latent + c.num_classes,
                              kernel_init=_normal_init(0.1), name="dec_lin",
                              precision=p, dtype=dt)
        self.dec_lin_2 = _dense(flat, c.num_hidden, name="dec_lin_2",
                                precision=p, dtype=dt)
        self.classifier_layer = _dense(c.num_classes, c.num_hidden,
                                       name="classifier_layer", precision=p,
                                       dtype=dt)
        self.z_mean = _dense(c.latent, c.num_hidden + c.num_classes,
                             name="z_mean", precision=p, dtype=dt)
        self.z_log_var = _dense(c.latent, c.num_hidden + c.num_classes,
                                name="z_log_var", precision=p, dtype=dt)
        self.dropout = nn.Dropout(rate=c.dropout)

    # --- submodules -------------------------------------------------------

    def encode(self, x: jnp.ndarray, ops: ModelOperators,
               train: bool = False) -> jnp.ndarray:
        """x: [B, N, F_in] -> h: [B, num_hidden]."""
        c = self.cfg
        x = x.astype(c.dtype)
        for i in range(c.n_layers):
            x = jax.nn.relu(self.cheb[i](x, ops.lap[i]))
            x = pool_apply(x, ops.down[i], method=c.pool_method,
                           precision=c.precision)
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(self.enc_lin(x))
        x = self.dropout(x, deterministic=not train)
        return x

    def classify(self, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """h: [B, num_hidden] -> y_hat: [B, C] (softmax, computed in f32)."""
        h = self.dropout(h, deterministic=not train)
        logits = self.classifier_layer(h).astype(jnp.float32)
        return jax.nn.softmax(logits, axis=-1)

    def decode(self, z: jnp.ndarray, ops: ModelOperators,
               train: bool = False) -> jnp.ndarray:
        """z: [B, latent + C] (label-conditioned) -> recon: [B, N, F_in]."""
        c = self.cfg
        x = jax.nn.relu(self.dec_lin(z))
        x = self.dropout(x, deterministic=not train)
        x = jax.nn.relu(self.dec_lin_2(x))
        x = self.dropout(x, deterministic=not train)
        x = x.reshape(x.shape[0], c.coarse_verts, self.filters[-1])
        for i in range(c.n_layers):
            x = pool_apply(x, ops.up[-i - 1], method=c.pool_method,
                           precision=c.precision)
            x = jax.nn.relu(self.cheb_dec[i](x, ops.lap[c.n_layers - i - 1]))
        recon = self.cheb_dec[-1](x, ops.lap_final)
        # loss/error math downstream is always f32
        return recon.astype(jnp.float32)

    def sample(self, y: jnp.ndarray, z: jnp.ndarray, ops: ModelOperators,
               train: bool = False) -> jnp.ndarray:
        """Label-conditioned decode (reference cheb_VAE.sample,
        cheb_VAE.py:294-305)."""
        return self.decode(jnp.concatenate([y, z], axis=-1), ops, train=train)

    def reparameterize(self, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("latent"), mu.shape, mu.dtype)
        return eps * std + mu

    # --- full forward -----------------------------------------------------

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, ops: ModelOperators,
                 train: bool = False) -> dict:
        """x: [B, N, F_in] normalized vertices; y: [B, C] one-hot labels.

        Returns dict(recon, y_hat, mu, logvar, z) — loss assembly lives in
        losses.vae_loss so drivers can weigh terms without re-tracing.
        """
        h = self.encode(x, ops, train=train)
        y_hat = self.classify(h, train=train)
        hy = jnp.concatenate([y.astype(h.dtype), h], axis=-1)
        mu = self.z_mean(hy).astype(jnp.float32)
        logvar = self.z_log_var(hy).astype(jnp.float32)
        z = self.reparameterize(mu, logvar) if train else mu
        recon = self.sample(y, z, ops, train=train)
        return {"recon": recon, "y_hat": y_hat, "mu": mu, "logvar": logvar, "z": z}
