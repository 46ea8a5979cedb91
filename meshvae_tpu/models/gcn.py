"""Chebyshev GCN classifier — the crecon second-stage model.

Parity with the reference's cheb_GCN (/root/reference/models/cheb_cls.py:55-114):
n_layers x (ChebConv -> ReLU -> downsample-pool) over 2*num_features
reconstruction-difference channels, flatten, Linear(->128) -> ReLU ->
Linear(->num_classes) producing logits for CrossEntropy.

The reference uses PyG's symmetric-normalized ChebConv here; with the default
lambda_max = 2 the scaled Laplacian's diagonal cancels exactly (the +1
Laplacian diagonal and the -1 fill self-loops sum to zero in aggregation), so
the effective propagation operator is the same -D^{-1/2} A D^{-1/2} as
ChebConv_batch — one kernel serves both models. Init: Chebyshev weights
glorot-uniform / zero bias (PyG default), head kernels ~ N(0, 0.1)
(cheb_cls.py:109-111).
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.cheb import cheb_conv
from ..ops.pool import pool_apply
from .operators import ModelOperators
from .vae import _dense, _normal_init


def _glorot_cheb_init(key, shape, dtype=jnp.float32):
    # shape [K, in, out]; PyG glorot uses the trailing two dims
    bound = math.sqrt(6.0 / (shape[-2] + shape[-1]))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


@dataclasses.dataclass(frozen=True)
class GCNConfig:
    num_features: int          # input channels (2 * mesh feature dim = 6)
    filters: tuple
    polygon_order: tuple
    n_layers: int
    num_classes: int
    coarse_verts: int
    hidden: int = 128
    cheb_method: str = "dense"
    pool_method: str = "gather"
    precision: str | None = None
    compute_dtype: str = "float32"
    # does the NETWORK input need a gradient? False for crecon (frozen
    # VAE -> diff features are constants), True for joint training where
    # the classifier loss backprops through diff into the VAE decoder
    input_grad: bool = True

    @staticmethod
    def from_config(cfg: dict, coarse_verts: int, num_features: int = 6) -> "GCNConfig":
        compute_dtype = str(cfg.get("compute_dtype", "float32") or "float32")
        precision = cfg.get("matmul_precision")
        if compute_dtype == "bfloat16" and not precision:
            precision = "default"  # same rationale as VAEConfig.from_config
        return GCNConfig(
            num_features=num_features,
            filters=tuple(cfg["num_conv_filters"]),
            polygon_order=tuple(cfg["polygon_order"]),
            n_layers=int(cfg["n_layers"]),
            num_classes=int(cfg["num_classes"]),
            coarse_verts=coarse_verts,
            cheb_method=str(cfg.get("cheb_method", "dense")),
            pool_method=str(cfg.get("pool_method", "gather")),
            precision=precision,
            compute_dtype=compute_dtype,
        )

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class ChebConvGlorot(nn.Module):
    in_features: int
    out_features: int
    k: int
    method: str = "dense"
    precision: str | None = None
    dtype: jnp.dtype = jnp.float32
    # False ONLY when the conv input never needs a gradient (crecon's
    # frozen diff features); the joint model differentiates through the
    # diff into the VAE, so it must stay True there
    input_grad: bool = True

    @nn.compact
    def __call__(self, x, op):
        weight = self.param("weight", _glorot_cheb_init,
                            (self.k, self.in_features, self.out_features))
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
        return cheb_conv(x.astype(self.dtype), op, weight.astype(self.dtype),
                         bias.astype(self.dtype), method=self.method,
                         precision=self.precision, input_grad=self.input_grad)


class ChebGCN(nn.Module):
    cfg: GCNConfig

    def setup(self):
        c = self.cfg
        filters = (c.num_features,) + tuple(c.filters)
        self.filters = filters
        kw = dict(method=c.cheb_method, precision=c.precision, dtype=c.dtype)
        self.cheb = [
            ChebConvGlorot(filters[i], filters[i + 1], c.polygon_order[i], **kw,
                           name=f"cheb_{i}",
                           input_grad=(i != 0) or c.input_grad)
            for i in range(len(filters) - 2)
        ]
        # flatten width uses the last conv's output filters (== filters[-2] of
        # the extended chain in the reference, cheb_cls.py:81)
        flat = c.coarse_verts * filters[-2]
        self.enc_lin = _dense(c.hidden, flat, kernel_init=_normal_init(0.1),
                              name="enc_lin", precision=c.precision,
                              dtype=c.dtype)
        self.cls_layer = _dense(c.num_classes, c.hidden,
                                kernel_init=_normal_init(0.1), name="cls_layer",
                                precision=c.precision, dtype=c.dtype)

    def __call__(self, x: jnp.ndarray, ops: ModelOperators) -> jnp.ndarray:
        """x: [B, N, 2*F] difference features -> logits [B, C] (f32)."""
        c = self.cfg
        x = x.astype(c.dtype)
        for i in range(c.n_layers):
            x = jax.nn.relu(self.cheb[i](x, ops.lap[i]))
            x = pool_apply(x, ops.down[i], method=c.pool_method,
                           precision=c.precision)
        x = x.reshape(x.shape[0], -1)
        logits = self.cls_layer(jax.nn.relu(self.enc_lin(x)))
        return logits.astype(jnp.float32)
