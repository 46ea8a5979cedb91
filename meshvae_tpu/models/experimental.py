"""Experimental / auxiliary modules mirroring the reference's extra layers.

The reference carries several modules that its shipped configs never enable
(SURVEY.md §2a marks them dead): the StyleGAN-style equalized-LR linear and
adaptive instance norm (/root/reference/models/cheb_VAE.py:30-101), a graph
batch-norm (models/cheb_cls.py:32-53), spatial graph convolution and graph
attention (nn/conv.py:589-683), and SortPool / DIFFPool (nn/pool.py:28-105).
They exist here as working, tested flax equivalents so the framework's
capability surface is a superset of the reference's, expressed TPU-first
(static dense/gather operators, no scatter message passing).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.graph import GraphOperator


class EqualLinear(nn.Module):
    """Linear with runtime weight scaling by sqrt(2 / fan_in) (equalized
    learning rate; reference EqualLR/EqualLinear, cheb_VAE.py:30-73)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.normal(1.0),
                            (fan_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        scale = math.sqrt(2.0 / fan_in)
        return x @ (kernel * scale) + bias


class AdaptiveInstanceNorm(nn.Module):
    """AdaIN conditioned on a style vector (reference cheb_VAE.py:76-101):
    normalize over the vertex dim, then scale/shift with style-predicted
    gamma/beta (gamma bias initialized to 1)."""

    channels: int
    eps: float = 1e-9

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, C]; style: [B, S]
        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            return b.at[: self.channels].set(1.0)

        fan_in = style.shape[-1]
        kernel = self.param("style_kernel", nn.initializers.normal(1.0),
                            (fan_in, 2 * self.channels))
        bias = self.param("style_bias", bias_init, (2 * self.channels,))
        scale = math.sqrt(2.0 / fan_in)
        gb = (style @ (kernel * scale) + bias)[:, None, :]
        gamma, beta = jnp.split(gb, 2, axis=-1)

        mean = x.mean(axis=1, keepdims=True)
        var = x.var(axis=1, ddof=1, keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


class GraphNorm(nn.Module):
    """Batch-dim normalization with learned affine (reference graph_norm,
    cheb_cls.py:32-53: beta multiplies, gamma shifts; beta init 1, gamma 0)."""

    num_features: int
    eps: float = 1e-9

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (self.num_features,))
        beta = self.param("beta", nn.initializers.ones, (self.num_features,))
        mean = x.mean(axis=0, keepdims=True)
        var = ((x - mean) ** 2).sum(axis=0, keepdims=True) / x.shape[0]
        return beta * (x - mean) / jnp.sqrt(var + self.eps) + gamma


class SpatialConv(nn.Module):
    """Spatial (GCN-style) graph convolution: linear transform then
    aggregation over A + I (reference Spatial_conv, nn/conv.py:589-624),
    expressed as a dense-operator matmul."""

    features: int
    precision: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, op: GraphOperator) -> jnp.ndarray:
        from ..ops.cheb import resolve_precision

        h = nn.Dense(self.features)(x)
        # adjacency-with-self-loops aggregation: the stored operator is the
        # negated normalized adjacency; |dense| recovers the neighbor mask
        agg = jnp.abs(jnp.sign(op.dense))
        agg = agg + jnp.eye(op.n, dtype=agg.dtype)
        return jnp.einsum("nm,bmf->bnf", agg, h,
                          precision=resolve_precision(self.precision))


class GraphAttention(nn.Module):
    """Single-head GAT layer over the static topology (reference
    graph_attention, nn/conv.py:626-683): attention logits from
    [Wh_i || Wh_j], softmax over the (masked) neighborhood incl. self."""

    features: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, op: GraphOperator) -> jnp.ndarray:
        h = nn.Dense(self.features, use_bias=False)(x)  # [B, N, F]
        a_src = self.param("a_src", nn.initializers.glorot_uniform(),
                           (self.features, 1))
        a_dst = self.param("a_dst", nn.initializers.glorot_uniform(),
                           (self.features, 1))
        logits = (h @ a_src) + jnp.swapaxes(h @ a_dst, 1, 2)  # [B, N, N]
        logits = nn.leaky_relu(logits, self.negative_slope)
        mask = (jnp.abs(op.dense) > 0) | jnp.eye(op.n, dtype=bool)
        logits = jnp.where(mask[None], logits, -jnp.inf)
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bnm,bmf->bnf", attn, h)


def sort_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """SortPool (reference nn/pool.py:28-63): order vertices by the last
    feature channel (descending), keep the top k, flatten to [B, k*F];
    short graphs are zero-padded."""
    b, n, f = x.shape
    order = jnp.argsort(-x[:, :, -1], axis=1)
    sorted_x = jnp.take_along_axis(x, order[:, :, None], axis=1)
    if n >= k:
        kept = sorted_x[:, :k]
    else:
        kept = jnp.pad(sorted_x, ((0, 0), (0, k - n), (0, 0)))
    return kept.reshape(b, k * f)


class DiffPool(nn.Module):
    """Differentiable pooling (reference DIFFPool, nn/pool.py:66-105):
    learned soft assignment S [N_in, N_out]; returns pooled features,
    coarsened adjacency, and the link-prediction auxiliary loss."""

    in_nodes: int
    out_nodes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray):
        s = self.param("s", nn.initializers.glorot_uniform(),
                       (self.in_nodes, self.out_nodes))
        s = jax.nn.softmax(s, axis=-1)
        pooled = jnp.einsum("nm,bnf->bmf", s, x)
        coarse_adj = s.T @ adj @ s
        link_loss = jnp.linalg.norm(adj - s @ s.T)
        return pooled, coarse_adj, link_loss


class PointCNN(nn.Module):
    """Tiny 1D-conv point classifier (reference CNN, cheb_cls.py:118-135):
    Conv1d over the vertex dim -> batch norm -> flatten -> 3 linear layers."""

    vertices_out: int = 30
    hidden: tuple = (10, 5)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # x: [B, N, 3]; kernel_size-1 conv over vertices == per-channel mix
        h = nn.Conv(features=3, kernel_size=(1,))(
            jnp.swapaxes(x, 1, 2))                      # [B, 3, N] -> conv
        h = nn.BatchNorm(use_running_average=not train,
                         axis=-1)(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.vertices_out * 3)(h)
        h = jax.nn.relu(nn.Dense(self.hidden[0])(h))
        h = jax.nn.relu(nn.Dense(self.hidden[1])(h))
        return nn.Dense(1)(h)


def pc2mesh(points, alpha: float | None = None):
    """Point cloud -> triangle surface mesh.

    Capability equivalent of the reference's dead `utils.pc2mesh`
    (/root/reference/utils.py:44-54), which estimates pivot radii from the
    mean nearest-neighbor spacing and calls open3d's C++ ball-pivoting.
    open3d is not a dependency of this framework, so the reconstruction is
    expressed with scipy instead: the alpha-shape boundary of the 3D
    Delaunay tetrahedralization — tetrahedra whose circumradius exceeds
    `alpha` are discarded and the surface is the set of faces left with
    exactly one incident tetrahedron. `alpha` auto-estimates as 3x the mean
    NN spacing, mirroring the reference's [1.5, 3] * avg_dist radius ladder
    (utils.py:49-51). Host-side numpy/scipy (runs once, offline), like all
    mesh preprocessing in this framework.

    Returns (vertices [N, 3] float64, faces [F, 3] int64). Face winding is
    not globally oriented (the reference's output normals are likewise
    unoriented estimates). Caveat shared with alpha shapes generally:
    exactly-cospherical inputs are degenerate (every tetrahedron's
    circumsphere IS the common sphere, so all are rejected) — thin surface
    scans should be jittered or given a larger explicit alpha.
    """
    import numpy as np
    import scipy.spatial as sps

    pts = np.asarray(points, dtype=np.float64)
    if pts.shape[0] < 4:
        raise ValueError("pc2mesh needs at least 4 points")
    tree = sps.cKDTree(pts)
    dist, _ = tree.query(pts, k=2)
    # duplicated points contribute zero NN spacing — estimate the scale
    # from the distinct-point spacings so auto-alpha does not collapse to 0
    positive = dist[:, 1][dist[:, 1] > 0]
    if positive.size == 0:
        raise ValueError("pc2mesh: all points coincide")
    avg = float(positive.mean())
    if alpha is None:
        alpha = 3.0 * avg

    try:
        tet = sps.Delaunay(pts)
    except sps.QhullError as exc:  # coplanar/degenerate cloud
        raise ValueError(f"pc2mesh: degenerate point cloud ({exc})") from exc
    simp = tet.simplices  # [T, 4]
    a, b, c, d = (pts[simp[:, i]] for i in range(4))
    # circumradius via the standard determinant-free formulation:
    # solve (p - a) . (p - a) = r^2 for the circumcenter p
    ba, ca, da = b - a, c - a, d - a
    sq = lambda v: (v * v).sum(-1)
    m = np.stack([ba, ca, da], axis=1)                     # [T, 3, 3]
    rhs = 0.5 * np.stack([sq(ba), sq(ca), sq(da)], axis=1)  # [T, 3]
    det = np.linalg.det(m)
    # scale-RELATIVE degeneracy cutoff: det scales as length^3, so an
    # absolute 1e-12 would classify every tet of a small-unit cloud
    # (edges ~1e-5) as degenerate and silently return an empty mesh
    good = np.abs(det) > 1e-9 * avg**3
    center = np.zeros((simp.shape[0], 3))
    center[good] = np.linalg.solve(m[good], rhs[good][..., None])[..., 0]
    radius = np.full(simp.shape[0], np.inf)
    radius[good] = np.sqrt(sq(center[good]))
    keep = simp[radius < alpha]

    faces: dict = {}
    combos = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))
    for i, j, k in combos:
        tris = np.sort(keep[:, (i, j, k)], axis=1)
        for t in map(tuple, tris):
            faces[t] = faces.get(t, 0) + 1
    boundary = np.asarray([f for f, n in faces.items() if n == 1],
                          dtype=np.int64)
    return pts, boundary.reshape(-1, 3)
