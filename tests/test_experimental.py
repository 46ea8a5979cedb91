"""Tests for the experimental module equivalents of the reference's unused
layers (EqualLinear, AdaIN, GraphNorm, SpatialConv, GAT, SortPool, DiffPool)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshvae_tpu.mesh.connectivity import vertex_adjacency
from meshvae_tpu.models.experimental import (
    AdaptiveInstanceNorm, DiffPool, EqualLinear, GraphAttention, GraphNorm,
    SpatialConv, sort_pool,
)
from meshvae_tpu.ops.graph import cheb_operator

from conftest import make_grid_mesh


@pytest.fixture(scope="module")
def graph():
    mesh = make_grid_mesh(6, jitter=0.05)
    op = cheb_operator(vertex_adjacency(mesh.num_vertices, mesh.f))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, op.n, 8)).astype(np.float32))
    return op, x


class TestEqualLinear:
    def test_runtime_scaling(self):
        m = EqualLinear(4)
        x = jnp.ones((2, 16))
        p = m.init(jax.random.key(0), x)
        out = m.apply(p, x)
        expected = x @ (p["params"]["kernel"] * np.sqrt(2 / 16)) \
            + p["params"]["bias"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-6)


class TestAdaIN:
    def test_identity_style_at_init(self, graph):
        # style kernel ~ N(0,1) scaled, but bias init -> gamma=1, beta=0 at
        # zero style: output is plain instance norm
        op, x = graph
        m = AdaptiveInstanceNorm(channels=8)
        style = jnp.zeros((2, 4))
        p = m.init(jax.random.key(0), x, style)
        out = np.asarray(m.apply(p, x, style))
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(axis=1, ddof=1), 1.0, atol=1e-4)


class TestGraphNorm:
    def test_normalizes_batch_dim(self):
        m = GraphNorm(8)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32) * 3 + 2)
        p = m.init(jax.random.key(0), x)
        out = np.asarray(m.apply(p, x))
        np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)


class TestSpatialConv:
    def test_aggregates_neighbors_plus_self(self, graph):
        op, x = graph
        m = SpatialConv(8)
        p = m.init(jax.random.key(0), x, op)
        out = m.apply(p, x, op)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))


class TestGraphAttention:
    def test_attention_rows_normalized(self, graph):
        op, x = graph
        m = GraphAttention(8)
        p = m.init(jax.random.key(0), x, op)
        out = m.apply(p, x, op)
        assert out.shape == (2, op.n, 8)
        assert np.all(np.isfinite(np.asarray(out)))


class TestSortPool:
    def test_top_k_by_last_channel(self):
        x = jnp.asarray(np.array([[[1.0, 0.1], [2.0, 0.3], [3.0, 0.2]]],
                                 dtype=np.float32))
        out = np.asarray(sort_pool(x, 2))
        # sorted desc by channel -1: rows (2.0, 0.3), (3.0, 0.2)
        np.testing.assert_allclose(out, [[2.0, 0.3, 3.0, 0.2]])

    def test_pads_short_graphs(self):
        x = jnp.ones((1, 2, 3))
        out = sort_pool(x, 4)
        assert out.shape == (1, 12)
        assert np.asarray(out)[0, 6:].sum() == 0


class TestDiffPool:
    def test_shapes_and_loss(self, graph):
        op, x = graph
        adj = jnp.abs(jnp.sign(op.dense))
        m = DiffPool(in_nodes=op.n, out_nodes=8)
        p = m.init(jax.random.key(0), x, adj)
        pooled, coarse, loss = m.apply(p, x, adj)
        assert pooled.shape == (2, 8, 8)
        assert coarse.shape == (8, 8)
        assert float(loss) >= 0


class TestPC2Mesh:
    """Equivalent of the reference's dead open3d ball-pivot pc2mesh
    (utils.py:44-54), rebuilt on scipy alpha shapes."""

    def test_reconstructs_ball_surface(self):
        import numpy as np
        from meshvae_tpu.models.experimental import pc2mesh

        # uniform samples of a solid ball: the alpha-shape boundary is the
        # sphere surface triangulated over the outermost samples
        rng = np.random.default_rng(0)
        n = 600
        v = rng.standard_normal((n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v * rng.uniform(0, 1, (n, 1)) ** (1 / 3)
        verts, faces = pc2mesh(pts)
        assert verts.shape == (n, 3)
        assert faces.shape[0] > 100
        assert faces.min() >= 0 and faces.max() < n
        # the boundary of the alpha complex is (near-)2-manifold: edges
        # shared by exactly two faces
        edges = {}
        for f in faces:
            for e in ((f[0], f[1]), (f[0], f[2]), (f[1], f[2])):
                e = tuple(sorted(e))
                edges[e] = edges.get(e, 0) + 1
        counts = np.asarray(list(edges.values()))
        assert (counts == 2).mean() > 0.9
        # boundary vertices sit near the unit sphere
        r = np.linalg.norm(pts[np.unique(faces)], axis=1)
        assert r.mean() > 0.7

    def test_rejects_degenerate_input(self):
        import numpy as np
        import pytest
        from meshvae_tpu.models.experimental import pc2mesh

        with pytest.raises(ValueError):
            pc2mesh(np.zeros((3, 3)))
