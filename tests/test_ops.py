"""Golden numerical tests for the graph ops: Laplacian normalization,
Chebyshev recurrence, pool/unpool — verified against independent numpy
closed forms on hand-checkable graphs, and cross-path (dense vs ell)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from meshvae_tpu.mesh.connectivity import vertex_adjacency
from meshvae_tpu.ops.cheb import cheb_conv, propagate_dense, propagate_ell
from meshvae_tpu.ops.graph import (
    cheb_operator, embed_operator, normalized_neg_adjacency, pool_operator,
)
from meshvae_tpu.ops.pool import pool_apply


def numpy_cheb(x, lap, weight, bias=None):
    """Independent numpy reference of the K-term Chebyshev recurrence."""
    k = weight.shape[0]
    tx0 = x
    out = tx0 @ weight[0]
    if k > 1:
        tx1 = np.einsum("nm,bmf->bnf", lap, x)
        out = out + tx1 @ weight[1]
    for i in range(2, k):
        tx2 = 2 * np.einsum("nm,bmf->bnf", lap, tx1) - tx0
        out = out + tx2 @ weight[i]
        tx0, tx1 = tx1, tx2
    if bias is not None:
        out = out + bias
    return out


class TestLaplacian:
    def test_triangle_graph(self):
        # 3-cycle: every vertex degree 2 -> weights -1/2 on each edge
        adj = vertex_adjacency(3, np.array([[0, 1, 2]]))
        lap = normalized_neg_adjacency(adj).toarray()
        expected = np.full((3, 3), -0.5)
        np.fill_diagonal(expected, 0.0)
        np.testing.assert_allclose(lap, expected, atol=1e-12)

    def test_path_graph(self):
        # path 0-1-2: deg = (1, 2, 1)
        adj = sp.csr_matrix(np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=float))
        lap = normalized_neg_adjacency(adj).toarray()
        v = -1.0 / np.sqrt(2.0)
        expected = np.array([[0, v, 0], [v, 0, v], [0, v, 0]])
        np.testing.assert_allclose(lap, expected, atol=1e-12)

    def test_ignores_stored_values_and_self_loops(self):
        # weights 7 on edges and a self-loop must not change the operator
        adj = sp.csr_matrix(np.array([[3.0, 7.0], [7.0, 0.0]]))
        lap = normalized_neg_adjacency(adj).toarray()
        np.testing.assert_allclose(lap, [[0, -1], [-1, 0]], atol=1e-12)

    def test_spectrum_in_unit_disc(self, grid_mesh):
        # -D^{-1/2} A D^{-1/2} has eigenvalues in [-1, 1]
        adj = vertex_adjacency(grid_mesh.num_vertices, grid_mesh.f)
        lap = normalized_neg_adjacency(adj).toarray()
        eig = np.linalg.eigvalsh(lap)
        assert eig.min() >= -1.0 - 1e-9 and eig.max() <= 1.0 + 1e-9


class TestChebConv:
    @pytest.fixture
    def setup(self, grid_mesh):
        rng = np.random.default_rng(0)
        adj = vertex_adjacency(grid_mesh.num_vertices, grid_mesh.f)
        op = cheb_operator(adj)
        x = rng.standard_normal((2, grid_mesh.num_vertices, 3)).astype(np.float32)
        weight = (0.1 * rng.standard_normal((6, 3, 8))).astype(np.float32)
        bias = (0.1 * rng.standard_normal(8)).astype(np.float32)
        return op, x, weight, bias, adj

    def test_matches_numpy_reference(self, setup):
        op, x, weight, bias, adj = setup
        lap = normalized_neg_adjacency(adj).toarray().astype(np.float32)
        expected = numpy_cheb(x, lap, weight, bias)
        got = cheb_conv(jnp.asarray(x), op, jnp.asarray(weight), jnp.asarray(bias),
                        method="dense", precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=2e-5)

    def test_dense_vs_ell(self, setup):
        op, x, weight, bias, _ = setup
        dense = cheb_conv(jnp.asarray(x), op, jnp.asarray(weight),
                          jnp.asarray(bias), method="dense",
                          precision=jax.lax.Precision.HIGHEST)
        ell = cheb_conv(jnp.asarray(x), op, jnp.asarray(weight),
                        jnp.asarray(bias), method="ell")
        np.testing.assert_allclose(np.asarray(dense), np.asarray(ell),
                                   rtol=2e-5, atol=2e-5)

    def test_propagate_paths_agree(self, setup):
        op, x, _, _, _ = setup
        d = propagate_dense(op, jnp.asarray(x), precision=jax.lax.Precision.HIGHEST)
        e = propagate_ell(op, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(d), np.asarray(e), rtol=2e-5, atol=2e-5)

    def test_k1_is_pure_linear(self, setup):
        op, x, weight, _, _ = setup
        got = cheb_conv(jnp.asarray(x), op, jnp.asarray(weight[:1]), None)
        np.testing.assert_allclose(np.asarray(got), x @ weight[0], rtol=1e-5,
                                   atol=1e-5)

    def test_embedded_quirk_operator(self, grid_mesh):
        # coarse operator embedded at full res: rows >= n_coarse get no
        # neighbor terms (identity path only)
        rng = np.random.default_rng(1)
        coarse_adj = vertex_adjacency(3, np.array([[0, 1, 2]]))
        n_full = 10
        op = embed_operator(coarse_adj, n_full)
        x = rng.standard_normal((1, n_full, 2)).astype(np.float32)
        weight = rng.standard_normal((2, 2, 2)).astype(np.float32)
        got = np.asarray(cheb_conv(jnp.asarray(x), op, jnp.asarray(weight), None,
                                   precision=jax.lax.Precision.HIGHEST))
        # rows 3.. see only x @ W0
        np.testing.assert_allclose(got[0, 3:], x[0, 3:] @ weight[0], rtol=1e-5,
                                   atol=1e-5)
        # rows 0..2 see the triangle-graph propagation too
        lap_full = np.zeros((n_full, n_full), dtype=np.float32)
        lap_full[:3, :3] = normalized_neg_adjacency(coarse_adj).toarray()
        expected = numpy_cheb(x, lap_full, weight)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


class TestPool:
    def test_selection_matrix(self):
        # D: pick vertices 2 and 0
        d = sp.csr_matrix((np.ones(2), ([0, 1], [2, 0])), shape=(2, 4))
        pool = pool_operator(d)
        assert pool.is_selection
        x = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
        out = pool_apply(x, pool)
        expected = np.asarray(x)[:, [2, 0], :]
        np.testing.assert_array_equal(np.asarray(out), expected)

    def test_barycentric_matrix_gather_vs_dense(self):
        rng = np.random.default_rng(3)
        rows = np.repeat(np.arange(5), 3)
        cols = rng.integers(0, 4, size=15)
        vals = rng.random(15)
        u = sp.csr_matrix((vals, (rows, cols)), shape=(5, 4))
        pool = pool_operator(u)
        x = jnp.asarray(rng.standard_normal((2, 4, 6)).astype(np.float32))
        got = pool_apply(x, pool, method="gather")
        ref = pool_apply(x, pool, method="dense",
                         precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                                   atol=2e-5)
        expected = np.einsum("mn,bnf->bmf", u.toarray(), np.asarray(x))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=2e-5)

    def test_gather_backward_matches_dense(self):
        """The gather path's custom VJP (precomputed P^T gathers instead
        of autodiff's scatter-add) must produce the exact dense-path
        gradient for both selection and barycentric matrices."""
        rng = np.random.default_rng(7)
        mats = [
            sp.csr_matrix((np.ones(3), ([0, 1, 2], [4, 0, 2])),
                          shape=(3, 6)),                       # selection D
            sp.csr_matrix((rng.random(15),
                           (np.repeat(np.arange(5), 3),
                            rng.integers(0, 4, size=15))),
                          shape=(5, 4)),                       # barycentric U
        ]
        for mat in mats:
            pool = pool_operator(mat)
            assert pool.t_idx is not None
            x = jnp.asarray(
                rng.standard_normal((2, mat.shape[1], 3)).astype(np.float32))
            g_out = jnp.asarray(
                rng.standard_normal((2, mat.shape[0], 3)).astype(np.float32))

            def loss(method):
                def fn(x_):
                    out = pool_apply(x_, pool, method=method,
                                     precision=jax.lax.Precision.HIGHEST)
                    return jnp.sum(out * g_out)
                return fn

            gg = jax.grad(loss("gather"))(x)
            gd = jax.grad(loss("dense"))(x)
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gd),
                                       rtol=2e-5, atol=2e-5)
            # the backward really is P^T @ g
            expected = np.einsum("mn,bmf->bnf", mat.toarray(),
                                 np.asarray(g_out))
            np.testing.assert_allclose(np.asarray(gg), expected,
                                       rtol=2e-5, atol=2e-5)


class TestQuirkFastPath:
    def test_active_corner_fast_path_matches_full(self, grid_mesh):
        """The embedded (quirk) operator stores only the corner; every
        method's fast path must equal the full-size recurrence over the
        manually-embedded matrix, including the alternating T_k(0) behavior
        of the inactive rows."""
        rng = np.random.default_rng(5)
        coarse_adj = vertex_adjacency(4, np.array([[0, 1, 2], [1, 3, 2]]))
        n_full = 12
        op = embed_operator(coarse_adj, n_full)
        assert op.active_n == 4
        assert op.dense.shape == (4, 4)  # corner storage only
        lap_full = np.zeros((n_full, n_full), dtype=np.float32)
        lap_full[:4, :4] = normalized_neg_adjacency(coarse_adj).toarray()
        x = jnp.asarray(rng.standard_normal((2, n_full, 3)).astype(np.float32))
        for K in (1, 2, 3, 5, 6):
            w = jnp.asarray(rng.standard_normal((K, 3, 4)).astype(np.float32))
            b = jnp.asarray(rng.standard_normal(4).astype(np.float32))
            expected = numpy_cheb(np.asarray(x), lap_full, np.asarray(w)) \
                + np.asarray(b)
            for method in ("dense", "ell"):
                got = cheb_conv(x, op, w, b, method=method,
                                precision=jax.lax.Precision.HIGHEST)
                np.testing.assert_allclose(
                    np.asarray(got), expected, rtol=1e-5, atol=1e-5,
                    err_msg=f"K={K} method={method}")

    def test_pallas_interpret_corner_path(self):
        import meshvae_tpu.ops.pallas_cheb as pc

        rng = np.random.default_rng(6)
        coarse_adj = vertex_adjacency(4, np.array([[0, 1, 2], [1, 3, 2]]))
        n_full = 12
        op = embed_operator(coarse_adj, n_full)
        lap_full = np.zeros((n_full, n_full), dtype=np.float32)
        lap_full[:4, :4] = normalized_neg_adjacency(coarse_adj).toarray()
        x = jnp.asarray(rng.standard_normal((2, n_full, 3)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((4, 3, 4)).astype(np.float32))
        expected = numpy_cheb(np.asarray(x), lap_full, np.asarray(w))
        pc.INTERPRET = True
        try:
            got = cheb_conv(x, op, w, None, method="pallas")
        finally:
            pc.INTERPRET = False
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                                   atol=1e-4)


class TestLayoutSelection:
    """Per-method operand layouts: only what the configured path reads gets
    materialized (at 20k vertices the unread dense operators are gigabytes)."""

    def test_trimmed_layouts_are_none(self, grid_mesh):
        import meshvae_tpu.ops.graph as graph_mod
        from meshvae_tpu.mesh.hierarchy import build_hierarchy
        from meshvae_tpu.models.operators import build_operators

        hier = build_hierarchy(grid_mesh, [2, 2])
        # above the hybrid cutoff: pallas levels hold BSR only
        saved = graph_mod.PALLAS_MIN_N
        graph_mod.PALLAS_MIN_N = 0
        try:
            pallas_ops = build_operators(hier, cheb_method="pallas",
                                         pool_method="gather")
        finally:
            graph_mod.PALLAS_MIN_N = saved
        assert pallas_ops.lap[0].dense is None
        assert pallas_ops.lap[0].ell_idx is None
        assert pallas_ops.lap[0].bsr is not None
        assert pallas_ops.lap_final.dense is None
        assert pallas_ops.up[0].dense is None
        assert pallas_ops.up[0].idx is not None

        # below the cutoff (hybrid dispatch): a small level materializes a
        # dense operator instead of BSR, and cheb_conv falls through to the
        # fused XLA path for it
        hybrid_ops = build_operators(hier, cheb_method="pallas",
                                     pool_method="gather")
        assert hybrid_ops.lap[0].bsr is None
        assert hybrid_ops.lap[0].dense is not None
        assert hybrid_ops.lap[0].ell_idx is None

        dense_ops = build_operators(hier, cheb_method="dense",
                                    pool_method="dense")
        assert dense_ops.lap[0].dense is not None
        assert dense_ops.lap[0].bsr is None
        assert dense_ops.up[0].idx is None
        assert dense_ops.up[0].dense is not None

        full = build_operators(hier)  # no method -> everything
        assert full.lap[0].dense is not None and full.lap[0].bsr is not None

    def test_trimmed_ops_compute_identically(self, grid_mesh):
        import jax
        import numpy as np
        import jax.numpy as jnp
        from meshvae_tpu.mesh.hierarchy import build_hierarchy
        from meshvae_tpu.models.operators import build_operators
        from meshvae_tpu.models.vae import MeshVAE, VAEConfig

        hier = build_hierarchy(grid_mesh, [2, 2])
        cfg = VAEConfig(num_features=3, filters=(4, 4, 8),
                        polygon_order=(3, 3, 3), n_layers=2, num_hidden=16,
                        latent=4, num_classes=2, dropout=0.0,
                        coarse_verts=hier.levels[-1], cheb_method="ell")
        model = MeshVAE(cfg)
        full = build_operators(hier)
        trimmed = build_operators(hier, cheb_method="ell",
                                  pool_method="gather")
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, hier.levels[0], 3)),
                        jnp.float32)
        y = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1]])
        params = model.init({"params": jax.random.key(0)}, x, y, trimmed,
                            train=False)
        out_t = model.apply(params, x, y, trimmed, train=False)
        out_f = model.apply(params, x, y, full, train=False)
        np.testing.assert_array_equal(np.asarray(out_t["recon"]),
                                      np.asarray(out_f["recon"]))
