"""Pallas block-sparse kernel tests (interpreter mode on CPU; the compiled
kernel is exercised on real TPU by bench.py and was verified bit-equal to
f32 round-off against the dense path)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import meshvae_tpu.ops.pallas_cheb as pc
from meshvae_tpu.mesh.connectivity import vertex_adjacency
from meshvae_tpu.ops.block_sparse import (BLOCK, bsr_to_dense,
                                          to_block_sparse)
from meshvae_tpu.ops.cheb import cheb_conv
from meshvae_tpu.ops.graph import cheb_operator, normalized_neg_adjacency

from conftest import make_grid_mesh


@pytest.fixture(autouse=True)
def interpret_mode():
    pc.INTERPRET = True
    yield
    pc.INTERPRET = False


@pytest.fixture(scope="module")
def big_graph():
    # > BLOCK vertices so multiple 128-blocks exist
    mesh = make_grid_mesh(14, jitter=0.05)  # 196 verts -> 2x2 block grid
    adj = vertex_adjacency(mesh.num_vertices, mesh.f)
    return mesh, adj


class TestBlockSparse:
    def test_roundtrip_dense(self, big_graph):
        mesh, adj = big_graph
        lap = normalized_neg_adjacency(adj)
        bsr = to_block_sparse(lap)
        assert bsr.n == mesh.num_vertices
        assert bsr.n_pad % BLOCK == 0
        np.testing.assert_allclose(bsr_to_dense(bsr), lap.toarray(),
                                   atol=1e-7)

    def test_blocks_sorted_rows_marked(self, big_graph):
        mesh, adj = big_graph
        bsr = to_block_sparse(normalized_neg_adjacency(adj))
        rows = np.asarray(bsr.block_row)
        cols = np.asarray(bsr.block_col)
        order = np.lexsort((cols, rows))
        np.testing.assert_array_equal(order, np.arange(len(rows)))
        first = np.asarray(bsr.first)
        expected = np.ones_like(rows)
        expected[1:] = (rows[1:] != rows[:-1]).astype(expected.dtype)
        np.testing.assert_array_equal(first, expected)
        # every block-row present (empty rows get explicit zero blocks)
        assert set(rows.tolist()) == set(range(bsr.n_pad // BLOCK))

    def test_empty_matrix(self):
        bsr = to_block_sparse(sp.csr_matrix((200, 200)))
        np.testing.assert_allclose(bsr_to_dense(bsr),
                                   np.zeros((200, 200)), atol=0)


class TestBsrMatmul:
    def test_matches_scipy(self, big_graph):
        mesh, adj = big_graph
        lap = normalized_neg_adjacency(adj)
        bsr = to_block_sparse(lap)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((bsr.n_pad, 128)).astype(np.float32)
        y = np.asarray(pc.bsr_matmul(bsr, jnp.asarray(x)))
        expected = np.zeros_like(x)
        expected[: bsr.n] = (lap @ x[: bsr.n]).astype(np.float32)
        np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)

    def test_fused_recurrence_step_and_vjp(self, big_graph):
        """cheb_step computes 2 L t1 - t0 inside the kernel; its VJP is
        (2 L g, -g) by symmetry."""
        mesh, adj = big_graph
        lap = normalized_neg_adjacency(adj)
        bsr = to_block_sparse(lap)
        rng = np.random.default_rng(4)
        t1 = rng.standard_normal((bsr.n_pad, 128)).astype(np.float32)
        t0 = rng.standard_normal((bsr.n_pad, 128)).astype(np.float32)
        got = np.asarray(pc.cheb_step(bsr, jnp.asarray(t1), jnp.asarray(t0)))
        expected = -t0.copy()
        expected[: bsr.n] += 2.0 * (lap @ t1[: bsr.n]).astype(np.float32)
        # rows beyond n have no blocks: kernel yields -t0 there too (padding
        # rows carry explicit zero blocks)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)

        g = rng.standard_normal(t1.shape).astype(np.float32)
        _, vjp = jax.vjp(lambda a, b: pc.cheb_step(bsr, a, b),
                         jnp.asarray(t1), jnp.asarray(t0))
        dt1, dt0 = vjp(jnp.asarray(g))
        exp_dt1 = np.zeros_like(g)
        exp_dt1[: bsr.n] = 2.0 * (lap.T @ g[: bsr.n]).astype(np.float32)
        np.testing.assert_allclose(np.asarray(dt1), exp_dt1, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(dt0), -g, rtol=1e-6, atol=0)

    def test_high_precision_bf16x3(self, big_graph):
        """precision=high runs an in-kernel bf16x3 split (3 MXU passes vs
        HIGHEST's 6) and must stay ~1e-5 of the exact product — well inside
        the <1e-4 parity budget."""
        mesh, adj = big_graph
        lap = normalized_neg_adjacency(adj)
        bsr = to_block_sparse(lap)
        rng = np.random.default_rng(5)
        x = rng.standard_normal((bsr.n_pad, 128)).astype(np.float32)
        expected = np.zeros_like(x)
        expected[: bsr.n] = (lap @ x[: bsr.n]).astype(np.float32)
        y = np.asarray(pc.bsr_matmul(bsr, jnp.asarray(x), precision="high"))
        scale = np.abs(expected).max()
        assert np.abs(y - expected).max() / scale < 2e-5

    def test_vjp_uses_symmetry(self, big_graph):
        mesh, adj = big_graph
        lap = normalized_neg_adjacency(adj)
        bsr = to_block_sparse(lap)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((bsr.n_pad, 128)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((bsr.n_pad, 128)).astype(np.float32))
        _, vjp = jax.vjp(lambda t: pc.bsr_matmul(bsr, t), x)
        (dx,) = vjp(g)
        expected = np.zeros_like(np.asarray(g))
        expected[: bsr.n] = (lap.T @ np.asarray(g)[: bsr.n]).astype(np.float32)
        np.testing.assert_allclose(np.asarray(dx), expected, rtol=1e-5,
                                   atol=1e-5)


class TestShardedBsr:
    """The distributed kernel (ops/pallas_shard.py): operator row-blocks
    sharded over "sp", activations all-gathered over the mesh, batch
    columns sharded over "dp" — SURVEY.md §2c's 'row-blocks of L
    distributable' design, proven on the virtual CPU mesh."""

    def test_matmul_and_vjp_match_scipy(self):
        from meshvae_tpu.ops.pallas_shard import (bsr_matmul_sharded,
                                                  shard_block_sparse)
        from meshvae_tpu.parallel.sharding import make_device_mesh

        mesh_g = make_grid_mesh(23, jitter=0.05)  # 529 verts -> 5+ blocks
        lap = normalized_neg_adjacency(
            vertex_adjacency(mesh_g.num_vertices, mesh_g.f))
        bsr = to_block_sparse(lap)
        sbsr = shard_block_sparse(bsr, 2)
        assert sbsr.n_pad % (2 * BLOCK) == 0
        dmesh = make_device_mesh(dp=4, sp=2)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((sbsr.n_pad, 512)).astype(np.float32)
        y = np.asarray(bsr_matmul_sharded(sbsr, jnp.asarray(x), dmesh))
        expected = np.zeros_like(x)
        expected[: bsr.n] = (lap @ x[: bsr.n]).astype(np.float32)
        np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)

        g = rng.standard_normal(x.shape).astype(np.float32)
        _, vjp = jax.vjp(lambda t: bsr_matmul_sharded(sbsr, t, dmesh),
                         jnp.asarray(x))
        (dx,) = vjp(jnp.asarray(g))
        exp_g = np.zeros_like(g)
        exp_g[: bsr.n] = (lap.T @ g[: bsr.n]).astype(np.float32)
        np.testing.assert_allclose(np.asarray(dx), exp_g, rtol=1e-5,
                                   atol=1e-5)


    def test_fused_seed_dot_sharded_square_mix(self):
        """The sharded backward's fused cotangent seed (_basis_mix_sharded
        p_plus_dot: gm row-sharded, wT replicated into the local kernel)
        must match the standalone-dot form. b=32, f=16 on a dp4 x sp2 mesh
        keeps f_pad == 16 == f_out — genuinely square, so the fused branch
        (not the eager fallback) executes."""
        import types

        import meshvae_tpu.ops.pallas_cheb as pc
        from meshvae_tpu.ops.pallas_shard import (cheb_conv_pallas_sharded,
                                                  shard_block_sparse)
        from meshvae_tpu.parallel.sharding import make_device_mesh

        mesh_g = make_grid_mesh(23, jitter=0.05)
        lap = normalized_neg_adjacency(
            vertex_adjacency(mesh_g.num_vertices, mesh_g.f))
        sbsr = shard_block_sparse(to_block_sparse(lap), 2)
        dmesh = make_device_mesh(dp=4, sp=2)
        op = types.SimpleNamespace(bsr_sp=sbsr, mesh=dmesh)

        rng = np.random.default_rng(41)
        K, b, f, n = 3, 32, 16, mesh_g.num_vertices
        x = jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((K, f, f)), jnp.float32)
        bias = jnp.asarray(0.1 * rng.standard_normal(f), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32)

        def loss(x_, w_, b_):
            o = cheb_conv_pallas_sharded(
                x_, op, w_, b_, precision=jax.lax.Precision.HIGHEST)
            return jnp.sum((o - tgt) ** 2)

        old = pc.FUSED_SEED_DOT
        try:
            pc.FUSED_SEED_DOT = True
            gf = jax.grad(loss, argnums=(0, 1, 2))(x, w, bias)
            pc.FUSED_SEED_DOT = False
            gs = jax.grad(loss, argnums=(0, 1, 2))(x, w, bias)
        finally:
            pc.FUSED_SEED_DOT = old
        for a, c, name in zip(gf, gs, ("dx", "dw", "dbias")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-6, atol=1e-6,
                err_msg=f"sharded fused-vs-standalone {name}")

    def test_bf16_blocks_survive_sharding(self):
        """The bf16 half-width streaming mode must survive repartitioning:
        shard_block_sparse preserves the block dtype and the sharded conv
        downcasts activations to match (a silent f32 upcast would void the
        mode exactly at multi-chip scale)."""
        from meshvae_tpu.ops.pallas_shard import (bsr_matmul_sharded,
                                                  shard_block_sparse)
        from meshvae_tpu.parallel.sharding import make_device_mesh

        mesh_g = make_grid_mesh(23, jitter=0.05)
        lap = normalized_neg_adjacency(
            vertex_adjacency(mesh_g.num_vertices, mesh_g.f))
        bsr = to_block_sparse(lap, dtype=jnp.bfloat16)
        sbsr = shard_block_sparse(bsr, 2)
        assert sbsr.blocks.dtype == jnp.bfloat16

        dmesh = make_device_mesh(dp=4, sp=2)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((sbsr.n_pad, 512)).astype(np.float32)
        y = np.asarray(bsr_matmul_sharded(
            sbsr, jnp.asarray(x, jnp.bfloat16), dmesh, precision="default"))
        expected = np.zeros_like(x)
        expected[: bsr.n] = (lap @ x[: bsr.n]).astype(np.float32)
        # bf16 operands with f32 accumulation: ~1e-2 absolute on O(1) data
        np.testing.assert_allclose(y, expected, rtol=2e-2, atol=2e-2)


class TestChebConvPallas:
    def test_matches_dense_path(self, big_graph):
        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((4, op.n, 8)).astype(np.float32))
        w = jnp.asarray((0.1 * rng.standard_normal((4, 8, 16))).astype(np.float32))
        b = jnp.asarray((0.1 * rng.standard_normal(16)).astype(np.float32))
        ref = cheb_conv(x, op, w, b, method="dense",
                        precision=jax.lax.Precision.HIGHEST)
        got = cheb_conv(x, op, w, b, method="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_state_mode(self, big_graph):
        """With bf16 operator blocks the kernel emits bf16, so the whole
        recurrence state (and the conv output) stays bf16 — no per-order
        f32 cast round-trips. Must track the dense bf16 path within bf16
        rounding, and actually BE bf16 (a silent f32 upcast would restore
        the double-width streaming this mode exists to remove)."""
        mesh, adj = big_graph
        op16 = cheb_operator(adj, dtype=jnp.bfloat16)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((4, op16.n, 8)).astype(np.float32))
        w = jnp.asarray((0.1 * rng.standard_normal((4, 8, 16))).astype(np.float32))
        b = jnp.asarray((0.1 * rng.standard_normal(16)).astype(np.float32))
        ref = cheb_conv(x, cheb_operator(adj), w, b, method="dense",
                        precision=jax.lax.Precision.HIGHEST)
        got = cheb_conv(x.astype(jnp.bfloat16), op16,
                        w.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                        method="pallas", precision="default")
        assert got.dtype == jnp.bfloat16
        scale = np.abs(np.asarray(ref)).max()
        delta = np.abs(np.asarray(got, np.float32) - np.asarray(ref)).max()
        assert delta / scale < 5e-2  # bf16 operands + bf16 state rounding

        # gradients flow bf16 too (custom VJPs must return operand-dtype
        # cotangents or jax rejects the vjp)
        def loss(xx):
            return jnp.sum(
                cheb_conv(xx, op16, w.astype(jnp.bfloat16), None,
                          method="pallas", precision="default")
                .astype(jnp.float32) ** 2)

        gx = jax.grad(loss)(x.astype(jnp.bfloat16))
        assert gx.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(gx.astype(jnp.float32)).all())

    @pytest.mark.parametrize("precision", ["highest", "high"])
    def test_bf16_blocks_clamp_strict_precision(self, big_graph, precision):
        """compute_dtype=bfloat16 with default.cfg's matmul_precision=
        highest must run the plain bf16 kernel, not crash the backend:
        Mosaic rejects fp32-contract matmuls on bf16 operands ("Bad lhs
        type") and HIGH's bf16x3 residual is exactly zero on bf16 blocks.
        The precision clamp (_clamp_bf16_precision) makes HIGHEST/HIGH
        on a bf16 operator behave exactly like DEFAULT — including through
        the gradient path (the round-4 quality campaign's flagship_bf16
        leg died on this before the clamp)."""
        mesh, adj = big_graph
        op16 = cheb_operator(adj, dtype=jnp.bfloat16)
        rng = np.random.default_rng(7)
        x = jnp.asarray(
            rng.standard_normal((4, op16.n, 8)).astype(np.float32))
        w = jnp.asarray(
            (0.1 * rng.standard_normal((4, 8, 16))).astype(np.float32))

        def loss(xx, ww, prec):
            return jnp.sum(
                cheb_conv(xx, op16, ww, None, method="pallas",
                          precision=prec).astype(jnp.float32) ** 2)

        args = (x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
        ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(
            *args, "default")
        got_l, got_g = jax.value_and_grad(loss, argnums=(0, 1))(
            *args, precision)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-6)
        for a, b in zip(got_g, ref_g):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32))

    @pytest.mark.parametrize("fused_bwd,colmajor", [
        (True, True), (True, False), (False, True)])
    def test_gradients_match_dense(self, big_graph, fused_bwd, colmajor):
        """The shipping pallas path's backward (fused reverse recurrence
        when FUSED_BWD, autodiff through bsr_matmul/cheb_step otherwise)
        must match dense-HIGHEST gradients for every order count. The
        small test shapes always fit the col-major VMEM budget, so the
        ROW-major two-seed kernel needs its own leg (budget forced to 0)."""
        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(17)
        old = pc.FUSED_BWD
        old_budget = pc.COLMAJOR_VMEM_BUDGET
        pc.FUSED_BWD = fused_bwd
        if not colmajor:
            pc.COLMAJOR_VMEM_BUDGET = 0
        try:
            for K in (1, 2, 3, 6):
                b, f_in, f_out = 4, 8, 16
                x = jnp.asarray(rng.standard_normal((b, op.n, f_in)),
                                jnp.float32)
                w = jnp.asarray(0.1 * rng.standard_normal((K, f_in, f_out)),
                                jnp.float32)
                bias = jnp.asarray(0.1 * rng.standard_normal(f_out),
                                   jnp.float32)
                tgt = jnp.asarray(rng.standard_normal((b, op.n, f_out)),
                                  jnp.float32)

                def loss(x_, w_, b_, method):
                    o = cheb_conv(x_, op, w_, b_, method=method,
                                  precision=jax.lax.Precision.HIGHEST)
                    return jnp.sum((o - tgt) ** 2)

                gd = jax.grad(lambda *a: loss(*a, "dense"),
                              argnums=(0, 1, 2))(x, w, bias)
                gp = jax.grad(lambda *a: loss(*a, "pallas"),
                              argnums=(0, 1, 2))(x, w, bias)
                for a, c, name in zip(gd, gp, ("dx", "dw", "dbias")):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-4,
                        err_msg=f"K={K} fused_bwd={fused_bwd} {name}")
        finally:
            pc.FUSED_BWD = old
            pc.COLMAJOR_VMEM_BUDGET = old_budget

    @pytest.mark.parametrize("colmajor", [True, False])
    def test_fused_seed_dot_square_mix(self, big_graph, colmajor):
        """Square mixes (f_pad == f_out) fold the per-order mix cotangents
        c_j = gm @ W_jᵀ into the kernel's first-visit seed (t_plus_dot).
        The fused form must match both the standalone-dot form and dense
        autodiff; non-square shapes in the other tests cover the eager
        fallback. b=8, f_in=16 gives f_pad=16=f_out — genuinely square."""
        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(31)
        old_budget = pc.COLMAJOR_VMEM_BUDGET
        old_flag = pc.FUSED_SEED_DOT
        if not colmajor:
            pc.COLMAJOR_VMEM_BUDGET = 0
        try:
            for K in (2, 3, 6):
                b, f = 8, 16
                x = jnp.asarray(rng.standard_normal((b, op.n, f)),
                                jnp.float32)
                w = jnp.asarray(0.1 * rng.standard_normal((K, f, f)),
                                jnp.float32)
                bias = jnp.asarray(0.1 * rng.standard_normal(f), jnp.float32)
                tgt = jnp.asarray(rng.standard_normal((b, op.n, f)),
                                  jnp.float32)

                def loss(x_, w_, b_, method):
                    o = cheb_conv(x_, op, w_, b_, method=method,
                                  precision=jax.lax.Precision.HIGHEST)
                    return jnp.sum((o - tgt) ** 2)

                pc.FUSED_SEED_DOT = True
                gf = jax.grad(lambda *a: loss(*a, "pallas"),
                              argnums=(0, 1, 2))(x, w, bias)
                pc.FUSED_SEED_DOT = False
                gs = jax.grad(lambda *a: loss(*a, "pallas"),
                              argnums=(0, 1, 2))(x, w, bias)
                gd = jax.grad(lambda *a: loss(*a, "dense"),
                              argnums=(0, 1, 2))(x, w, bias)
                for a, c, name in zip(gf, gs, ("dx", "dw", "dbias")):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(c), rtol=1e-6, atol=1e-6,
                        err_msg=f"K={K} fused-vs-standalone {name}")
                for a, c, name in zip(gd, gf, ("dx", "dw", "dbias")):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-4,
                        err_msg=f"K={K} fused-vs-dense {name}")
        finally:
            pc.COLMAJOR_VMEM_BUDGET = old_budget
            pc.FUSED_SEED_DOT = old_flag

    def test_input_grad_false_keeps_param_grads(self, big_graph):
        """input_grad=False must leave dw/dbias bit-identical to the full
        backward and return a zero dx (the flag only skips the dead dx
        recurrence — see cheb_conv's caller contract)."""
        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(23)
        K, b, f_in, f_out = 6, 4, 8, 16
        x = jnp.asarray(rng.standard_normal((b, op.n, f_in)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((K, f_in, f_out)),
                        jnp.float32)
        bias = jnp.asarray(0.1 * rng.standard_normal(f_out), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((b, op.n, f_out)), jnp.float32)

        def loss(x_, w_, b_, input_grad):
            o = cheb_conv(x_, op, w_, b_, method="pallas",
                          precision=jax.lax.Precision.HIGHEST,
                          input_grad=input_grad)
            return jnp.sum((o - tgt) ** 2)

        g_full = jax.grad(lambda *a: loss(*a, True),
                          argnums=(0, 1, 2))(x, w, bias)
        g_skip = jax.grad(lambda *a: loss(*a, False),
                          argnums=(0, 1, 2))(x, w, bias)
        np.testing.assert_array_equal(np.asarray(g_full[1]),
                                      np.asarray(g_skip[1]))
        np.testing.assert_array_equal(np.asarray(g_full[2]),
                                      np.asarray(g_skip[2]))
        assert not np.any(np.asarray(g_skip[0]))

    @pytest.mark.parametrize("colmajor", [True, False])
    def test_fused_backward_high_precision(self, big_graph, colmajor):
        """bf16x3 (HIGH) backward through the two-seed kernel stays inside
        the gradient parity budget (both kernel orientations; the real-TPU
        bs16 HIGH config runs row-major)."""
        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(19)
        old_budget = pc.COLMAJOR_VMEM_BUDGET
        if not colmajor:
            pc.COLMAJOR_VMEM_BUDGET = 0
        K, b, f_in, f_out = 6, 4, 8, 16
        x = jnp.asarray(rng.standard_normal((b, op.n, f_in)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((K, f_in, f_out)),
                        jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((b, op.n, f_out)), jnp.float32)

        def loss(x_, method, prec):
            o = cheb_conv(x_, op, w, None, method=method, precision=prec)
            return jnp.sum((o - tgt) ** 2)

        try:
            gd = jax.grad(lambda a: loss(a, "dense",
                                         jax.lax.Precision.HIGHEST))(x)
            gh = jax.grad(lambda a: loss(a, "pallas", "high"))(x)
        finally:
            pc.COLMAJOR_VMEM_BUDGET = old_budget
        scale = np.abs(np.asarray(gd)).max()
        delta = np.abs(np.asarray(gd) - np.asarray(gh)).max()
        assert delta / scale < 1e-3

    def test_odd_feature_width_pads(self, big_graph):
        # F_in = 3 with batch 4 -> C = 12, padded up to the column panel
        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((4, op.n, 3)).astype(np.float32))
        w = jnp.asarray((0.1 * rng.standard_normal((3, 3, 8))).astype(np.float32))
        ref = cheb_conv(x, op, w, None, method="dense",
                        precision=jax.lax.Precision.HIGHEST)
        got = cheb_conv(x, op, w, None, method="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestChebConvFused:
    """The fused kernel is RETIRED from the cheb_method surface (strictly
    dominated — see ops/pallas_fused.py docstring); it stays correct so the
    documented negative result remains executable."""

    def test_not_a_config_method(self, big_graph):
        mesh, adj = big_graph
        op = cheb_operator(adj)
        x = jnp.zeros((2, op.n, 4), jnp.float32)
        w = jnp.zeros((3, 4, 8), jnp.float32)
        with pytest.raises(ValueError, match="retired"):
            cheb_conv(x, op, w, None, method="pallas_fused")

    def test_matches_dense_forward(self, big_graph):
        from meshvae_tpu.ops.pallas_fused import cheb_conv_fused

        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(4)
        for b, f_in, f_out, K in ((4, 8, 16, 4), (4, 16, 32, 6), (8, 16, 3, 5)):
            x = jnp.asarray(rng.standard_normal((b, op.n, f_in)).astype(np.float32))
            w = jnp.asarray((0.1 * rng.standard_normal((K, f_in, f_out))).astype(np.float32))
            bias = jnp.asarray((0.1 * rng.standard_normal(f_out)).astype(np.float32))
            ref = cheb_conv(x, op, w, bias, method="dense",
                            precision=jax.lax.Precision.HIGHEST)
            got = cheb_conv_fused(x, op, w, bias)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"b={b} f={f_in}->{f_out} K={K}")

    def test_gradients_match_dense(self, big_graph):
        from meshvae_tpu.ops.pallas_fused import cheb_conv_fused

        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(5)
        b, f_in, f_out, K = 4, 8, 16, 5
        x = jnp.asarray(rng.standard_normal((b, op.n, f_in)).astype(np.float32))
        w = jnp.asarray((0.1 * rng.standard_normal((K, f_in, f_out))).astype(np.float32))
        bias = jnp.asarray((0.1 * rng.standard_normal(f_out)).astype(np.float32))
        tgt = jnp.asarray(rng.standard_normal((b, op.n, f_out)).astype(np.float32))

        def dense_loss(x_, w_, b_):
            o = cheb_conv(x_, op, w_, b_, method="dense",
                          precision=jax.lax.Precision.HIGHEST)
            return jnp.sum((o - tgt) ** 2)

        def fused_loss(x_, w_, b_):
            return jnp.sum((cheb_conv_fused(x_, op, w_, b_) - tgt) ** 2)

        gd = jax.grad(dense_loss, argnums=(0, 1, 2))(x, w, bias)
        gf = jax.grad(fused_loss, argnums=(0, 1, 2))(x, w, bias)
        for a, c, name in zip(gd, gf, ("dx", "dw", "dbias")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-4,
                err_msg=name)


class TestGroupedKernel:
    """Row-grouped kernel (default): one grid step per output row-block,
    all G block-dots, single write — must equal the per-block kernels
    bit-for-f32-round-off across every seed combination and precision."""

    def test_layout_built(self, big_graph):
        mesh, adj = big_graph
        bsr = to_block_sparse(normalized_neg_adjacency(adj))
        assert bsr.g_idx is not None and bsr.g_width >= 1
        nb = bsr.num_blocks
        g_idx = np.asarray(bsr.g_idx)
        g_bcol = np.asarray(bsr.g_bcol).reshape(g_idx.shape)
        brow = np.asarray(bsr.block_row)
        bcol = np.asarray(bsr.block_col)
        # every real block appears exactly once, in its own row's group
        real = g_idx[g_idx < nb]
        assert sorted(real.tolist()) == list(range(nb))
        for r in range(g_idx.shape[0]):
            for i, bi in enumerate(g_idx[r]):
                if bi < nb:
                    assert brow[bi] == r
                    assert g_bcol[r, i] == bcol[bi]

    def test_matches_per_block_kernels(self, big_graph):
        mesh, adj = big_graph
        bsr = to_block_sparse(normalized_neg_adjacency(adj))
        rng = np.random.default_rng(12)
        x = jnp.asarray(rng.standard_normal((bsr.n_pad, 256)), jnp.float32)
        tp = jnp.asarray(rng.standard_normal((bsr.n_pad, 256)), jnp.float32)
        HI = jax.lax.Precision.HIGHEST
        cases = [
            dict(),
            dict(t_prev=tp, alpha=2.0),
            dict(t_plus=tp, alpha=2.0),
        ]
        old_grouped = pc.GROUPED
        try:
            for prec in (HI, jax.lax.Precision.HIGH):
                for kwargs in cases:
                    pc.GROUPED = True
                    yg = np.asarray(pc._bsr_matmul_impl(bsr, x, prec,
                                                        **kwargs))
                    pc.GROUPED = False
                    yl = np.asarray(pc._bsr_matmul_impl(bsr, x, prec,
                                                        **kwargs))
                    np.testing.assert_allclose(
                        yg, yl, rtol=1e-5, atol=1e-5,
                        err_msg=f"prec={prec} kwargs={sorted(kwargs)}")
        finally:
            pc.GROUPED = old_grouped

    def test_fused_seed_dot_grouped(self, big_graph):
        """t_plus_dot (the lazy in-kernel mix-cotangent seed) through the
        grouped kernel equals the eager standalone dot."""
        mesh, adj = big_graph
        bsr = to_block_sparse(normalized_neg_adjacency(adj))
        rng = np.random.default_rng(13)
        f = 16
        c = 256
        x = jnp.asarray(rng.standard_normal((bsr.n_pad, c)), jnp.float32)
        gm = jnp.asarray(rng.standard_normal((bsr.n_pad, c)), jnp.float32)
        wt = jnp.asarray(rng.standard_normal((f, f)), jnp.float32)
        HI = jax.lax.Precision.HIGHEST
        lazy = np.asarray(pc._bsr_matmul_impl(bsr, x, HI,
                                              t_plus_dot=(gm, wt)))
        cexp = jax.lax.dot_general(
            gm.reshape(bsr.n_pad, c // f, f), wt, (((2,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        ).reshape(bsr.n_pad, c)
        eager = np.asarray(pc._bsr_matmul_impl(bsr, x, HI, t_plus=cexp))
        np.testing.assert_allclose(lazy, eager, rtol=1e-5, atol=1e-5)

    def test_cheb_conv_grads_grouped(self, big_graph):
        """Full conv value + grads, grouped vs dense."""
        mesh, adj = big_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(14)
        b, f_in, f_out, K = 8, 16, 32, 6
        x = jnp.asarray(
            rng.standard_normal((b, op.n, f_in)).astype(np.float32))
        w = jnp.asarray(
            (0.1 * rng.standard_normal((K, f_in, f_out))).astype(np.float32))

        def loss(method):
            def fn(x_, w_):
                o = cheb_conv(x_, op, w_, None, method=method,
                              precision=jax.lax.Precision.HIGHEST)
                return jnp.sum(o ** 2)
            return fn

        vd, gd = jax.value_and_grad(loss("dense"), (0, 1))(x, w)
        vp, gp = jax.value_and_grad(loss("pallas"), (0, 1))(x, w)
        np.testing.assert_allclose(float(vp), float(vd), rtol=1e-5)
        for a, c_, name in zip(gd, gp, ("dx", "dw")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c_),
                                       rtol=1e-3, atol=1e-3, err_msg=name)

    def test_wide_row_falls_back_to_per_block(self):
        """A row spanning more than MAX_GROUP block-columns gets no
        grouped view; the per-block kernels take over transparently."""
        from meshvae_tpu.ops.block_sparse import MAX_GROUP

        n = (MAX_GROUP + 2) * BLOCK
        rng = np.random.default_rng(15)
        dense = np.zeros((n, n), np.float32)
        # first row touches every block column (> MAX_GROUP of them)
        dense[0, :: BLOCK] = 1.0
        dense[:: BLOCK, 0] = 1.0  # keep it symmetric-ish
        bsr = to_block_sparse(sp.csr_matrix(dense))
        assert bsr.g_idx is None and bsr.g_width == 0
        x = jnp.asarray(rng.standard_normal((bsr.n_pad, 128)), jnp.float32)
        y = np.asarray(pc._bsr_matmul_impl(bsr, x,
                                           jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(y[:n], dense @ np.asarray(x)[:n],
                                   rtol=1e-5, atol=1e-5)


class TestEmittedPipelineSpmm:
    def test_matches_grouped_and_dense(self):
        """The emitted-pipeline SpMM spike (benchmarks/emitted_probe.py:
        one grid step per panel, manual double-buffered row-block DMAs)
        must equal the grouped kernel and the dense product — the
        correctness backstop behind the 80k grid-step-roof A/B."""
        from benchmarks.emitted_probe import emitted_spmm

        mesh = make_grid_mesh(32, jitter=0.05)  # 1024 verts, 8 block-rows
        adj = vertex_adjacency(mesh.num_vertices, mesh.f)
        lap = normalized_neg_adjacency(adj)
        bsr = to_block_sparse(lap)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((bsr.n_pad, 256)), jnp.float32)
        y_emit = np.asarray(emitted_spmm(bsr, x, interpret=True))
        y_grp = np.asarray(pc._bsr_matmul_impl(bsr, x,
                                               jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(y_emit, y_grp, rtol=1e-5, atol=1e-5)
        dense = bsr_to_dense(bsr)
        np.testing.assert_allclose(
            y_emit[:bsr.n], dense @ np.asarray(x)[:bsr.n],
            rtol=1e-4, atol=1e-4)


class TestMultiRowGrouped:
    """Multi-row grouped kernel (GROUP_ROWS > 1): R row-blocks per grid
    step — the narrow-panel regime's answer to the ~0.45us per-step cost
    (small batch, big meshes). Must equal the single-row grouped kernel
    across seed combos and precisions, and through full conv grads."""

    @pytest.fixture(scope="class")
    def wide_graph(self):
        mesh = make_grid_mesh(32, jitter=0.05)  # 1024 verts -> 8 block-rows
        adj = vertex_adjacency(mesh.num_vertices, mesh.f)
        return mesh, adj

    def test_matches_single_row(self, wide_graph):
        mesh, adj = wide_graph
        bsr = to_block_sparse(normalized_neg_adjacency(adj))
        assert bsr.n_pad // BLOCK == 8
        rng = np.random.default_rng(21)
        x = jnp.asarray(rng.standard_normal((bsr.n_pad, 256)), jnp.float32)
        tp = jnp.asarray(rng.standard_normal((bsr.n_pad, 256)), jnp.float32)
        HI = jax.lax.Precision.HIGHEST
        cases = [
            dict(),
            dict(t_prev=tp, alpha=2.0),
            dict(t_plus=tp, alpha=2.0),
        ]
        old = pc.GROUP_ROWS
        try:
            for prec in (HI, jax.lax.Precision.HIGH):
                for kwargs in cases:
                    pc.GROUP_ROWS = 1
                    y1 = np.asarray(pc._bsr_matmul_impl(bsr, x, prec,
                                                        **kwargs))
                    for r in (2, 4, 8):
                        pc.GROUP_ROWS = r
                        yr = np.asarray(pc._bsr_matmul_impl(bsr, x, prec,
                                                            **kwargs))
                        np.testing.assert_allclose(
                            yr, y1, rtol=1e-5, atol=1e-5,
                            err_msg=f"R={r} prec={prec} "
                                    f"kwargs={sorted(kwargs)}")
        finally:
            pc.GROUP_ROWS = old

    def test_pick_group_rows_rules(self):
        # respects divisibility: prime row count -> 1
        assert pc._pick_group_rows(157, 4, 256, False, 1 << 20) == 1
        # panel at the sweet spot -> no multi-row (flagship regime)
        assert pc._pick_group_rows(40, 4, pc.GROUP_MAX_PANEL, False,
                                   1 << 20) == 1
        # narrow panel -> largest divisor under the work cap
        r = pc._pick_group_rows(40, 4, 256, False, 1 << 20)
        assert r > 1 and 40 % r == 0 and r * 256 <= pc.GROUP_MAX_PANEL
        # operand ceiling binds in HIGH mode (2x slab refs)
        r_high = pc._pick_group_rows(40, 4, 256, True, 1 << 20)
        assert r_high * 4 * 2 <= pc._GROUP_MAX_OPERANDS
        # VMEM budget binds: huge per-row cost -> 1
        assert pc._pick_group_rows(40, 4, 128, False,
                                   pc.GROUP_VMEM_BUDGET) == 1
        # an explicit GROUP_ROWS override still clamps to the VMEM budget
        # (round-3 advisor finding: oversized sweep values must degrade,
        # not hit Mosaic VMEM exhaustion)
        old = pc.GROUP_ROWS
        pc.GROUP_ROWS = 64
        try:
            per_row = pc.GROUP_VMEM_BUDGET // 4  # budget caps at 4 rows
            r_env = pc._pick_group_rows(40, 4, 128, False, per_row)
            assert r_env <= 4 and 40 % r_env == 0
        finally:
            pc.GROUP_ROWS = old

    def test_row_multiple_padding(self):
        """Row counts are padded to a multiple of 8 when the overhead is
        <= 5% (the 20k template's 157 prime rows -> 160), never on small
        operators, and the padded rows are explicit zero blocks."""
        n_small = 10 * BLOCK  # 10 rows: 60% overhead, no padding
        bsr_small = to_block_sparse(sp.eye(n_small, format="csr"))
        assert bsr_small.n_pad == n_small
        n_big = 157 * BLOCK  # 1.9% overhead: padded to 160 rows
        bsr_big = to_block_sparse(sp.eye(n_big, format="csr"))
        assert bsr_big.n_pad == 160 * BLOCK
        assert bsr_big.g_idx.shape[0] == 160
        # padded rows produce zero output
        x = jnp.ones((bsr_big.n_pad, 128), jnp.float32)
        y = np.asarray(pc._bsr_matmul_impl(bsr_big, x,
                                           jax.lax.Precision.HIGHEST))
        np.testing.assert_allclose(y[:n_big], 1.0)
        np.testing.assert_allclose(y[n_big:], 0.0)

    def test_conv_grads_multirow(self, wide_graph):
        """Full conv value + grads with a forced multi-row kernel vs
        dense (exercises the fused backward's two-seed multi-row path)."""
        mesh, adj = wide_graph
        op = cheb_operator(adj)
        rng = np.random.default_rng(22)
        b, f_in, f_out, K = 8, 16, 32, 6
        x = jnp.asarray(
            rng.standard_normal((b, op.n, f_in)).astype(np.float32))
        w = jnp.asarray(
            (0.1 * rng.standard_normal((K, f_in, f_out))).astype(np.float32))

        def loss(method):
            def fn(x_, w_):
                o = cheb_conv(x_, op, w_, None, method=method,
                              precision=jax.lax.Precision.HIGHEST)
                return jnp.sum(o ** 2)
            return fn

        old = pc.GROUP_ROWS
        try:
            pc.GROUP_ROWS = 4
            vp, gp = jax.value_and_grad(loss("pallas"), (0, 1))(x, w)
        finally:
            pc.GROUP_ROWS = old
        vd, gd = jax.value_and_grad(loss("dense"), (0, 1))(x, w)
        np.testing.assert_allclose(float(vp), float(vd), rtol=1e-5)
        for a, c_, name in zip(gd, gp, ("dx", "dw")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c_),
                                       rtol=1e-3, atol=1e-3, err_msg=name)


class TestRowPaddedOperators:
    """Operators whose BSR row count was padded to a multiple of 8 (the
    multi-row grouped kernel's divisor rule) must stay correct through
    every kernel entry point that computes its own layout from the
    operator — the fused design-record kernel regressed here once by
    recomputing roundup(n, BLOCK) instead of using bsr.n_pad."""

    def _padded_op(self):
        # 141 block-rows (prime-ish, 2.1% overhead) -> padded to 144
        n = 141 * BLOCK
        lap = sp.eye(n, format="csr") * 0.5
        bsr = to_block_sparse(lap)
        assert bsr.n_pad == 144 * BLOCK
        return n, lap, bsr

    def test_fused_kernel_padded_rows(self):
        from meshvae_tpu.ops.graph import GraphOperator
        from meshvae_tpu.ops.pallas_fused import cheb_conv_fused

        n, lap, bsr = self._padded_op()
        op = GraphOperator(dense=None, ell_idx=None, ell_w=None, bsr=bsr,
                           n=n)
        rng = np.random.default_rng(31)
        b, f, k = 1, 8, 2
        x = jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((k, f, f)), jnp.float32)
        got = cheb_conv_fused(x, op, w, None,
                              precision=jax.lax.Precision.HIGHEST)
        # L = 0.5 I: out = x @ W0 + 0.5 x @ W1 everywhere, incl. the
        # last real row-block (the regression corrupted rows past
        # n - BLOCK via clamped out-of-range output indices)
        expected = np.asarray(x) @ np.asarray(w[0]) \
            + 0.5 * np.asarray(x) @ np.asarray(w[1])
        np.testing.assert_allclose(np.asarray(got), expected,
                                   rtol=1e-5, atol=1e-5)
        # and the backward path pads consistently (used to assert)
        g = jax.grad(lambda x_: jnp.sum(
            cheb_conv_fused(x_, op, w, None,
                            precision=jax.lax.Precision.HIGHEST) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestPoolKernelTransposeGrad:
    """High-fan-in pool transposes (> graph.TGRAD_ELL_MAX) run their
    backward dx = P^T @ g through the rectangular block-sparse kernel
    instead of unrolled ELL gathers (ops/pool.py). Gradients must equal
    the dense path exactly."""

    def test_high_fanin_backward_matches_dense(self):
        from meshvae_tpu.ops.graph import TGRAD_ELL_MAX, pool_operator
        from meshvae_tpu.ops.pool import pool_apply

        rng = np.random.default_rng(41)
        n_fine, n_coarse = 300, 40
        rows = np.repeat(np.arange(n_fine), 3)
        cols = rng.integers(0, n_coarse, size=3 * n_fine)
        u = sp.csr_matrix((rng.random(3 * n_fine), (rows, cols)),
                          shape=(n_fine, n_coarse))
        pool = pool_operator(u)
        # fan-in exceeds the ELL cutoff -> kernel-transpose layout built
        # (the ELL transpose stays as the sharded/CPU fallback)
        assert pool.t_idx is not None and pool.t_bsr is not None
        assert int(np.diff(sp.csr_matrix(u.T).indptr).max()) > TGRAD_ELL_MAX
        b, f = 8, 16  # b*f = 128: panel-aligned
        x = jnp.asarray(rng.standard_normal((b, n_coarse, f)), jnp.float32)
        g_out = jnp.asarray(rng.standard_normal((b, n_fine, f)), jnp.float32)

        def loss(method):
            def fn(x_):
                out = pool_apply(x_, pool, method=method,
                                 precision=jax.lax.Precision.HIGHEST)
                return jnp.sum(out * g_out)
            return fn

        gg = jax.grad(loss("gather"))(x)  # interpret-mode kernel backward
        gd = jax.grad(loss("dense"))(x)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gd),
                                   rtol=2e-5, atol=2e-5)
        expected = np.einsum("mn,bmf->bnf", u.toarray(), np.asarray(g_out))
        np.testing.assert_allclose(np.asarray(gg), expected,
                                   rtol=2e-5, atol=2e-5)

    def test_small_batch_falls_back(self):
        """b*f below one column panel: the kernel path is skipped and the
        backward still matches dense (autodiff scatter fallback)."""
        from meshvae_tpu.ops.graph import pool_operator
        from meshvae_tpu.ops.pool import pool_apply

        rng = np.random.default_rng(42)
        rows = np.repeat(np.arange(100), 3)
        cols = rng.integers(0, 5, size=300)
        u = sp.csr_matrix((rng.random(300), (rows, cols)), shape=(100, 5))
        pool = pool_operator(u)
        assert pool.t_bsr is not None
        x = jnp.asarray(rng.standard_normal((2, 5, 3)), jnp.float32)

        def fn(x_):
            return jnp.sum(pool_apply(x_, pool) ** 2)

        def fd(x_):
            return jnp.sum(pool_apply(x_, pool, method="dense",
                           precision=jax.lax.Precision.HIGHEST) ** 2)

        np.testing.assert_allclose(np.asarray(jax.grad(fn)(x)),
                                   np.asarray(jax.grad(fd)(x)),
                                   rtol=2e-5, atol=2e-5)
