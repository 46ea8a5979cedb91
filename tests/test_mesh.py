"""Unit tests for the host-side mesh layer: I/O, connectivity, QSlim,
barycentric transfer, hierarchy, Procrustes."""
import os

import numpy as np
import pytest
import scipy.sparse as sp

from meshvae_tpu.mesh.connectivity import edge_list, unique_edges, vertex_adjacency
from meshvae_tpu.mesh.hierarchy import build_hierarchy, load_or_build_hierarchy
from meshvae_tpu.mesh.io import TriMesh, load_obj, save_obj
from meshvae_tpu.mesh.procrustes import procrustes_align
from meshvae_tpu.mesh.qslim import decimate_by_factor, face_quadrics, qslim_decimate
from meshvae_tpu.mesh.transfer import barycentric_transfer, closest_point_triangle

from conftest import make_grid_mesh


class TestIO:
    def test_roundtrip(self, tmp_path, grid_mesh):
        path = os.path.join(tmp_path, "m.obj")
        save_obj(path, grid_mesh.v, grid_mesh.f)
        back = load_obj(path)
        np.testing.assert_allclose(back.v, grid_mesh.v, atol=1e-5)
        np.testing.assert_array_equal(back.f, grid_mesh.f)

    def test_template_loads(self, template_mesh):
        assert template_mesh.v.shape == (4998, 3)
        assert template_mesh.f.shape == (9996, 3)

    def test_face_formats(self, tmp_path):
        path = os.path.join(tmp_path, "fmt.obj")
        with open(path, "w") as fp:
            fp.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n")
            fp.write("f 1/1 2/2/2 3//3\nf 2 4 3\n")
        mesh = load_obj(path)
        assert mesh.f.tolist() == [[0, 1, 2], [1, 3, 2]]

    def test_parser_tiers_agree(self, tmp_path, grid_mesh):
        """load_obj has three tiers (native C, vectorized numpy, general
        per-token); on the plain-triangle dialect all available tiers must
        produce identical arrays, and dialect escapes (negative indices,
        polygons, texture indices, w components, comments) must route to
        the general parser with correct results."""
        from meshvae_tpu.mesh.io import _parse_obj_fast
        from meshvae_tpu.native import obj_parse_native

        path = os.path.join(tmp_path, "plain.obj")
        save_obj(path, grid_mesh.v, grid_mesh.f, comment="tier check")
        fast_v, fast_f = _parse_obj_fast(open(path).read())
        assert fast_v is not None
        np.testing.assert_allclose(fast_v, load_obj(path).v, atol=0)
        np.testing.assert_array_equal(fast_f, load_obj(path).f)
        native = obj_parse_native(path)
        if native is not None:  # library built
            np.testing.assert_allclose(native[0], fast_v, atol=0)
            np.testing.assert_array_equal(native[1], fast_f)

        # numeric edge cases through the native parser's exact fixed-point
        # fast path AND its strtod fallback (exponents, >15-digit
        # mantissas): values must be BIT-identical to Python float() —
        # the hierarchy goldens hash vertex bits
        hard = ("v 1e-3 -2.5E2 0.125\n"
                "v 0.1234567890123456789 -3. .5\n"
                "v -0 16777217.125 9.999999999999999\n"
                "f 1 2 3\n")
        p = os.path.join(tmp_path, "hard.obj")
        with open(p, "w") as fp:
            fp.write(hard)
        expect = np.array(
            [[1e-3, -2.5e2, 0.125],
             [0.1234567890123456789, -3.0, 0.5],
             [-0.0, 16777217.125, 9.999999999999999]])
        np.testing.assert_array_equal(load_obj(p).v, expect)
        native_hard = obj_parse_native(p)
        if native_hard is not None:
            np.testing.assert_array_equal(native_hard[0], expect)

        # dialect escapes: every tier must decline, general parser handles
        escapes = {
            "neg.obj": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n",
                        [[0, 1, 2]]),
            "quad.obj": ("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n",
                         [[0, 1, 2], [0, 2, 3]]),
            "tex.obj": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/1 2/2 3/3\n",
                        [[0, 1, 2]]),
            "w.obj": ("v 0 0 0 1.0\nv 1 0 0 1.0\nv 0 1 0 1.0\nf 1 2 3\n",
                      [[0, 1, 2]]),
        }
        for name, (text, faces) in escapes.items():
            p = os.path.join(tmp_path, name)
            with open(p, "w") as fp:
                fp.write(text)
            assert _parse_obj_fast(text)[0] is None, name
            assert obj_parse_native(p) is None, name
            assert load_obj(p).f.tolist() == faces, name

        # a >18-digit face index must DECLINE (not silently split into
        # several bogus indices at the digit cap) so the general parser
        # surfaces a loud failure instead of corrupt connectivity
        p = os.path.join(tmp_path, "bigidx.obj")
        with open(p, "w") as fp:
            fp.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                     "f 100000000000000000012 3 1\n")
        assert obj_parse_native(p) is None
        with pytest.raises(Exception):
            load_obj(p)


class TestConnectivity:
    def test_single_triangle(self):
        adj = vertex_adjacency(3, np.array([[0, 1, 2]]))
        dense = adj.toarray()
        assert (dense > 0).sum() == 6  # 3 undirected edges
        assert np.allclose(dense, dense.T)
        assert np.all(np.diag(dense) == 0)

    def test_grid_edge_count(self, grid_mesh):
        edges = unique_edges(grid_mesh.num_vertices, grid_mesh.f)
        n = 8
        expected = 2 * n * (n - 1) + (n - 1) ** 2  # grid + diagonals
        assert edges.shape == (expected, 2)
        assert np.all(edges[:, 0] < edges[:, 1])

    def test_edge_list_strips_self_loops(self):
        adj = sp.csr_matrix(np.array([[1.0, 2.0], [2.0, 0.0]]))
        edges = edge_list(adj)
        assert edges.tolist() == [[0, 1], [1, 0]]


class TestQSlim:
    def test_quadric_zero_on_plane(self, grid_mesh):
        flat = make_grid_mesh(6, jitter=0.0)
        quadrics = face_quadrics(flat.v, flat.f)
        # every vertex lies in the z=0 plane of every incident face -> cost 0
        homo = np.concatenate([flat.v, np.ones((flat.num_vertices, 1))], axis=1)
        costs = np.einsum("ni,nij,nj->n", homo, quadrics, homo)
        np.testing.assert_allclose(costs, 0.0, atol=1e-9)

    def test_decimation_reaches_target(self, grid_mesh):
        new_f, down = qslim_decimate(grid_mesh.v, grid_mesh.f, 16)
        kept = np.unique(new_f)
        assert kept.shape[0] <= 16
        assert down.shape == (kept.shape[0], grid_mesh.num_vertices)
        # D rows are one-hot selections
        assert np.all(down.toarray().sum(axis=1) == 1)
        assert np.all((down.toarray() == 0) | (down.toarray() == 1))

    def test_no_degenerate_faces(self, grid_mesh):
        new_f, _ = decimate_by_factor(grid_mesh.v, grid_mesh.f, 4.0)
        assert np.all(new_f[:, 0] != new_f[:, 1])
        assert np.all(new_f[:, 1] != new_f[:, 2])
        assert np.all(new_f[:, 2] != new_f[:, 0])

    def test_deterministic(self, grid_mesh):
        f1, d1 = decimate_by_factor(grid_mesh.v, grid_mesh.f, 4.0)
        f2, d2 = decimate_by_factor(grid_mesh.v, grid_mesh.f, 4.0)
        np.testing.assert_array_equal(f1, f2)
        assert (d1 != d2).nnz == 0


class TestTransfer:
    def test_closest_point_regions(self):
        a, b, c = np.zeros(3), np.array([1.0, 0, 0]), np.array([0, 1.0, 0])
        # interior
        q, w = closest_point_triangle(np.array([0.25, 0.25, 1.0]), a, b, c)
        np.testing.assert_allclose(q, [0.25, 0.25, 0.0], atol=1e-12)
        np.testing.assert_allclose(w, [0.5, 0.25, 0.25], atol=1e-12)
        # vertex region
        q, w = closest_point_triangle(np.array([-1.0, -1.0, 0.0]), a, b, c)
        np.testing.assert_allclose(q, a, atol=1e-12)
        assert w == (1.0, 0.0, 0.0)
        # edge region
        q, w = closest_point_triangle(np.array([0.5, -1.0, 0.0]), a, b, c)
        np.testing.assert_allclose(q, [0.5, 0.0, 0.0], atol=1e-12)
        np.testing.assert_allclose(w, [0.5, 0.5, 0.0], atol=1e-12)

    def test_rows_are_affine(self, grid_mesh):
        new_f, down = decimate_by_factor(grid_mesh.v, grid_mesh.f, 4.0)
        coarse_v = down @ grid_mesh.v
        u = barycentric_transfer(coarse_v, new_f, grid_mesh.v)
        np.testing.assert_allclose(np.asarray(u.sum(axis=1)).ravel(), 1.0,
                                   atol=1e-9)
        assert u.shape == (grid_mesh.num_vertices, coarse_v.shape[0])

    def test_identity_on_source_vertices(self, grid_mesh):
        # transferring the source's own vertices reproduces them exactly
        u = barycentric_transfer(grid_mesh.v, grid_mesh.f, grid_mesh.v)
        np.testing.assert_allclose(u @ grid_mesh.v, grid_mesh.v, atol=1e-9)


class TestHierarchy:
    def test_levels_shrink(self, grid_mesh):
        hier = build_hierarchy(grid_mesh, [2, 2])
        assert hier.num_levels == 3
        assert hier.levels[0] == 64
        assert hier.levels[1] <= 33  # ceil(64/2) + possible early stop
        assert hier.levels[2] <= 17
        for i in range(2):
            assert hier.downsample[i].shape == (hier.levels[i + 1], hier.levels[i])
            assert hier.upsample[i].shape == (hier.levels[i], hier.levels[i + 1])

    def test_cache_roundtrip(self, tmp_path, grid_mesh):
        h1 = load_or_build_hierarchy(grid_mesh, [2], cache_dir=str(tmp_path))
        h2 = load_or_build_hierarchy(grid_mesh, [2], cache_dir=str(tmp_path))
        assert h1.levels == h2.levels
        for a, b in zip(h1.adjacency, h2.adjacency):
            assert (a != b).nnz == 0
        for a, b in zip(h1.upsample, h2.upsample):
            assert abs(a - b).max() < 1e-12


class TestProcrustes:
    def test_inverse_roundtrip(self, grid_mesh):
        rng = np.random.default_rng(1)
        template = grid_mesh.v + rng.standard_normal(grid_mesh.v.shape) * 0.1
        # random similarity transform of the template
        theta = 0.7
        rot = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1.0],
        ])
        points = (template @ rot.T) * 2.5 + np.array([3.0, -1.0, 0.5])

        aligned, (r, s, m), disparity = procrustes_align(template, points)
        recovered = aligned @ r * s + m
        np.testing.assert_allclose(recovered, points, atol=1e-8)

    def test_matches_scipy_normalization(self, grid_mesh):
        from scipy.spatial import procrustes as scipy_procrustes
        rng = np.random.default_rng(2)
        a = rng.standard_normal((50, 3))
        b = rng.standard_normal((50, 3))
        aligned, _, disparity = procrustes_align(a, b)
        _, mtx2, disp_ref = scipy_procrustes(a, b)
        np.testing.assert_allclose(aligned, mtx2, atol=1e-10)
        np.testing.assert_allclose(disparity, disp_ref, atol=1e-10)


class TestRcmReorder:
    """reorder_vertices_rcm: pure relabeling that restores block locality
    after midpoint subdivision (the scaled templates are generated with
    it — raw subdivision appends midpoints at the end and inflates the
    occupied operator blocks ~8x at 20k)."""

    def test_same_surface_and_topology(self):
        from meshvae_tpu.mesh.subdivide import (reorder_vertices_rcm,
                                                subdivide_midpoint)

        mesh = make_grid_mesh(9, jitter=0.03)
        sub = subdivide_midpoint(mesh)
        re = reorder_vertices_rcm(sub)
        assert re.num_vertices == sub.num_vertices
        assert re.num_faces == sub.num_faces
        # same vertex set (relabeled), same edge set under the relabeling
        a = np.asarray(sorted(map(tuple, np.asarray(sub.v).tolist())))
        b = np.asarray(sorted(map(tuple, np.asarray(re.v).tolist())))
        np.testing.assert_allclose(a, b)

        def edge_set(m):
            f = np.asarray(m.f)
            e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
            e = np.sort(e, axis=1)
            v = np.asarray(m.v)
            # geometric edge set (midpoint coordinates are unique here)
            return {tuple(np.round((v[i] + v[j]) / 2, 9)) for i, j in e}

        assert edge_set(sub) == edge_set(re)

    def test_reduces_block_count(self):
        import scipy.sparse as sp

        from meshvae_tpu.mesh.connectivity import vertex_adjacency
        from meshvae_tpu.mesh.subdivide import (reorder_vertices_rcm,
                                                subdivide_midpoint)

        mesh = subdivide_midpoint(make_grid_mesh(12, jitter=0.0))

        def blocks(m):
            adj = sp.coo_matrix(vertex_adjacency(m.num_vertices, m.f))
            return len({(r // 128, c // 128)
                        for r, c in zip(adj.row, adj.col)})

        assert blocks(reorder_vertices_rcm(mesh)) < blocks(mesh)
