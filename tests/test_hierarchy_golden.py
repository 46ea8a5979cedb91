"""Golden parity of the hierarchy builder against the REFERENCE'S OWN code.

Round-1 parity tests compared this repo's model to a torch twin also written
here — a shared misreading would pass silently. These tests import
/root/reference/mesh_operations.py itself (pure numpy/scipy once psbody is
stubbed; the AABB tree is replaced by this repo's exact nearest-surface
query) and assert, on the real template5k with the default factors:

  * mode="reference" QSlim reproduces the reference's D / faces / A
    BIT-FOR-BIT at every level (same collapse order, same quirks);
  * the reference-mode U assembly matches setup_deformation_transfer's
    per-branch coefficients given identical nearest-point data;
  * the default "fast" mode stays within a small bounded divergence of the
    reference hierarchy (documented, not hidden).

Skipped when the reference checkout is not mounted (the repo is standalone).
"""
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

from meshvae_tpu.mesh.connectivity import vertex_adjacency
from meshvae_tpu.mesh.hierarchy import build_hierarchy
from meshvae_tpu.mesh.io import load_obj
from meshvae_tpu.mesh.qslim import decimate_by_factor, qslim_decimate_exact
from meshvae_tpu.mesh.transfer import _nearest_on_surface, classify_part

from conftest import TEMPLATE_PATH, make_grid_mesh

REF_PATH = "/root/reference/mesh_operations.py"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(REF_PATH),
        reason="reference checkout not mounted; golden fixtures unavailable"),
]


class _StubAABBTree:
    """Drop-in for psbody's C++ AABB tree: exact nearest-point-on-surface
    queries from this repo's transfer helper, emitting the (faces, parts,
    points) triple setup_deformation_transfer consumes
    (mesh_operations.py:208-211)."""

    def __init__(self, mesh):
        self.mesh = mesh

    def nearest(self, target_v, want_parts):
        assert want_parts
        t = np.asarray(target_v, dtype=np.float64)
        faces = np.zeros(t.shape[0], dtype=np.int64)
        parts = np.zeros(t.shape[0], dtype=np.int64)
        points = np.zeros_like(t)
        for i, fi, q, w in _nearest_on_surface(
                np.asarray(self.mesh.v, np.float64),
                np.asarray(self.mesh.f, np.int64), t):
            faces[i] = fi
            parts[i] = classify_part(w)
            points[i] = q
        return faces, parts, points


class _StubMesh:
    def __init__(self, v=None, f=None):
        self.v = v
        self.f = f

    def compute_aabb_tree(self):
        return _StubAABBTree(self)


def _load_reference_module():
    pb = types.ModuleType("psbody")
    pbm = types.ModuleType("psbody.mesh")
    pbm.Mesh = _StubMesh
    pb.mesh = pbm
    saved = {k: sys.modules.get(k) for k in ("psbody", "psbody.mesh")}
    sys.modules["psbody"] = pb
    sys.modules["psbody.mesh"] = pbm
    try:
        spec = importlib.util.spec_from_file_location("_ref_mesh_ops", REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


@pytest.fixture(scope="module")
def refmod():
    return _load_reference_module()


@pytest.fixture(scope="module")
def template():
    return load_obj(TEMPLATE_PATH)


FACTORS = [4, 4, 4, 4]


@pytest.fixture(scope="module")
def golden(refmod, template):
    """The reference's own M, A, D, U on template5k / default factors."""
    mesh = _StubMesh(v=np.asarray(template.v, np.float64),
                     f=np.asarray(template.f, np.int64))
    return refmod.generate_transform_matrices(mesh, list(FACTORS))


@pytest.fixture(scope="module")
def ours(template):
    return build_hierarchy(template, FACTORS, mode="reference")


class TestReferenceExactMode:
    def test_downsample_matrices_bitwise(self, golden, ours):
        _, _, ref_d, _ = golden
        assert len(ref_d) == len(ours.downsample)
        for level, (rd, od) in enumerate(zip(ref_d, ours.downsample)):
            assert rd.shape == od.shape, f"level {level}"
            assert np.array_equal(rd.toarray(), od.toarray()), (
                f"D differs at level {level}")

    def test_faces_and_vertices_bitwise(self, golden, ours):
        ref_m, _, _, _ = golden
        for level, rm in enumerate(ref_m):
            assert np.array_equal(np.asarray(rm.f), ours.faces[level]), (
                f"faces differ at level {level}")
            assert np.array_equal(np.asarray(rm.v), ours.vertices[level]), (
                f"vertices differ at level {level}")

    def test_adjacency_bitwise(self, golden, ours):
        _, ref_a, _, _ = golden
        for level, ra in enumerate(ref_a):
            oa = ours.adjacency[level]
            assert ra.shape == oa.shape
            assert np.array_equal(ra.toarray(), oa.toarray()), (
                f"A differs at level {level}")

    def test_upsample_matches_reference_assembly(self, golden, ours):
        """Same nearest-point data drives both assemblies, so the only
        freedom is the branch math — which must agree to fp noise."""
        _, _, _, ref_u = golden
        for level, (ru, ou) in enumerate(zip(ref_u, ours.upsample)):
            assert ru.shape == ou.shape
            delta = np.abs(ru.toarray() - ou.toarray()).max()
            assert delta < 1e-9, f"U delta {delta} at level {level}"

    def test_edge_rows_reproduce_reference_quirk(self, ours):
        """Edge-classified rows use the linear-span lstsq of the reference
        (rows need not sum to 1) — prove the quirk actually fires."""
        row_sums = np.asarray(ours.upsample[0].sum(axis=1)).ravel()
        assert np.abs(row_sums - 1.0).max() > 1e-6, (
            "expected some non-affine (edge-branch) rows")


class TestFastModeDivergenceBound:
    """The default fast mode makes its own near-tie collapse choices; its
    divergence from the reference hierarchy must stay small and visible."""

    def test_grid_exactly_matches(self, refmod):
        mesh = make_grid_mesh(8, jitter=0.05)
        ref_f, ref_d = refmod.qslim_decimator_transformer(
            _StubMesh(v=mesh.v, f=mesh.f), factor=0.5)
        our_f, our_d = decimate_by_factor(mesh.v, mesh.f, 2.0)
        assert np.array_equal(ref_f, our_f)
        assert np.array_equal(ref_d.toarray(), our_d.toarray())

    def test_template_kept_sets_close(self, golden, template):
        ref_m, _, ref_d, _ = golden
        v = np.asarray(template.v, np.float64)
        f = np.asarray(template.f, np.int64)
        for level, rd in enumerate(ref_d):
            _, od = decimate_by_factor(v, f, 4.0)
            ref_kept = np.asarray(rd.tocoo().col)
            our_kept = np.asarray(od.tocoo().col)
            assert ref_kept.size == our_kept.size
            overlap = np.intersect1d(ref_kept, our_kept).size
            assert overlap >= ref_kept.size - 4, (
                f"fast-mode kept-set drift {ref_kept.size - overlap} "
                f"at level {level}")
            # walk down the REFERENCE chain so levels stay comparable
            v = rd.dot(v)
            f = np.asarray(ref_m[level + 1].f)


class TestExactModeUnit:
    def test_exact_equals_reference_single_level(self, refmod):
        mesh = make_grid_mesh(8, jitter=0.3, seed=3)
        target = math.ceil(mesh.v.shape[0] * 0.25)
        ref_f, ref_d = refmod.qslim_decimator_transformer(
            _StubMesh(v=mesh.v, f=mesh.f), factor=0.25)
        our_f, our_d = qslim_decimate_exact(mesh.v, mesh.f, target)
        assert np.array_equal(ref_f, our_f)
        assert np.array_equal(ref_d.toarray(), our_d.toarray())

    def test_quadrics_bitwise(self, refmod):
        from meshvae_tpu.mesh.qslim import reference_quadrics
        mesh = make_grid_mesh(6, jitter=0.2, seed=1)
        ref_q = refmod.vertex_quadrics(_StubMesh(v=mesh.v, f=mesh.f))
        our_q = reference_quadrics(mesh.v, mesh.f)
        assert np.array_equal(ref_q, our_q)
