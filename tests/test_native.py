"""Native (C++) mesh-ops parity vs the pure-python reference implementations."""
import numpy as np
import pytest

from conftest import make_grid_mesh


@pytest.fixture(scope="module")
def native_lib():
    try:
        from meshvae_tpu.native.build import build
        build()
    except Exception as exc:  # no compiler in env -> skip, don't fail
        pytest.skip(f"native build unavailable: {exc}")
    from meshvae_tpu import native
    if not native.available():
        pytest.skip("libmeshops.so failed to load")
    return native


class TestNativeQSlim:
    def test_identical_to_python(self, native_lib):
        from meshvae_tpu.mesh import qslim
        mesh = make_grid_mesh(12, jitter=0.05)
        f_py, d_py = qslim.qslim_decimate(mesh.v, mesh.f, 36,
                                          use_native="never")
        f_nat, d_nat = qslim.qslim_decimate(mesh.v, mesh.f, 36,
                                            use_native="always")
        assert d_py.shape == d_nat.shape
        assert (d_py != d_nat).nnz == 0
        np.testing.assert_array_equal(f_py, f_nat)

    def test_target_reached(self, native_lib):
        from meshvae_tpu.mesh import qslim
        mesh = make_grid_mesh(10, jitter=0.02)
        f_nat, d_nat = qslim.qslim_decimate(mesh.v, mesh.f, 25,
                                            use_native="always")
        assert d_nat.shape[0] <= 25
        assert np.all(np.asarray(d_nat.sum(axis=1)).ravel() == 1)


class TestNativeTransfer:
    def test_matches_python(self, native_lib):
        from meshvae_tpu.mesh import qslim, transfer
        mesh = make_grid_mesh(12, jitter=0.05)
        f, d = qslim.qslim_decimate(mesh.v, mesh.f, 36, use_native="always")
        coarse_v = d @ mesh.v
        u_py = transfer.barycentric_transfer(coarse_v, f, mesh.v,
                                             use_native="never")
        u_nat = transfer.barycentric_transfer(coarse_v, f, mesh.v,
                                              use_native="always")
        np.testing.assert_allclose(np.asarray(u_nat.sum(axis=1)).ravel(), 1.0,
                                   atol=1e-9)
        # same closest faces -> same sparse entries (tolerance for fp ties)
        diff = abs(u_py - u_nat)
        assert diff.max() < 1e-6 if diff.nnz else True

    def test_identity_on_source_vertices(self, native_lib):
        from meshvae_tpu.mesh import transfer
        mesh = make_grid_mesh(9, jitter=0.05)
        u = transfer.barycentric_transfer(mesh.v, mesh.f, mesh.v,
                                          use_native="always")
        np.testing.assert_allclose(u @ mesh.v, mesh.v, atol=1e-9)
