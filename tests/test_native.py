"""Native C++ core vs. numpy fallback — both paths must agree to ~1e-12."""

import numpy as np
import pytest

from dealii_spirk_tpu import tables as T
from dealii_spirk_tpu.fem import assembly as asm
from dealii_spirk_tpu.fem import basis
from dealii_spirk_tpu.native import core

nc = core()
pytestmark = pytest.mark.skipif(
    nc is None, reason="native core unavailable (no g++?)"
)


def test_gauss_legendre_matches():
    for n in (2, 3, 5, 8):
        x, w = nc.gauss_legendre(n)
        x2, w2 = basis.gauss_legendre_01(n)
        np.testing.assert_allclose(x, x2, atol=1e-14)
        np.testing.assert_allclose(w, w2, atol=1e-14)


def test_gauss_lobatto_matches():
    for p in (1, 2, 3, 4):
        np.testing.assert_allclose(
            nc.gauss_lobatto(p), basis.gauss_lobatto_01(p), atol=1e-14
        )


def test_local_matrices_match():
    for p in (1, 2, 3, 4):
        m, k = nc.local_matrices(p)
        m2, k2 = asm.local_matrices(p)
        np.testing.assert_allclose(m, m2, atol=1e-13)
        np.testing.assert_allclose(k, k2, atol=1e-12)


def test_band_assembly_matches():
    m2, _ = asm.local_matrices(2)
    np.testing.assert_allclose(
        nc.assemble_band_1d(8, 2, m2, 0.125),
        asm.assemble_band_1d(8, 2, m2, 0.125),
        atol=1e-14,
    )


def test_prolongation_matches():
    for p in (1, 2, 3):
        np.testing.assert_allclose(
            nc.prolongation_1d(4, p), asm.prolongation_1d(4, p), atol=1e-13
        )


@pytest.mark.parametrize("s", [2, 3, 5, 8, 10])
def test_radau_tables_match_numpy(s):
    t = nc.radau_tables(s)
    A, b, c = T.radau_iia(s)
    np.testing.assert_allclose(t["A"], A, atol=1e-12)
    np.testing.assert_allclose(t["b"], b, atol=1e-12)
    np.testing.assert_allclose(t["c"], c, atol=1e-13)
    np.testing.assert_allclose(t["A_inv"], np.linalg.inv(A), atol=1e-9)
    # consistency of the real diagonalization
    np.testing.assert_allclose(
        t["T"] @ np.diag(t["D"]) @ t["T_inv"], t["L"], atol=1e-9
    )
    np.testing.assert_allclose(t["L"], np.tril(t["L"]), atol=1e-12)


@pytest.mark.parametrize("s", [2, 3, 4, 5, 7, 9, 10])
def test_native_complex_tables(s):
    A, b, c = T.radau_iia(s)
    A_inv = np.linalg.inv(A)
    ct = nc.complex_tables(A_inv)
    V = ct["T_re"] + 1j * ct["T_im"]
    Vi = ct["T_inv_re"] + 1j * ct["T_inv_im"]
    w = ct["D_re"] + 1j * ct["D_im"]
    np.testing.assert_allclose(V @ np.diag(w) @ Vi, A_inv, atol=1e-8)
    # pair conventions: adjacent conjugates, +imag first, |lambda|^2 sorted
    for i in range(0, s - 1, 2):
        assert abs(w[i].conj() - w[i + 1]) < 1e-8 or abs(w[i].imag) < 1e-10
        assert w[i].imag >= -1e-12
    mag = np.abs(w) ** 2
    assert all(mag[i] >= mag[i + 1] - 1e-8 for i in range(s - 1))
