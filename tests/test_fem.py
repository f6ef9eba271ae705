"""Tests for the 1D FEM assembly layer."""

import numpy as np
import pytest

from dealii_spirk_tpu.fem.assembly import (
    band_to_dense,
    evaluation_operator,
    interior_nodes_1d,
    local_matrices,
    prolongation_1d,
)
from dealii_spirk_tpu.fem.basis import (
    gauss_legendre_01,
    gauss_lobatto_01,
    lagrange_deriv_matrix,
    lagrange_matrix,
)
from dealii_spirk_tpu.fem.grid import make_level, make_space


def test_gauss_legendre_exactness():
    x, w = gauss_legendre_01(3)
    for k in range(6):
        np.testing.assert_allclose(np.dot(w, x**k), 1 / (k + 1), atol=1e-14)


def test_gauss_lobatto_endpoints():
    for p in range(1, 6):
        pts = gauss_lobatto_01(p)
        assert len(pts) == p + 1
        assert pts[0] == 0.0 and pts[-1] == 1.0
    np.testing.assert_allclose(gauss_lobatto_01(2), [0, 0.5, 1], atol=1e-14)


def test_lagrange_partition_of_unity():
    nodes = gauss_lobatto_01(4)
    x = np.linspace(0, 1, 17)
    E = lagrange_matrix(nodes, x)
    np.testing.assert_allclose(E.sum(axis=1), 1.0, atol=1e-12)
    D = lagrange_deriv_matrix(nodes, x)
    np.testing.assert_allclose(D.sum(axis=1), 0.0, atol=1e-10)


def test_local_matrices_p1():
    m, k = local_matrices(1)
    np.testing.assert_allclose(m, [[1 / 3, 1 / 6], [1 / 6, 1 / 3]], atol=1e-14)
    np.testing.assert_allclose(k, [[1, -1], [-1, 1]], atol=1e-14)


def test_assembled_p1_stencil():
    lev = make_level(3, 1)  # 8 cells, h = 1/8
    h = lev.h
    A = band_to_dense(lev.mass_band)
    # interior row of the 1D P1 mass matrix: h/6, 2h/3, h/6
    np.testing.assert_allclose(A[3, 2:5], [h / 6, 2 * h / 3, h / 6], atol=1e-14)
    K = band_to_dense(lev.stiff_band)
    np.testing.assert_allclose(K[3, 2:5], [-1 / h, 2 / h, -1 / h], atol=1e-12)


@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_mass_total(p):
    # sum of all entries of the full mass matrix = measure of domain; on the
    # interior block, test against a smooth integral instead:
    lev = make_level(4, p)
    M = band_to_dense(lev.mass_band)
    u = np.sin(np.pi * lev.x)
    # u^T M u ~ int sin(pi x)^2 = 1/2 up to interpolation error
    np.testing.assert_allclose(u @ M @ u, 0.5, rtol=10.0 ** (-p - 1))


@pytest.mark.parametrize("p", [1, 2, 3])
def test_laplace_rayleigh_quotient(p):
    lev = make_level(4, p)
    K = band_to_dense(lev.stiff_band)
    M = band_to_dense(lev.mass_band)
    u = np.sin(np.pi * lev.x)
    rq = (u @ K @ u) / (u @ M @ u)
    np.testing.assert_allclose(rq, np.pi**2, rtol=10.0 ** (-p - 1))


@pytest.mark.parametrize("p", [2, 3])
def test_prolongation_exact_for_polynomials(p):
    # x(1-x) is in Q_p globally for p >= 2 and vanishes on the boundary
    nc = 4
    P = prolongation_1d(nc, p)
    xc = interior_nodes_1d(nc, p)
    xf = interior_nodes_1d(2 * nc, p)
    f = lambda x: x * (1 - x)
    np.testing.assert_allclose(P @ f(xc), f(xf), atol=1e-12)


def test_prolongation_p1_midpoints():
    nc = 4
    P = prolongation_1d(nc, 1)
    xc = interior_nodes_1d(nc, 1)
    xf = interior_nodes_1d(2 * nc, 1)
    uc = np.sin(np.pi * xc)
    uf = P @ uc
    # fine nodes at coarse positions keep their values
    for i, x in enumerate(xf):
        j = np.where(np.isclose(xc, x))[0]
        if len(j):
            np.testing.assert_allclose(uf[i], uc[j[0]], atol=1e-14)
    # midpoints are averages of neighbors (hat-function interpolation)
    assert np.isclose(xf[0], xc[0] / 2)
    np.testing.assert_allclose(uf[0], uc[0] / 2, atol=1e-14)


def test_evaluation_operator_integrates():
    E, xq, wq = evaluation_operator(8, 2, 4)
    lev = make_level(3, 2)
    u = np.sin(np.pi * lev.x)
    # int u_h ~ int sin(pi x) = 2/pi
    np.testing.assert_allclose(np.dot(wq, E @ u), 2 / np.pi, rtol=1e-5)


def test_make_space():
    sp = make_space(2, 1, 4)
    assert sp.shape == (15, 15)
    assert sp.n_dofs == 17**2
    assert len(sp.levels) == 4  # refinements 1..4 for p=1
    assert len(sp.prolongations) == 3
    sp3 = make_space(3, 2, 3)
    assert sp3.shape == (15, 15, 15)
    assert len(sp3.levels) == 4  # refinements 0..3 for p=2
