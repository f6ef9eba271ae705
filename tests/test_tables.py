"""Tests for the Radau IIA table layer.

Oracle values come from the mathematical definition of Radau IIA and from
spot-checks against the reference's shipped tables (reference
``tables/A_inv2.txt``, ``tables/D_vec_2.txt``, ...), re-derived here rather
than copied.
"""

import os

import numpy as np
import pytest

from dealii_spirk_tpu.tables import irk_tables, radau_iia, radau_iia_nodes


def test_nodes_s2():
    c = radau_iia_nodes(2)
    np.testing.assert_allclose(c, [1.0 / 3.0, 1.0], atol=1e-14)


def test_nodes_s3():
    c = radau_iia_nodes(3)
    expect = [(4 - np.sqrt(6)) / 10, (4 + np.sqrt(6)) / 10, 1.0]
    np.testing.assert_allclose(c, expect, atol=1e-14)


def test_butcher_s2_known_values():
    A, b, c = radau_iia(2)
    np.testing.assert_allclose(
        A, [[5 / 12, -1 / 12], [3 / 4, 1 / 4]], atol=1e-14
    )
    np.testing.assert_allclose(b, [3 / 4, 1 / 4], atol=1e-14)


def test_a_inv_s2_matches_reference_table():
    # reference tables/A_inv2.txt: [[1.5, 0.5], [-4.5, 2.5]]
    t = irk_tables(2)
    np.testing.assert_allclose(
        t.A_inv, [[1.5, 0.5], [-4.5, 2.5]], atol=1e-12
    )


def test_d_vec_s2_matches_reference_table():
    # reference tables/D_vec_2.txt: [4.0, 1.5] (descending)
    t = irk_tables(2)
    np.testing.assert_allclose(t.D, [4.0, 1.5], atol=1e-12)


@pytest.mark.parametrize("s", [2, 3, 4, 5, 6, 7, 8, 9, 10])
def test_order_conditions(s):
    A, b, c = radau_iia(s)
    # B(p): sum_j b_j c_j^{k-1} = 1/k for k = 1..2s-1
    for k in range(1, 2 * s):
        np.testing.assert_allclose(
            np.dot(b, c ** (k - 1)), 1.0 / k, rtol=1e-9, atol=1e-12
        )
    # C(s): sum_j A_ij c_j^{k-1} = c_i^k / k for k = 1..s
    for k in range(1, s + 1):
        np.testing.assert_allclose(
            A @ (c ** (k - 1)), c**k / k, rtol=1e-9, atol=1e-12
        )


@pytest.mark.parametrize("s", [2, 3, 4, 5, 6, 8, 10])
def test_real_factorization(s):
    t = irk_tables(s)
    np.testing.assert_allclose(t.A @ t.A_inv, np.eye(s), atol=1e-9)
    # T diag(D) T_inv reconstructs the lower-triangular factor L
    np.testing.assert_allclose(
        t.T @ np.diag(t.D) @ t.T_inv, t.L, atol=1e-8
    )
    # L is lower triangular, the omitted U factor is unit upper triangular
    np.testing.assert_allclose(t.L, np.tril(t.L), atol=1e-12)
    U = np.linalg.solve(t.L, t.A_inv)
    np.testing.assert_allclose(np.diag(U), np.ones(s), atol=1e-8)
    np.testing.assert_allclose(U, np.triu(U), atol=1e-8)
    # shifts are real and positive -> shifted operators are SPD
    assert np.all(t.D > 0)


@pytest.mark.parametrize("s", [2, 3, 4, 5, 7, 9])
def test_complex_diagonalization(s):
    t = irk_tables(s)
    V = t.T_re + 1j * t.T_im
    Vinv = t.T_inv_re + 1j * t.T_inv_im
    w = t.D_re + 1j * t.D_im
    np.testing.assert_allclose(V @ np.diag(w) @ Vinv, t.A_inv, atol=1e-8)
    # conjugate pairs adjacent, +imag first; odd s has one trailing real ev
    for i in range(0, s - 1, 2):
        np.testing.assert_allclose(w[i].conj(), w[i + 1], atol=1e-10)
        assert w[i].imag >= 0
        np.testing.assert_allclose(V[:, i].conj(), V[:, i + 1], atol=1e-10)
    if s % 2 == 1:
        assert abs(w[-1].imag) < 1e-10
    # real parts positive (shifted complex operators are coercive)
    assert np.all(t.D_re > 0)
    # |lambda|^2 sorted descending (reference irk_ev.m:57)
    mag = (w * w.conj()).real
    assert np.all(np.diff(mag) <= 1e-9)


def test_n_pairs():
    assert irk_tables(4).n_pairs == 2
    assert irk_tables(5).n_pairs == 3


def test_complex_tables_s4_match_both_reference_shipped_sets():
    """The reference ships TWO q=4 complex table sets: the main one
    (``tables/{T_re4,T_im4,D_vec_re_4,...}.txt``) and a legacy-named
    duplicate (``tables/complex/{T_real_4,D_vec_real_4,...}.txt``).
    The two are numerically identical (<= 1e-15, verified against both
    trees); the spot values below are from ``tables/complex/``.  Our
    generated diagonalization reproduces them to the shipped tables' own
    precision — the reference's ``A_inv4.txt`` itself deviates ~1.5e-5
    from the exact Radau IIA inverse (its Octave pipeline truncates),
    while our tables satisfy the order conditions to ~1e-12, so the
    ~1e-6 eigenvalue offsets are the REFERENCE's truncation, not ours."""
    t = irk_tables(4)
    np.testing.assert_allclose(
        t.D_re,
        [3.212807757094062] * 2 + [4.787196486968396] * 2,
        atol=5e-6,
    )
    np.testing.assert_allclose(
        t.D_im,
        [4.7730846556088515, -4.7730846556088515,
         1.5674735997791158, -1.5674735997791158],
        atol=5e-6,
    )
    # first column of T (tables/complex/T_real_4.txt rows 0..3, col 0):
    # the eigenvector normalization convention matches too
    np.testing.assert_allclose(
        t.T_re[:, 0],
        [0.05606502801108528, -0.1698137072122071,
         0.2543698027733842, 0.8708298136730743],
        atol=2e-5,
    )


def test_table_file_roundtrip(tmp_path):
    """Both directions of the reference table-file format (reference
    load_matrix_from_file/load_vector_from_file, main.cc:599-656)."""
    from dealii_spirk_tpu.tables import load_table_file, save_table_file

    t = irk_tables(3)
    mat_path = str(tmp_path / "A_inv3.txt")
    save_table_file(mat_path, t.A_inv)
    np.testing.assert_array_equal(load_table_file(mat_path), t.A_inv)
    vec_path = str(tmp_path / "b_vec_3.txt")
    save_table_file(vec_path, t.b)
    loaded = load_table_file(vec_path)
    assert loaded.ndim == 1  # 1-row files come back as vectors
    np.testing.assert_array_equal(loaded, t.b)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/tables"),
    reason="reference tables not present",
)
def test_load_reference_shipped_tables():
    """Load the reference's OWN shipped files through our loader and check
    them against the generated tables (cross-implementation oracle; the
    shipped A_inv deviates ~1e-5 from exact, see the q=4 complex test)."""
    from dealii_spirk_tpu.tables import load_table_file

    a_inv = load_table_file("/root/reference/tables/A_inv2.txt")
    np.testing.assert_allclose(a_inv, irk_tables(2).A_inv, atol=1e-12)
    b = load_table_file("/root/reference/tables/b_vec_2.txt")
    assert b.ndim == 1
    np.testing.assert_allclose(b, irk_tables(2).b, atol=1e-12)
