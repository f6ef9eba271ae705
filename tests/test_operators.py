"""Tests for the separable a*M + b*K operator layer against dense Kronecker
construction (the unambiguous oracle for the tensor-product structure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_spirk_tpu.fem.grid import make_level
from dealii_spirk_tpu.ops import (
    apply_complex,
    apply_mass,
    apply_shifted,
    apply_stiffness,
    level_ops,
    operator_diagonal,
)
from dealii_spirk_tpu.ops.banded import apply_band, apply_dense_1d


def _kron_operators(level, dim):
    M1 = level.mass_dense
    K1 = level.stiff_dense
    I = np.eye(level.m)
    if dim == 2:
        M = np.kron(M1, M1)
        K = np.kron(K1, M1) + np.kron(M1, K1)
    else:
        M = np.kron(np.kron(M1, M1), M1)
        K = (
            np.kron(np.kron(K1, M1), M1)
            + np.kron(np.kron(M1, K1), M1)
            + np.kron(np.kron(M1, M1), K1)
        )
    del I
    return M, K


def test_apply_band_matches_dense():
    rng = np.random.default_rng(0)
    level = make_level(3, 2)
    u = rng.standard_normal((4, level.m, 7))
    out_b = apply_band(jnp.asarray(level.mass_band), jnp.asarray(u), 1)
    out_d = apply_dense_1d(jnp.asarray(level.mass_dense), jnp.asarray(u), 1)
    np.testing.assert_allclose(out_b, out_d, atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("p", [1, 2])
@pytest.mark.parametrize("mode", ["stencil", "dense"])
def test_mass_stiffness_vs_kron(dim, p, mode):
    rng = np.random.default_rng(1)
    level = make_level(2, p)
    ops = level_ops(level)
    m = level.m
    u = rng.standard_normal((m,) * dim)
    M, K = _kron_operators(level, dim)
    np.testing.assert_allclose(
        np.asarray(apply_mass(ops, jnp.asarray(u), dim, mode)).ravel(),
        M @ u.ravel(),
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(apply_stiffness(ops, jnp.asarray(u), dim, mode)).ravel(),
        K @ u.ravel(),
        atol=1e-9,
    )


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("mode", ["stencil", "dense"])
def test_shifted_vs_kron(dim, mode):
    rng = np.random.default_rng(2)
    level = make_level(2, 1)
    ops = level_ops(level)
    u = rng.standard_normal((level.m,) * dim)
    a, b = 3.7, 0.21
    M, K = _kron_operators(level, dim)
    np.testing.assert_allclose(
        np.asarray(apply_shifted(ops, a, b, jnp.asarray(u), dim, mode)).ravel(),
        (a * M + b * K) @ u.ravel(),
        atol=1e-10,
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_diagonal_exact(dim):
    level = make_level(2, 2)
    ops = level_ops(level)
    a, b = 2.5, 0.4
    M, K = _kron_operators(level, dim)
    diag = np.asarray(operator_diagonal(ops, a, b, dim)).ravel()
    np.testing.assert_allclose(diag, np.diag(a * M + b * K), atol=1e-11)


@pytest.mark.parametrize("dim", [2])
def test_complex_block_apply(dim):
    rng = np.random.default_rng(3)
    level = make_level(2, 1)
    ops = level_ops(level)
    m = level.m
    z = rng.standard_normal((2,) + (m,) * dim)
    d_re, d_im, tau = 1.3, 0.7, 0.1
    M, K = _kron_operators(level, dim)
    out = np.asarray(apply_complex(ops, d_re, d_im, tau, jnp.asarray(z), dim))
    re, im = z[0].ravel(), z[1].ravel()
    expect_re = d_re * (M @ re) - d_im * (M @ im) + tau * (K @ re)
    expect_im = d_im * (M @ re) + d_re * (M @ im) + tau * (K @ im)
    np.testing.assert_allclose(out[0].ravel(), expect_re, atol=1e-10)
    np.testing.assert_allclose(out[1].ravel(), expect_im, atol=1e-10)


def test_batched_apply_vmap():
    """Stage-batched operator (reference operator.h:701-881) via vmap."""
    rng = np.random.default_rng(4)
    level = make_level(2, 1)
    ops = level_ops(level)
    m = level.m
    q = 4
    W = jnp.asarray(rng.standard_normal((q, m, m)))
    d = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    tau = 0.1
    out = jax.vmap(lambda di, wi: apply_shifted(ops, di, tau, wi, 2))(d, W)
    for i in range(q):
        np.testing.assert_allclose(
            out[i],
            apply_shifted(ops, float(d[i]), tau, W[i], 2),
            atol=1e-12,
        )
