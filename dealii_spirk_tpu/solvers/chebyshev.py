"""Chebyshev point-Jacobi smoother (deal.II PreconditionChebyshev semantics).

The reference smooths every GMG level with Chebyshev(degree=5,
smoothing_range=20) over a point-Jacobi preconditioner, with the smoothing
interval estimated by 20 CG iterations (reference
``preconditioner.h:219-232`` and ``preconditioner.h:352-373``).

``estimate_chebyshev_range`` reproduces that estimation: CG-Lanczos on the
Jacobi-preconditioned operator, then ``max_ev = 1.2 * lambda_max_est`` and
``min_ev = max_ev / smoothing_range``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax

from .krylov import cg_lanczos_extremal_eigs


def estimate_chebyshev_range(
    A: Callable,
    inv_diag,
    rhs,
    *,
    n_cg_iterations: int = 20,
    smoothing_range: float = 20.0,
    batch: bool = False,
):
    """Return Chebyshev interval ``(theta, delta)`` = (center, half-width)."""
    M = lambda r: inv_diag * r
    _lmin, lmax = cg_lanczos_extremal_eigs(
        A, rhs, M=M, n_iterations=n_cg_iterations, batch=batch
    )
    max_ev = 1.2 * lmax
    min_ev = max_ev / smoothing_range
    theta = 0.5 * (max_ev + min_ev)
    delta = 0.5 * (max_ev - min_ev)
    return theta, delta


def chebyshev_apply(
    A: Callable,
    inv_diag,
    theta,
    delta,
    b,
    *,
    x0=None,
    degree: int = 5,
    batch: bool = False,
):
    """Chebyshev-accelerated Jacobi iteration of the given polynomial degree.

    With ``x0=None`` this is the preconditioner application (deal.II
    ``vmult``, zero initial guess — used for GMG pre-smoothing and as the
    block coarse solve); with an initial guess it is the smoother ``step``
    used for post-smoothing.  ``theta``/``delta`` may carry a leading lane
    axis when ``batch`` (per-stage smoothing intervals).
    """

    def ex(s):
        if batch and jnp.ndim(s) == 1:
            return s.reshape(s.shape + (1,) * (b.ndim - 1))
        return s

    theta_b = ex(theta)
    delta_b = ex(delta)

    if x0 is None:
        r = b
        x = jnp.zeros_like(b)
    else:
        r = b - A(x0)
        x = x0

    z = inv_diag * r
    d = z / theta_b
    x = x + d
    sigma = theta_b / delta_b
    rho = 1.0 / sigma

    def body(_k, state):
        x, d, r, rho = state
        r = r - A(d)
        z = inv_diag * r
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta_b) * z
        x = x + d
        return x, d, r, rho_new

    x, _d, _r, _rho = lax.fori_loop(0, degree - 1, body, (x, d, r, rho))
    return x
