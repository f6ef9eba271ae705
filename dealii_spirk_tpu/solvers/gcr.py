"""Preconditioned GCR (generalized conjugate residual).

Port of the reference's hand-written ``SolverGCR`` (``main.cc:77-171``,
present as an alternative to GMRES behind ``if (false)`` switches at
``main.cc:906/1365/2192/2746``): right-preconditioned, explicit
orthogonalization of the A-images of the search directions, residual
monitored in the unpreconditioned norm, fixed basis size (GCRmaxit = 40,
no restart).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax

from .krylov import KrylovResult


def gcr(
    A: Callable,
    b,
    *,
    M: Callable | None = None,
    x0=None,
    maxiter: int = 40,
    abstol: float = 1e-20,
    reltol: float = 0.0,
) -> KrylovResult:
    if M is None:
        M = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)
        p = -b
    else:
        p = A(x0) - b  # reference works with the negated residual

    res0 = jnp.sqrt(jnp.sum(p * p))
    tol = jnp.maximum(abstol, reltol * res0)
    H = jnp.zeros((maxiter,) + b.shape, b.dtype)
    Hd = jnp.zeros((maxiter,) + b.shape, b.dtype)
    Hn = jnp.ones((maxiter,), b.dtype)

    def cond(st):
        _x, _p, res, it, _H, _Hd, _Hn = st
        return (res > tol) & (it < maxiter)

    def body(st):
        x, p, res, it, H, Hd, Hn = st
        search = M(p)
        Asearch = A(search)

        def orth(i, carry):
            Asearch, search = carry
            t = jnp.sum(H[i] * Asearch) / Hn[i]
            return Asearch - t * H[i], search - t * Hd[i]

        Asearch, search = lax.fori_loop(0, it, orth, (Asearch, search))
        nA = jnp.sum(Asearch * Asearch)
        safe = jnp.where(nA > 0, nA, 1.0)
        H = H.at[it].set(Asearch)
        Hd = Hd.at[it].set(search)
        Hn = Hn.at[it].set(safe)
        c = jnp.sum(Asearch * p) / safe
        x = x - c * search
        p = p - c * Asearch
        res = jnp.sqrt(jnp.sum(p * p))
        return x, p, res, it + 1, H, Hd, Hn

    x, _p, res, it, _H, _Hd, _Hn = lax.while_loop(
        cond, body, (x0, p, res0, jnp.int32(0), H, Hd, Hn)
    )
    return KrylovResult(x=x, n_iterations=it, residual=res)
