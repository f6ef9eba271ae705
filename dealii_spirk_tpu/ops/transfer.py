"""Grid-transfer operators for geometric multigrid.

Tensor-product analog of deal.II's MGTransferGlobalCoarsening (used by the
reference at ``preconditioner.h:236-340``): the dim-dimensional
prolongation is the Kronecker product of the 1D interpolation matrix with
itself, applied axis-by-axis; restriction is its transpose.  Block
(stage-batched) transfer — the reference's MGTransferBlockGlobalCoarsening
— is just the same apply with leading batch axes.
"""

from __future__ import annotations

from .banded import apply_dense_1d


def _spatial_axes(u_ndim: int, dim: int) -> tuple[int, ...]:
    return tuple(range(u_ndim - dim, u_ndim))


def prolong(P, u_coarse, dim: int):
    """Interpolate coarse -> fine: apply P (m_f, m_c) along each axis."""
    u = u_coarse
    for ax in _spatial_axes(u.ndim, dim):
        u = apply_dense_1d(P, u, ax)
    return u


def restrict(P, u_fine, dim: int):
    """Residual transfer fine -> coarse: apply P^T along each axis."""
    u = u_fine
    for ax in _spatial_axes(u.ndim, dim):
        u = apply_dense_1d(P.T, u, ax)
    return u
