"""Pallas TPU kernel: fused constant-coefficient stencil apply.

For Q_1 elements on the uniform hypercube grid, the operator
``a*M + b*K`` is a *constant* 3^dim-point stencil (every interior row of
the 1D band is identical; boundary rows only drop out-of-range columns,
which zero ghost layers reproduce exactly).  The reference pays one
sum-factorization cell sweep for this (``operator.h:379-421``); the
XLA fallback pays ~7 banded roll-sweeps.  This kernel does the whole
apply in ONE pass over HBM.

Key tricks (Mosaic-constraint-aware):

* **Minimal padding.** In-plane (y = sublane, x = lane) data sits at
  offset 0 with the extent rounded up to the tile size (>= 1 trailing
  zero).  Neighbor access uses ``pltpu.roll``: rolling +1 wraps the
  trailing zero in at index 0 (exactly the Dirichlet ghost); rolling -1
  only contaminates the trailing pad, which is sliced off.  The slab (z)
  axis carries an explicit 1-ghost and is DMA'd with halo (z offsets only
  slice the untiled leading dim, so no alignment constraint).
* **Separable split.**  w = m_z (x) A2 + k_z (x) B2 with
  ``A2 = a m (x) m + b (k (x) m + m (x) k)`` and ``B2 = b m (x) m``:
  reduce over z first (scalar multiplies), then run two 9-point 2D
  stencils — ~1/3 fewer roll ops than the naive 27-term form.
* Per-stage weights (shift d_i) stream through SMEM, so one kernel
  serves the stage-batched operator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mass_laplace import LevelOps

_BZ = 8  # slab thickness (3D)


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_stencil_supported(degree: int, dim: int, dtype) -> bool:
    return degree == 1 and dim in (2, 3) and dtype == jnp.float32


def _bands_1d(ops: LevelOps):
    mid = ops.mass_band.shape[1] // 2
    return ops.mass_band[:, mid], ops.stiff_band[:, mid]  # (3,), (3,)


def stencil_weights(ops: LevelOps, a, b, dim: int):
    """Per-lane packed weights for a*M + b*K.

    3D: (q, 24) = [m_z(3), k_z(3), A2(9), B2(9)];  2D: (q, 9) = A2 with
    the shift folded in.  ``a``: scalar or (q,), ``b``: scalar.
    """
    m1, k1 = _bands_1d(ops)
    a = jnp.atleast_1d(jnp.asarray(a, m1.dtype))
    mm = jnp.einsum("i,j->ij", m1, m1).reshape(-1)
    km = (
        jnp.einsum("i,j->ij", k1, m1) + jnp.einsum("i,j->ij", m1, k1)
    ).reshape(-1)
    A2 = a[:, None] * mm[None] + b * km[None]  # (q, 9)
    if dim == 2:
        return A2
    B2 = jnp.broadcast_to(b * mm, A2.shape)
    q = a.shape[0]
    mz = jnp.broadcast_to(m1, (q, 3))
    kz = jnp.broadcast_to(k1, (q, 3))
    return jnp.concatenate([mz, kz, A2, B2], axis=1)  # (q, 24)


def _roll(x, shift: int, axis: int):
    n = x.shape[axis]
    return pltpu.roll(x, jnp.int32(shift % n), axis=axis)


def _stencil2d(w9, u):
    """9-point 2D stencil on the last two axes via rolls.

    ``w9`` indexable as w9[dy*3+dx]; neighbor (dy-1, dx-1) offsets.
    """
    ya = u.ndim - 2
    xa = u.ndim - 1
    acc = None
    for dy in range(3):
        ry = _roll(u, 1 - dy, ya)
        for dx in range(3):
            term = w9[dy * 3 + dx] * _roll(ry, 1 - dx, xa)
            acc = term if acc is None else acc + term
    return acc


def _kernel_3d(w_ref, u_hbm, out_ref, scratch, sem):
    iq = pl.program_id(0)
    iz = pl.program_id(1)
    bz = out_ref.shape[1]
    cp = pltpu.make_async_copy(
        u_hbm.at[iq, pl.ds(iz * bz, bz + 2)], scratch, sem
    )
    cp.start()
    cp.wait()
    # z-reduction: S_A = sum_dz m_z[dz] * plane, S_B with k_z
    p0 = scratch[0:bz]
    p1 = scratch[1 : 1 + bz]
    p2 = scratch[2 : 2 + bz]
    SA = w_ref[iq, 0] * p0 + w_ref[iq, 1] * p1 + w_ref[iq, 2] * p2
    SB = w_ref[iq, 3] * p0 + w_ref[iq, 4] * p1 + w_ref[iq, 5] * p2
    acc = _stencil2d(lambda_w(w_ref, iq, 6), SA) + _stencil2d(
        lambda_w(w_ref, iq, 15), SB
    )
    out_ref[0] = acc


def lambda_w(w_ref, iq, base):
    class _W:
        def __getitem__(self, j):
            return w_ref[iq, base + j]

    return _W()


def _kernel_2d(w_ref, u_ref, out_ref):
    iq = pl.program_id(0)
    out_ref[0] = _stencil2d(lambda_w(w_ref, iq, 0), u_ref[0])


def _i32(*vals):
    return tuple(jnp.int32(v) for v in vals)


@functools.partial(jax.jit, static_argnames=("dim", "interpret"))
def _fused_apply(w, u, *, dim: int, interpret: bool = False):
    """u: (q, *spatial) f32, w packed per stencil_weights."""
    # Mosaic wants 32-bit index arithmetic; switch the x64 default off for
    # this trace so internally generated index maps stay i32.
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        return _fused_apply_impl(w, u, dim, interpret)


def _fused_apply_impl(w, u, dim: int, interpret: bool):
    q = u.shape[0]
    spatial = u.shape[1:]

    if dim == 3:
        nz, ny, nx = spatial
        nzp = _ceil(nz, _BZ)
        ny_p = _ceil(ny + 1, 8)
        nx_p = _ceil(nx + 1, 128)
        u_pad = jnp.pad(
            u, ((0, 0), (1, 1 + nzp - nz), (0, ny_p - ny), (0, nx_p - nx))
        )
        out = pl.pallas_call(
            _kernel_3d,
            grid=(q, nzp // _BZ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, _BZ, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((q, nzp, ny_p, nx_p), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((_BZ + 2, ny_p, nx_p), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(w, u_pad)
        return out[:, :nz, :ny, :nx]

    ny, nx = spatial
    ny_p = _ceil(ny + 1, 8)
    nx_p = _ceil(nx + 1, 128)
    u_pad = jnp.pad(u, ((0, 0), (0, ny_p - ny), (0, nx_p - nx)))
    out = pl.pallas_call(
        _kernel_2d,
        grid=(q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, ny_p, nx_p), jnp.float32),
        interpret=interpret,
    )(w, u_pad)
    return out[:, :ny, :nx]


def fused_stencil_apply(
    ops: LevelOps, a, b, u, dim: int, *, interpret: bool = False
):
    """(a M + b K) u for degree-1 grids in one fused pass.

    ``u``: (*spatial) with scalar ``a``, or (q, *spatial) with ``a`` of
    shape (q,).  ``b`` (tau) is scalar.
    """
    batched = u.ndim == dim + 1
    if not batched:
        u = u[None]
    a_arr = jnp.atleast_1d(jnp.asarray(a, jnp.float32))
    if a_arr.shape[0] != u.shape[0]:
        a_arr = jnp.broadcast_to(a_arr, (u.shape[0],))
    w = stencil_weights(ops, a_arr, b, dim)
    out = _fused_apply(w, u, dim=dim, interpret=interpret)
    return out if batched else out[0]
