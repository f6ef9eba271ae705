"""Pallas TPU kernel: fused sum-factorized apply of a*M + b*K (degree 1).

The XLA fallback executes the separable operator as ~7 banded sweeps
(~14 HBM passes at 2 per sweep).  This kernel performs the whole apply in
ONE pass over HBM, mapping each tensor direction to the cheapest hardware
mechanism:

* **z (slab axis)**: free — the DMA'd slab carries a 1-plane halo and the
  z-combination is three statically shifted slices (p=1 rows are
  translation invariant; zero ghosts reproduce the Dirichlet boundary,
  cf. reference ``operator.h:379-421``).
* **y (sublane axis)**: three ``pltpu.roll`` shifts — sublane rotates are
  cheap VPU ops; the >= 1 trailing zero row makes wraparound harmless.
* **x (lane axis)**: ONE MXU matmul against the stacked dense 1D
  operators ``[Mx^T; Kx^T]`` — matmul against a banded matrix wastes MXU
  FLOPs but they are free compared to lane shuffles, and the dense matrix
  handles the boundary rows exactly.

Derivation (3D).  With Zm/Zk the z-mass/z-stiffness combinations of the
slab and per-stage shift a (= d_i), tau = b:

    E = a Zm + b Zk,  F = b Zm
    C = sum_dy [ m1[dy] roll_y(E) + k1[dy] roll_y(F) ]
    D = sum_dy   m1[dy] roll_y(F)
    out = C @ Mx^T + D @ Kx^T  ==  [C | D] @ [Mx^T ; Kx^T]

Per-stage scalars (a_i, b) stream through SMEM so one kernel serves the
stage-batched operator (reference ``operator.h:701-881``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mass_laplace import LevelOps

_BZ = 32  # slab thickness (3D); large slabs amortize per-block overhead


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_stencil_supported(degree: int, dim: int, dtype) -> bool:
    return degree == 1 and dim in (2, 3) and dtype == jnp.float32


def _interior_bands(ops: LevelOps):
    mid = ops.mass_band.shape[1] // 2
    return ops.mass_band[:, mid], ops.stiff_band[:, mid]  # (3,), (3,)


def _dense_padded(band, n_pad: int):
    """Dense (n_pad, n_pad) 1D operator from its band (zero-padded).

    ``band`` must be concrete (LevelOps arrays are trace-time constants).
    """
    import numpy as np

    from ...fem.assembly import band_to_dense

    A = band_to_dense(np.asarray(band))
    m = A.shape[0]
    out = np.zeros((n_pad, n_pad), np.float32)
    out[:m, :m] = A
    return jnp.asarray(out)


def _roll(x, shift: int, axis: int):
    n = x.shape[axis]
    return pltpu.roll(x, jnp.int32(shift % n), axis=axis)


def _kernel_3d(w_ref, band_ref, xmat_ref, u_hbm, out_ref, scratch, sem):
    iq = pl.program_id(0)
    iz = pl.program_id(1)
    bz = out_ref.shape[1]
    cp = pltpu.make_async_copy(
        u_hbm.at[iq, pl.ds(iz * bz, bz + 2)], scratch, sem
    )
    cp.start()
    cp.wait()
    a = w_ref[iq, 0]
    b = w_ref[iq, 1]
    p0 = scratch[0:bz]
    p1 = scratch[1 : 1 + bz]
    p2 = scratch[2 : 2 + bz]
    Zm = band_ref[0, 0] * p0 + band_ref[0, 1] * p1 + band_ref[0, 2] * p2
    Zk = band_ref[1, 0] * p0 + band_ref[1, 1] * p1 + band_ref[1, 2] * p2
    E = a * Zm + b * Zk
    F = b * Zm
    C = None
    D = None
    for dy in range(3):
        rE = _roll(E, 1 - dy, 1)
        rF = _roll(F, 1 - dy, 1)
        c_term = band_ref[0, dy] * rE + band_ref[1, dy] * rF
        d_term = band_ref[0, dy] * rF
        C = c_term if C is None else C + c_term
        D = d_term if D is None else D + d_term
    CD = jnp.concatenate([C, D], axis=-1)
    out_ref[0] = jax.lax.dot_general(
        CD,
        xmat_ref[:],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel_ms_3d(band_ref, xmat_ref, u_hbm, outm_ref, outk_ref, scratch, sem):
    """Dual-output: M u and K u from one slab pass (for the outer-system
    vmult, reference main.cc:1014-1028 — q mass + q stiffness applies)."""
    iq = pl.program_id(0)
    iz = pl.program_id(1)
    bz = outm_ref.shape[1]
    nx_p = outm_ref.shape[3]
    cp = pltpu.make_async_copy(
        u_hbm.at[iq, pl.ds(iz * bz, bz + 2)], scratch, sem
    )
    cp.start()
    cp.wait()
    p0 = scratch[0:bz]
    p1 = scratch[1 : 1 + bz]
    p2 = scratch[2 : 2 + bz]
    Zm = band_ref[0, 0] * p0 + band_ref[0, 1] * p1 + band_ref[0, 2] * p2
    Zk = band_ref[1, 0] * p0 + band_ref[1, 1] * p1 + band_ref[1, 2] * p2
    Cm = None
    Ck = None
    for dy in range(3):
        rm = _roll(Zm, 1 - dy, 1)
        rk = _roll(Zk, 1 - dy, 1)
        cm_term = band_ref[0, dy] * rm
        ck_term = band_ref[0, dy] * rk + band_ref[1, dy] * rm
        Cm = cm_term if Cm is None else Cm + cm_term
        Ck = ck_term if Ck is None else Ck + ck_term
    dn = (((2,), (0,)), ((), ()))
    outm_ref[0] = jax.lax.dot_general(
        Cm,
        xmat_ref[:nx_p],
        dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    outk_ref[0] = jax.lax.dot_general(
        jnp.concatenate([Ck, Cm], axis=-1),
        xmat_ref[:],
        dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel_ms_2d(band_ref, xmat_ref, u_ref, outm_ref, outk_ref):
    iq = pl.program_id(0)
    nx_p = outm_ref.shape[2]
    u = u_ref[0]
    Cm = None
    Ck = None
    for dy in range(3):
        r = _roll(u, 1 - dy, 0)
        cm_term = band_ref[0, dy] * r
        ck_term = band_ref[1, dy] * r
        Cm = cm_term if Cm is None else Cm + cm_term
        Ck = ck_term if Ck is None else Ck + ck_term
    dn = (((1,), (0,)), ((), ()))
    outm_ref[0] = jax.lax.dot_general(
        Cm,
        xmat_ref[:nx_p],
        dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    outk_ref[0] = jax.lax.dot_general(
        jnp.concatenate([Ck, Cm], axis=-1),
        xmat_ref[:],
        dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel_2d(w_ref, band_ref, xmat_ref, u_ref, out_ref):
    iq = pl.program_id(0)
    a = w_ref[iq, 0]
    b = w_ref[iq, 1]
    u = u_ref[0]
    C = None
    D = None
    for dy in range(3):
        r = _roll(u, 1 - dy, 0)
        c_term = (a * band_ref[0, dy] + b * band_ref[1, dy]) * r
        d_term = b * band_ref[0, dy] * r
        C = c_term if C is None else C + c_term
        D = d_term if D is None else D + d_term
    CD = jnp.concatenate([C, D], axis=-1)
    out_ref[0] = jax.lax.dot_general(
        CD,
        xmat_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _i32(*vals):
    return tuple(jnp.int32(v) for v in vals)


@functools.partial(jax.jit, static_argnames=("dim", "interpret"))
def _fused_apply(w, band, xmat, u, *, dim: int, interpret: bool = False):
    """u: (q, *spatial) f32; w: (q, 2) per-stage (a_i, b); band: (2, 3)
    interior 1D stencils; xmat: (2*nx_p, nx_p) stacked [Mx^T; Kx^T]."""
    # Mosaic wants 32-bit index arithmetic; trace with the x64 default off
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        return _fused_apply_impl(w, band, xmat, u, dim, interpret)


def _fused_apply_impl(w, band, xmat, u, dim: int, interpret: bool):
    q = u.shape[0]
    spatial = u.shape[1:]

    if dim == 3:
        nz, ny, nx = spatial
        bz = _BZ if nz >= _BZ else 8  # small (coarse) grids: thin slabs
        nzp = _ceil(nz, bz)
        ny_p = _ceil(ny + 1, 8)
        nx_p = xmat.shape[1]
        u_pad = jnp.pad(
            u, ((0, 0), (1, 1 + nzp - nz), (0, ny_p - ny), (0, nx_p - nx))
        )
        out = pl.pallas_call(
            _kernel_3d,
            grid=(q, nzp // bz),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((q, nzp, ny_p, nx_p), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bz + 2, ny_p, nx_p), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(w, band, xmat, u_pad)
        return out[:, :nz, :ny, :nx]

    ny, nx = spatial
    ny_p = _ceil(ny + 1, 8)
    nx_p = xmat.shape[1]
    u_pad = jnp.pad(u, ((0, 0), (0, ny_p - ny), (0, nx_p - nx)))
    out = pl.pallas_call(
        _kernel_2d,
        grid=(q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, ny_p, nx_p), jnp.float32),
        interpret=interpret,
    )(w, band, xmat, u_pad)
    return out[:, :ny, :nx]


@functools.partial(jax.jit, static_argnames=("dim", "interpret"))
def _fused_ms_apply(band, xmat, u, *, dim: int, interpret: bool = False):
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        return _fused_ms_apply_impl(band, xmat, u, dim, interpret)


def _fused_ms_apply_impl(band, xmat, u, dim: int, interpret: bool):
    q = u.shape[0]
    spatial = u.shape[1:]

    if dim == 3:
        nz, ny, nx = spatial
        bz = _BZ if nz >= _BZ else 8
        nzp = _ceil(nz, bz)
        ny_p = _ceil(ny + 1, 8)
        nx_p = xmat.shape[1]
        u_pad = jnp.pad(
            u, ((0, 0), (1, 1 + nzp - nz), (0, ny_p - ny), (0, nx_p - nx))
        )
        shape = jax.ShapeDtypeStruct((q, nzp, ny_p, nx_p), jnp.float32)
        spec = pl.BlockSpec(
            (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
        )
        outm, outk = pl.pallas_call(
            _kernel_ms_3d,
            grid=(q, nzp // bz),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(spec, spec),
            out_shape=(shape, shape),
            scratch_shapes=[
                pltpu.VMEM((bz + 2, ny_p, nx_p), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(band, xmat, u_pad)
        sl = (slice(None), slice(None, nz), slice(None, ny), slice(None, nx))
        return outm[sl], outk[sl]

    ny, nx = spatial
    ny_p = _ceil(ny + 1, 8)
    nx_p = xmat.shape[1]
    u_pad = jnp.pad(u, ((0, 0), (0, ny_p - ny), (0, nx_p - nx)))
    shape = jax.ShapeDtypeStruct((q, ny_p, nx_p), jnp.float32)
    spec = pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0))
    outm, outk = pl.pallas_call(
        _kernel_ms_2d,
        grid=(q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            spec,
        ],
        out_specs=(spec, spec),
        out_shape=(shape, shape),
        interpret=interpret,
    )(band, xmat, u_pad)
    sl = (slice(None), slice(None, ny), slice(None, nx))
    return outm[sl], outk[sl]


def fused_mass_stiffness_apply(
    ops: LevelOps, u, dim: int, *, interpret: bool = False
):
    """(M u, K u) for a stage-batched block in one fused pass."""
    m1, k1 = _interior_bands(ops)
    band = jnp.stack([m1, k1]).astype(jnp.float32)
    xmat = _xmat(ops, u.shape[-1])
    return _fused_ms_apply(band, xmat, u, dim=dim, interpret=interpret)


def _xmat(ops: LevelOps, nx: int):
    nx_p = _ceil(nx + 1, 128)
    Mx = _dense_padded(ops.mass_band.astype(jnp.float32), nx_p)
    Kx = _dense_padded(ops.stiff_band.astype(jnp.float32), nx_p)
    return jnp.concatenate([Mx.T, Kx.T], axis=0)  # (2*nx_p, nx_p)


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
    q = u.shape[0]
    a_arr = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(a, jnp.float32)), (q,)
    )
    b_arr = jnp.broadcast_to(jnp.asarray(b, jnp.float32), (q,))
    w = jnp.stack([a_arr, b_arr], axis=1)  # (q, 2)
    m1, k1 = _interior_bands(ops)
    band = jnp.stack([m1, k1]).astype(jnp.float32)  # (2, 3)
    xmat = _xmat(ops, u.shape[-1])
    out = _fused_apply(w, band, xmat, u, dim=dim, interpret=interpret)
    return out if batched else out[0]
