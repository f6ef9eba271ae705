"""Pallas TPU kernel: fused sum-factorized apply of a*M + b*K (any degree).

The XLA fallback executes the separable operator as ~7 banded sweeps
(~14 HBM passes at 2 per sweep).  This kernel performs the whole apply in
ONE pass over HBM, mapping each tensor direction to the cheapest hardware
mechanism:

* **z (slab axis)**: free — the DMA'd slab carries a p-plane halo and the
  z-combination is 2p+1 statically shifted slices scaled by *per-row*
  band vectors (rows whose couplings fall outside the domain carry zero
  band entries, so boundaries are exact — same data the XLA path uses,
  cf. ``fem/assembly.py``).
* **y (sublane axis)**: 2p+1 ``pltpu.roll`` shifts — sublane rotates are
  cheap VPU ops; per-row band vectors annihilate both boundary and
  wrap-around contributions (pad rows have zero band weight).
* **x (lane axis)**: ONE MXU matmul against the stacked dense 1D
  operators ``[Mx^T; Kx^T]`` — matmul against a banded matrix wastes MXU
  FLOPs but they are free compared to lane shuffles.

Derivation.  With Zm/Zk the z-mass/z-stiffness combinations of the slab
and per-stage shift a (= d_i), tau = b:

    E = a Zm + b Zk,  F = b Zm
    C = sum_k [ ybm_k(y) roll_y(E, p-k) + ybs_k(y) roll_y(F, p-k) ]
    D = sum_k   ybm_k(y) roll_y(F, p-k)
    out = C @ Mx^T + D @ Kx^T  ==  [C | D] @ [Mx^T ; Kx^T]

Per-stage scalars (a_i, b) stream through SMEM so one kernel serves the
stage-batched operator (reference ``operator.h:701-881``); the band
tables ride along as small VMEM arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mass_laplace import LevelOps

_BZ = 8  # slab thickness (3D). Small slabs keep the padded layout's
# halo blocks (one per side, thickness _BZ) cheap, fit VMEM comfortably,
# and measured no slower than 16/32 per block on v5e.
# full f32 matmul: Mosaic rejects Precision.HIGH, and the default
# single-pass bf16 (~3e-3 rel error) stalls Krylov convergence
_HIGH = jax.lax.Precision.HIGHEST


def _ceil(x: int, m: int) -> int:
    return -(-x // m) * m


def _nx_pad(nx: int, p: int, dim: int) -> int:
    """Lane extent for the kernels: the +p margin is only needed by the
    lane-ROLL x-contraction; the MXU-dot path needs just ceil(nx, 128).
    This matters exactly when nx + p crosses a lane-tile boundary — e.g.
    p=2, m=127 would pad 129 -> 256 lanes, doubling every kernel's VMEM
    (pushing the fused smoother off its budget) and the canonical
    layout's footprint, for pad columns the dot annihilates anyway."""
    nxr = _ceil(nx + p, 128)
    if _x_roll_ok(p, dim, nxr):
        return nxr
    return _ceil(nx, 128)


def fused_stencil_supported(degree: int, dim: int, dtype) -> bool:
    return 1 <= degree <= 4 and dim in (2, 3) and dtype == jnp.float32


def _dense_padded(band, n_pad: int):
    """Dense (n_pad, n_pad) 1D operator from its (2p+1, m) band,
    zero-padded — built IN-GRAPH with .at scatters so only the tiny band
    constant lands in the program.  A concrete dense literal here gets
    re-embedded in every XLA computation that uses it (while bodies,
    branches): at refinement 8 the (512, 256) dual table appeared 12+
    times = ~7 MB of duplicated literals, blowing the remote compiler's
    request cap (HTTP 413).  XLA CSE + while-loop LICM hoist the cheap
    construction."""
    band = jnp.asarray(band, jnp.float32)
    nb, m = band.shape
    p = (nb - 1) // 2
    out = jnp.zeros((n_pad, n_pad), jnp.float32)
    for k in range(-p, p + 1):
        i0 = max(0, -k)
        i1 = min(m, m - k)
        rows = np.arange(i0, i1)
        out = out.at[rows, rows + k].set(band[p + k, i0:i1])
    return out


def _band_table(ops: LevelOps, n_rows: int):
    """(n_rows, >=128) band table: per-row weights for the mass (columns
    0..2p) and stiffness (columns 2p+1..4p+1) bands, zero beyond the m
    physical rows; lane extent padded to 128.  Built in-graph (see
    ``_dense_padded``)."""
    mb = jnp.asarray(ops.mass_band, jnp.float32)
    kb = jnp.asarray(ops.stiff_band, jnp.float32)
    nb, m = mb.shape
    tab = jnp.zeros(
        (max(_ceil(n_rows, 8), 8), _ceil(2 * nb, 128)), jnp.float32
    )
    tab = tab.at[:m, :nb].set(mb.T)
    return tab.at[:m, nb : 2 * nb].set(kb.T)


def _band_table_x(ops: LevelOps, n_cols: int):
    """x-direction band table (>=8, n_cols): row k = mass-band diagonal k,
    row nb+k = stiffness; columns are lane positions, zero beyond the m
    physical columns.  Used by the lane-roll x-contraction (``x_roll``).
    Built in-graph (see ``_dense_padded``)."""
    mb = jnp.asarray(ops.mass_band, jnp.float32)
    kb = jnp.asarray(ops.stiff_band, jnp.float32)
    nb, m = mb.shape
    tab = jnp.zeros((max(_ceil(2 * nb, 8), 8), n_cols), jnp.float32)
    tab = tab.at[:nb, :m].set(mb)
    return tab.at[nb : 2 * nb, :m].set(kb)


def _band_table_y_mxu(ops: LevelOps, ny_p: int):
    """(2, ny_p, ny_p) stacked dense ``[Wm, Ws]`` lhs for the MXU y
    contraction (zero-padded beyond the m physical rows; built in-graph,
    see ``_dense_padded``).  Stacked square blocks rather than one
    (ny_p, 2*ny_p) slab: each matmul then contracts over exactly ny_p,
    so Mosaic never K-splits the bf16 lhs into an offset column slice
    (which it rejects with "Bad lhs type" on v5e).  M and K are
    symmetric, so no transpose question arises."""
    return jnp.stack(
        [
            _dense_padded(ops.mass_band, ny_p),
            _dense_padded(ops.stiff_band, ny_p),
        ]
    )


def _y_mxu_ok(p: int, dim: int, ny_p: int, nx_p: int, by: int) -> bool:
    """MXU y-contraction gate: whole-plane 3D kernels with a
    full-lane-tile y extent (Mosaic's bf16 matmul support is only
    validated there) and VMEM headroom for the per-plane matmul operands
    (H + stacked CD + dense Y ~ 22 plane-equivalents) under the
    worst-case (cheb) kernel — one decision for ALL kernel kinds so the
    threaded canonical tables stay layout-consistent."""
    if not (_YMXU and dim == 3 and by == 0):
        return False
    if ny_p < 128 and not _INTERPRET:
        return False  # Mosaic bf16 matmuls validated at >=1 lane tile only
    blocks = 2 * (_BZ + 2 * p) + 13 * _BZ + 22
    return ny_p * nx_p * 4 * blocks <= 14 * 2**20


def _y_mxu_canon(shape_c, p: int, dim: int) -> bool:
    """Canonical-path gate — a pure function of the canonical shape, so
    ``canon_tables`` and every kernel wrapper resolve identically:
    additionally requires ALL canonical kinds to run whole-plane."""
    if dim != 3:
        return False
    if any(
        _canon_by_from_shape(shape_c, p, kind) for kind in _CANON_KIND_EXTRA
    ):
        return False
    return _y_mxu_ok(p, dim, shape_c[2], shape_c[3], 0)


def kernel_vmem_fits(spatial, p: int, dim: int, cheb: bool = False) -> bool:
    """Conservative scoped-VMEM estimate for the whole-plane 3D kernels.

    The kernels hold whole (ny_p, nx_p) planes: 2-slot DMA scratch of
    bz+2p planes plus ~7 live block-sized intermediates (E/F/C/D, the
    stacked dot operand, the output) — the fused Chebyshev kernel adds
    6 more blocked in/out buffers.  Mosaic's scoped limit is 16 MB; at
    m=255 (refinement 8, degree 1) the estimate is ~20 MB and the
    compile fails — the *y-blocked* kernel variant (``yb_for``) takes
    over there."""
    if dim != 3:
        return True
    ny_p = _ceil(spatial[-2] + p, 8)
    nx_p = _nx_pad(spatial[-1], p, dim)
    plane = ny_p * nx_p * 4
    bz = _BZ
    blocks = 2 * (bz + 2 * p) + 7 * bz + (6 * bz if cheb else 0)
    return plane * blocks <= 14 * 2**20


def yb_for(spatial, p: int, dim: int) -> int:
    """y-block size for the y-blocked 3D kernels, for grids where the
    whole-plane kernel exceeds scoped VMEM (m >= 255 at degree 1 — the
    reference's production range sweeps refinements 3..19,
    /root/reference/scripts/parameters_all_q.py:33).

    Returns 0 when the whole-plane kernel fits (preferred: no y-halo
    re-reads, lane rolls available at p=1) or when no block size fits
    (XLA fallback).  The estimate mirrors ``kernel_vmem_fits``: 2-slot
    DMA scratch of (bz+2p, by+2p) planes, E/F at the haloed y extent,
    and ~8 further (bz, by, nx_p) intermediates.
    """
    if dim != 3 or kernel_vmem_fits(spatial, p, dim):
        return 0
    nx_p = _nx_pad(spatial[-1], p, dim)
    bz = _BZ
    for by in (128, 64, 32, 16, 8):
        if by >= _ceil(spatial[-2] + p, 8):
            continue
        byh = _ceil(by + 2 * p, 8)  # == _yb_window(by, p)
        floats = (
            2 * (bz + 2 * p) * byh + 2 * bz * byh + 8 * bz * by
        ) * nx_p
        # 11 MB budget: the estimate undercounts at higher degrees
        # (measured 18.6 MB actual vs 14.5 estimated at p=3, by=128)
        if floats * 4 <= 11 * 2**20:
            return by
    return 0


def kernel_fits(spatial, p: int, dim: int) -> bool:
    """Dispatch gate for the fused apply/ms kernels: whole-plane OR
    y-blocked variant fits scoped VMEM."""
    if dim != 3:
        return True
    return kernel_vmem_fits(spatial, p, dim) or yb_for(spatial, p, dim) > 0


def _x_roll_ok(p: int, dim: int, nx_p: int) -> bool:
    # Lane rolls beat the dense-padded MXU dot (6-pass f32 emulation
    # wasting ~99% of its MACs on a (2p+1)-diagonal matrix) when the roll
    # count is small and the lane extent is ONE vreg tile: measured 34%
    # faster at p=1, nx_p=128 on v5e.  Rolls across multiple lane tiles
    # blow Mosaic's scoped-VMEM budget (19.9M at nx_p=256) and higher
    # degrees multiply the roll count — both keep the dot.
    return dim == 3 and p == 1 and nx_p <= 128


# bf16x3 split for the in-kernel dense dots — three bf16 MXU passes
# with f32 accumulation instead of HIGHEST's six, dropping the lo*lo
# term (~1e-5 rel error).  Iteration counts stay identical, but the
# operator noise lands in the ACCURACY oracle when the discretization
# error is itself 1e-5-class (high degree), so the default is a
# degree-1-only gate (see _bf16_ok, measured numbers there).
# SPIRK_BF16X3: "auto" (default, degree-1 only) | "1" always | "0" never.
import os as _os

_BF16X3 = _os.environ.get("SPIRK_BF16X3", "auto")
if _BF16X3 not in ("0", "1", "auto"):
    import warnings as _warnings

    _warnings.warn(
        f"SPIRK_BF16X3={_BF16X3!r} is not one of '0'/'1'/'auto'; "
        "treating as '0' (bf16x3 disabled)",
        stacklevel=2,
    )
    _BF16X3 = "0"

# MXU y-contraction (VERDICT r2 #2): replace the y-direction roll/FMA
# chains with one bf16x3 matmul per z-plane — [C|D] (ny, 2nx) =
# [Wm|Ws] (ny, 2ny) @ [[E|F],[F|0]] (2ny, 2nx) — whose output IS the
# x-dot operand (the concat the dot path built explicitly before).
# Whole-plane 3D kernels only (the y-blocked variants keep rolls).
# SPIRK_YMXU=0 opts out.
_YMXU = _os.environ.get("SPIRK_YMXU", "0") == "1"

# Paired Chebyshev kernel (two smoother iterations per HBM round trip).
# Default off: measured slower on v5e (see ``cheb2_supported``).
_CHEB_PAIR = _os.environ.get("SPIRK_CHEB_PAIR", "0") == "1"

# bf16 STORAGE for the fused Chebyshev iteration state (r, d): the
# smoother iteration is HBM-bound at the y-blocked canonical sizes
# (84% of roof at refinement 8), and r/d are pure smoother-internal
# state — storing them bf16 halves 4 of the iteration's 6 HBM passes
# (x, the V-cycle output the outer Krylov reads, stays f32; all
# arithmetic stays f32 in VMEM).  ROUND2_NOTES parked this as
# "plausible but changes preconditioner quality" — the oracle is
# unchanged outer/inner iteration counts.  y-blocked kernels only.
_CHEB_BF16 = _os.environ.get("SPIRK_CHEB_BF16", "0") == "1"

# bf16x3 DOTS inside the fused Chebyshev kernels at EVERY degree: the
# smoother only ever runs inside the preconditioner, so its A·d noise
# perturbs M, not A — the accuracy argument that gates ``_bf16_ok`` to
# degree 1 (those dots sit in operator applies that feed the outer
# residual/accuracy oracle) does not apply to the smoother; the oracle
# here is unchanged iteration counts (scripts/cheb_dot_ab.py measures
# the kernel and the end-to-end step under that oracle).  At p >= 2 the
# HIGHEST x-dot is ~half the cheb kernel's serial time (BASELINE r4
# roofline: cheb at 60-65% of sum-roof vs 84% at p=1).  SPIRK_BF16X3=0
# still wins as the global kill switch (``_dot_bf16x3`` checks it).
# Read at kernel trace time — in-process flips need jax.clear_caches().
_CHEB_DOT_BF16 = _os.environ.get("SPIRK_CHEB_DOT_BF16", "1") == "1"

# Force interpret-mode execution of every public kernel entry point
# (CPU testing of the full pallas-mode solve paths, incl. schemes)
_INTERPRET = _os.environ.get("SPIRK_PALLAS_INTERPRET", "0") == "1"


def _dot_bf16x3(lhs, rhs, dn, force_highest: bool = False):
    """dot_general as three bf16 MXU passes with f32 accumulation
    (hi*hi + hi*lo + lo*hi; the dropped lo*lo term is ~5e-6 relative),
    falling back to HIGHEST (six f32-emulation passes) where Mosaic
    rejects bf16.  Shared by the x contraction and the MXU y path."""
    # (Historical note: earlier rounds saw Mosaic reject these dots —
    # "Bad lhs type" — and gated on output width.  Root cause was the
    # package-global jax_default_matmul_precision=highest leaking an
    # fp32 contract precision onto bf16 operands; with the explicit
    # DEFAULT precision below every shape compiles, including 128-wide
    # outputs.)
    if _BF16X3 != "0" and not force_highest:
        ch = lhs.astype(jnp.bfloat16)
        cl = (lhs - ch.astype(jnp.float32)).astype(jnp.bfloat16)
        xh = rhs.astype(jnp.bfloat16)
        xl = (rhs - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        # explicit DEFAULT precision: the package sets
        # jax_default_matmul_precision=highest globally (f64 CPU parity),
        # and Mosaic rejects bf16 operands with an fp32 contract
        # precision ("Bad lhs type") — the root cause of every earlier
        # in-kernel bf16 rejection (see _y_stage_mxu history).
        _DEF = jax.lax.Precision.DEFAULT
        out = jax.lax.dot_general(
            ch, xh, dn, preferred_element_type=jnp.float32, precision=_DEF
        )
        out = out + jax.lax.dot_general(
            ch, xl, dn, preferred_element_type=jnp.float32, precision=_DEF
        )
        return out + jax.lax.dot_general(
            cl, xh, dn, preferred_element_type=jnp.float32, precision=_DEF
        )
    return jax.lax.dot_general(
        lhs, rhs, dn, preferred_element_type=jnp.float32, precision=_HIGH
    )


def _bf16_ok(p: int) -> bool:
    """Accuracy gate for the bf16x3 contractions: at degree 1 the
    discretization error (~5e-4 L2 at the recorded grids) dwarfs the
    ~1e-5 relative bf16x3 operator error (measured: r8 end-to-end L2
    unchanged to 4 digits), but at p >= 3 the discretization error is
    1e-5-class and bf16x3 visibly pollutes the accuracy oracle (p=4 r6:
    L2 8.9e-6 HIGHEST vs 5.3e-5 bf16 at identical iteration counts) for
    a 0-7% speed gain — so the default is degree 1 only.
    SPIRK_BF16X3=1 forces on everywhere, =0 off everywhere."""
    if _BF16X3 == "1":
        return True
    if _BF16X3 == "0":
        return False
    return p == 1


def _x_dot(CD, xm, p: int, force_highest: bool = False,
           force_bf16: bool = False):
    return _dot_bf16x3(
        CD, xm, (((2,), (0,)), ((), ())),
        force_highest=force_highest or not (_bf16_ok(p) or force_bf16),
    )


def _y_dot(Y, H, p: int, force_highest: bool = False,
           force_bf16: bool = False):
    """(ny, ny) @ (ny, 2nx) plain matmul for the MXU y contraction."""
    return _dot_bf16x3(
        Y, H, (((1,), (0,)), ((), ())),
        force_highest=force_highest or not (_bf16_ok(p) or force_bf16),
    )


def _roll(x, shift: int, axis: int):
    n = x.shape[axis]
    return pltpu.roll(x, jnp.int32(shift % n), axis=axis)


def _y_stage_mxu(E, F, yb_ref, ny_p: int, p: int,
                 force_bf16: bool = False):
    """MXU y contraction: C = Wm E + Ws F and D = Wm F computed as two
    bf16x3 matmuls per z-plane, ``[C|D] = Wm @ [E|F] + Ws @ [F|0]`` —
    and the (bz, ny, 2nx) result IS the x-dot operand (the lane concat
    the dot path otherwise builds explicitly).  ``yb_ref`` holds the
    stacked square ``_band_table_y_mxu`` table.  Mosaic distributes the
    matmuls over the concat blocks (and K-splits wide contractions);
    both are fine with the explicit DEFAULT precision in
    ``_dot_bf16x3`` — the historical "Bad lhs type" rejections were the
    inherited fp32 contract precision, not the operand structure."""
    Wm = yb_ref[0]
    Ws = yb_ref[1]
    zero = jnp.zeros(E.shape[1:], jnp.float32)
    rows = []
    for z in range(E.shape[0]):
        H1 = jnp.concatenate([E[z], F[z]], axis=1)
        H2 = jnp.concatenate([F[z], zero], axis=1)
        rows.append(_y_dot(Wm, H1, p, force_bf16=force_bf16)
                    + _y_dot(Ws, H2, p, force_bf16=force_bf16))
    return jnp.stack(rows)


def _slab_dma(u_hbm, scratch, sem, p: int, z_off: int, bz: int):
    """Double-buffered z-slab DMA pipelined ACROSS grid steps.

    ``scratch``/``sem`` carry a leading 2-slot axis; grid steps execute
    sequentially on the core, so each step prefetches the next step's
    slab (crossing the stage boundary too) while waiting only on its own.
    Returns a Ref view of the current slab.
    """
    iq = pl.program_id(0)
    iz = pl.program_id(1)
    nq = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    g = iq * nsteps + iz
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    def copy_for(iq_, iz_, slot_):
        return pltpu.make_async_copy(
            u_hbm.at[iq_, pl.ds(iz_ * bz + z_off, bz + 2 * p)],
            scratch.at[slot_],
            sem.at[slot_],
        )

    @pl.when(g == 0)
    def _():
        copy_for(iq, iz, slot).start()

    niq = jnp.where(iz + 1 < nsteps, iq, iq + 1)
    niz = jnp.where(iz + 1 < nsteps, iz + 1, 0)

    @pl.when(g + 1 < nq * nsteps)
    def _():
        copy_for(niq, niz, nslot).start()

    copy_for(iq, iz, slot).wait()
    return scratch.at[slot]


def _slab_scratch(bz: int, p: int, ny_p: int, nx_p: int):
    return [
        pltpu.VMEM((2, bz + 2 * p, ny_p, nx_p), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _slab_dma_canon(u_hbm, scratch, sem, p: int, bz: int):
    """Double-buffered z-slab DMA for the zero-halo canonical layout.

    The source array has z extent nzp = ceil(nz, bz) with NO halo planes.
    Interior blocks copy the usual window [iz*bz - p, iz*bz + bz + p); the
    first/last blocks copy the in-bounds sub-window into the right offset
    of the scratch slab and the missing halo planes are zero-filled
    in-kernel (their couplings exit the domain, so the standard band
    table already weights them by zero — the zeroing only guards against
    non-finite garbage in uninitialized VMEM).  The kernel's
    ``zb[:, k]`` / ``scratch[k : k + bz]`` access pattern and the plain
    ``_band_table`` are IDENTICAL to the classic layout.  Requires at
    least two z blocks (``canon_supported``).  Returns the slab Ref.
    """
    iq = pl.program_id(0)
    iz = pl.program_id(1)
    nq = pl.num_programs(0)
    nsteps = pl.num_programs(1)
    last = nsteps - 1
    g = iq * nsteps + iz
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    def first_copy(iq_, slot_):
        # planes [0, bz + p) -> scratch[p:]
        return pltpu.make_async_copy(
            u_hbm.at[iq_, pl.ds(0, bz + p)],
            scratch.at[slot_, pl.ds(p, bz + p)],
            sem.at[slot_],
        )

    def last_copy(iq_, slot_):
        # planes [nzp - bz - p, nzp) -> scratch[:bz + p]
        return pltpu.make_async_copy(
            u_hbm.at[iq_, pl.ds(last * bz - p, bz + p)],
            scratch.at[slot_, pl.ds(0, bz + p)],
            sem.at[slot_],
        )

    def mid_copy(iq_, iz_, slot_):
        return pltpu.make_async_copy(
            u_hbm.at[iq_, pl.ds(iz_ * bz - p, bz + 2 * p)],
            scratch.at[slot_],
            sem.at[slot_],
        )

    def start_for(iq_, iz_, slot_):
        @pl.when(iz_ == 0)
        def _():
            first_copy(iq_, slot_).start()

        @pl.when(iz_ == last)
        def _():
            last_copy(iq_, slot_).start()

        @pl.when((iz_ > 0) & (iz_ < last))
        def _():
            mid_copy(iq_, iz_, slot_).start()

    @pl.when(g == 0)
    def _():
        start_for(iq, iz, slot)

    niq = jnp.where(iz + 1 < nsteps, iq, iq + 1)
    niz = jnp.where(iz + 1 < nsteps, iz + 1, 0)

    @pl.when(g + 1 < nq * nsteps)
    def _():
        start_for(niq, niz, nslot)

    @pl.when(iz == 0)
    def _():
        first_copy(iq, slot).wait()
        scratch[slot, pl.ds(0, p)] = jnp.zeros(
            (p,) + scratch.shape[2:], scratch.dtype
        )

    @pl.when(iz == last)
    def _():
        last_copy(iq, slot).wait()
        scratch[slot, pl.ds(bz + p, p)] = jnp.zeros(
            (p,) + scratch.shape[2:], scratch.dtype
        )

    @pl.when((iz > 0) & (iz < last))
    def _():
        mid_copy(iq, iz, slot).wait()

    return scratch.at[slot]


def _yb_window(by: int, p: int) -> int:
    """Sublane extent of the y DMA window: by + 2p rounded up to the
    sublane tile (Mosaic requires HBM slice shapes aligned to 8)."""
    return _ceil(by + 2 * p, 8)


def _slab_dma_yb(u_hbm, scratch, sem, p: int, bz: int, by: int):
    """Double-buffered (z, y)-windowed DMA for the y-blocked kernels.

    Grid is (q, z-blocks, y-blocks); ``u_hbm`` carries leading z and y
    halos of p, so the window at (iz, iy) reads interior planes
    [iz*bz - p, iz*bz + bz + p) x rows [iy*by - p, iy*by - p + byw)
    with byw = ceil(by + 2p, 8) (sublane-aligned slice shapes; the
    trailing over-read rows are annihilated by the band weights).
    Same cross-step prefetch discipline as ``_slab_dma``.
    """
    iq = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    nq = pl.num_programs(0)
    nz_s = pl.num_programs(1)
    ny_s = pl.num_programs(2)
    g = (iq * nz_s + iz) * ny_s + iy
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    def copy_for(iq_, iz_, iy_, slot_):
        return pltpu.make_async_copy(
            u_hbm.at[
                iq_,
                pl.ds(iz_ * bz, bz + 2 * p),
                pl.ds(iy_ * by, _yb_window(by, p)),
            ],
            scratch.at[slot_],
            sem.at[slot_],
        )

    @pl.when(g == 0)
    def _():
        copy_for(iq, iz, iy, slot).start()

    carry_y = iy + 1 >= ny_s
    niy = jnp.where(carry_y, 0, iy + 1)
    carry_z = carry_y & (iz + 1 >= nz_s)
    niz = jnp.where(carry_y, jnp.where(carry_z, 0, iz + 1), iz)
    niq = jnp.where(carry_z, iq + 1, iq)

    @pl.when(g + 1 < nq * nz_s * ny_s)
    def _():
        copy_for(niq, niz, niy, nslot).start()

    copy_for(iq, iz, iy, slot).wait()
    return scratch.at[slot]


def _slab_scratch_yb(bz: int, p: int, by: int, nx_p: int):
    return [
        pltpu.VMEM((2, bz + 2 * p, _yb_window(by, p), nx_p), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _make_kernel_3d_yb(p: int):
    """y-blocked fused apply: the y-combination is 2p+1 statically
    shifted sub-slices of the haloed slab (replacing the whole-plane
    sublane rolls), weighted by the band-table rows of this y block.
    Output row r of block iy (interior row iy*by + r) reads slab row
    k + r, i.e. interior row iy*by + r + (k - p) — the same coupling the
    roll formulation expresses, but with whole-plane VMEM residency
    replaced by (by + 2p)-row blocks."""
    nb = 2 * p + 1

    def kernel(w_ref, zb_ref, yb_ref, xmat_ref, u_hbm, out_ref, scratch2, sem):
        iq = pl.program_id(0)
        iz = pl.program_id(1)
        iy = pl.program_id(2)
        bz = out_ref.shape[1]
        by = out_ref.shape[2]
        scratch = _slab_dma_yb(u_hbm, scratch2, sem, p, bz, by)
        a = w_ref[iq, 0]
        b = w_ref[iq, 1]
        zb = zb_ref[pl.ds(iz * bz, bz)]
        yb = yb_ref[pl.ds(iy * by, by)]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = scratch[k : k + bz]  # (bz, by + 2p, nx_p)
            wm = zb[:, k].reshape(bz, 1, 1)
            ws = zb[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        E = a * Zm + b * Zk
        F = b * Zm
        C = None
        D = None
        for k in range(nb):
            # rolled[r] = E[r + k]: output row r couples to window row
            # r + k (interior offset k - p); roll + offset-0 slice keeps
            # every sublane access aligned
            sE = _roll(E, -k, 1)[:, :by, :]
            sF = _roll(F, -k, 1)[:, :by, :]
            wm = yb[:, k].reshape(1, by, 1)
            ws = yb[:, nb + k].reshape(1, by, 1)
            c_term = wm * sE + ws * sF
            d_term = wm * sF
            C = c_term if C is None else C + c_term
            D = d_term if D is None else D + d_term
        out_ref[0] = _x_dot(jnp.concatenate([C, D], axis=-1), xmat_ref[:], p)

    return kernel


def _make_kernel_ms_3d_yb(p: int):
    """y-blocked dual-output (M u, K u) variant of ``_make_kernel_ms_3d``."""
    nb = 2 * p + 1

    def kernel(
        zb_ref, yb_ref, xmat_ref, u_hbm, outm_ref, outk_ref, scratch2, sem
    ):
        iz = pl.program_id(1)
        iy = pl.program_id(2)
        bz = outm_ref.shape[1]
        by = outm_ref.shape[2]
        nx_p = outm_ref.shape[3]
        scratch = _slab_dma_yb(u_hbm, scratch2, sem, p, bz, by)
        zb = zb_ref[pl.ds(iz * bz, bz)]
        yb = yb_ref[pl.ds(iy * by, by)]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = scratch[k : k + bz]
            wm = zb[:, k].reshape(bz, 1, 1)
            ws = zb[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        Cm = None
        Ck = None
        for k in range(nb):
            rm = _roll(Zm, -k, 1)[:, :by, :]
            rk = _roll(Zk, -k, 1)[:, :by, :]
            wm = yb[:, k].reshape(1, by, 1)
            ws = yb[:, nb + k].reshape(1, by, 1)
            cm_term = wm * rm
            ck_term = wm * rk + ws * rm
            Cm = cm_term if Cm is None else Cm + cm_term
            Ck = ck_term if Ck is None else Ck + ck_term
        outm_ref[0] = _x_dot(Cm, xmat_ref[:nx_p], p)
        outk_ref[0] = _x_dot(
            jnp.concatenate([Ck, Cm], axis=-1), xmat_ref[:]
        , p)

    return kernel


def _make_kernel_3d(p: int, z_off: int = 0, x_roll: bool = False,
                    canon: bool = False, y_mxu: bool = False,
                    residual: bool = False):
    """``z_off``: element offset of the data region on the slab axis minus
    p (0 for the classic layout with a p-ghost, bz for the halo-block
    padded layout used inside the V-cycle).  With ``x_roll`` the x
    contraction uses lane rolls against a band table instead of the MXU
    dot (``xmat_ref`` then holds ``_band_table_x``).  ``canon``: zero-halo
    canonical layout — clamped DMA windows (``_slab_dma_canon``) paired
    with the shift-baked z table (``_band_table_z_canon``).  ``y_mxu``:
    the y contraction runs on the MXU (``_y_stage_mxu``; ``yb_ref`` then
    holds the dense ``_band_table_y_mxu`` table).  ``residual``: the
    kernel takes an extra blocked input r and writes r - A u (the
    V-cycle's restriction residual in one HBM round trip)."""
    nb = 2 * p + 1

    def kernel(w_ref, zb_ref, yb_ref, xmat_ref, u_hbm, *rest):
        if residual:
            r_ref, out_ref, scratch2, sem = rest
        else:
            (out_ref, scratch2, sem) = rest
            r_ref = None
        iq = pl.program_id(0)
        iz = pl.program_id(1)
        bz = out_ref.shape[1]
        ny_p = out_ref.shape[2]
        nx_p = out_ref.shape[3]
        if canon:
            scratch = _slab_dma_canon(u_hbm, scratch2, sem, p, bz)
        else:
            scratch = _slab_dma(u_hbm, scratch2, sem, p, z_off, bz)
        a = w_ref[iq, 0]
        b = w_ref[iq, 1]
        zb = zb_ref[pl.ds(iz * bz, bz)]  # (bz, lanes)
        Zm = None
        Zk = None
        for k in range(nb):
            plane = scratch[k : k + bz]
            wm = zb[:, k].reshape(bz, 1, 1)
            ws = zb[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        E = a * Zm + b * Zk
        F = b * Zm
        if y_mxu:
            CD = _y_stage_mxu(E, F, yb_ref, ny_p, p)
            C = CD[:, :, :nx_p]
            D = CD[:, :, nx_p:]
        else:
            C = None
            D = None
            for k in range(nb):
                rE = _roll(E, p - k, 1)
                rF = _roll(F, p - k, 1)
                wm = yb_ref[:ny_p, k].reshape(1, ny_p, 1)
                ws = yb_ref[:ny_p, nb + k].reshape(1, ny_p, 1)
                c_term = wm * rE + ws * rF
                d_term = wm * rF
                C = c_term if C is None else C + c_term
                D = d_term if D is None else D + d_term
        if x_roll:
            out = None
            for k in range(nb):
                rc = _roll(C, p - k, 2)
                rd = _roll(D, p - k, 2)
                wm = xmat_ref[k].reshape(1, 1, -1)
                ws = xmat_ref[nb + k].reshape(1, 1, -1)
                t = wm * rc + ws * rd
                out = t if out is None else out + t
        elif y_mxu:
            out = _x_dot(CD, xmat_ref[:], p)
        else:
            out = _x_dot(
                jnp.concatenate([C, D], axis=-1), xmat_ref[:]
            , p)
        out_ref[0] = r_ref[0] - out if residual else out

    return kernel


def _make_kernel_ms_3d(p: int, z_off: int = 0, x_roll: bool = False,
                       canon: bool = False, y_mxu: bool = False):
    """Dual-output: M u and K u from one slab pass (for the outer-system
    vmult, reference main.cc:1014-1028)."""
    nb = 2 * p + 1

    def kernel(
        zb_ref, yb_ref, xmat_ref, u_hbm, outm_ref, outk_ref, scratch2, sem
    ):
        iq = pl.program_id(0)
        iz = pl.program_id(1)
        bz = outm_ref.shape[1]
        ny_p = outm_ref.shape[2]
        nx_p = outm_ref.shape[3]
        if canon:
            scratch = _slab_dma_canon(u_hbm, scratch2, sem, p, bz)
        else:
            scratch = _slab_dma(u_hbm, scratch2, sem, p, z_off, bz)
        zb = zb_ref[pl.ds(iz * bz, bz)]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = scratch[k : k + bz]
            wm = zb[:, k].reshape(bz, 1, 1)
            ws = zb[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        if y_mxu:
            # E=Zk, F=Zm: CD = [Wm Zk + Ws Zm | Wm Zm] = [Ck | Cm]
            CD = _y_stage_mxu(Zk, Zm, yb_ref, ny_p, p)
            Ck = CD[:, :, :nx_p]
            Cm = CD[:, :, nx_p:]
            if not x_roll:
                outk_ref[0] = _x_dot(CD, xmat_ref[:], p)
                outm_ref[0] = _x_dot(Cm, xmat_ref[:nx_p], p)
                return
        else:
            Cm = None
            Ck = None
            for k in range(nb):
                rm = _roll(Zm, p - k, 1)
                rk = _roll(Zk, p - k, 1)
                wm = yb_ref[:ny_p, k].reshape(1, ny_p, 1)
                ws = yb_ref[:ny_p, nb + k].reshape(1, ny_p, 1)
                cm_term = wm * rm
                ck_term = wm * rk + ws * rm
                Cm = cm_term if Cm is None else Cm + cm_term
                Ck = ck_term if Ck is None else Ck + ck_term
        if x_roll:
            om = None
            ok = None
            for k in range(nb):
                rcm = _roll(Cm, p - k, 2)
                rck = _roll(Ck, p - k, 2)
                wm = xmat_ref[k].reshape(1, 1, -1)
                ws = xmat_ref[nb + k].reshape(1, 1, -1)
                om = wm * rcm if om is None else om + wm * rcm
                t = wm * rck + ws * rcm
                ok = t if ok is None else ok + t
            outm_ref[0] = om
            outk_ref[0] = ok
            return
        outm_ref[0] = _x_dot(Cm, xmat_ref[:nx_p], p)
        outk_ref[0] = _x_dot(
            jnp.concatenate([Ck, Cm], axis=-1), xmat_ref[:]
        , p)

    return kernel


def _make_kernel_2d(p: int):
    nb = 2 * p + 1

    def kernel(w_ref, yb_ref, xmat_ref, u_ref, out_ref):
        iq = pl.program_id(0)
        ny_p = out_ref.shape[1]
        a = w_ref[iq, 0]
        b = w_ref[iq, 1]
        u = u_ref[0]
        C = None
        D = None
        for k in range(nb):
            r = _roll(u, p - k, 0)
            wm = yb_ref[:ny_p, k].reshape(ny_p, 1)
            ws = yb_ref[:ny_p, nb + k].reshape(ny_p, 1)
            c_term = (a * wm + b * ws) * r
            d_term = b * wm * r
            C = c_term if C is None else C + c_term
            D = d_term if D is None else D + d_term
        CD = jnp.concatenate([C, D], axis=-1)
        out_ref[0] = jax.lax.dot_general(
            CD,
            xmat_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HIGH,
        )

    return kernel


def _make_kernel_ms_2d(p: int):
    nb = 2 * p + 1

    def kernel(yb_ref, xmat_ref, u_ref, outm_ref, outk_ref):
        iq = pl.program_id(0)
        ny_p = outm_ref.shape[1]
        nx_p = outm_ref.shape[2]
        u = u_ref[0]
        Cm = None
        Ck = None
        for k in range(nb):
            r = _roll(u, p - k, 0)
            wm = yb_ref[:ny_p, k].reshape(ny_p, 1)
            ws = yb_ref[:ny_p, nb + k].reshape(ny_p, 1)
            cm_term = wm * r
            ck_term = ws * r
            Cm = cm_term if Cm is None else Cm + cm_term
            Ck = ck_term if Ck is None else Ck + ck_term
        dn = (((1,), (0,)), ((), ()))
        outm_ref[0] = jax.lax.dot_general(
            Cm,
            xmat_ref[:nx_p],
            dn,
            preferred_element_type=jnp.float32,
            precision=_HIGH,
        )
        outk_ref[0] = jax.lax.dot_general(
            jnp.concatenate([Ck, Cm], axis=-1),
            xmat_ref[:],
            dn,
            preferred_element_type=jnp.float32,
            precision=_HIGH,
        )

    return kernel


def _i32(*vals):
    return tuple(jnp.int32(v) for v in vals)


def _geometry(u, p: int, dim: int, nx_p: int):
    spatial = u.shape[1:]
    if dim == 3:
        nz, ny, nx = spatial
        bz = _BZ if nz >= _BZ else 8
        nzp = _ceil(nz, bz)
        ny_p = _ceil(ny + p, 8)
        pad = ((0, 0), (p, p + nzp - nz), (0, ny_p - ny), (0, nx_p - nx))
        return bz, nzp, ny_p, pad
    ny, nx = spatial
    ny_p = _ceil(ny + p, 8)
    pad = ((0, 0), (0, ny_p - ny), (0, nx_p - nx))
    return None, None, ny_p, pad


def _geometry_yb(u, p: int, nx_p: int, by: int):
    """Pad geometry for the y-blocked kernels: leading z AND y halos of
    p (zero-filled, annihilated by the band weights) so every (z, y) DMA
    window is in bounds; the y extent covers the last block's aligned
    window (``_yb_window``)."""
    nz, ny, nx = u.shape[1:]
    bz = _BZ if nz >= _BZ else 8
    nzp = _ceil(nz, bz)
    nby = -(-ny // by)
    y_ext = (nby - 1) * by + _yb_window(by, p)
    pad = (
        (0, 0),
        (p, p + nzp - nz),
        (p, y_ext - p - ny),
        (0, nx_p - nx),
    )
    return bz, nzp, nby, pad


@functools.partial(
    jax.jit,
    static_argnames=("p", "dim", "interpret", "x_roll", "by", "y_mxu"),
)
def _fused_apply(
    w, zb, yb, xmat, u, *, p, dim, interpret=False, x_roll=False, by=0,
    y_mxu=False,
):
    # Mosaic wants 32-bit index arithmetic; trace with the x64 default off
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        return _fused_apply_impl(
            w, zb, yb, xmat, u, p, dim, interpret, x_roll, by, y_mxu
        )


def _fused_apply_impl(w, zb, yb, xmat, u, p, dim, interpret, x_roll=False,
                      by=0, y_mxu=False):
    q = u.shape[0]
    nx_p = xmat.shape[1]
    if dim == 3 and by:
        nz, ny, nx = u.shape[1:]
        bz, nzp, nby, pad = _geometry_yb(u, p, nx_p, by)
        u_pad = jnp.pad(u, pad)
        out = pl.pallas_call(
            _make_kernel_3d_yb(p),
            grid=(q, nzp // bz, nby),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, bz, by, nx_p), lambda iq, iz, iy: _i32(iq, iz, iy, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (q, nzp, nby * by, nx_p), jnp.float32
            ),
            scratch_shapes=_slab_scratch_yb(bz, p, by, nx_p),
            interpret=interpret,
        )(w, zb, yb, xmat, u_pad)
        return out[:, :nz, :ny, :nx]
    bz, nzp, ny_p, pad = _geometry(u, p, dim, nx_p)
    u_pad = jnp.pad(u, pad)
    if dim == 3:
        nz, ny, nx = u.shape[1:]
        out = pl.pallas_call(
            _make_kernel_3d(p, x_roll=x_roll, y_mxu=y_mxu),
            grid=(q, nzp // bz),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((q, nzp, ny_p, nx_p), jnp.float32),
            scratch_shapes=_slab_scratch(bz, p, ny_p, nx_p),
            interpret=interpret,
        )(w, zb, yb, xmat, u_pad)
        return out[:, :nz, :ny, :nx]

    ny, nx = u.shape[1:]
    out = pl.pallas_call(
        _make_kernel_2d(p),
        grid=(q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q, ny_p, nx_p), jnp.float32),
        interpret=interpret,
    )(w, yb, xmat, u_pad)
    return out[:, :ny, :nx]


@functools.partial(
    jax.jit,
    static_argnames=("p", "dim", "interpret", "x_roll", "by", "y_mxu"),
)
def _fused_ms_apply(
    zb, yb, xmat, u, *, p, dim, interpret=False, x_roll=False, by=0,
    y_mxu=False,
):
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        return _fused_ms_apply_impl(
            zb, yb, xmat, u, p, dim, interpret, x_roll, by, y_mxu
        )


def _fused_ms_apply_impl(zb, yb, xmat, u, p, dim, interpret, x_roll=False,
                         by=0, y_mxu=False):
    q = u.shape[0]
    nx_p = xmat.shape[1]
    if dim == 3 and by:
        nz, ny, nx = u.shape[1:]
        bz, nzp, nby, pad = _geometry_yb(u, p, nx_p, by)
        u_pad = jnp.pad(u, pad)
        shape = jax.ShapeDtypeStruct((q, nzp, nby * by, nx_p), jnp.float32)
        spec = pl.BlockSpec(
            (1, bz, by, nx_p), lambda iq, iz, iy: _i32(iq, iz, iy, 0)
        )
        outm, outk = pl.pallas_call(
            _make_kernel_ms_3d_yb(p),
            grid=(q, nzp // bz, nby),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(spec, spec),
            out_shape=(shape, shape),
            scratch_shapes=_slab_scratch_yb(bz, p, by, nx_p),
            interpret=interpret,
        )(zb, yb, xmat, u_pad)
        sl = (slice(None), slice(None, nz), slice(None, ny), slice(None, nx))
        return outm[sl], outk[sl]
    bz, nzp, ny_p, pad = _geometry(u, p, dim, nx_p)
    u_pad = jnp.pad(u, pad)
    if dim == 3:
        nz, ny, nx = u.shape[1:]
        shape = jax.ShapeDtypeStruct((q, nzp, ny_p, nx_p), jnp.float32)
        spec = pl.BlockSpec(
            (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
        )
        outm, outk = pl.pallas_call(
            _make_kernel_ms_3d(p, x_roll=x_roll, y_mxu=y_mxu),
            grid=(q, nzp // bz),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(spec, spec),
            out_shape=(shape, shape),
            scratch_shapes=_slab_scratch(bz, p, ny_p, nx_p),
            interpret=interpret,
        )(zb, yb, xmat, u_pad)
        sl = (slice(None), slice(None, nz), slice(None, ny), slice(None, nx))
        return outm[sl], outk[sl]

    ny, nx = u.shape[1:]
    shape = jax.ShapeDtypeStruct((q, ny_p, nx_p), jnp.float32)
    spec = pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0))
    outm, outk = pl.pallas_call(
        _make_kernel_ms_2d(p),
        grid=(q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            spec,
        ],
        out_specs=(spec, spec),
        out_shape=(shape, shape),
        interpret=interpret,
    )(yb, xmat, u_pad)
    sl = (slice(None), slice(None, ny), slice(None, nx))
    return outm[sl], outk[sl]


def _tables(ops: LevelOps, u, p: int, dim: int, x_roll: bool = False,
            by: int = 0, y_mxu: bool = False):
    nx_p = _nx_pad(u.shape[-1], p, dim)
    if x_roll:
        xmat = _band_table_x(ops, nx_p)
    else:
        xmat = jnp.concatenate(
            [
                _dense_padded(ops.mass_band, nx_p).T,
                _dense_padded(ops.stiff_band, nx_p).T,
            ],
            axis=0,
        )
    if dim == 3:
        bz = _BZ if u.shape[1] >= _BZ else 8
        nzp = _ceil(u.shape[1], bz)
        ny = u.shape[2]
        ny_p = (-(-ny // by)) * by if by else _ceil(ny + p, 8)
        zb = _band_table(ops, nzp)
        yb = (
            _band_table_y_mxu(ops, ny_p)
            if y_mxu
            else _band_table(ops, ny_p)
        )
        return zb, yb, xmat
    ny_p = _ceil(u.shape[1] + p, 8)
    return None, _band_table(ops, ny_p), xmat


def fused_stencil_apply(
    ops: LevelOps, a, b, u, dim: int, *, interpret: bool = False,
    force_yb: int = 0,
):
    """(a M + b K) u in one fused pass, any supported degree.

    ``u``: (*spatial) with scalar ``a``, or (q, *spatial) with ``a`` of
    shape (q,).  ``b`` (tau) is scalar.  ``force_yb`` overrides the
    y-block-size choice (testing only).
    """
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    batched = u.ndim == dim + 1
    if not batched:
        u = u[None]
    q = u.shape[0]
    a_arr = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(a, jnp.float32)), (q,))
    b_arr = jnp.broadcast_to(jnp.asarray(b, jnp.float32), (q,))
    w = jnp.stack([a_arr, b_arr], axis=1)
    by = force_yb or yb_for(u.shape[1:], p, dim)
    x_roll = (not by) and _x_roll_ok(p, dim, _ceil(u.shape[-1] + p, 128))
    y_mxu = dim == 3 and _y_mxu_ok(
        p, dim, _ceil(u.shape[2] + p, 8), _nx_pad(u.shape[-1], p, dim), by
    )
    zb, yb, xmat = _tables(ops, u, p, dim, x_roll, by, y_mxu)
    if dim == 3:
        out = _fused_apply(
            w, zb, yb, xmat, u, p=p, dim=dim, interpret=interpret,
            x_roll=x_roll, by=by, y_mxu=y_mxu,
        )
    else:
        out = _fused_apply(
            w, None, yb, xmat, u, p=p, dim=dim, interpret=interpret
        )
    return out if batched else out[0]


def fused_mass_stiffness_apply(
    ops: LevelOps, u, dim: int, *, interpret: bool = False, force_yb: int = 0
):
    """(M u, K u) for a stage-batched block in one fused pass."""
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    by = force_yb or yb_for(u.shape[1:], p, dim) if dim == 3 else 0
    x_roll = (not by) and _x_roll_ok(p, dim, _ceil(u.shape[-1] + p, 128))
    y_mxu = dim == 3 and _y_mxu_ok(
        p, dim, _ceil(u.shape[2] + p, 8), _nx_pad(u.shape[-1], p, dim), by
    )
    zb, yb, xmat = _tables(ops, u, p, dim, x_roll, by, y_mxu)
    return _fused_ms_apply(
        zb, yb, xmat, u, p=p, dim=dim, interpret=interpret, x_roll=x_roll,
        by=by, y_mxu=y_mxu,
    )


# ---------------------------------------------------------------------------
# zero-halo canonical layout
# ---------------------------------------------------------------------------
#
# Every classic fused apply pays THREE full HBM round trips: jnp.pad of
# the input, the kernel pass itself, and the output slice — ~3x the
# traffic an out-of-place apply needs.  The canonical layout removes the
# pad and the slice by keeping ALL solver fields (Krylov vectors, V-cycle
# residuals/corrections, smoother state) in the kernel's aligned shape
#
#     3D: (q, nzp, ny_p, nx_p),  nzp  = ceil(nz, bz)  (NO z-halo planes)
#     2D: (q, ny_p, nx_p)
#
# with the pad regions maintained EXACTLY ZERO.  Two properties make the
# layout closed under every operation in the solve:
#
# * the kernels write zeros into every pad position whenever the input
#   pads are zero (band tables/x operators are zero beyond the m physical
#   rows), so applies preserve the invariant with no halo scrubs — this is
#   what the earlier halo-block padded layout (below) lacked;
# * all other solve operations (elementwise chains, stage mixes, Krylov
#   dots, zero-embedded transfer matmuls) are linear and touch pads only
#   multiplicatively, so zeros stay zeros and dots/norms are unchanged BY
#   THE PADS — iteration counts match the classic path up to fp
#   reduction-order effects (the canonical x contraction may use a
#   different dot variant than the compact path; scheme tests allow ±1).
#
# The z-halo is eliminated by branch-specific boundary DMAs
# (``_slab_dma_canon``): first/last blocks copy the in-bounds sub-window
# and zero the missing halo planes in VMEM, so the in-kernel access
# pattern and band tables are unchanged.  Requires >= 2 z blocks
# (``canon_supported``).


def canon_shape(spatial, p: int, dim: int):
    """Canonical zero-halo shape (without the leading batch axis)."""
    if dim == 3:
        nz, ny, nx = spatial
        bz = _BZ if nz >= _BZ else 8
        return (_ceil(nz, bz), _ceil(ny + p, 8), _nx_pad(nx, p, dim))
    ny, nx = spatial
    return (_ceil(ny + p, 8), _nx_pad(nx, p, dim))


# extra pipelined/intermediate block budget per kernel kind, in units of
# bz*by*nx_p floats: the ms kernel double-buffers TWO blocked outputs
# (measured 292 KB over the 16 MB cap at by=128/m=255 without this), the
# cheb kernel three blocked inputs AND three outputs
_CANON_KIND_EXTRA = {"apply": 0, "ms": 4, "cheb": 6}


def _canon_by_from_shape(shape_c, p: int, kind: str = "apply") -> int:
    """y-block size from a CANONICAL (padded) 3D shape: 0 = whole-plane
    kernel fits (preferred), by > 0 = canonical y-blocked variant, -1 =
    unsupported."""
    ny_p, nx_p = shape_c[-2], shape_c[-1]
    bz = _BZ
    plane = ny_p * nx_p * 4
    blocks = 2 * (bz + 2 * p) + 7 * bz + (6 * bz if kind == "cheb" else 0)
    if plane * blocks <= 14 * 2**20:
        return 0
    # candidates: every multiple of 8 dividing ny_p, largest first (the
    # y-halo costs 16 rows per block, so bigger blocks read less).  At
    # p >= 2 the padded ny_p (e.g. 200 at m=191, 264 at m=255) has NO
    # power-of-two divisor >= 16, so a power-of-two-only list silently
    # dropped the reference's whole degree axis off the canonical path.
    cands = [
        by
        for by in range(min(256, ny_p - 8), 7, -8)
        if ny_p % by == 0
    ]
    for by in cands:
        byw = by + 16  # 8-row halo groups both sides
        floats = (2 * (bz + 2 * p) + 2 * bz) * byw * nx_p + (
            8 + _CANON_KIND_EXTRA[kind]
        ) * bz * by * nx_p
        # 11 MB budget (see yb_for: the estimate undercounts at high p)
        if floats * 4 <= 11 * 2**20:
            return by
    return -1


def _canon_by(u_c, p: int, dim: int, kind: str = "apply") -> int:
    if dim != 3:
        return 0
    by = _canon_by_from_shape(u_c.shape, p, kind=kind)
    if by < 0:
        raise ValueError("canonical kernels unsupported at this size")
    return by


def cheb_canon_geom(shape_c, p: int, dim: int) -> tuple[int, int]:
    """(bz, by) for the canonical fused Chebyshev kernel.

    by keeps ``_canon_by_from_shape`` semantics (0 = whole-plane
    preferred).  On the y-blocked path bz is chosen JOINTLY with by to
    minimize the d-window DMA re-read factor
    ``((bz+2p)(by+16))/(bz by)`` under the same 11 MB scoped-VMEM
    budget: the round-5 probes showed the p >= 2 cheb kernels are
    DMA-bound on exactly that re-read — removing the MXU x-dot or the
    y-pass moves the kernel < 4% (``scripts/cheb_probe.py``) — and
    bz=16 measured 1.06-1.12x at the p in {2,3,4} production shapes,
    while bz=32 (and bz=16 at the p=1 by=64 shape) busts scoped VMEM
    (``scripts/cheb_bz_probe.py``/``cheb_geom_sweep.py``).  At p=1 the
    chooser keeps (8, 64): (16, 32)'s re-read (1.69x) is worse than
    (8, 64)'s 1.56x.  ``SPIRK_CHEB_BZ`` (or ``_CHEB_BZ_FORCE``) pins bz
    for A/B runs; 8 reproduces the pre-round-5 geometry exactly."""
    if dim != 3:
        return _BZ, 0
    by0 = _canon_by_from_shape(shape_c, p, kind="cheb")
    if by0 < 0:
        raise ValueError("canonical kernels unsupported at this size")
    if by0 == 0:
        return _BZ, 0
    force = _CHEB_BZ_FORCE or int(_os.environ.get("SPIRK_CHEB_BZ", "0"))
    nzp, ny_p, nx_p = shape_c[1], shape_c[2], shape_c[3]
    best, best_f = (_BZ, by0), (
        (_BZ + 2 * p) * (by0 + 16) / (_BZ * by0)
    )
    for bz in (8, 16, 32):
        if (force and bz != force) or nzp % bz:
            continue
        if bz + 2 * p > nzp:
            continue  # haloed z window must fit the canonical extent
        for by in range(min(256, ny_p - 8), 7, -8):
            if ny_p % by:
                continue
            floats = (2 * (bz + 2 * p) + 2 * bz) * (by + 16) * nx_p + (
                8 + _CANON_KIND_EXTRA["cheb"]
            ) * bz * by * nx_p
            # 13 MB here (vs _canon_by_from_shape's 11): the round-5
            # probes compiled (16, 40) at p=3 (12.9 MB estimate) and
            # failed from 13.7 MB estimates up — the budget sits
            # between the measured compile/fail boundary points
            if floats * 4 > 13 * 2**20:
                continue
            f = (bz + 2 * p) * (by + 16) / (bz * by)
            if f < best_f - 1e-9:
                best, best_f = (bz, by), f
    if force and best[0] != force and nzp % force == 0:
        # pinned bz admissible but never beat the default ⇒ pin anyway
        # (A/B runs need the arm, not the optimum)
        for by in range(min(256, ny_p - 8), 7, -8):
            if ny_p % by:
                continue
            floats = (
                2 * (force + 2 * p) + 2 * force
            ) * (by + 16) * nx_p + (
                8 + _CANON_KIND_EXTRA["cheb"]
            ) * force * by * nx_p
            if floats * 4 <= 13 * 2**20:
                return force, by
    return best


_CHEB_BZ_FORCE = 0  # module-level pin for in-process A/B (see above)


def canon_yb_for(spatial, p: int, dim: int, cheb: bool = False) -> int:
    """y-block size for the CANONICAL y-blocked kernels: 0 when the
    whole-plane canonical kernel fits (preferred), else the largest
    divisor of ny_p whose (z, y)-windowed working set fits scoped VMEM,
    else -1 (canonical unsupported at this size).

    The canonical y window carries a full 8-row sublane group of halo on
    each side (data at dst offset 8) so every DMA slice is
    sublane-aligned; boundary y blocks copy the in-bounds sub-window and
    zero the halo rows in VMEM (same discipline as ``_slab_dma_canon``).
    """
    if dim != 3:
        return 0
    return _canon_by_from_shape(
        canon_shape(spatial, p, 3), p, kind="cheb" if cheb else "apply"
    )


def canon_worthwhile(spatial, p: int, dim: int, limit: float = 1.5) -> bool:
    """Whether keeping a whole solve in the canonical layout pays off.

    The aligned shape must be near-tight enough that the inflation of
    every solver op stays below what the layout saves (two HBM passes
    per apply plus the in-kernel pad/slice work the classic path pays
    at the SAME inflated lane extent).  Measured on v5e (hw_sweep):
    m=63 p=1 (2.1x inflation) classic ~14-22 ms/step vs canon ~25 —
    reject; m=191 p=3 (1.41x: lanes 191->256) canon 276 ms vs classic
    393 (30% faster, round 3) — accept; m=127 p=1 (2.4%) canon 33 vs
    classic 57.  The limit sits between the measured 1.41-accept and
    the 2.1-reject.

    ``SPIRK_FORCE_CANON=1`` overrides to True — used by the CPU test
    suite to exercise the canonical solve paths on small grids.
    """
    if _os.environ.get("SPIRK_FORCE_CANON", "0") == "1":
        return True
    cs = canon_shape(spatial, p, dim)
    infl = 1.0
    for c, s in zip(cs, spatial):
        infl *= c / s
    return infl <= limit


def canon_supported(spatial, p: int, dim: int, cheb: bool = False) -> bool:
    """True when the canonical-layout kernels can run at this size:
    whole-plane (preferred) or the canonical y-blocked variant."""
    if not (1 <= p <= 4 and dim in (2, 3)):
        return False
    if dim == 2:
        ps = canon_shape(spatial, p, 2)
        return ps[0] * ps[1] * 4 <= 4 * 2**20
    nz = spatial[0]
    bz = _BZ if nz >= _BZ else 8
    if _ceil(nz, bz) < 2 * bz:  # first/last DMA branches must be distinct
        return False
    return canon_yb_for(spatial, p, dim, cheb=cheb) >= 0


def canon_shardable(spatial, p: int, dim: int, n_space: int) -> bool:
    """True when the canonical-layout kernels can run space-sharded over
    ``n_space`` devices: the canonical z extent splits evenly into
    per-device slabs of whole z blocks (the halo'd kernels run one
    uniform DMA window per block, so each shard needs >= one full bz
    block), and the per-shard plane geometry fits the same kernel
    variants as the unsharded layout (the by / x_roll decisions are
    z-blind).  3-D only — the reference's spatial domain decomposition
    (main.cc:3027; ghost exchange operator.h:379-421) maps to a p-plane
    ppermute halo exchange per apply (``ops/pallas/sharded.py``)."""
    if n_space == 1:
        return canon_supported(spatial, p, dim)
    if dim != 3 or not (1 <= p <= 4):
        return False
    nz_c = canon_shape(spatial, p, 3)[0]
    if nz_c % n_space:
        return False
    nzl = nz_c // n_space
    if nzl % _BZ or nzl < _BZ:
        return False
    # every kernel kind the sharded V-cycle dispatches must be feasible
    return (
        canon_yb_for(spatial, p, 3) >= 0
        and canon_yb_for(spatial, p, 3, cheb=True) >= 0
    )


def pad_canon(u, spatial, p: int, dim: int):
    """(q, *spatial) -> canonical layout (pads zero)."""
    ps = canon_shape(spatial, p, dim)
    pad = ((0, 0),) + tuple(
        (0, ps[i] - spatial[i]) for i in range(dim)
    )
    return jnp.pad(u, pad)


def unpad_canon(u_c, spatial, dim: int):
    return u_c[(slice(None),) + tuple(slice(0, s) for s in spatial)]


def _for_each_zy_case(iz_, iy_, nz_s, ny_s, p, bz, by, fn, halo_z=False):
    """Enumerate the (z, y) DMA window cases of the canonical y-blocked
    layout and call ``fn(cond, zs, zn, zd, ys, yn, yd)`` for each:
    first/last blocks copy the in-bounds sub-window to the matching end
    of the scratch window, mid blocks the full haloed window.  Branches
    that cannot occur are SKIPPED at trace time (their slice sizes may
    exceed the array when there are only first/last blocks).  Shared by
    the per-stage (``_slab_dma_canon_yb``) and all-stage
    (``_slab_dma_canon_yb_allq``) DMA helpers.

    ``halo_z``: the source carries p REAL halo planes at each z end (the
    space-sharded layout — neighbor-shard planes materialized by a
    ppermute exchange, ``ops/pallas/sharded.py``), so every z window is
    the uniform haloed read ``[iz*bz, iz*bz + bz + 2p)`` and no z
    boundary branches exist."""
    lastz = nz_s - 1
    lasty = ny_s - 1
    # (cond(iz), src_z_start, z_size, dst_z_off) — z_size/dst static
    if halo_z:
        z_cases = [(iz_ >= 0, iz_ * bz, bz + 2 * p, 0)]
    else:
        z_cases = [
            (iz_ == 0, jnp.int32(0), bz + p, p),
            (iz_ == lastz, lastz * bz - p, bz + p, 0),
        ]
    if not halo_z and nz_s > 2:
        z_cases.append(
            ((iz_ > 0) & (iz_ < lastz), iz_ * bz - p, bz + 2 * p, 0)
        )
    y_cases = [
        (iy_ == 0, jnp.int32(0), by + 8, 8),
        (iy_ == lasty, lasty * by - 8, by + 8, 0),
    ]
    if ny_s > 2:
        # start written as 8 * k so Mosaic's tile-divisibility prover
        # (sublane tiling 8) accepts the traced offset — the
        # equivalent ``iy * by - 8`` fails to prove on v5e
        y_cases.append(
            (
                (iy_ > 0) & (iy_ < lasty),
                8 * (iy_ * (by // 8) - 1),
                by + 16,
                0,
            )
        )
    for zc, zs, zn, zd in z_cases:
        for yc, ys, yn, yd in y_cases:
            fn(zc & yc, zs, zn, zd, ys, yn, yd)


def _slab_dma_canon_yb(u_hbm, scratch, sem, p: int, bz: int, by: int,
                       halo_z: bool = False):
    """Double-buffered (z, y)-windowed DMA for the canonical y-blocked
    kernels (zero-halo layout, grid (q, z-blocks, y-blocks)).

    z handling mirrors ``_slab_dma_canon`` (first/mid/last branches); the
    y window is ``[iy*by - 8, iy*by + by + 8)`` — full 8-row sublane
    groups of halo so every slice offset/extent stays sublane-aligned —
    with boundary blocks copying the in-bounds ``by + 8`` rows into the
    right end of the scratch window.  Missing halo rows/planes are
    zero-filled in VMEM; their couplings exit the domain so the standard
    band tables weight them by zero anyway.  Data rows sit at scratch y
    offset 8 (kernels slice ``[8 - p + k : 8 - p + k + by]``).

    ``halo_z``: the source carries p real halo planes at each z end (the
    space-sharded layout, ``ops/pallas/sharded.py``): uniform z windows,
    no z boundary branches, no z zero-fill.
    """
    iq = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    nq = pl.num_programs(0)
    # static block counts from the (static) operand shape — branches that
    # cannot occur must be SKIPPED at trace time (their slice sizes may
    # exceed the array when there are only first/last blocks)
    nz_s = (u_hbm.shape[1] - (2 * p if halo_z else 0)) // bz
    ny_s = u_hbm.shape[2] // by
    g = (iq * nz_s + iz) * ny_s + iy
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    def for_each_case(iz_, iy_, fn):
        _for_each_zy_case(iz_, iy_, nz_s, ny_s, p, bz, by, fn, halo_z=halo_z)

    def start_for(iq_, iz_, iy_, slot_):
        def issue(cond, zs, zn, zd, ys, yn, yd):
            @pl.when(cond)
            def _():
                pltpu.make_async_copy(
                    u_hbm.at[iq_, pl.ds(zs, zn), pl.ds(ys, yn)],
                    scratch.at[slot_, pl.ds(zd, zn), pl.ds(yd, yn)],
                    sem.at[slot_],
                ).start()

        for_each_case(iz_, iy_, issue)

    @pl.when(g == 0)
    def _():
        start_for(iq, iz, iy, slot)

    carry_y = iy + 1 >= ny_s
    niy = jnp.where(carry_y, 0, iy + 1)
    carry_z = carry_y & (iz + 1 >= nz_s)
    niz = jnp.where(carry_y, jnp.where(carry_z, 0, iz + 1), iz)
    niq = jnp.where(carry_z, iq + 1, iq)

    @pl.when(g + 1 < nq * nz_s * ny_s)
    def _():
        start_for(niq, niz, niy, nslot)

    def wait(cond, zs, zn, zd, ys, yn, yd):
        @pl.when(cond)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[iq, pl.ds(zs, zn), pl.ds(ys, yn)],
                scratch.at[slot, pl.ds(zd, zn), pl.ds(yd, yn)],
                sem.at[slot],
            ).wait()

    for_each_case(iz, iy, wait)

    # zero the halo planes/rows the boundary copies didn't write
    byw = by + 16
    zeros_z = jnp.zeros((p, byw) + scratch.shape[3:], scratch.dtype)
    zeros_y = jnp.zeros((bz + 2 * p, 8) + scratch.shape[3:], scratch.dtype)

    if not halo_z:
        @pl.when(iz == 0)
        def _():
            scratch[slot, pl.ds(0, p)] = zeros_z

        @pl.when(iz == nz_s - 1)
        def _():
            scratch[slot, pl.ds(bz + p, p)] = zeros_z

    @pl.when(iy == 0)
    def _():
        scratch[slot, :, pl.ds(0, 8)] = zeros_y

    @pl.when(iy == ny_s - 1)
    def _():
        scratch[slot, :, pl.ds(by + 8, 8)] = zeros_y

    return scratch.at[slot]


def _slab_scratch_canon_yb(bz: int, p: int, by: int, nx_p: int,
                           dtype=jnp.float32):
    return [
        pltpu.VMEM((2, bz + 2 * p, by + 16, nx_p), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _yslice(E, k: int, p: int, by: int):
    """Rows ``[8 - p + k, 8 - p + k + by)`` of a canonical-yb window via
    roll + aligned slice (cheap sublane rotate; direct unaligned slices
    cost sublane shifts)."""
    return _roll(E, -(8 - p + k), 1)[:, :by, :]


def _make_kernel_3d_canon_yb(p: int, residual: bool = False,
                             halo_z: bool = False):
    """Canonical y-blocked fused apply — zero-halo layout in AND out.
    Same mathematics as ``_make_kernel_3d_yb``; windowing differs (see
    ``_slab_dma_canon_yb``).  The x dot follows the ``_bf16_ok`` degree
    gate (bf16x3 at p=1 by default — this is the r8 production kernel —
    HIGHEST otherwise).  ``residual``: extra blocked input r; the kernel
    writes r - A u.  ``halo_z``: input carries p real z halo planes per
    end (space-sharded layout)."""
    nb = 2 * p + 1

    def kernel(w_ref, zb_ref, yb_ref, xmat_ref, u_hbm, *rest):
        if residual:
            r_ref, out_ref, scratch2, sem = rest
        else:
            (out_ref, scratch2, sem) = rest
            r_ref = None
        iq = pl.program_id(0)
        iz = pl.program_id(1)
        iy = pl.program_id(2)
        bz = out_ref.shape[1]
        by = out_ref.shape[2]
        scratch = _slab_dma_canon_yb(u_hbm, scratch2, sem, p, bz, by,
                                     halo_z=halo_z)
        a = w_ref[iq, 0]
        b = w_ref[iq, 1]
        zb = zb_ref[pl.ds(iz * bz, bz)]
        yb = yb_ref[pl.ds(iy * by, by)]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = scratch[k : k + bz]  # (bz, by + 16, nx_p)
            wm = zb[:, k].reshape(bz, 1, 1)
            ws = zb[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        E = a * Zm + b * Zk
        F = b * Zm
        C = None
        D = None
        for k in range(nb):
            sE = _yslice(E, k, p, by)
            sF = _yslice(F, k, p, by)
            wm = yb[:, k].reshape(1, by, 1)
            ws = yb[:, nb + k].reshape(1, by, 1)
            c_term = wm * sE + ws * sF
            d_term = wm * sF
            C = c_term if C is None else C + c_term
            D = d_term if D is None else D + d_term
        out = _x_dot(jnp.concatenate([C, D], axis=-1), xmat_ref[:], p)
        out_ref[0] = r_ref[0] - out if residual else out

    return kernel


def _make_kernel_ms_3d_canon_yb(p: int, halo_z: bool = False):
    nb = 2 * p + 1

    def kernel(
        zb_ref, yb_ref, xmat_ref, u_hbm, outm_ref, outk_ref, scratch2, sem
    ):
        iz = pl.program_id(1)
        iy = pl.program_id(2)
        bz = outm_ref.shape[1]
        by = outm_ref.shape[2]
        nx_p = outm_ref.shape[3]
        scratch = _slab_dma_canon_yb(u_hbm, scratch2, sem, p, bz, by,
                                     halo_z=halo_z)
        zb = zb_ref[pl.ds(iz * bz, bz)]
        yb = yb_ref[pl.ds(iy * by, by)]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = scratch[k : k + bz]
            wm = zb[:, k].reshape(bz, 1, 1)
            ws = zb[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        Cm = None
        Ck = None
        for k in range(nb):
            rm = _yslice(Zm, k, p, by)
            rk = _yslice(Zk, k, p, by)
            wm = yb[:, k].reshape(1, by, 1)
            ws = yb[:, nb + k].reshape(1, by, 1)
            cm_term = wm * rm
            ck_term = wm * rk + ws * rm
            Cm = cm_term if Cm is None else Cm + cm_term
            Ck = ck_term if Ck is None else Ck + ck_term
        outm_ref[0] = _x_dot(Cm, xmat_ref[:nx_p], p)
        outk_ref[0] = _x_dot(
            jnp.concatenate([Ck, Cm], axis=-1), xmat_ref[:]
        , p)

    return kernel


def _make_kernel_cheb_3d_canon_yb(p: int, diag: bool = False,
                                  halo_z: bool = False):
    nb = 2 * p + 1

    def kernel(w_ref, zb_ref, yb_ref, xmat_ref, *rest):
        if diag:
            (dgz_ref, dgy_ref, dgx_ref, d_hbm, r_ref, x_ref,
             r_out, d_out, x_out, scratch2, sem) = rest
        else:
            (d_hbm, r_ref, x_ref, invd_ref,
             r_out, d_out, x_out, scratch2, sem) = rest
        iq = pl.program_id(0)
        iz = pl.program_id(1)
        iy = pl.program_id(2)
        bz = r_out.shape[1]
        by = r_out.shape[2]
        scratch = _slab_dma_canon_yb(d_hbm, scratch2, sem, p, bz, by,
                                     halo_z=halo_z)
        # bf16-STORAGE state (``_CHEB_BF16``): d/r ride HBM in bf16; all
        # arithmetic is f32 in VMEM (astype is a no-op when already f32)
        f32 = jnp.float32
        a = w_ref[iq, 0]
        b = w_ref[iq, 1]
        c1 = w_ref[iq, 2]
        c2 = w_ref[iq, 3]
        zb = zb_ref[pl.ds(iz * bz, bz)]
        yb = yb_ref[pl.ds(iy * by, by)]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = scratch[k : k + bz].astype(f32)
            wm = zb[:, k].reshape(bz, 1, 1)
            ws = zb[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        E = a * Zm + b * Zk
        F = b * Zm
        C = None
        D = None
        for k in range(nb):
            sE = _yslice(E, k, p, by)
            sF = _yslice(F, k, p, by)
            wm = yb[:, k].reshape(1, by, 1)
            ws = yb[:, nb + k].reshape(1, by, 1)
            c_term = wm * sE + ws * sF
            d_term = wm * sF
            C = c_term if C is None else C + c_term
            D = d_term if D is None else D + d_term
        Ad = _x_dot(
            jnp.concatenate([C, D], axis=-1), xmat_ref[:]
        , p, force_bf16=_CHEB_DOT_BF16)
        r_new = r_ref[0].astype(f32) - Ad
        if diag:
            dgz = dgz_ref[pl.ds(iz * bz, bz)]
            dgy = dgy_ref[pl.ds(iy * by, by)]
            z = _dg_z(
                r_new, a, b,
                dgz[:, 0].reshape(bz, 1, 1), dgz[:, 1].reshape(bz, 1, 1),
                dgy[:, 0].reshape(1, by, 1), dgy[:, 1].reshape(1, by, 1),
                dgx_ref[0:1].reshape(1, 1, -1),
                dgx_ref[1:2].reshape(1, 1, -1),
            )
        else:
            z = invd_ref[0] * r_new
        # value-level y slice (offset 8 is sublane-aligned); a 2-D Ref
        # slice here failed Mosaic's tile-divisibility prover on v5e.
        # astype BEFORE the slice: on bf16 state the f32 copy restores
        # the (8, 128)-tiled layout the offset-8 slice is proven for
        dblk = scratch[p : p + bz].astype(f32)[:, 8 : 8 + by, :]
        d_new = c1 * dblk + c2 * z
        r_out[0] = r_new.astype(r_out.dtype)
        d_out[0] = d_new.astype(d_out.dtype)
        x_out[0] = x_ref[0] + d_new

    return kernel


# Tables are built IN-GRAPH from the small band constants (see
# ``_dense_padded``): only ~KB-scale band literals land in the program,
# XLA CSE merges repeated construction within a computation and
# while-loop LICM hoists it out of Krylov loops.  (A concrete-literal
# cache was tried first: JAX dedupes identical constants within one
# computation, but XLA re-embeds them in every called computation — the
# refinement-8 solve still carried 12+ copies of the 524 KB dual x
# table.)


def _tables_canon(ops: LevelOps, shape_c, p: int, dim: int, x_roll: bool,
                  y_mxu: bool = False):
    nx_p = shape_c[-1]
    if x_roll:
        xmat = _band_table_x(ops, nx_p)
    else:
        xmat = jnp.concatenate(
            [
                _dense_padded(ops.mass_band, nx_p).T,
                _dense_padded(ops.stiff_band, nx_p).T,
            ],
            axis=0,
        )
    if dim == 3:
        zb = _band_table(ops, shape_c[1])
        yb = (
            _band_table_y_mxu(ops, shape_c[2])
            if y_mxu
            else _band_table(ops, shape_c[2])
        )
        return zb, yb, xmat
    return None, _band_table(ops, shape_c[1]), xmat


@functools.partial(
    jax.jit,
    static_argnames=(
        "p", "dim", "interpret", "x_roll", "by", "y_mxu", "halo_z"
    ),
)
def _fused_apply_canon(w, zb, yb, xmat, u_c, r_c=None, *, p, dim, interpret,
                       x_roll, by=0, y_mxu=False, halo_z=False):
    from jax._src.config import enable_x64 as _scoped_x64

    residual = r_c is not None
    assert not residual or dim == 3, "residual epilogue is 3-D only"
    assert not halo_z or dim == 3, "halo_z (space-sharded) is 3-D only"
    with _scoped_x64(False):
        q = u_c.shape[0]
        nx_p = u_c.shape[-1]
        extra = [u_c, r_c] if residual else [u_c]
        if dim == 3:
            # halo_z: u_c carries p real halo planes per z end; the output
            # covers only the interior (the shard's own planes)
            nzp = u_c.shape[1] - (2 * p if halo_z else 0)
            ny_p = u_c.shape[2]
            out_shape3 = (q, nzp, ny_p, nx_p)
        if dim == 3 and by:
            bz = _BZ
            spec = pl.BlockSpec(
                (1, bz, by, nx_p), lambda iq, iz, iy: _i32(iq, iz, iy, 0)
            )
            return pl.pallas_call(
                _make_kernel_3d_canon_yb(p, residual=residual,
                                         halo_z=halo_z),
                grid=(q, nzp // bz, ny_p // by),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ] + ([spec] if residual else []),
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(out_shape3, jnp.float32),
                scratch_shapes=_slab_scratch_canon_yb(bz, p, by, nx_p),
                interpret=interpret,
            )(w, zb, yb, xmat, *extra)
        if dim == 3:
            bz = _BZ
            spec = pl.BlockSpec(
                (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
            )
            return pl.pallas_call(
                _make_kernel_3d(p, z_off=0, x_roll=x_roll,
                                canon=not halo_z, y_mxu=y_mxu,
                                residual=residual),
                grid=(q, nzp // bz),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ] + ([spec] if residual else []),
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(out_shape3, jnp.float32),
                scratch_shapes=_slab_scratch(bz, p, ny_p, nx_p),
                interpret=interpret,
            )(w, zb, yb, xmat, *extra)
        ny_p = u_c.shape[1]
        spec = pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0))
        return pl.pallas_call(
            _make_kernel_2d(p),
            grid=(q,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                spec,
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(u_c.shape, jnp.float32),
            interpret=interpret,
        )(w, yb, xmat, u_c)


def _check_canon_tables(tables, x_roll: bool, y_mxu: bool = False):
    """Guard the threaded-tables contract: the xmat/yb layouts must match
    the wrapper's resolved contraction paths.  The y-blocked canonical
    kernels always use the dense xmat (wrappers force x_roll off when
    by > 0), while ``canon_tables`` chooses the layout from the canonical
    shape alone — consistent for every shape the solvers produce (cubic
    grids), but nothing upstream enforces it, so fail loudly rather than
    feed a band table to a dot kernel (wrong shapes/results)."""
    if tables is None:
        return
    xmat = tables[2]
    # Shape-sniffing is EXACT for the shapes these builders produce:
    # dense xmat is (2*nx_p, nx_p) with nx_p >= 8 while band xmat has
    # <= 2*(2p+1) <= 18 rows and >= 128 columns (never 2:1); the MXU y
    # table is the only 3-D one.  A new table variant must keep these
    # invariants or extend this guard.
    is_dense = xmat.shape[0] == 2 * xmat.shape[1]
    if is_dense == x_roll:
        raise ValueError(
            f"canonical kernel tables were built for "
            f"{'the dense-dot' if is_dense else 'the lane-roll'} x path "
            f"but the kernel resolved x_roll={x_roll} "
            f"(xmat shape {tuple(xmat.shape)})"
        )
    yb = tables[1]
    if yb is not None:
        # MXU y table: stacked dense (2, ny_p, ny_p); band: 2D
        yb_dense = yb.ndim == 3
        if yb_dense != y_mxu:
            raise ValueError(
                f"canonical kernel tables were built for "
                f"{'the MXU' if yb_dense else 'the roll'} y path "
                f"but the kernel resolved y_mxu={y_mxu} "
                f"(yb shape {tuple(yb.shape)})"
            )


def canon_tables(ops: LevelOps, spatial, p: int, dim: int):
    """Kernel tables (zb, yb, xmat) for one level's canonical layout.

    Built once (e.g. inside ``gmg_reinit``) and THREADED as arguments to
    the canonical kernel wrappers via ``GMGPrec.canon_tables`` — in-graph
    construction at every call site measurably slowed the solve (~15% at
    refinement 7: XLA's while-loop LICM does not fully hoist it), while
    concrete literals blow up program size (XLA re-embeds them in every
    called computation; see the note above ``_tables_canon``).
    The layout must match the wrappers' own x_roll choice, which is a
    pure function of the canonical shape."""
    shape_c = (0,) + canon_shape(spatial, p, dim)  # leading batch unused
    x_roll = _x_roll_ok(p, dim, shape_c[-1])
    y_mxu = _y_mxu_canon(shape_c, p, dim)
    return _tables_canon(ops, shape_c, p, dim, x_roll, y_mxu)


def cheb_diag_supported(spatial, p: int, dim: int) -> bool:
    """True when the canonical Chebyshev kernel should compute the
    Jacobi diagonal in-kernel from 1D Kronecker factors (drops the invd
    read — 1 of the iteration's 7 HBM passes).  Only the y-blocked
    sizes (by > 0): there the iteration is HBM-bound and the saved pass
    measured 1.10x at refinement 8, while the small whole-plane grids
    are compute-bound and the per-element division made them 6% SLOWER
    (measured at refinement 7, p=1 — BASELINE round 4)."""
    return (
        dim == 3
        and canon_supported(spatial, p, dim, cheb=True)
        and canon_yb_for(spatial, p, dim, cheb=True) > 0
    )


def cheb_diag_tables(ops: LevelOps, spatial, p: int, dim: int):
    """1D Jacobi-diagonal factors (dgz, dgy, dgx) for one level's
    canonical layout: diag(aM + bK) = a·(mz⊗my⊗mx) + b·(kz⊗my⊗mx +
    mz⊗ky⊗mx + mz⊗my⊗kx) (``ops/mass_laplace.py::operator_diagonal``,
    reference ``operator.h:311-329``), rebuilt per element inside the
    Chebyshev kernel instead of reading a precomputed (q, m³) inverse
    from HBM.  Pad entries carry (mass 1, stiff 0) so the padded
    diagonal stays strictly positive and pad lanes of the (zero)
    residual map to z = 0/diag = 0 — the zero-halo invariant holds.
    dgz/dgy are (n_p, 2) sublane tables; dgx is (2, nx_p) along lanes."""
    nz_p, ny_p, nx_p = canon_shape(spatial, p, dim)[-3:]
    dm = jnp.asarray(ops.mass_diag, jnp.float32)
    dk = jnp.asarray(ops.stiff_diag, jnp.float32)
    m = dm.shape[0]

    def col(n_p):
        mc = jnp.ones((n_p,), jnp.float32).at[:m].set(dm)
        kc = jnp.zeros((n_p,), jnp.float32).at[:m].set(dk)
        return jnp.stack([mc, kc], axis=1)

    return col(nz_p), col(ny_p), col(nx_p).T


def _dg_z(r_new, a, b, zm, zk, ym, yk, xm, xk):
    """z = D⁻¹ r from the broadcast 1D diagonal factors (see
    ``cheb_diag_tables``); ~5 extra VPU ops/element in place of one full
    HBM read of invd."""
    zmym = zm * ym
    diag = (a * zmym + b * (zk * ym + zm * yk)) * xm + (b * zmym) * xk
    return r_new / diag


# ---------------------------------------------------------------------------
# paired Chebyshev: TWO smoother iterations per HBM round trip
# ---------------------------------------------------------------------------
#
# The fused Chebyshev iteration is HBM-bound at every degree (BASELINE
# round-4 roofline: 41-47% of its HBM max-bound as 7 — with the in-kernel
# diagonal 6 — logical passes).  Temporal blocking halves that: one
# kernel invocation computes iterations k and k+1, reading d (z-halo 2p),
# r (z-halo p) and x once and writing the three k+2 states once — ~7
# logical passes for TWO iterations.  Stage 1 runs the apply + update on
# an EXTENDED window (z: bz+2p planes, y: the full by+16 sublane window)
# so the intermediate d_{k+1} is valid on every tap stage 2 consumes;
# window rows beyond the domain get exact zeros (the pair band tables
# carry zero rows there and the pair diag factors (mass 1, stiff 0) keep
# the division finite), preserving the zero-halo invariant.
#
# The y window's 8-row halos bound the degree at p <= 4 (stage 1 consumes
# rows 8-2p..; stage 2's taps stay >= 8-p) — exactly the fused-kernel
# degree range.


def _cheb2_by(shape_c, p: int) -> int:
    """y-block size for the paired kernel: largest multiple-of-8 divisor
    of ny_p whose working set fits scoped VMEM (two double-buffered DMA
    scratches + extended stage-1 transients), else -1."""
    q, nz_p, ny_p, nx_p = shape_c
    bz = _BZ
    ez = bz + 2 * p
    for by in range(min(256, ny_p - 8), 7, -8):
        if ny_p % by:
            continue
        byw = by + 16
        floats = (
            2 * (bz + 4 * p) * byw  # d scratch (z-halo 2p, 2 slots)
            + 2 * ez * byw  # r scratch (z-halo p, 2 slots)
            + 8 * ez * byw  # stage-1 transients (E/F/C/D/Ad/r1/z1/d1)
            + 6 * bz * byw  # stage-2 transients
            + 8 * bz * by  # blocked x in + 3 outs, double-buffered
        ) * nx_p
        if floats * 4 <= 11 * 2**20:
            return by
    return -1


def cheb2_supported(spatial, p: int, dim: int, q: int) -> bool:
    """True when the paired Chebyshev kernel can run: y-blocked 3D
    canonical layout with the in-kernel diagonal (``cheb_diag_supported``)
    and a VMEM-feasible pair block.

    Default OFF (`SPIRK_CHEB_PAIR=1` opts in): measured SLOWER on v5e —
    0.73x at r8 p=1, 0.51x at r7 p=2 (scripts/cheb_pair_bench.py).  The
    single-iteration kernel already runs at ~84% of the HBM roof, so
    compute ≈ transfer under the double-buffered DMA; pairing halves the
    traffic but the halo-extended stage-1 window adds ~35-70% compute,
    a net loss at every production size (BASELINE round 4)."""
    if not _CHEB_PAIR:
        return False
    if not cheb_diag_supported(spatial, p, dim):
        return False
    shape_c = (q,) + canon_shape(spatial, p, dim)
    return _cheb2_by(shape_c, p) > 0


def cheb2_tables(ops: LevelOps, spatial, p: int, dim: int):
    """Extended-window tables for the paired Chebyshev kernel: the z/y
    band tables padded with 8 zero rows each side (row j ↔ global j − 8,
    so the kernel's aligned 24-row z loads and by+16 y window loads stay
    in range and out-of-domain outputs come out exactly zero), and the
    matching diag factors padded with (mass 1, stiff 0) rows so the
    extended division stays finite."""
    nz_p, ny_p, _ = canon_shape(spatial, p, dim)[-3:]
    zb = _band_table(ops, nz_p)
    yb = _band_table(ops, ny_p)
    zb_pair = jnp.pad(zb, ((8, 8), (0, 0)))
    yb_pair = jnp.pad(yb, ((8, 8), (0, 0)))
    dgz, dgy, _ = cheb_diag_tables(ops, spatial, p, dim)
    # rows outside the table: mass factor 1, stiffness factor 0
    pad10 = lambda t, h: jnp.stack(
        [
            jnp.pad(t[:, 0], (h, h), constant_values=1.0),
            jnp.pad(t[:, 1], (h, h), constant_values=0.0),
        ],
        axis=1,
    )
    dgz_pair = pad10(dgz, 8)
    dgy_pair = pad10(dgy, 8)
    return zb_pair, yb_pair, dgz_pair, dgy_pair


def _make_kernel_cheb2_3d_canon_yb(p: int):
    """TWO fused Chebyshev iterations per HBM round trip (see the module
    note above ``_cheb2_by``).  All stage-2 band/diag rows are trims of
    the 8-row-padded pair tables, so the kernel carries no duplicate
    standard tables; ``w`` is (q, 6): a, b, c1/c2 of iteration k and of
    iteration k+1."""
    nb = 2 * p + 1

    def kernel(
        w_ref, xmat_ref, zbp_ref, ybp_ref, dgzp_ref, dgyp_ref, dgx_ref,
        d_hbm, r_hbm, x_ref, r_out, d_out, x_out, dscr, dsem, rscr, rsem,
    ):
        iq = pl.program_id(0)
        iz = pl.program_id(1)
        iy = pl.program_id(2)
        bz = r_out.shape[1]
        by = r_out.shape[2]
        byw = by + 16
        ez = bz + 2 * p
        d0 = _slab_dma_canon_yb(d_hbm, dscr, dsem, 2 * p, bz, by)
        r0 = _slab_dma_canon_yb(r_hbm, rscr, rsem, p, bz, by)
        a = w_ref[iq, 0]
        b = w_ref[iq, 1]
        c1a = w_ref[iq, 2]
        c2a = w_ref[iq, 3]
        c1b = w_ref[iq, 4]
        c2b = w_ref[iq, 5]
        # aligned 24-row loads of the z-axis pair tables, trimmed at
        # value level (the trims' offsets are static)
        zbp_w = zbp_ref[pl.ds(iz * bz, 24)]
        dgzp_w = dgzp_ref[pl.ds(iz * bz, 24)]
        ybp_w = ybp_ref[pl.ds(iy * by, byw)]
        dgyp_w = dgyp_ref[pl.ds(iy * by, byw)]
        xm = dgx_ref[0:1].reshape(1, 1, -1)
        xk = dgx_ref[1:2].reshape(1, 1, -1)

        # ---- stage 1: iteration k on the extended window ------------
        # outputs e in [0, ez) sit at global z = iz*bz - p + e and span
        # the full by+16 y window; rows/planes outside the domain come
        # out exactly zero (zero pair-table rows x zero-filled halos)
        zb1 = zbp_w[8 - p : 8 - p + ez]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = d0[k : k + ez]
            wm = zb1[:, k].reshape(ez, 1, 1)
            ws = zb1[:, nb + k].reshape(ez, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        E = a * Zm + b * Zk
        F = b * Zm
        C = None
        D = None
        for k in range(nb):
            # full-window y pass via rolls: rows [8-p, 8+by+p) are
            # exact; edge rows are garbage but never consumed below
            rE = _roll(E, p - k, 1)
            rF = _roll(F, p - k, 1)
            wm = ybp_w[:, k].reshape(1, byw, 1)
            ws = ybp_w[:, nb + k].reshape(1, byw, 1)
            c_term = wm * rE + ws * rF
            d_term = wm * rF
            C = c_term if C is None else C + c_term
            D = d_term if D is None else D + d_term
        Ad0 = _x_dot(jnp.concatenate([C, D], axis=-1), xmat_ref[:], p,
                     force_bf16=_CHEB_DOT_BF16)
        r1 = r0[0:ez] - Ad0
        dgz1 = dgzp_w[8 - p : 8 - p + ez]
        z1 = _dg_z(
            r1, a, b,
            dgz1[:, 0].reshape(ez, 1, 1), dgz1[:, 1].reshape(ez, 1, 1),
            dgyp_w[:, 0].reshape(1, byw, 1),
            dgyp_w[:, 1].reshape(1, byw, 1),
            xm, xk,
        )
        d1 = c1a * d0[p : p + ez] + c2a * z1

        # ---- stage 2: iteration k+1 on the core block ----------------
        zb2 = zbp_w[8 : 8 + bz]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = d1[k : k + bz]
            wm = zb2[:, k].reshape(bz, 1, 1)
            ws = zb2[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        E = a * Zm + b * Zk
        F = b * Zm
        yb2 = ybp_w[8 : 8 + by]
        C = None
        D = None
        for k in range(nb):
            sE = _yslice(E, k, p, by)
            sF = _yslice(F, k, p, by)
            wm = yb2[:, k].reshape(1, by, 1)
            ws = yb2[:, nb + k].reshape(1, by, 1)
            c_term = wm * sE + ws * sF
            d_term = wm * sF
            C = c_term if C is None else C + c_term
            D = d_term if D is None else D + d_term
        Ad1 = _x_dot(jnp.concatenate([C, D], axis=-1), xmat_ref[:], p,
                     force_bf16=_CHEB_DOT_BF16)
        r1c = r1[p : p + bz][:, 8 : 8 + by, :]
        d1c = d1[p : p + bz][:, 8 : 8 + by, :]
        r2 = r1c - Ad1
        dgz2 = dgzp_w[8 : 8 + bz]
        dgy2 = dgyp_w[8 : 8 + by]
        z2 = _dg_z(
            r2, a, b,
            dgz2[:, 0].reshape(bz, 1, 1), dgz2[:, 1].reshape(bz, 1, 1),
            dgy2[:, 0].reshape(1, by, 1), dgy2[:, 1].reshape(1, by, 1),
            xm, xk,
        )
        d_new = c1b * d1c + c2b * z2
        r_out[0] = r2
        d_out[0] = d_new
        x_out[0] = x_ref[0] + d1c + d_new

    return kernel


def fused_cheb_pair_canon(
    ops: LevelOps, a, b, c1a, c2a, c1b, c2b, d_c, r_c, x_c, dim: int,
    *, tables=None, diag_tables=None, pair_tables=None,
    interpret: bool = False, force_yb: int = 0,
):
    """TWO fused Chebyshev iterations in one HBM round trip (canonical
    y-blocked 3D layout; gate with ``cheb2_supported``).  Same state
    convention as two chained ``fused_cheb_iter_canon`` calls with
    coefficients (c1a, c2a) then (c1b, c2b)."""
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    q = d_c.shape[0]
    to_q = lambda s: jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(s, jnp.float32)), (q,)
    )
    w = jnp.stack(
        [to_q(a), to_q(b), to_q(c1a), to_q(c2a), to_q(c1b), to_q(c2b)],
        axis=1,
    )
    by = force_yb or _cheb2_by(d_c.shape, p)
    if by <= 0:
        raise ValueError("paired cheb kernel unsupported at this size")
    # the pair kernel always contracts x with the dense table; threaded
    # tables carry it at every production pair size (by > 0 implies
    # nx_p >= 256, past the lane-roll range), but rebuild locally when
    # handed lane-roll tables (small forced-yb grids in tests)
    xmat = tables[2] if tables is not None else None
    if xmat is None or xmat.shape[0] != 2 * xmat.shape[1]:
        xmat = _tables_canon(ops, d_c.shape, p, dim, False)[2]
    if diag_tables is None or pair_tables is None:
        raise ValueError("paired cheb kernel needs diag + pair tables")
    dgx = diag_tables[2]
    zbp, ybp, dgzp, dgyp = pair_tables
    return _fused_cheb2_canon(
        w, xmat, zbp, ybp, dgzp, dgyp, dgx, d_c, r_c, x_c, p=p, by=by,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("p", "by", "interpret"))
def _fused_cheb2_canon(
    w, xmat, zbp, ybp, dgzp, dgyp, dgx, d_c, r_c, x_c, *, p, by, interpret
):
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        q, nzp, ny_p, nx_p = d_c.shape
        bz = _BZ
        shape = jax.ShapeDtypeStruct(d_c.shape, jnp.float32)
        blocked = pl.BlockSpec(
            (1, bz, by, nx_p), lambda iq, iz, iy: _i32(iq, iz, iy, 0)
        )
        return pl.pallas_call(
            _make_kernel_cheb2_3d_canon_yb(p),
            grid=(q, nzp // bz, ny_p // by),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *([pl.BlockSpec(memory_space=pltpu.VMEM)] * 6),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                blocked,
            ],
            out_specs=(blocked, blocked, blocked),
            out_shape=(shape, shape, shape),
            scratch_shapes=[
                pltpu.VMEM((2, bz + 4 * p, by + 16, nx_p), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, bz + 2 * p, by + 16, nx_p), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(w, xmat, zbp, ybp, dgzp, dgyp, dgx, d_c, r_c, x_c)


def fused_stencil_apply_canon(
    ops: LevelOps, a, b, u_c, dim: int, *, interpret: bool = False,
    force_yb: int = 0, tables=None, sub_from=None, halo_z: bool = False,
):
    """(a M + b K) on a canonical-layout stage block — ONE HBM round trip,
    pads in == zero implies pads out == zero (no scrubs).

    ``sub_from`` (3-D only): return ``sub_from - (a M + b K) u`` with the
    subtraction in the kernel epilogue — the V-cycle's restriction
    residual pays 3 HBM passes instead of apply + XLA subtract (5).

    ``halo_z`` (3-D only): ``u_c`` carries p REAL halo planes at each z
    end (one space shard of a z-sharded field, neighbor planes already
    exchanged — ``ops/pallas/sharded.py``); the output covers the
    interior planes only, and the threaded ``tables``' z band rows must
    correspond to the shard's own rows."""
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    q = u_c.shape[0]
    a_arr = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(a, jnp.float32)), (q,))
    b_arr = jnp.broadcast_to(jnp.asarray(b, jnp.float32), (q,))
    w = jnp.stack([a_arr, b_arr], axis=1)
    # by / x_roll / y_mxu are pure functions of the plane geometry
    # (z-blind), so halo'd and zero-halo shapes resolve identically
    by = force_yb or _canon_by(u_c, p, dim)
    x_roll = (not by) and _x_roll_ok(p, dim, u_c.shape[-1])
    y_mxu = (not by) and _y_mxu_canon(u_c.shape, p, dim)
    _check_canon_tables(tables, x_roll, y_mxu)
    if halo_z and tables is None:
        # the z band rows are GLOBAL per-row weights; a halo'd local
        # shape cannot reconstruct them — the sharded wrapper slices the
        # global tables per shard (ops/pallas/sharded.py)
        raise ValueError("halo_z requires per-shard threaded tables")
    zb, yb, xmat = (
        tables
        if tables is not None
        else _tables_canon(ops, u_c.shape, p, dim, x_roll, y_mxu)
    )
    if sub_from is not None and dim != 2:
        return _fused_apply_canon(
            w, zb, yb, xmat, u_c, sub_from, p=p, dim=dim,
            interpret=interpret, x_roll=x_roll, by=by, y_mxu=y_mxu,
            halo_z=halo_z,
        )
    out = _fused_apply_canon(
        w, zb, yb, xmat, u_c, p=p, dim=dim, interpret=interpret,
        x_roll=x_roll, by=by, y_mxu=y_mxu, halo_z=halo_z,
    )
    return out if sub_from is None else sub_from - out


@functools.partial(
    jax.jit,
    static_argnames=(
        "p", "dim", "interpret", "x_roll", "by", "y_mxu", "halo_z"
    ),
)
def _fused_ms_apply_canon(zb, yb, xmat, u_c, *, p, dim, interpret, x_roll,
                          by=0, y_mxu=False, halo_z=False):
    from jax._src.config import enable_x64 as _scoped_x64

    assert not halo_z or dim == 3, "halo_z (space-sharded) is 3-D only"
    with _scoped_x64(False):
        q = u_c.shape[0]
        nx_p = u_c.shape[-1]
        if dim == 3:
            nzp = u_c.shape[1] - (2 * p if halo_z else 0)
            ny_p = u_c.shape[2]
            shape = jax.ShapeDtypeStruct((q, nzp, ny_p, nx_p), jnp.float32)
        else:
            shape = jax.ShapeDtypeStruct(u_c.shape, jnp.float32)
        if dim == 3 and by:
            bz = _BZ
            spec = pl.BlockSpec(
                (1, bz, by, nx_p), lambda iq, iz, iy: _i32(iq, iz, iy, 0)
            )
            return pl.pallas_call(
                _make_kernel_ms_3d_canon_yb(p, halo_z=halo_z),
                grid=(q, nzp // bz, ny_p // by),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=(spec, spec),
                out_shape=(shape, shape),
                scratch_shapes=_slab_scratch_canon_yb(bz, p, by, nx_p),
                interpret=interpret,
            )(zb, yb, xmat, u_c)
        if dim == 3:
            bz = _BZ
            spec = pl.BlockSpec(
                (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
            )
            return pl.pallas_call(
                _make_kernel_ms_3d(p, z_off=0, x_roll=x_roll,
                                   canon=not halo_z, y_mxu=y_mxu),
                grid=(q, nzp // bz),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=(spec, spec),
                out_shape=(shape, shape),
                scratch_shapes=_slab_scratch(bz, p, ny_p, nx_p),
                interpret=interpret,
            )(zb, yb, xmat, u_c)
        ny_p = u_c.shape[1]
        spec = pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0))
        return pl.pallas_call(
            _make_kernel_ms_2d(p),
            grid=(q,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                spec,
            ],
            out_specs=(spec, spec),
            out_shape=(shape, shape),
            interpret=interpret,
        )(yb, xmat, u_c)


def fused_mass_stiffness_apply_canon(
    ops: LevelOps, u_c, dim: int, *, interpret: bool = False,
    force_yb: int = 0, tables=None, halo_z: bool = False,
):
    """(M u, K u) on a canonical-layout stage block, one HBM pass.
    ``halo_z``: see ``fused_stencil_apply_canon``."""
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    by = force_yb or _canon_by(u_c, p, dim, kind="ms")
    x_roll = (not by) and _x_roll_ok(p, dim, u_c.shape[-1])
    y_mxu = (not by) and _y_mxu_canon(u_c.shape, p, dim)
    _check_canon_tables(tables, x_roll, y_mxu)
    if halo_z and tables is None:
        raise ValueError("halo_z requires per-shard threaded tables")
    zb, yb, xmat = (
        tables
        if tables is not None
        else _tables_canon(ops, u_c.shape, p, dim, x_roll, y_mxu)
    )
    return _fused_ms_apply_canon(
        zb, yb, xmat, u_c, p=p, dim=dim, interpret=interpret,
        x_roll=x_roll, by=by, y_mxu=y_mxu, halo_z=halo_z,
    )


def fused_cheb_iter_canon(
    ops: LevelOps, a, b, c1, c2, d_c, r_c, x_c, invd_c, dim: int,
    *, interpret: bool = False, force_yb: int = 0, tables=None,
    diag_tables=None, halo_z: bool = False, force_bz: int = 0,
):
    """One fused Chebyshev iteration on canonical-layout stage blocks
    (3D): r' = r - A d;  d' = c1 d + c2 D^{-1} r';  x' = x + d' in a
    single HBM pass.  Pads of every input zero implies pads of every
    output zero — nothing to re-zero.

    With ``diag_tables`` (from ``cheb_diag_tables``) the kernel rebuilds
    D⁻¹ in-kernel from the 1D Kronecker factors instead of reading
    ``invd_c`` — one fewer HBM pass per iteration (``invd_c`` may then
    be None).

    ``halo_z`` (3-D only): ``d_c`` (the apply operand) carries p REAL
    halo planes per z end — one space shard, neighbor planes exchanged
    (``ops/pallas/sharded.py``); r/x/invd and all outputs are interior.
    Requires per-shard threaded tables (z rows sliced to the shard)."""
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    q = d_c.shape[0]
    to_q = lambda s: jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(s, jnp.float32)), (q,)
    )
    w = jnp.stack([to_q(a), to_q(b), to_q(c1), to_q(c2)], axis=1)
    if force_yb:
        by, bzk = force_yb, force_bz
    else:
        # joint (bz, by) geometry: minimizes the d-window DMA re-read
        # on the y-blocked path (the p >= 2 binder, see cheb_canon_geom)
        bzk, by = cheb_canon_geom(d_c.shape, p, dim)
        bzk = force_bz or (0 if halo_z else bzk)
    x_roll = (not by) and _x_roll_ok(p, dim, d_c.shape[-1])
    y_mxu = (not by) and _y_mxu_canon(d_c.shape, p, dim)
    _check_canon_tables(tables, x_roll, y_mxu)
    if halo_z and tables is None:
        raise ValueError("halo_z requires per-shard threaded tables")
    zb, yb, xmat = (
        tables
        if tables is not None
        else _tables_canon(ops, d_c.shape, p, dim, x_roll, y_mxu)
    )
    if diag_tables is not None and dim == 3:
        dgz, dgy, dgx = diag_tables
        return _fused_cheb_canon_dg(
            w, zb, yb, xmat, dgz, dgy, dgx, d_c, r_c, x_c, p=p,
            interpret=interpret, x_roll=x_roll, by=by, y_mxu=y_mxu,
            halo_z=halo_z, bzk=bzk,
        )
    return _fused_cheb_canon(
        w, zb, yb, xmat, d_c, r_c, x_c, invd_c, p=p,
        interpret=interpret, x_roll=x_roll, by=by, y_mxu=y_mxu,
        halo_z=halo_z, bzk=bzk,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "p", "interpret", "x_roll", "by", "y_mxu", "halo_z", "bzk"
    ),
)
def _fused_cheb_canon_dg(
    w, zb, yb, xmat, dgz, dgy, dgx, d_c, r_c, x_c, *, p, interpret, x_roll,
    by=0, y_mxu=False, halo_z=False, bzk=0,
):
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        # halo_z: d (the DMA'd apply operand) carries p real z halo planes
        # per end; the blocked r/x operands and all outputs are interior
        q, _nzd, ny_p, nx_p = d_c.shape
        nzp = r_c.shape[1]
        bz = (bzk or _BZ) if by else _BZ
        if r_c.dtype != d_c.dtype:
            raise TypeError("cheb state (r, d) dtypes must match")
        shape = jax.ShapeDtypeStruct(r_c.shape, jnp.float32)
        small = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        if by:
            # r/d outputs keep the state dtype (bf16 under _CHEB_BF16);
            # x keeps its own (f32 — the V-cycle output)
            shape_s = jax.ShapeDtypeStruct(r_c.shape, d_c.dtype)
            shape_x = jax.ShapeDtypeStruct(x_c.shape, x_c.dtype)
            blocked = pl.BlockSpec(
                (1, bz, by, nx_p), lambda iq, iz, iy: _i32(iq, iz, iy, 0)
            )
            return pl.pallas_call(
                _make_kernel_cheb_3d_canon_yb(p, diag=True, halo_z=halo_z),
                grid=(q, nzp // bz, ny_p // by),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    *small,
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    blocked,
                    blocked,
                ],
                out_specs=(blocked, blocked, blocked),
                out_shape=(shape_s, shape_s, shape_x),
                scratch_shapes=_slab_scratch_canon_yb(
                    bz, p, by, nx_p, dtype=d_c.dtype
                ),
                interpret=interpret,
            )(w, zb, yb, xmat, dgz, dgy, dgx, d_c, r_c, x_c)
        if d_c.dtype != jnp.float32:
            raise TypeError(
                "bf16 cheb state is y-blocked-only (whole-plane kernels "
                "are compute-bound; see _CHEB_BF16)"
            )
        blocked = pl.BlockSpec(
            (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
        )
        return pl.pallas_call(
            _make_kernel_cheb_3d(
                p, x_roll=x_roll, canon=not halo_z, y_mxu=y_mxu, diag=True,
                halo_z=halo_z,
            ),
            grid=(q, nzp // bz),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *small,
                pl.BlockSpec(memory_space=pltpu.ANY),
                blocked,
                blocked,
            ],
            out_specs=(blocked, blocked, blocked),
            out_shape=(shape, shape, shape),
            scratch_shapes=_slab_scratch(bz, p, ny_p, nx_p),
            interpret=interpret,
        )(w, zb, yb, xmat, dgz, dgy, dgx, d_c, r_c, x_c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "p", "interpret", "x_roll", "by", "y_mxu", "halo_z", "bzk"
    ),
)
def _fused_cheb_canon(
    w, zb, yb, xmat, d_c, r_c, x_c, invd_c, *, p, interpret, x_roll, by=0,
    y_mxu=False, halo_z=False, bzk=0,
):
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        # halo_z: d carries p real z halo planes per end (see
        # _fused_cheb_canon_dg); r/x/invd and the outputs are interior
        q, _nzd, ny_p, nx_p = d_c.shape
        nzp = r_c.shape[1]
        bz = (bzk or _BZ) if by else _BZ
        if r_c.dtype != d_c.dtype:
            raise TypeError("cheb state (r, d) dtypes must match")
        shape = jax.ShapeDtypeStruct(r_c.shape, jnp.float32)
        if by:
            # see _fused_cheb_canon_dg: bf16 state rides the y-blocked path
            shape_s = jax.ShapeDtypeStruct(r_c.shape, d_c.dtype)
            shape_x = jax.ShapeDtypeStruct(x_c.shape, x_c.dtype)
            blocked = pl.BlockSpec(
                (1, bz, by, nx_p), lambda iq, iz, iy: _i32(iq, iz, iy, 0)
            )
            return pl.pallas_call(
                _make_kernel_cheb_3d_canon_yb(p, halo_z=halo_z),
                grid=(q, nzp // bz, ny_p // by),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    blocked,
                    blocked,
                    blocked,
                ],
                out_specs=(blocked, blocked, blocked),
                out_shape=(shape_s, shape_s, shape_x),
                scratch_shapes=_slab_scratch_canon_yb(
                    bz, p, by, nx_p, dtype=d_c.dtype
                ),
                interpret=interpret,
            )(w, zb, yb, xmat, d_c, r_c, x_c, invd_c)
        if d_c.dtype != jnp.float32:
            raise TypeError(
                "bf16 cheb state is y-blocked-only (whole-plane kernels "
                "are compute-bound; see _CHEB_BF16)"
            )
        blocked = pl.BlockSpec(
            (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz, 0, 0)
        )
        return pl.pallas_call(
            _make_kernel_cheb_3d(p, x_roll=x_roll, canon=not halo_z,
                                 y_mxu=y_mxu, halo_z=halo_z),
            grid=(q, nzp // bz),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                blocked,
                blocked,
                blocked,
            ],
            out_specs=(blocked, blocked, blocked),
            out_shape=(shape, shape, shape),
            scratch_shapes=_slab_scratch(bz, p, ny_p, nx_p),
            interpret=interpret,
        )(w, zb, yb, xmat, d_c, r_c, x_c, invd_c)


# ---------------------------------------------------------------------------
# stage-coupled canonical kernels: the q x q stage mixing in-kernel
# ---------------------------------------------------------------------------
#
# The IRK solve interleaves the separable operator applies with DENSE
# stage couplings (A^{-1}, T, T^{-1} — the reference's basis changes,
# main.cc:1443-1534).  As XLA dots these mixes cost ~4 HBM passes each
# over the full (q, m^3) field (~2.6 ms per mix at refinement 8, ~18
# mixes per solve — the largest non-kernel slice of the r8 step,
# ROUND3_NOTES).  Two kernels remove that traffic:
#
#  * ``stage_mix_canon``          — the standalone mix as ONE read + ONE
#    write pass: the grid covers row blocks, each step holds all q
#    stages of its block in VMEM and emits all q outputs.
#  * ``fused_ms_mix_apply_canon`` — the outer-system vmult
#    ``A^{-1} (M W) + tau (K W)`` (reference main.cc:1556-1591 /
#    :1014-1028) in one kernel: the grid covers spatial blocks only,
#    each step DMAs the haloed windows of ALL q stages, runs the dual
#    mass/stiffness z/y/x passes per stage in VMEM, and accumulates the
#    q x q mix on the block results — one HBM read of W and one write of
#    the result, replacing the ms kernel's (MW, KW) write plus the
#    mix einsum's read-combine-write.


def _slab_dma_canon_yb_allq(u_hbm, scratch, sem, p: int, bz: int, by: int):
    """Double-buffered (z, y)-windowed DMA of ALL q stages per grid step
    (grid (z-blocks, y-blocks)): identical window logic to
    ``_slab_dma_canon_yb`` with the stage axis copied whole — the
    stage-mixing kernel needs every stage's window resident to contract
    the q x q coupling in VMEM."""
    iz = pl.program_id(0)
    iy = pl.program_id(1)
    nz_s = u_hbm.shape[1] // bz
    ny_s = u_hbm.shape[2] // by
    g = iz * ny_s + iy
    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    def start_for(iz_, iy_, slot_):
        def issue(cond, zs, zn, zd, ys, yn, yd):
            @pl.when(cond)
            def _():
                pltpu.make_async_copy(
                    u_hbm.at[:, pl.ds(zs, zn), pl.ds(ys, yn)],
                    scratch.at[slot_, :, pl.ds(zd, zn), pl.ds(yd, yn)],
                    sem.at[slot_],
                ).start()

        _for_each_zy_case(iz_, iy_, nz_s, ny_s, p, bz, by, issue)

    @pl.when(g == 0)
    def _():
        start_for(iz, iy, slot)

    carry_y = iy + 1 >= ny_s
    niy = jnp.where(carry_y, 0, iy + 1)
    niz = jnp.where(carry_y, iz + 1, iz)

    @pl.when(g + 1 < nz_s * ny_s)
    def _():
        start_for(niz, niy, nslot)

    def wait(cond, zs, zn, zd, ys, yn, yd):
        @pl.when(cond)
        def _():
            pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(zs, zn), pl.ds(ys, yn)],
                scratch.at[slot, :, pl.ds(zd, zn), pl.ds(yd, yn)],
                sem.at[slot],
            ).wait()

    _for_each_zy_case(iz, iy, nz_s, ny_s, p, bz, by, wait)

    # zero the halo planes/rows the boundary copies didn't write
    q = scratch.shape[1]
    byw = by + 16
    zeros_z = jnp.zeros((q, p, byw) + scratch.shape[4:], scratch.dtype)
    zeros_y = jnp.zeros(
        (q, bz + 2 * p, 8) + scratch.shape[4:], scratch.dtype
    )

    @pl.when(iz == 0)
    def _():
        scratch[slot, :, pl.ds(0, p)] = zeros_z

    @pl.when(iz == nz_s - 1)
    def _():
        scratch[slot, :, pl.ds(bz + p, p)] = zeros_z

    @pl.when(iy == 0)
    def _():
        scratch[slot, :, :, pl.ds(0, 8)] = zeros_y

    @pl.when(iy == ny_s - 1)
    def _():
        scratch[slot, :, :, pl.ds(by + 8, 8)] = zeros_y

    return scratch.at[slot]


def _make_kernel_stage_mix(q_out: int, q_in: int):
    def kernel(mat_ref, w_ref, out_ref):
        for i in range(q_out):
            acc = None
            for j in range(q_in):
                term = mat_ref[i, j] * w_ref[j]
                acc = term if acc is None else acc + term
            out_ref[i] = acc

    return kernel


def _mix_rows_block(n_rows: int, nx_p: int, q_out: int, q_in: int) -> int:
    """Row-block size for ``stage_mix_canon``: the largest multiple-of-8
    divisor of ``n_rows`` whose pipelined in+out blocks (2 buffers each
    side) fit the budget; 0 when none does.  At huge fields (> 100 MB)
    the budget drops to 2 MB — the r8 block sweep
    (`scripts/mix_br_sweep.py`) measured 429 GB/s at the 2 MB footprint
    vs 341-352 at 4-8 MB; small fields keep 6 MB (r7 mixes are ~0.03 ms
    at any block size)."""
    huge = q_in * n_rows * nx_p * 4 > 100 * 2**20
    budget = (2 if huge else 6) * 2**20
    best = 0
    for br in range(8, n_rows + 1, 8):
        if n_rows % br:
            continue
        if 2 * (q_in + q_out) * br * nx_p * 4 <= budget:
            best = br
        else:
            break
    return best


@functools.partial(
    jax.jit, static_argnames=("q_out", "q_in", "br", "interpret")
)
def _stage_mix_canon(mat, w2, *, q_out, q_in, br, interpret):
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        n_rows, nx_p = w2.shape[1], w2.shape[2]
        return pl.pallas_call(
            _make_kernel_stage_mix(q_out, q_in),
            grid=(n_rows // br,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((q_in, br, nx_p), lambda ir: _i32(0, ir, 0)),
            ],
            out_specs=pl.BlockSpec(
                (q_out, br, nx_p), lambda ir: _i32(0, ir, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (q_out, n_rows, nx_p), jnp.float32
            ),
            interpret=interpret,
        )(mat, w2)


def stage_mix_canon(mat, W_c, *, interpret: bool = False):
    """Dense stage mix ``out_i = sum_j mat[i, j] W_j`` on an aligned
    (canonical/padded) f32 stage block as ONE HBM pass — each grid step
    holds a row block of all stages in VMEM, so every input element is
    read once and every output written once (the XLA dot moves ~4 passes
    at production sizes).  Falls back to the reshaped GEMM off the
    aligned layouts.  Reference semantics: ``perform_basis_change``
    (main.cc:1486-1534) on the batched layout."""
    interpret = interpret or _INTERPRET
    q_out, q_in = mat.shape
    nx_p = W_c.shape[-1]
    n_rows = 1
    for s in W_c.shape[1:-1]:
        n_rows *= s
    br = (
        _mix_rows_block(n_rows, nx_p, q_out, q_in)
        if (W_c.dtype == jnp.float32 and nx_p % 128 == 0 and n_rows % 8 == 0)
        else 0
    )
    if br == 0:
        out = mat @ W_c.reshape(q_in, -1)
        return out.reshape((q_out,) + W_c.shape[1:])
    out = _stage_mix_canon(
        mat.astype(jnp.float32),
        W_c.reshape(q_in, n_rows, nx_p),
        q_out=q_out,
        q_in=q_in,
        br=br,
        interpret=interpret,
    )
    return out.reshape((q_out,) + W_c.shape[1:])


def _ms_mix_by(shape_c, p: int, q: int) -> int:
    """y-block size for the fused mix-vmult kernel: the largest
    multiple-of-8 divisor of ny_p (<= ny_p/2 so first/last DMA branches
    stay distinct) whose ALL-STAGE working set fits the 11 MB
    scoped-VMEM budget; -1 when none fits (callers fall back to the
    unfused ms kernel + einsum)."""
    ny_p, nx_p = shape_c[-2], shape_c[-1]
    bz = _BZ
    start = (ny_p // 2) // 8 * 8
    for by in range(min(256, start), 7, -8):
        if ny_p % by:
            continue
        byw = by + 16
        floats = (
            2 * q * (bz + 2 * p) * byw  # 2-slot all-stage DMA scratch
            + 2 * q * bz * by  # double-buffered all-stage output block
            + q * bz * by  # q mix accumulators
            + 6 * bz * byw  # Zm/Zk/Cm/Ck + dot operand transients
        ) * nx_p
        if floats * 4 <= 11 * 2**20:
            return by
    return -1


def ms_mix_supported(spatial, p: int, dim: int, q: int) -> bool:
    """True when ``fused_ms_mix_apply_canon`` can run at this size: 3D
    canonical layout, non-MXU y path (the threaded tables must be the
    band/dense layouts this kernel reads), and an all-stage y block that
    fits VMEM."""
    if dim != 3 or not (1 <= p <= 4):
        return False
    if not canon_supported(spatial, p, dim):
        return False
    shape_c = (q,) + canon_shape(spatial, p, dim)
    if _y_mxu_canon(shape_c, p, dim):
        return False
    return _ms_mix_by(shape_c, p, q) > 0


def _make_kernel_ms_mix_3d_canon_yb(p: int, q: int, x_roll: bool):
    """out_i = sum_j mw[i, j] (M u_j) + mw[q, i] (K u_i) — the dual
    mass/stiffness passes of ``_make_kernel_ms_3d_canon_yb`` run per
    stage with the q x q mix accumulated on the block results in VMEM;
    row q of the SMEM ``mw`` table carries the stiffness (tau) weights."""
    nb = 2 * p + 1

    def kernel(mw_ref, zb_ref, yb_ref, xmat_ref, u_hbm, out_ref, scratch2,
               sem):
        iz = pl.program_id(0)
        iy = pl.program_id(1)
        bz = out_ref.shape[1]
        by = out_ref.shape[2]
        nx_p = out_ref.shape[3]
        scratch = _slab_dma_canon_yb_allq(u_hbm, scratch2, sem, p, bz, by)
        zb = zb_ref[pl.ds(iz * bz, bz)]
        yb = yb_ref[pl.ds(iy * by, by)]
        accs = [None] * q
        for j in range(q):
            Zm = None
            Zk = None
            for k in range(nb):
                plane = scratch[j, k : k + bz]
                wm = zb[:, k].reshape(bz, 1, 1)
                ws = zb[:, nb + k].reshape(bz, 1, 1)
                Zm = wm * plane if Zm is None else Zm + wm * plane
                Zk = ws * plane if Zk is None else Zk + ws * plane
            Cm = None
            Ck = None
            for k in range(nb):
                rm = _yslice(Zm, k, p, by)
                rk = _yslice(Zk, k, p, by)
                wm = yb[:, k].reshape(1, by, 1)
                ws = yb[:, nb + k].reshape(1, by, 1)
                cm_term = wm * rm
                ck_term = wm * rk + ws * rm
                Cm = cm_term if Cm is None else Cm + cm_term
                Ck = ck_term if Ck is None else Ck + ck_term
            if x_roll:
                MWb = None
                KWb = None
                for k in range(nb):
                    rcm = _roll(Cm, p - k, 2)
                    rck = _roll(Ck, p - k, 2)
                    wm = xmat_ref[k].reshape(1, 1, -1)
                    ws = xmat_ref[nb + k].reshape(1, 1, -1)
                    MWb = wm * rcm if MWb is None else MWb + wm * rcm
                    t = wm * rck + ws * rcm
                    KWb = t if KWb is None else KWb + t
            else:
                MWb = _x_dot(Cm, xmat_ref[:nx_p], p)
                KWb = _x_dot(
                    jnp.concatenate([Ck, Cm], axis=-1), xmat_ref[:], p
                )
            for i in range(q):
                t = mw_ref[i, j] * MWb
                accs[i] = t if accs[i] is None else accs[i] + t
            accs[j] = accs[j] + mw_ref[q, j] * KWb
        for i in range(q):
            out_ref[i] = accs[i]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("p", "q", "by", "x_roll", "interpret")
)
def _fused_ms_mix_canon(mw, zb, yb, xmat, u_c, *, p, q, by, x_roll,
                        interpret):
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        nzp, ny_p, nx_p = u_c.shape[1], u_c.shape[2], u_c.shape[3]
        bz = _BZ
        return pl.pallas_call(
            _make_kernel_ms_mix_3d_canon_yb(p, q, x_roll),
            grid=(nzp // bz, ny_p // by),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (q, bz, by, nx_p), lambda iz, iy: _i32(0, iz, iy, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(u_c.shape, jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, q, _BZ + 2 * p, by + 16, nx_p), jnp.float32
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(mw, zb, yb, xmat, u_c)


def fused_ms_mix_apply_canon(
    ops: LevelOps, mat, tau, u_c, dim: int, *, interpret: bool = False,
    force_yb: int = 0, tables=None,
):
    """``out_i = sum_j mat[i, j] (M u_j) + tau (K u_i)`` — the outer
    SystemMatrix vmult (reference main.cc:1556-1591, "reduced vmults"
    main.cc:1014-1028) on a canonical-layout stage block in ONE HBM
    round trip.  ``mat`` is the q x q stage coupling (A^{-1});
    the unfused equivalent is ``mix(mat, MW) + tau * KW`` over
    ``fused_mass_stiffness_apply_canon``."""
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    q = u_c.shape[0]
    by = force_yb or _ms_mix_by(u_c.shape, p, q)
    if by <= 0:
        raise ValueError("ms-mix kernel unsupported at this size")
    # layout contract: same resolution as canon_tables (x_roll is a pure
    # function of the canonical shape; the MXU y path is gated off in
    # ms_mix_supported)
    x_roll = _x_roll_ok(p, dim, u_c.shape[-1])
    _check_canon_tables(tables, x_roll)
    zb, yb, xmat = (
        tables
        if tables is not None
        else _tables_canon(ops, u_c.shape, p, dim, x_roll, False)
    )
    tau_row = jnp.broadcast_to(jnp.asarray(tau, jnp.float32), (1, q))
    mw = jnp.concatenate([mat.astype(jnp.float32), tau_row], axis=0)
    return _fused_ms_mix_canon(
        mw, zb, yb, xmat, u_c, p=p, q=q, by=by, x_roll=x_roll,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# zero-copy padded layout (used inside the multigrid V-cycle)
# ---------------------------------------------------------------------------
#
# Every per-apply jnp.pad / slice is a full extra HBM pass.  Inside the
# V-cycle the smoother applies the operator ~10x per level, so fields are
# kept in a *canonical padded layout* across the whole cycle:
#
#   3D: (q, bz + nzp + bz, ny_p, nx_p), data block at z-offset bz
#   2D: (q, ny_p, nx_p),                data block at offset 0
#
# The leading/trailing z halo blocks let the slab DMA read its p-plane
# halo without any repadding; their contents are IRRELEVANT GARBAGE —
# per-row band weights are zero for every out-of-range coupling, so halo
# and pad values never reach valid output rows, and all V-cycle operations
# (smoothing, residuals, transfers) are elementwise or band applications
# that never reduce over the pad region.


def padded_shape(spatial, p: int, dim: int):
    """Canonical padded shape (without the leading batch axis).

    The lane extent uses ``_nx_pad`` — the same tight rule as the
    canonical layout and the ``kernel_vmem_fits`` gate: the +p margin is
    carried only when the lane-roll x path (p=1) will use it; the
    dense-dot path needs none.  Keeping this consistent with the gate
    matters: at p>=2, m=127 the old ``ceil(nx+p, 128)`` rule padded to
    256 lanes (~2x kernel VMEM) while the gate estimated with 128 — the
    fused smoother would pass the gate and then blow Mosaic's scoped
    cap at compile time."""
    if dim == 3:
        nz, ny, nx = spatial
        bz = _BZ if nz >= _BZ else 8
        nzp = _ceil(nz, bz)
        return (bz + nzp + bz, _ceil(ny + p, 8), _nx_pad(nx, p, dim))
    ny, nx = spatial
    return (_ceil(ny + p, 8), _nx_pad(nx, p, dim))


def pad_field(u, spatial, p: int, dim: int):
    """(q, *spatial) -> canonical padded layout."""
    ps = padded_shape(spatial, p, dim)
    if dim == 3:
        bz = _BZ if spatial[0] >= _BZ else 8
        pad = (
            (0, 0),
            (bz, ps[0] - bz - spatial[0]),
            (0, ps[1] - spatial[1]),
            (0, ps[2] - spatial[2]),
        )
    else:
        pad = ((0, 0), (0, ps[0] - spatial[0]), (0, ps[1] - spatial[1]))
    return jnp.pad(u, pad)


def unpad_field(u_pad, spatial, p: int, dim: int):
    if dim == 3:
        bz = _BZ if spatial[0] >= _BZ else 8
        return u_pad[
            :, bz : bz + spatial[0], : spatial[1], : spatial[2]
        ]
    return u_pad[:, : spatial[0], : spatial[1]]


@functools.partial(
    jax.jit,
    static_argnames=("p", "dim", "spatial", "interpret", "x_roll", "y_mxu"),
)
def _fused_apply_padded(
    w, zb, yb, xmat, u_pad, *, p, dim, spatial, interpret=False,
    x_roll=False, y_mxu=False,
):
    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        q = u_pad.shape[0]
        nx_p = xmat.shape[1]
        if dim == 3:
            bz = _BZ if spatial[0] >= _BZ else 8
            nzp = u_pad.shape[1] - 2 * bz
            ny_p = u_pad.shape[2]
            out = pl.pallas_call(
                _make_kernel_3d(p, z_off=bz - p, x_roll=x_roll,
                                y_mxu=y_mxu),
                grid=(q, nzp // bz),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                # write into the interior blocks; the halo blocks stay
                # garbage, which every consumer tolerates (see above)
                out_specs=pl.BlockSpec(
                    (1, bz, ny_p, nx_p),
                    lambda iq, iz: _i32(iq, iz + 1, 0, 0),
                ),
                out_shape=jax.ShapeDtypeStruct(u_pad.shape, jnp.float32),
                scratch_shapes=_slab_scratch(bz, p, ny_p, nx_p),
                interpret=interpret,
            )(w, zb, yb, xmat, u_pad)
            # the kernel never writes the halo blocks; uninitialized
            # memory may hold NaNs, and 0 * NaN = NaN would poison any
            # consumer.  Only the p planes adjacent to the data are ever
            # read by the slab DMA — zero exactly those (tiny writes);
            # the V-cycle scrubs full halos before axis-contracting ops.
            out = out.at[:, bz - p : bz].set(0.0)
            return out.at[:, bz + nzp : bz + nzp + p].set(0.0)
        ny_p = u_pad.shape[1]
        return pl.pallas_call(
            _make_kernel_2d(p),
            grid=(q,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, ny_p, nx_p), lambda iq: _i32(iq, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(u_pad.shape, jnp.float32),
            interpret=interpret,
        )(w, yb, xmat, u_pad)


def fused_stencil_apply_padded(
    ops: LevelOps, a, b, u_pad, spatial, dim: int, *, interpret: bool = False
):
    """(a M + b K) on a canonical-padded stage block, zero extra copies.

    ``u_pad``: (q, *padded_shape(spatial, p, dim)); returns the same
    layout.  Halo/pad regions of the result are unspecified.
    """
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    q = u_pad.shape[0]
    a_arr = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(a, jnp.float32)), (q,))
    b_arr = jnp.broadcast_to(jnp.asarray(b, jnp.float32), (q,))
    w = jnp.stack([a_arr, b_arr], axis=1)
    nx_p = u_pad.shape[-1]
    x_roll = _x_roll_ok(p, dim, nx_p)
    y_mxu = dim == 3 and _y_mxu_ok(p, dim, u_pad.shape[2], nx_p, 0)

    def _build_padded_tables():
        if x_roll:
            xmat = _band_table_x(ops, nx_p)
        else:
            xmat = jnp.concatenate(
                [
                    _dense_padded(ops.mass_band, nx_p).T,
                    _dense_padded(ops.stiff_band, nx_p).T,
                ],
                axis=0,
            )
        if dim == 3:
            bz_ = _BZ if spatial[0] >= _BZ else 8
            yb = (
                _band_table_y_mxu(ops, u_pad.shape[2])
                if y_mxu
                else _band_table(ops, u_pad.shape[2])
            )
            return _band_table(ops, u_pad.shape[1] - 2 * bz_), yb, xmat
        return None, _band_table(ops, u_pad.shape[1]), xmat

    zb, yb, xmat = _build_padded_tables()
    return _fused_apply_padded(
        w, zb, yb, xmat, u_pad, p=p, dim=dim, spatial=tuple(spatial),
        interpret=interpret, x_roll=x_roll, y_mxu=y_mxu,
    )


# ---------------------------------------------------------------------------
# fused Chebyshev-smoother iteration (padded layout)
# ---------------------------------------------------------------------------
#
# One Chebyshev iteration is
#     r <- r - A d;  z = D^{-1} r;  d <- c1 d + c2 z;  x <- x + d
# i.e. an operator apply plus three elementwise sweeps over stage-block
# fields.  Fusing them into the apply kernel turns four HBM round trips
# into one: per block this reads (d-slab, r, x, invd) and writes
# (r', d', x').  Operates on the canonical padded layout; the p planes of
# d'/x' adjacent to the data must be re-zeroed by the caller (same
# discipline as fused_stencil_apply_padded).


def _make_kernel_cheb_3d(p: int, x_roll: bool = False, canon: bool = False,
                         y_mxu: bool = False, diag: bool = False,
                         halo_z: bool = False):
    nb = 2 * p + 1
    # factor pads assume the canonical layout (halo_z is its sharded form)
    assert not diag or canon or halo_z

    def kernel(w_ref, zb_ref, yb_ref, xmat_ref, *rest):
        if diag:
            (dgz_ref, dgy_ref, dgx_ref, d_hbm, r_ref, x_ref,
             r_out, d_out, x_out, scratch2, sem) = rest
        else:
            (d_hbm, r_ref, x_ref, invd_ref,
             r_out, d_out, x_out, scratch2, sem) = rest
        iq = pl.program_id(0)
        iz = pl.program_id(1)
        bz = r_out.shape[1]
        ny_p = r_out.shape[2]
        nx_p = r_out.shape[3]
        if canon:
            scratch = _slab_dma_canon(d_hbm, scratch2, sem, p, bz)
        elif halo_z:
            # p real halo planes at each z end (space-sharded layout):
            # uniform windows [iz*bz, iz*bz + bz + 2p)
            scratch = _slab_dma(d_hbm, scratch2, sem, p, 0, bz)
        else:
            scratch = _slab_dma(d_hbm, scratch2, sem, p, bz - p, bz)
        a = w_ref[iq, 0]
        b = w_ref[iq, 1]
        c1 = w_ref[iq, 2]
        c2 = w_ref[iq, 3]
        zb = zb_ref[pl.ds(iz * bz, bz)]
        Zm = None
        Zk = None
        for k in range(nb):
            plane = scratch[k : k + bz]
            wm = zb[:, k].reshape(bz, 1, 1)
            ws = zb[:, nb + k].reshape(bz, 1, 1)
            Zm = wm * plane if Zm is None else Zm + wm * plane
            Zk = ws * plane if Zk is None else Zk + ws * plane
        E = a * Zm + b * Zk
        F = b * Zm
        if y_mxu:
            CD = _y_stage_mxu(E, F, yb_ref, ny_p, p,
                              force_bf16=_CHEB_DOT_BF16)
            C = CD[:, :, :nx_p]
            D = CD[:, :, nx_p:]
        else:
            C = None
            D = None
            for k in range(nb):
                rE = _roll(E, p - k, 1)
                rF = _roll(F, p - k, 1)
                wm = yb_ref[:ny_p, k].reshape(1, ny_p, 1)
                ws = yb_ref[:ny_p, nb + k].reshape(1, ny_p, 1)
                c_term = wm * rE + ws * rF
                d_term = wm * rF
                C = c_term if C is None else C + c_term
                D = d_term if D is None else D + d_term
        if x_roll:
            Ad = None
            for k in range(nb):
                rc = _roll(C, p - k, 2)
                rd = _roll(D, p - k, 2)
                wm = xmat_ref[k].reshape(1, 1, -1)
                ws = xmat_ref[nb + k].reshape(1, 1, -1)
                t = wm * rc + ws * rd
                Ad = t if Ad is None else Ad + t
        elif y_mxu:
            Ad = _x_dot(CD, xmat_ref[:], p, force_bf16=_CHEB_DOT_BF16)
        else:
            Ad = _x_dot(jnp.concatenate([C, D], axis=-1), xmat_ref[:], p,
                        force_bf16=_CHEB_DOT_BF16)
        r_new = r_ref[0] - Ad
        if diag:
            dgz = dgz_ref[pl.ds(iz * bz, bz)]
            z = _dg_z(
                r_new, a, b,
                dgz[:, 0].reshape(bz, 1, 1), dgz[:, 1].reshape(bz, 1, 1),
                dgy_ref[:, 0].reshape(1, ny_p, 1),
                dgy_ref[:, 1].reshape(1, ny_p, 1),
                dgx_ref[0:1].reshape(1, 1, -1),
                dgx_ref[1:2].reshape(1, 1, -1),
            )
        else:
            z = invd_ref[0] * r_new
        d_new = c1 * scratch[p : p + bz] + c2 * z
        r_out[0] = r_new
        d_out[0] = d_new
        x_out[0] = x_ref[0] + d_new

    return kernel


def fused_cheb_iter_padded(
    ops: LevelOps, a, b, c1, c2, d_pad, r_pad, x_pad, invd_pad, spatial,
    dim: int, *, interpret: bool = False,
):
    """One fused Chebyshev iteration on padded stage blocks (3D).

    Returns ``(r', d', x')`` in the same layout; the caller re-zeroes the
    DMA-adjacent halo planes of d' (and of x' if x' feeds another apply).
    """
    interpret = interpret or _INTERPRET
    p = (ops.mass_band.shape[0] - 1) // 2
    q = d_pad.shape[0]
    to_q = lambda s: jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(s, jnp.float32)), (q,)
    )
    w = jnp.stack([to_q(a), to_q(b), to_q(c1), to_q(c2)], axis=1)
    nx_p = d_pad.shape[-1]
    x_roll = _x_roll_ok(p, dim, nx_p)
    bz = _BZ if spatial[0] >= _BZ else 8
    nzp = d_pad.shape[1] - 2 * bz
    ny_p = d_pad.shape[2]
    y_mxu = _y_mxu_ok(p, dim, ny_p, nx_p, 0)

    def _build_cheb_tables():
        if x_roll:
            xmat = _band_table_x(ops, nx_p)
        else:
            xmat = jnp.concatenate(
                [
                    _dense_padded(ops.mass_band, nx_p).T,
                    _dense_padded(ops.stiff_band, nx_p).T,
                ],
                axis=0,
            )
        yb = (
            _band_table_y_mxu(ops, ny_p)
            if y_mxu
            else _band_table(ops, ny_p)
        )
        return _band_table(ops, nzp), yb, xmat

    zb, yb, xmat = _build_cheb_tables()

    from jax._src.config import enable_x64 as _scoped_x64

    with _scoped_x64(False):
        shape = jax.ShapeDtypeStruct(d_pad.shape, jnp.float32)
        blocked = pl.BlockSpec(
            (1, bz, ny_p, nx_p), lambda iq, iz: _i32(iq, iz + 1, 0, 0)
        )
        r_new, d_new, x_new = pl.pallas_call(
            _make_kernel_cheb_3d(p, x_roll=x_roll, y_mxu=y_mxu),
            grid=(q, nzp // bz),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                blocked,
                blocked,
                blocked,
            ],
            out_specs=(blocked, blocked, blocked),
            out_shape=(shape, shape, shape),
            scratch_shapes=_slab_scratch(bz, p, ny_p, nx_p),
            interpret=interpret,
        )(w, zb, yb, xmat, d_pad, r_pad, x_pad, invd_pad)
    # keep the DMA-adjacent planes of the next iteration's operand zero
    d_new = d_new.at[:, bz - p : bz].set(0.0)
    d_new = d_new.at[:, bz + nzp : bz + nzp + p].set(0.0)
    x_new = x_new.at[:, bz - p : bz].set(0.0)
    x_new = x_new.at[:, bz + nzp : bz + nzp + p].set(0.0)
    return r_new, d_new, x_new
