"""Geometric multigrid V-cycle with Chebyshev smoothing.

TPU-native equivalent of the reference's ``PreconditionerGMG``
(``preconditioner.h:219-501``): global-coarsening level hierarchy,
Chebyshev(5)/point-Jacobi smoothing on every level with CG-estimated
smoothing intervals, and a coarse-grid solve.

Deviations from the reference, by design:

* The coarse solve is an exact dense solve (precomputed inverse of the
  tiny coarsest-level matrix) instead of one Trilinos-ML AMG V-cycle
  (reference ``preconditioner.h:377-399``) — the coarsest tensor grid has
  at most a few hundred DoFs, so a single small matmul on the MXU is both
  exact and faster than an AMG hierarchy.  This can only *reduce*
  iteration counts.
* The stage-batched ("block") variant is the same code vmapped over the
  leading stage axis — replacing ``MGTransferBlockGlobalCoarsening`` and
  the block smoother (reference ``preconditioner.h:407-446``).
"""

from __future__ import annotations

import os as _os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.grid import Space
from ..ops.mass_laplace import (
    LevelOps,
    apply_shifted,
    apply_shifted_batched,
    level_ops,
    operator_diagonal,
)
from ..ops.transfer import prolong, restrict
from .chebyshev import chebyshev_apply, estimate_chebyshev_range

SMOOTHER_DEGREE = 5  # reference preconditioner.h:222
SMOOTHING_RANGE = 20.0  # reference preconditioner.h:221
EIG_CG_ITERATIONS = 20  # reference preconditioner.h:223

# fields above this size run the smoother loop as lax.fori_loop instead
# of unrolling.  Effectively disabled: the fori gate dated from when
# kernel tables were embedded as in-graph constants and refinement-8
# programs blew the remote compiler's request cap — tables now ride as
# jit arguments, and the fori carry boundaries measured ~11 ms per
# smooth at r8 (XLA copies the three field carries every iteration),
# 355.9 -> 253.0 ms/step end-to-end when unrolled (scripts/unroll_ab.py,
# BASELINE round 4).  SPIRK_UNROLL_LIMIT overrides (elements).
_UNROLL_LIMIT = int(_os.environ.get("SPIRK_UNROLL_LIMIT", 10**12))


class GMGData(NamedTuple):
    """Static (tau-independent) multigrid data for one problem (a pytree)."""

    level_ops: tuple[LevelOps, ...]  # coarse -> fine
    prolongs: tuple[jnp.ndarray, ...]  # [l]: level l -> level l+1
    coarse_mass: jnp.ndarray  # dense coarsest-level dim-D mass matrix
    coarse_stiff: jnp.ndarray


class GMGPrec(NamedTuple):
    """Shift-dependent state produced by ``gmg_reinit`` (a pytree)."""

    inv_diags: tuple[jnp.ndarray, ...]
    thetas: tuple[jnp.ndarray, ...]
    deltas: tuple[jnp.ndarray, ...]
    coarse_inv: jnp.ndarray
    # canonical-padded Jacobi diagonals for the zero-copy pallas V-cycle
    # (None outside "pallas" batched mode)
    inv_diags_padded: tuple[jnp.ndarray, ...] | None = None
    # zero-halo canonical-layout diagonals (``vcycle_canon``); entries are
    # None at levels where the canonical kernels don't run
    inv_diags_canon: tuple[jnp.ndarray | None, ...] | None = None
    # per-level canonical kernel tables (zb, yb, xmat), threaded to the
    # kernel wrappers so the hot loop neither rebuilds them in-graph nor
    # embeds them as literals (ops/pallas/stencil.py::canon_tables)
    canon_tables: tuple[tuple | None, ...] | None = None
    # per-level 1D Jacobi-diagonal factors (dgz, dgy, dgx): the fused
    # Chebyshev kernel rebuilds D⁻¹ in-kernel from these instead of
    # reading the (q, m³) inverse — one fewer HBM pass per iteration
    # (ops/pallas/stencil.py::cheb_diag_tables)
    cheb_diag_canon: tuple[tuple | None, ...] | None = None
    # per-level extended-window tables for the PAIRED Chebyshev kernel
    # (two iterations per HBM round trip; ops/pallas/stencil.py::
    # cheb2_tables) — None at levels where the pair kernel can't run
    cheb2_canon: tuple[tuple | None, ...] | None = None


# levels at or below this DoF count are dropped and solved exactly by the
# dense coarse solve: one small MXU matmul replaces several smoothing
# chains whose tiny kernels are pure launch overhead on a TPU.  This can
# only strengthen the preconditioner relative to the reference (which
# coarsens all the way to one cell, preconditioner.h:287-339).
COARSE_SIZE_LIMIT = 1024

# Experimental: keep all V-cycle fields in the canonical padded layout
# (ops/pallas/stencil.py) to skip per-apply pad/slice passes.  Measured
# *slower* on v5e at 127^3 (the inflated z extents and halo scrubs cost
# more than the pads they remove), so off by default; flip via env for
# future experiments on hardware with different relayout costs.
PADDED_VCYCLE = _os.environ.get("SPIRK_PADDED_VCYCLE", "0") == "1"

# Fused Chebyshev smoothing on the standard-layout V-cycle: each smoother
# call pads its fields once into the canonical padded layout, runs the
# fused iteration kernel (ops/pallas/stencil.py: one HBM pass per
# Chebyshev iteration instead of an apply + three elementwise sweeps),
# and unpads on exit.  Unlike SPIRK_PADDED_VCYCLE this keeps residuals
# and transfers on the compact standard layout.
FUSED_SMOOTH = _os.environ.get("SPIRK_FUSED_SMOOTH", "1") == "1"


def _coarse_dense(space: Space, dtype, l0: int) -> tuple[np.ndarray, np.ndarray]:
    lev = space.levels[l0]
    M1, K1 = lev.mass_dense, lev.stiff_dense
    if space.dim == 2:
        M = np.kron(M1, M1)
        K = np.kron(K1, M1) + np.kron(M1, K1)
    else:
        MM = np.kron(M1, M1)
        MK = np.kron(M1, K1) + np.kron(K1, M1)
        M = np.kron(M1, MM)
        K = np.kron(K1, MM) + np.kron(M1, MK)
    return M.astype(dtype), K.astype(dtype)


def build_gmg_data(
    space: Space,
    dtype=jnp.float64,
    with_dense: bool = True,
    coarse_size_limit: int = COARSE_SIZE_LIMIT,
) -> GMGData:
    # coarsest retained level: the largest one still within the dense
    # coarse-solve budget (always keep at least the bottom level, and keep
    # the finest level out of the dense solve when there are >= 2 levels)
    l0 = 0
    for i, lev in enumerate(space.levels):
        if lev.m**space.dim <= coarse_size_limit:
            l0 = i
    if l0 == len(space.levels) - 1 and len(space.levels) > 1:
        l0 -= 1
    cm, ck = _coarse_dense(space, np.float64, l0)
    return GMGData(
        level_ops=tuple(
            level_ops(lev, dtype, with_dense=with_dense)
            for lev in space.levels[l0:]
        ),
        prolongs=tuple(
            jnp.asarray(P, dtype=dtype) for P in space.prolongations[l0:]
        ),
        coarse_mass=jnp.asarray(cm, dtype=dtype),
        coarse_stiff=jnp.asarray(ck, dtype=dtype),
    )


def _make_A(
    ops: LevelOps,
    a,
    b,
    dim: int,
    mode: str,
    batch: bool,
    interpret: bool = False,
) -> Callable:
    if batch:
        return lambda u: apply_shifted_batched(
            ops, a, b, u, dim, mode, interpret=interpret
        )
    return lambda u: apply_shifted(
        ops, a, b, u, dim, mode, interpret=interpret
    )


def gmg_reinit(
    gmg: GMGData,
    a,
    b,
    dim: int,
    mode: str = "stencil",
    *,
    batch: bool = False,
    n_cg_iterations: int = EIG_CG_ITERATIONS,
    smoothing_range: float = SMOOTHING_RANGE,
) -> GMGPrec:
    """Build the shift-dependent GMG state for the operator a*M + b*K.

    ``a`` is a scalar — or a vector of per-stage shifts when ``batch``
    (the block preconditioner, reference ``main.cc:3150-3178``).  This is
    the analog of ``PreconditionerGMG::reinit`` (reference
    ``preconditioner.h:341-447``): per-level Jacobi diagonals, Chebyshev
    eigenvalue estimation, coarse matrix factorization.
    """
    inv_diags = []
    thetas = []
    deltas = []
    key = jax.random.PRNGKey(42)
    one = jnp.ones(a.shape if batch else (), dtype=gmg.coarse_mass.dtype)
    for lvl, ops in enumerate(gmg.level_ops):
        m = ops.m
        if batch:
            diag = jax.vmap(
                lambda ai: operator_diagonal(ops, ai, b, dim)
            )(a)
        else:
            diag = operator_diagonal(ops, a, b, dim)
        inv_diag = 1.0 / diag
        if lvl == 0:
            # the coarsest level is solved exactly (dense); no smoother
            inv_diags.append(inv_diag)
            thetas.append(one)
            deltas.append(one)
            continue
        shape = (m,) * dim
        rhs = jax.random.uniform(key, shape, dtype=ops.mass_band.dtype)
        if batch:
            rhs = jnp.broadcast_to(rhs, (a.shape[0],) + shape)
        A = _make_A(ops, a, b, dim, mode, batch)
        theta, delta = estimate_chebyshev_range(
            A,
            inv_diag,
            rhs,
            n_cg_iterations=n_cg_iterations,
            smoothing_range=smoothing_range,
            batch=batch,
        )
        inv_diags.append(inv_diag)
        thetas.append(theta)
        deltas.append(delta)

    if batch:
        coarse = (
            a[:, None, None] * gmg.coarse_mass[None] + b * gmg.coarse_stiff
        )
        coarse_inv = jnp.linalg.inv(coarse)
    else:
        coarse_inv = jnp.linalg.inv(a * gmg.coarse_mass + b * gmg.coarse_stiff)

    inv_diags_padded = None
    inv_diags_canon = None
    canon_tables = None
    cheb_diag_canon = None
    cheb2_canon = None
    if mode == "pallas" and batch:
        from ..ops.pallas import stencil as st

        p = (gmg.level_ops[0].mass_band.shape[0] - 1) // 2
        if PADDED_VCYCLE or FUSED_SMOOTH:
            inv_diags_padded = tuple(
                st.pad_field(invd, (ops.m,) * dim, p, dim)
                for invd, ops in zip(inv_diags, gmg.level_ops)
            )
        fine_sp = (gmg.level_ops[-1].m,) * dim
        if st.canon_worthwhile(fine_sp, p, dim):
            # only at levels where the in-kernel diag factors CANNOT run
            # (cheb_diag_canon replaces the padded inverse elsewhere —
            # at refinement 8 that's ~270 MB of HBM and a full read per
            # smoother iteration)
            inv_diags_canon = tuple(
                st.pad_canon(invd, (ops.m,) * dim, p, dim)
                if (
                    st.canon_supported((ops.m,) * dim, p, dim)
                    and not st.cheb_diag_supported((ops.m,) * dim, p, dim)
                )
                else None
                for invd, ops in zip(inv_diags, gmg.level_ops)
            )
            canon_tables = tuple(
                st.canon_tables(ops, (ops.m,) * dim, p, dim)
                if st.canon_supported((ops.m,) * dim, p, dim)
                else None
                for ops in gmg.level_ops
            )
            cheb_diag_canon = tuple(
                st.cheb_diag_tables(ops, (ops.m,) * dim, p, dim)
                if st.cheb_diag_supported((ops.m,) * dim, p, dim)
                else None
                for ops in gmg.level_ops
            )
            q_stages = a.shape[0] if batch else 1
            cheb2_canon = tuple(
                st.cheb2_tables(ops, (ops.m,) * dim, p, dim)
                if st.cheb2_supported((ops.m,) * dim, p, dim, q_stages)
                else None
                for ops in gmg.level_ops
            )

    return GMGPrec(
        inv_diags=tuple(inv_diags),
        thetas=tuple(thetas),
        deltas=tuple(deltas),
        coarse_inv=coarse_inv,
        inv_diags_padded=inv_diags_padded,
        inv_diags_canon=inv_diags_canon,
        canon_tables=canon_tables,
        cheb_diag_canon=cheb_diag_canon,
        cheb2_canon=cheb2_canon,
    )


def _coarse_solve(prec: GMGPrec, r, dim: int, batch: bool):
    if batch:
        q = r.shape[0]
        flat = r.reshape(q, -1)
        x = jnp.einsum("qij,qj->qi", prec.coarse_inv, flat)
        return x.reshape(r.shape)
    flat = r.reshape(-1)
    return (prec.coarse_inv @ flat).reshape(r.shape)


def vcycle(
    gmg: GMGData,
    prec: GMGPrec,
    a,
    b,
    r,
    dim: int,
    mode: str = "stencil",
    *,
    batch: bool = False,
    degree: int = SMOOTHER_DEGREE,
    interpret: bool = False,
):
    """One multigrid V-cycle approximating (a*M + b*K)^-1 r.

    Pre-smoothing from a zero initial guess, residual restriction, coarse
    solve, prolongated correction, post-smoothing — matching deal.II's
    ``Multigrid`` as configured by the reference (one V-cycle used either
    as the inner-CG preconditioner or directly when InnerTolerance == 0,
    reference ``main.cc:1126-1148``).
    """
    if (
        PADDED_VCYCLE
        and batch
        and mode == "pallas"
        and prec.inv_diags_padded is not None
    ):
        return _vcycle_padded(
            gmg, prec, a, b, r, dim, degree=degree, interpret=interpret
        )
    n_levels = len(gmg.level_ops)
    fused_smooth = (
        batch
        and mode == "pallas"
        and dim == 3
        and prec.inv_diags_padded is not None
    )
    p = (gmg.level_ops[0].mass_band.shape[0] - 1) // 2

    def smooth(l, rl, x0=None, rl_pad=None):
        ops = gmg.level_ops[l]
        from ..ops.pallas import stencil as st

        if fused_smooth and st.kernel_vmem_fits(
            (ops.m,) * dim, p, dim, cheb=True
        ):
            sp = (ops.m,) * dim
            if rl_pad is None:
                rl_pad = st.pad_field(rl, sp, p, dim)
            x0_pad = None if x0 is None else st.pad_field(x0, sp, p, dim)
            x_pad = _chebyshev_padded(
                ops,
                a,
                b,
                prec.inv_diags_padded[l],
                prec.thetas[l],
                prec.deltas[l],
                rl_pad,
                sp,
                dim,
                x0_pad=x0_pad,
                degree=degree,
                interpret=interpret,
            )
            return st.unpad_field(x_pad, sp, p, dim), rl_pad
        A = _make_A(ops, a, b, dim, mode, batch)
        x = chebyshev_apply(
            A,
            prec.inv_diags[l],
            prec.thetas[l],
            prec.deltas[l],
            rl,
            x0=x0,
            degree=degree,
            batch=batch,
        )
        return x, None

    def solve(l, rl):
        if l == 0:
            return _coarse_solve(prec, rl, dim, batch)
        ops = gmg.level_ops[l]
        A = _make_A(ops, a, b, dim, mode, batch, interpret=interpret)
        x, rl_pad = smooth(l, rl)
        res = rl - A(x)
        rc = restrict(gmg.prolongs[l - 1], res, dim)
        xc = solve(l - 1, rc)
        x = x + prolong(gmg.prolongs[l - 1], xc, dim)
        return smooth(l, rl, x0=x, rl_pad=rl_pad)[0]

    return solve(n_levels - 1, r)


def _chebyshev_padded(
    ops, a, b, invd_pad, theta, delta, r_pad, spatial, dim,
    *, x0_pad=None, degree=SMOOTHER_DEGREE, interpret=False,
):
    """Chebyshev smoothing on padded stage blocks with the fused
    iteration kernel (one HBM pass per iteration instead of an apply plus
    three elementwise sweeps)."""
    from ..ops.pallas import stencil as st

    def ex(s):
        return s.reshape(s.shape + (1,) * (r_pad.ndim - 1))

    if x0_pad is None:
        rr = r_pad
        x = jnp.zeros_like(r_pad)
    else:
        rr = r_pad - st.fused_stencil_apply_padded(
            ops, a, b, x0_pad, spatial, dim, interpret=interpret
        )
        x = x0_pad
    z = invd_pad * rr
    d = z / ex(theta)
    x = x + d
    sigma = theta / delta
    rho = 1.0 / sigma

    def body(_k, state):
        rr, d, x, rho = state
        rho_new = 1.0 / (2.0 * sigma - rho)
        c1 = rho_new * rho
        c2 = 2.0 * rho_new / delta
        rr, d, x = st.fused_cheb_iter_padded(
            ops, a, b, c1, c2, d, rr, x, invd_pad, spatial, dim,
            interpret=interpret,
        )
        return rr, d, x, rho_new

    state = (rr, d, x, rho)
    if r_pad.size <= _UNROLL_LIMIT:  # see _chebyshev_canon
        for k in range(degree - 1):
            state = body(k, state)
    else:
        from jax import lax

        state = lax.fori_loop(0, degree - 1, body, state)
    _rr, _d, x, _rho = state
    return x


def _chebyshev_canon(
    ops, a, b, invd_c, theta, delta, r_c, dim,
    *, x0_c=None, degree=SMOOTHER_DEGREE, interpret=False, tables=None,
    diag_tables=None, pair_tables=None, mesh=None,
):
    """Chebyshev smoothing on canonical-layout stage blocks.  3D uses the
    fused iteration kernel (one HBM pass per iteration); 2D runs the
    elementwise chain with the canonical apply (no pad/slice passes
    either way).  Pads stay exactly zero throughout.

    ``mesh``: run the kernels (stage, space)-sharded over the device mesh
    (ops/pallas/sharded.py — p-plane halo ppermute per apply, the
    reference's ghost exchange under every cell loop,
    operator.h:379-421); bitwise-identical results, 3-D only."""
    from ..ops.pallas import stencil as st

    if dim == 2:
        A = lambda u: st.fused_stencil_apply_canon(
            ops, a, b, u, dim, interpret=interpret, tables=tables
        )
        return chebyshev_apply(
            A, invd_c, theta, delta, r_c, x0=x0_c, degree=degree, batch=True
        )

    # (bz, by) is computed ONCE from the smoother state shape and
    # threaded to the iteration kernel as force_yb/force_bz, so the bf16
    # gate below and the kernel dispatch cannot diverge (ADVICE r4); the
    # decision is z- and dtype-blind.  The sharded path keeps the
    # default bz (its per-shard z extents gate on _BZ, sharded.py) but
    # shares by so local and sharded runs stay bitwise-identical.
    p = (ops.mass_band.shape[0] - 1) // 2
    bz_c, by_c = st.cheb_canon_geom(r_c.shape, p, dim)

    if mesh is not None:
        from ..ops.pallas import sharded as shk

        apply_c = lambda u: shk.sharded_stencil_apply_canon(
            ops, a, b, u, mesh, tables=tables, interpret=interpret
        )
        cheb_iter = lambda c1, c2, d, rr, x: shk.sharded_cheb_iter_canon(
            ops, a, b, c1, c2, d, rr, x, invd_c, mesh, tables=tables,
            diag_tables=diag_tables, interpret=interpret, force_yb=by_c,
        )
    else:
        apply_c = lambda u: st.fused_stencil_apply_canon(
            ops, a, b, u, dim, interpret=interpret, tables=tables
        )
        cheb_iter = lambda c1, c2, d, rr, x: st.fused_cheb_iter_canon(
            ops, a, b, c1, c2, d, rr, x, invd_c, dim, interpret=interpret,
            tables=tables, diag_tables=diag_tables, force_yb=by_c,
            force_bz=bz_c,
        )

    def ex(s):
        return s.reshape(s.shape + (1,) * (r_c.ndim - 1))

    if diag_tables is not None:
        # init-step D⁻¹ from the 1D Kronecker factors: the broadcast
        # products fuse into the division (XLA), so no (q, m³) inverse
        # is read — or even materialized (pads carry mass 1 / stiff 0,
        # so the padded diagonal is positive and zero pads stay zero)
        dgz, dgy, dgx = diag_tables
        aq = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(a, jnp.float32)), (r_c.shape[0],)
        )
        zmym = (
            dgz[:, 0][None, :, None, None] * dgy[:, 0][None, None, :, None]
        )
        zkym_zmyk = (
            dgz[:, 1][None, :, None, None] * dgy[:, 0][None, None, :, None]
            + dgz[:, 0][None, :, None, None]
            * dgy[:, 1][None, None, :, None]
        )
        diag = (aq[:, None, None, None] * zmym + b * zkym_zmyk) * dgx[0] + (
            b * zmym
        ) * dgx[1]
        apply_invd = lambda t: t / diag
    else:
        apply_invd = lambda t: invd_c * t

    sigma = theta / delta
    rho = 1.0 / sigma
    # the post-smooth entry (x0 given) stays apply + XLA subtract + XLA
    # init: the one-invocation alternative — fused_cheb_iter_canon with
    # (d, x) := x0 and (c1, c2) = (0, 1/theta) computes the same step —
    # measured SLOWER at r8 (3.56 vs 3.35 ms, scripts/vcycle_decomp.py):
    # XLA's elementwise glue runs at the HBM roof here
    if x0_c is None:
        rr = r_c
    else:
        rr = r_c - apply_c(x0_c)
    z = apply_invd(rr)
    d = z / ex(theta)
    x = d if x0_c is None else x0_c + d
    # bf16 STORAGE for the iteration state (r, d) under SPIRK_CHEB_BF16:
    # the y-blocked iteration kernel is HBM-bound, x (the output the
    # Krylov solver reads) stays f32, arithmetic stays f32 in VMEM.  The
    # casts fuse into the XLA init chain above (no extra pass).
    use_bf16 = (
        st._CHEB_BF16
        and dim == 3
        and mesh is None
        and r_c.dtype == jnp.float32
        and by_c > 0
    )
    if use_bf16:
        rr = rr.astype(jnp.bfloat16)
        d = d.astype(jnp.bfloat16)

    def body(_k, state):
        rr, d, x, rho = state
        rho_new = 1.0 / (2.0 * sigma - rho)
        c1 = rho_new * rho
        c2 = 2.0 * rho_new / delta
        rr, d, x = cheb_iter(c1, c2, d, rr, x)
        return rr, d, x, rho_new

    def body2(_k, state):
        # TWO iterations per kernel invocation (temporal blocking): the
        # paired kernel halves the smoother's HBM traffic
        rr, d, x, rho = state
        rho1 = 1.0 / (2.0 * sigma - rho)
        rho2 = 1.0 / (2.0 * sigma - rho1)
        rr, d, x = st.fused_cheb_pair_canon(
            ops, a, b, rho1 * rho, 2.0 * rho1 / delta,
            rho2 * rho1, 2.0 * rho2 / delta, d, rr, x, dim,
            tables=tables, diag_tables=diag_tables,
            pair_tables=pair_tables, interpret=interpret,
        )
        return rr, d, x, rho2

    # unrolled by default (a fori_loop's carry boundaries cost ~5 ms/step
    # at refinement 7); fori only at huge grids, where one kernel call
    # site instead of degree-1 keeps the program inside the remote
    # compiler's request cap
    state = (rr, d, x, rho)
    n_it = degree - 1
    use_pair = (
        pair_tables is not None
        and diag_tables is not None
        and not use_bf16
        and mesh is None  # the pair kernel has no sharded variant
    )
    n_pair, n_single = divmod(n_it, 2) if use_pair else (0, n_it)
    if r_c.size <= _UNROLL_LIMIT:
        for k in range(n_pair):
            state = body2(k, state)
        for k in range(n_single):
            state = body(k, state)
    else:
        from jax import lax

        if n_pair:
            state = lax.fori_loop(0, n_pair, body2, state)
        if n_single:
            state = lax.fori_loop(0, n_single, body, state)
    _rr, _d, x, _rho = state
    return x


def vcycle_canon(
    gmg: GMGData,
    prec: GMGPrec,
    a,
    b,
    r_c,
    dim: int,
    *,
    degree: int = SMOOTHER_DEGREE,
    interpret: bool = False,
    mesh=None,
):
    """Batched V-cycle on the zero-halo canonical layout: ``r_c`` and the
    result are (q, *canon_shape(fine)) with pads exactly zero; applies and
    fused Chebyshev iterations pay ONE HBM pass each (no per-apply
    pad/slice, no halo scrubs — see ``ops/pallas/stencil.py``).  Iteration
    semantics match ``vcycle(..., batch=True)``: pads are zero so dots and
    norms are unchanged by the padding itself; counts can still differ by
    fp reduction-order effects between x-contraction variants (scheme
    tests allow ±1).  Levels too small for the canonical kernels fall back
    to the compact path locally (cheap there).

    ``mesh``: kernels run (stage, space)-sharded over the device mesh via
    shard_map + p-plane halo ppermute (ops/pallas/sharded.py) at every
    level whose z extent splits into whole per-shard blocks
    (``canon_shardable``); smaller levels fall back to the compact XLA
    stencil path, which the SPMD partitioner decomposes on its own (the
    reference coarsens onto fewer ranks the same way,
    preconditioner.h:287-339).  Grid transfers stay XLA dot_generals with
    sharded outputs pinned — partitioned by XLA, not hand-scheduled.
    """
    from ..ops.banded import apply_dense_1d
    from ..ops.pallas import stencil as st

    p = (gmg.level_ops[0].mass_band.shape[0] - 1) // 2
    n_levels = len(gmg.level_ops)
    spatials = [(ops.m,) * dim for ops in gmg.level_ops]

    def _pin(u_c):
        """Pin a canonical stage block to the (stage, space) mesh so the
        transfer contractions reshard instead of gathering."""
        if mesh is None:
            return u_c
        from ..parallel.sharding import stage_block_sharding

        return jax.lax.with_sharding_constraint(
            u_c, stage_block_sharding(mesh, u_c.ndim)
        )

    def _canon_ok(l):
        # a canonical level carries EITHER the padded inverse diagonal or
        # the 1D diag factors (gmg_reinit builds exactly one of the two);
        # under a mesh the level must additionally split into whole
        # per-shard z blocks for the sharded kernels
        inv_ok = (
            prec.inv_diags_canon is not None
            and prec.inv_diags_canon[l] is not None
        )
        dg_ok = (
            prec.cheb_diag_canon is not None
            and prec.cheb_diag_canon[l] is not None
        )
        shard_ok = mesh is None or st.canon_shardable(
            spatials[l], p, dim, mesh.shape["space"]
        )
        return (inv_ok or dg_ok) and shard_ok

    def _transfer_mats(l):
        """Canonical-embedded 1D transfer matrices, levels l <-> l+1
        (numpy trace-time constants; the z matrix additionally feeds the
        sharded-transfer bandwidth analysis under a mesh)."""
        P1 = np.asarray(gmg.prolongs[l], dtype=np.float32)
        cs_f = st.canon_shape(spatials[l + 1], p, dim)
        cs_c = st.canon_shape(spatials[l], p, dim)
        mats_P, mats_R = [], []
        for ax in range(dim):
            Pp = np.zeros((cs_f[ax], cs_c[ax]), np.float32)
            Pp[: P1.shape[0], : P1.shape[1]] = P1
            mats_P.append(Pp)
            mats_R.append(Pp.T)
        return mats_P, mats_R

    def _apply_axes(mats, u):
        for ax_i, m_ in enumerate(mats):
            if mesh is not None and ax_i == 0 and dim == 3:
                # the z contraction runs over the space-sharded axis; as
                # a global dot XLA emits a full-z all-gather of the field
                # (verified HLO) — contract locally with an h-plane halo
                # ppermute instead (grid transfers are banded about the
                # 2:1 coarsening map)
                from ..ops.pallas import sharded as shk

                plan = shk.transfer_z_plan(m_, mesh.shape["space"])
                if plan is not None:
                    u = shk.sharded_transfer_z(plan, u, mesh)
                    continue
            u = apply_dense_1d(jnp.asarray(m_), u, 1 + ax_i)
        return u

    def _tables(l):
        return (
            prec.canon_tables[l] if prec.canon_tables is not None else None
        )

    def _A_canon(l):
        ops = gmg.level_ops[l]
        if mesh is not None:
            from ..ops.pallas import sharded as shk

            return lambda uc: shk.sharded_stencil_apply_canon(
                ops, a, b, uc, mesh, tables=_tables(l),
                interpret=interpret,
            )
        return lambda uc: st.fused_stencil_apply_canon(
            ops, a, b, uc, dim, interpret=interpret, tables=_tables(l)
        )

    def smooth(l, rl_c, x0_c=None):
        if _canon_ok(l):
            if dim == 3 and not st.canon_supported(
                spatials[l], p, dim, cheb=True
            ):
                # apply-canon fits but the (bigger) fused-Chebyshev kernel
                # doesn't: elementwise chain with the canonical apply
                return chebyshev_apply(
                    _A_canon(l), prec.inv_diags_canon[l], prec.thetas[l],
                    prec.deltas[l], rl_c, x0=x0_c, degree=degree, batch=True,
                )
            return _chebyshev_canon(
                gmg.level_ops[l], a, b, prec.inv_diags_canon[l],
                prec.thetas[l], prec.deltas[l], rl_c, dim,
                x0_c=x0_c, degree=degree, interpret=interpret,
                tables=_tables(l),
                diag_tables=(
                    prec.cheb_diag_canon[l]
                    if prec.cheb_diag_canon is not None
                    else None
                ),
                pair_tables=(
                    prec.cheb2_canon[l]
                    if prec.cheb2_canon is not None
                    else None
                ),
                mesh=mesh,
            )
        # small level: compact classic smoothing (arrays are tiny here)
        sp = spatials[l]
        rl = st.unpad_canon(rl_c, sp, dim)
        x0 = None if x0_c is None else st.unpad_canon(x0_c, sp, dim)
        A = _make_A(gmg.level_ops[l], a, b, dim, "stencil", True)
        x = chebyshev_apply(
            A, prec.inv_diags[l], prec.thetas[l], prec.deltas[l], rl,
            x0=x0, degree=degree, batch=True,
        )
        return st.pad_canon(x, sp, p, dim)

    def residual(l, rl_c, x_c):
        if _canon_ok(l):
            # apply + XLA subtract, NOT the kernel-epilogue sub_from
            # variant: measured 1.34 vs 2.35 ms at r8 — XLA's subtract
            # runs at roof while the extra blocked input degrades the
            # kernel's DMA schedule (BASELINE round 4)
            return rl_c - _A_canon(l)(x_c)
        sp = spatials[l]
        rl = st.unpad_canon(rl_c, sp, dim)
        x = st.unpad_canon(x_c, sp, dim)
        A = _make_A(gmg.level_ops[l], a, b, dim, "stencil", True)
        return st.pad_canon(rl - A(x), sp, p, dim)

    def solve(l, rl_c):
        if l == 0:
            rl = st.unpad_canon(rl_c, spatials[0], dim)
            x = _coarse_solve(prec, rl, dim, True)
            return st.pad_canon(x, spatials[0], p, dim)
        x = smooth(l, rl_c)
        res = residual(l, rl_c, x)
        mats_P, mats_R = _transfer_mats(l - 1)
        rc = _pin(_apply_axes(mats_R, res))
        xc = solve(l - 1, rc)
        x = x + _pin(_apply_axes(mats_P, xc))
        return smooth(l, rl_c, x0_c=x)

    return solve(n_levels - 1, r_c)


def _vcycle_padded(
    gmg: GMGData,
    prec: GMGPrec,
    a,
    b,
    r,
    dim: int,
    *,
    degree: int = SMOOTHER_DEGREE,
    interpret: bool = False,
):
    """Zero-copy V-cycle: every field lives in the canonical padded layout
    across the whole cycle (see ``ops/pallas/stencil.py``), so smoother
    applies pay no per-apply pad/slice passes.  Batched (stage-block)
    operands only."""
    from ..ops.banded import apply_dense_1d
    from ..ops.pallas import stencil as st

    p = (gmg.level_ops[0].mass_band.shape[0] - 1) // 2
    n_levels = len(gmg.level_ops)
    spatials = [(ops.m,) * dim for ops in gmg.level_ops]

    def _offsets(l):
        sp = spatials[l]
        if dim == 3:
            bz = st._BZ if sp[0] >= st._BZ else 8
            return (bz, 0, 0)
        return (0, 0)

    def _transfer_mats(l):
        """Padded-layout 1D transfer matrices between levels l and l+1
        (built from trace-time-constant prolongations)."""
        P1 = np.asarray(gmg.prolongs[l], dtype=np.float32)  # (m_f, m_c)
        ps_f = st.padded_shape(spatials[l + 1], p, dim)
        ps_c = st.padded_shape(spatials[l], p, dim)
        off_f = _offsets(l + 1)
        off_c = _offsets(l)
        mats_P, mats_R = [], []
        for ax in range(dim):
            Pp = np.zeros((ps_f[ax], ps_c[ax]), np.float32)
            Pp[
                off_f[ax] : off_f[ax] + P1.shape[0],
                off_c[ax] : off_c[ax] + P1.shape[1],
            ] = P1
            mats_P.append(jnp.asarray(Pp))
            mats_R.append(jnp.asarray(Pp.T))
        return mats_P, mats_R

    def _apply_axes(mats, u):
        for ax_i, m_ in enumerate(mats):
            u = apply_dense_1d(m_, u, u.ndim - dim + ax_i)
        return u

    def _A(l):
        ops = gmg.level_ops[l]
        sp = spatials[l]
        return lambda up: st.fused_stencil_apply_padded(
            ops, a, b, up, sp, dim, interpret=interpret
        )

    def solve(l, rl_pad):
        if l == 0:
            rl = st.unpad_field(rl_pad, spatials[0], p, dim)
            x = _coarse_solve(prec, rl, dim, True)
            return st.pad_field(x, spatials[0], p, dim)
        A = _A(l)
        invd = prec.inv_diags_padded[l]
        if dim == 3:
            x = _chebyshev_padded(
                gmg.level_ops[l], a, b, invd, prec.thetas[l],
                prec.deltas[l], rl_pad, spatials[l], dim,
                degree=degree, interpret=interpret,
            )
        else:
            x = chebyshev_apply(
                A, invd, prec.thetas[l], prec.deltas[l], rl_pad,
                degree=degree, batch=True,
            )
        bz = st._BZ if spatials[l][0] >= st._BZ else 8
        res = rl_pad - A(x)
        if dim == 3:
            # the restriction contracts over the full padded axis; halo
            # blocks may hold non-finite garbage (0 * NaN = NaN), so scrub
            # them before the transfer
            res = res.at[:, :bz].set(0.0)
            res = res.at[:, res.shape[1] - bz :].set(0.0)
        mats_P, mats_R = _transfer_mats(l - 1)
        rc = _apply_axes(mats_R, res)
        xc = solve(l - 1, rc)
        x = x + _apply_axes(mats_P, xc)
        if dim == 3:
            x = _chebyshev_padded(
                gmg.level_ops[l], a, b, invd, prec.thetas[l],
                prec.deltas[l], rl_pad, spatials[l], dim,
                x0_pad=x, degree=degree, interpret=interpret,
            )
        else:
            x = chebyshev_apply(
                A, invd, prec.thetas[l], prec.deltas[l], rl_pad,
                x0=x, degree=degree, batch=True,
            )
        if dim == 3:
            # scrub halos before this level's result is prolongated by the
            # parent (the transfer contracts over the full padded axis and
            # 0 * NaN = NaN; smoothing accumulates non-finite halo garbage
            # beyond the p DMA-adjacent planes the kernels keep zero)
            x = x.at[:, :bz].set(0.0)
            x = x.at[:, x.shape[1] - bz :].set(0.0)
        return x

    r_pad = st.pad_field(r, spatials[-1], p, dim)
    out = solve(n_levels - 1, r_pad)
    return st.unpad_field(out, spatials[-1], p, dim)
