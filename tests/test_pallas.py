"""Fused Pallas stencil kernel vs. the XLA banded path (interpret mode on
CPU; the same kernel compiles for real on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dealii_spirk_tpu.fem.grid import make_level
from dealii_spirk_tpu.ops.mass_laplace import apply_shifted, level_ops
from dealii_spirk_tpu.ops.pallas.stencil import (
    fused_stencil_apply,
    fused_stencil_supported,
)


def test_supported_matrix():
    assert fused_stencil_supported(1, 3, jnp.float32)
    assert fused_stencil_supported(1, 2, jnp.float32)
    assert fused_stencil_supported(3, 3, jnp.float32)
    assert not fused_stencil_supported(5, 3, jnp.float32)
    assert not fused_stencil_supported(1, 3, jnp.float64)


@pytest.mark.parametrize(
    "dim,p,ref", [(2, 1, 3), (2, 1, 4), (3, 1, 2), (3, 1, 3),
                  (2, 2, 3), (3, 2, 2), (2, 3, 2), (3, 3, 1), (2, 4, 2)]
)
def test_matches_xla_path(dim, p, ref):
    lev = make_level(ref, p)
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((lev.m,) * dim), jnp.float32)
    want = apply_shifted(ops, 1.7, 0.3, u, dim, "stencil")
    got = fused_stencil_apply(ops, 1.7, 0.3, u, dim, interpret=True)
    np.testing.assert_allclose(got, want, atol=4e-5)


@pytest.mark.parametrize("dim,p", [(2, 2), (3, 2), (3, 3)])
def test_ms_matches_xla_path(dim, p):
    from dealii_spirk_tpu.ops.mass_laplace import (
        apply_mass_batched,
        apply_stiffness_batched,
    )
    from dealii_spirk_tpu.ops.pallas.stencil import fused_mass_stiffness_apply

    lev = make_level(2, p)
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(5)
    W = jnp.asarray(rng.standard_normal((3,) + (lev.m,) * dim), jnp.float32)
    got_m, got_k = fused_mass_stiffness_apply(ops, W, dim, interpret=True)
    # kernel matmuls run as 3 bf16 passes (~1e-6 relative)
    np.testing.assert_allclose(
        got_m, apply_mass_batched(ops, W, dim), atol=2e-5
    )
    k_want = apply_stiffness_batched(ops, W, dim)
    np.testing.assert_allclose(
        got_k, k_want, atol=float(1e-5 * np.abs(k_want).max() + 1e-6)
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_batched_per_stage_shifts(dim):
    lev = make_level(3, 1)
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(1)
    q = 4
    W = jnp.asarray(rng.standard_normal((q,) + (lev.m,) * dim), jnp.float32)
    d = jnp.asarray([1.0, 2.5, 4.0, 8.0], jnp.float32)
    want = jax.vmap(
        lambda di, wi: apply_shifted(ops, di, 0.3, wi, dim, "stencil")
    )(d, W)
    got = fused_stencil_apply(ops, d, 0.3, W, dim, interpret=True)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mass_and_stiffness_special_cases():
    from dealii_spirk_tpu.ops.mass_laplace import apply_mass, apply_stiffness

    lev = make_level(3, 1)
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((lev.m,) * 2), jnp.float32)
    np.testing.assert_allclose(
        fused_stencil_apply(ops, 1.0, 0.0, u, 2, interpret=True),
        apply_mass(ops, u, 2),
        atol=2e-6,
    )
    k_want = apply_stiffness(ops, u, 2)
    np.testing.assert_allclose(
        fused_stencil_apply(ops, 0.0, 1.0, u, 2, interpret=True),
        k_want,
        atol=float(1e-5 * np.abs(k_want).max() + 1e-6),
    )


def test_dense_padded_matches_band():
    from dealii_spirk_tpu.ops.banded import apply_dense_1d
    from dealii_spirk_tpu.ops.pallas.stencil import _dense_padded

    lev = make_level(3, 1)
    ops = level_ops(lev, jnp.float32)
    A = _dense_padded(ops.mass_band, 16)
    np.testing.assert_allclose(
        np.asarray(A)[: lev.m, : lev.m], lev.mass_dense, atol=1e-6
    )
    assert np.all(np.asarray(A)[lev.m :, :] == 0)


def test_padded_vcycle_matches_classic():
    """The zero-copy padded V-cycle must equal the classic one."""
    import jax.numpy as jnp

    from dealii_spirk_tpu.fem.grid import make_space
    from dealii_spirk_tpu.ops.pallas.stencil import pad_field
    from dealii_spirk_tpu.solvers.gmg import (
        _vcycle_padded,
        build_gmg_data,
        gmg_reinit,
        vcycle,
    )

    # include a >= 3-level hierarchy: only those exercise prolongation
    # from a *smoothed* level (the 2-level case prolongates the always-
    # clean dense coarse solve and cannot catch halo-garbage bugs)
    for dim, pdeg, ref in [(2, 1, 7), (3, 1, 5), (3, 2, 2)]:
        space = make_space(dim, pdeg, ref)
        gmg = build_gmg_data(space, dtype=jnp.float32, with_dense=False)
        shifts = jnp.asarray([1.5, 4.0], jnp.float32)
        prec = gmg_reinit(gmg, shifts, 0.1, dim, mode="stencil", batch=True)
        prec = prec._replace(
            inv_diags_padded=tuple(
                pad_field(invd, (ops.m,) * dim, pdeg, dim)
                for invd, ops in zip(prec.inv_diags, gmg.level_ops)
            )
        )
        rng = np.random.default_rng(2)
        r = jnp.asarray(
            rng.standard_normal((2,) + space.shape), jnp.float32
        )
        out_cls = vcycle(gmg, prec, shifts, 0.1, r, dim, "stencil", batch=True)
        out_pad = _vcycle_padded(
            gmg, prec, shifts, 0.1, r, dim, interpret=True
        )
        rel = float(jnp.abs(out_pad - out_cls).max() / jnp.abs(out_cls).max())
        assert rel < 1e-5, (dim, pdeg, rel)


def test_kernel_vmem_gate():
    """Whole-plane kernels stop fitting scoped VMEM at m=255 3D (26MB
    request on v5e); the y-blocked variant takes over there, so pallas
    dispatch must STAY on — this is the reference's production range
    (refinements 3..19, scripts/parameters_all_q.py:33)."""
    from dealii_spirk_tpu.ops.mass_laplace import _pallas_ok
    from dealii_spirk_tpu.ops.pallas.stencil import (
        kernel_fits,
        kernel_vmem_fits,
        yb_for,
    )

    assert kernel_vmem_fits((127, 127, 127), 1, 3)
    assert kernel_vmem_fits((127, 127, 127), 4, 3)
    assert not kernel_vmem_fits((255, 255, 255), 1, 3)
    assert kernel_vmem_fits((63, 63, 63), 1, 3, cheb=True)
    assert kernel_vmem_fits((127, 127, 127), 1, 3, cheb=True)

    # y-blocked coverage beyond the whole-plane limit
    assert yb_for((127, 127, 127), 1, 3) == 0  # whole-plane preferred
    assert yb_for((255, 255, 255), 1, 3) > 0
    assert yb_for((255, 255, 255), 4, 3) > 0
    assert yb_for((511, 511, 511), 1, 3) > 0
    assert kernel_fits((255, 255, 255), 1, 3)
    assert kernel_fits((511, 511, 511), 1, 3)

    lev = make_level(8, 1)  # m = 255: y-blocked kernel dispatches
    ops = level_ops(lev, jnp.float32)
    import jax

    u = jax.ShapeDtypeStruct((2, 255, 255, 255), jnp.float32)
    assert _pallas_ok(ops, u, 3)
    lev7 = make_level(7, 1)
    ops7 = level_ops(lev7, jnp.float32)
    u7 = jax.ShapeDtypeStruct((2, 127, 127, 127), jnp.float32)
    assert _pallas_ok(ops7, u7, 3)


@pytest.mark.parametrize(
    "p,ref,by", [(1, 3, 8), (1, 4, 16), (2, 2, 8), (4, 2, 8)]
)
def test_yb_matches_xla_path(p, ref, by):
    """The y-blocked kernel (production path for m >= 255) must equal the
    XLA banded path; exercised at small sizes by forcing a y block."""
    lev = make_level(ref, p)
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(7)
    q = 3
    W = jnp.asarray(rng.standard_normal((q,) + (lev.m,) * 3), jnp.float32)
    d = jnp.asarray([1.0, 2.5, 4.0], jnp.float32)
    want = jax.vmap(
        lambda di, wi: apply_shifted(ops, di, 0.3, wi, 3, "stencil")
    )(d, W)
    got = fused_stencil_apply(
        ops, d, 0.3, W, 3, interpret=True, force_yb=by
    )
    np.testing.assert_allclose(
        got, want, atol=float(4e-5 * max(1.0, np.abs(want).max()))
    )


@pytest.mark.parametrize("p,ref,by", [(1, 3, 8), (2, 2, 8)])
def test_yb_ms_matches_xla_path(p, ref, by):
    from dealii_spirk_tpu.ops.mass_laplace import (
        apply_mass_batched,
        apply_stiffness_batched,
    )
    from dealii_spirk_tpu.ops.pallas.stencil import fused_mass_stiffness_apply

    lev = make_level(ref, p)
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(8)
    W = jnp.asarray(rng.standard_normal((3,) + (lev.m,) * 3), jnp.float32)
    got_m, got_k = fused_mass_stiffness_apply(
        ops, W, 3, interpret=True, force_yb=by
    )
    np.testing.assert_allclose(
        got_m, apply_mass_batched(ops, W, 3), atol=2e-5
    )
    k_want = apply_stiffness_batched(ops, W, 3)
    # kernel x-dot runs as 3 bf16 passes (~1e-5 relative)
    np.testing.assert_allclose(
        got_k, k_want, atol=float(2e-5 * np.abs(k_want).max() + 1e-6)
    )


def test_fused_smooth_vcycle_matches_classic():
    """The standard-layout V-cycle with fused Chebyshev smoothing
    (SPIRK_FUSED_SMOOTH, the production default) must equal the classic
    smoother path bit-for-bit in structure: same hierarchy, same
    intervals, same iteration mathematics."""
    import jax.numpy as jnp

    from dealii_spirk_tpu.fem.grid import make_space
    from dealii_spirk_tpu.ops.pallas.stencil import pad_field
    from dealii_spirk_tpu.solvers.gmg import (
        build_gmg_data,
        gmg_reinit,
        vcycle,
    )

    # >= 3-level hierarchies (see test_padded_vcycle_matches_classic)
    for dim, pdeg, ref in [(3, 1, 5), (3, 2, 2)]:
        space = make_space(dim, pdeg, ref)
        gmg = build_gmg_data(space, dtype=jnp.float32, with_dense=False)
        shifts = jnp.asarray([1.5, 4.0], jnp.float32)
        prec = gmg_reinit(gmg, shifts, 0.1, dim, mode="stencil", batch=True)
        prec_pad = prec._replace(
            inv_diags_padded=tuple(
                pad_field(invd, (ops.m,) * dim, pdeg, dim)
                for invd, ops in zip(prec.inv_diags, gmg.level_ops)
            )
        )
        rng = np.random.default_rng(3)
        r = jnp.asarray(
            rng.standard_normal((2,) + space.shape), jnp.float32
        )
        out_cls = vcycle(
            gmg, prec, shifts, 0.1, r, dim, "stencil", batch=True
        )
        out_fus = vcycle(
            gmg,
            prec_pad,
            shifts,
            0.1,
            r,
            dim,
            "pallas",
            batch=True,
            interpret=True,
        )
        rel = float(jnp.abs(out_fus - out_cls).max() / jnp.abs(out_cls).max())
        assert rel < 1e-5, (dim, pdeg, rel)


def test_padded_apply_matches():
    from dealii_spirk_tpu.ops.mass_laplace import apply_shifted_batched
    from dealii_spirk_tpu.ops.pallas.stencil import (
        fused_stencil_apply_padded,
        pad_field,
        unpad_field,
    )

    rng = np.random.default_rng(0)
    for dim, p, r in [(3, 1, 3), (3, 2, 2), (2, 1, 4)]:
        lev = make_level(r, p)
        ops = level_ops(lev, jnp.float32)
        spatial = (lev.m,) * dim
        W = jnp.asarray(rng.standard_normal((3,) + spatial), jnp.float32)
        Wp = pad_field(W, spatial, p, dim)
        d = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
        outp = fused_stencil_apply_padded(
            ops, d, 0.3, Wp, spatial, dim, interpret=True
        )
        out = unpad_field(outp, spatial, p, dim)
        want = apply_shifted_batched(ops, d, 0.3, W, dim, "stencil")
        np.testing.assert_allclose(out, want, atol=4e-5)


# ---------------------------------------------------------------------------
# zero-halo canonical layout
# ---------------------------------------------------------------------------


def test_canon_apply_matches_and_pads_zero():
    """Canonical-layout fused apply equals the XLA path on the data block
    and writes EXACT zeros in every pad position (the invariant that lets
    whole solves stay in the layout without scrubs)."""
    from dealii_spirk_tpu.ops.mass_laplace import apply_shifted_batched
    from dealii_spirk_tpu.ops.pallas import stencil as st

    rng = np.random.default_rng(0)
    for dim, p, ref in [(3, 1, 4), (3, 2, 4), (2, 1, 4), (2, 3, 3)]:
        lev = make_level(ref, p)
        sp = (lev.m,) * dim
        assert st.canon_supported(sp, p, dim, cheb=True), (dim, p, lev.m)
        ops = level_ops(lev, jnp.float32)
        W = jnp.asarray(rng.standard_normal((3,) + sp), jnp.float32)
        d = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
        Wc = st.pad_canon(W, sp, p, dim)
        got = st.fused_stencil_apply_canon(ops, d, 0.37, Wc, dim, interpret=True)
        want = apply_shifted_batched(ops, d, 0.37, W, dim, "stencil")
        np.testing.assert_allclose(
            st.unpad_canon(got, sp, dim), want,
            atol=float(1e-4 * np.abs(want).max() + 1e-6),
        )
        mask = np.ones(got.shape, bool)
        mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
        assert float(jnp.abs(jnp.where(mask, got, 0)).max()) == 0.0

        gm, gk = st.fused_mass_stiffness_apply_canon(ops, Wc, dim, interpret=True)
        from dealii_spirk_tpu.ops.mass_laplace import (
            apply_mass_batched,
            apply_stiffness_batched,
        )
        np.testing.assert_allclose(
            st.unpad_canon(gm, sp, dim),
            apply_mass_batched(ops, W, dim),
            atol=2e-5,
        )
        kw = apply_stiffness_batched(ops, W, dim)
        np.testing.assert_allclose(
            st.unpad_canon(gk, sp, dim), kw,
            atol=float(2e-5 * np.abs(kw).max() + 1e-6),
        )
        assert float(jnp.abs(jnp.where(mask, gm, 0)).max()) == 0.0
        assert float(jnp.abs(jnp.where(mask, gk, 0)).max()) == 0.0


@pytest.mark.parametrize("p,ref,force_yb", [(1, 4, 0), (1, 4, 8), (2, 3, 8)])
def test_canon_apply_residual_epilogue(p, ref, force_yb):
    """``fused_stencil_apply_canon(..., sub_from=r)`` must equal
    r - (aM + bK) u with pads exactly zero, on both the whole-plane and
    y-blocked kernels (the V-cycle restriction residual,
    reference preconditioner.h:219-501 / gmg.cc V-cycle)."""
    from dealii_spirk_tpu.ops.mass_laplace import apply_shifted_batched
    from dealii_spirk_tpu.ops.pallas import stencil as st

    dim = 3
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(3)
    q = 2
    mk = lambda: jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32)
    u, r = mk(), mk()
    a = jnp.asarray([1.3, 0.8], jnp.float32)
    b = 0.21
    pc = lambda t: st.pad_canon(t, sp, p, dim)
    got = st.fused_stencil_apply_canon(
        ops, a, b, pc(u), dim, interpret=True, force_yb=force_yb,
        sub_from=pc(r),
    )
    want = r - apply_shifted_batched(ops, a, b, u, dim, "stencil")
    np.testing.assert_allclose(
        st.unpad_canon(got, sp, dim), want,
        atol=float(2e-5 * np.abs(want).max() + 1e-6),
    )
    mask = np.ones(got.shape, bool)
    mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
    assert float(jnp.abs(jnp.where(mask, got, 0)).max()) == 0.0


def test_canon_cheb_iter_matches_elementwise():
    from dealii_spirk_tpu.ops.mass_laplace import apply_shifted_batched
    from dealii_spirk_tpu.ops.pallas import stencil as st

    dim, p, ref = 3, 1, 4
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(1)
    q = 2
    mk = lambda: jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32)
    d0, r0, x0 = mk(), mk(), mk()
    invd = jnp.asarray(
        np.abs(rng.standard_normal((q,) + sp)) + 0.5, jnp.float32
    )
    a = jnp.asarray([1.3, 0.8], jnp.float32)
    b, c1, c2 = 0.21, 0.7, 0.4
    pc = lambda u: st.pad_canon(u, sp, p, dim)
    rn, dn, xn = st.fused_cheb_iter_canon(
        ops, a, b, c1, c2, pc(d0), pc(r0), pc(x0), pc(invd), dim,
        interpret=True,
    )
    Ad = apply_shifted_batched(ops, a, b, d0, dim, "stencil")
    r_want = r0 - Ad
    d_want = c1 * d0 + c2 * (invd * r_want)
    x_want = x0 + d_want
    for got, want in [(rn, r_want), (dn, d_want), (xn, x_want)]:
        np.testing.assert_allclose(
            st.unpad_canon(got, sp, dim), want, atol=5e-4
        )
        mask = np.ones(got.shape, bool)
        mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
        assert float(jnp.abs(jnp.where(mask, got, 0)).max()) == 0.0


@pytest.mark.parametrize("p,ref,force_yb", [(1, 4, 0), (1, 4, 8), (2, 3, 8)])
def test_canon_cheb_diag_tables_match_invd(p, ref, force_yb):
    """The in-kernel Jacobi diagonal (1D Kronecker factors,
    ``cheb_diag_tables``) must reproduce the precomputed-invd iteration
    to f32 roundoff on both the whole-plane and y-blocked kernels, with
    pads exactly zero (reference diag semantics: operator.h:311-329)."""
    from dealii_spirk_tpu.ops.mass_laplace import operator_diagonal
    from dealii_spirk_tpu.ops.pallas import stencil as st

    dim = 3
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(2)
    q = 2
    pc = lambda u: st.pad_canon(u, sp, p, dim)
    mk = lambda: pc(jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32))
    d0, r0, x0 = mk(), mk(), mk()
    a = jnp.asarray([1.3, 0.8], jnp.float32)
    b, c1, c2 = jnp.float32(0.21), 0.7, 0.4
    invd_c = pc(jax.vmap(lambda ai: 1.0 / operator_diagonal(ops, ai, b, dim))(a))
    dg = st.cheb_diag_tables(ops, sp, p, dim)
    want = st.fused_cheb_iter_canon(
        ops, a, b, c1, c2, d0, r0, x0, invd_c, dim, interpret=True,
        force_yb=force_yb,
    )
    got = st.fused_cheb_iter_canon(
        ops, a, b, c1, c2, d0, r0, x0, None, dim, interpret=True,
        force_yb=force_yb, diag_tables=dg,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5)
        mask = np.ones(g.shape, bool)
        mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
        assert float(jnp.abs(jnp.where(mask, g, 0)).max()) == 0.0


def test_cheb_dot_bf16_flag_semantics(monkeypatch):
    """SPIRK_CHEB_DOT_BF16 (bf16x3 dots inside the smoother kernels at
    EVERY degree — the smoother perturbs M, not A, so ``_bf16_ok``'s
    degree-1 accuracy gate does not apply): at p=2 the flag-off kernel
    must reproduce the f32-HIGHEST iteration to f32 roundoff against
    the XLA oracle, and the flag-on kernel the same iteration to bf16x3
    tolerance (~1e-5 relative), pads exactly zero in both."""
    from dealii_spirk_tpu.ops.mass_laplace import apply_shifted_batched
    from dealii_spirk_tpu.ops.pallas import stencil as st

    dim, p, ref = 3, 2, 3
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(5)
    q = 2
    pc = lambda u: st.pad_canon(u, sp, p, dim)
    d0 = jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32)
    r0 = jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32)
    invd = jnp.asarray(
        np.abs(rng.standard_normal((q,) + sp)) + 0.5, jnp.float32
    )
    a = jnp.asarray([1.3, 0.8], jnp.float32)
    b, c1, c2 = 0.21, 0.7, 0.4
    Ad = apply_shifted_batched(ops, a, b, d0, dim, "stencil")
    r_want = r0 - Ad
    d_want = c1 * d0 + c2 * (invd * r_want)
    wants = [r_want, d_want, x0 + d_want]
    for flag, rel in [(False, 3e-6), (True, 1e-4)]:
        monkeypatch.setattr(st, "_CHEB_DOT_BF16", flag)
        got = st.fused_cheb_iter_canon(
            ops, a, b, c1, c2, pc(d0), pc(r0), pc(x0), pc(invd), dim,
            interpret=True, force_yb=8,
        )
        for g, w in zip(got, wants):
            np.testing.assert_allclose(
                st.unpad_canon(g, sp, dim), w,
                atol=float(rel * np.abs(w).max() + 1e-6),
            )
            mask = np.ones(g.shape, bool)
            mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
            assert float(jnp.abs(jnp.where(mask, g, 0)).max()) == 0.0


@pytest.mark.parametrize("diag", [False, True])
def test_canon_cheb_bf16_state_yblocked(diag):
    """SPIRK_CHEB_BF16 (bf16 STORAGE for the smoother state r/d on the
    y-blocked kernels): outputs must match the f32 iteration to bf16
    rounding, r/d come back bf16 while x stays f32, and pads stay
    exactly zero through the cast chain (zero is exact in bf16)."""
    from dealii_spirk_tpu.ops.mass_laplace import operator_diagonal
    from dealii_spirk_tpu.ops.pallas import stencil as st

    dim, p, ref = 3, 1, 4
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(11)
    q = 2
    pc = lambda u: st.pad_canon(u, sp, p, dim)
    mk = lambda: pc(jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32))
    d0, r0, x0 = mk(), mk(), mk()
    a = jnp.asarray([1.3, 0.8], jnp.float32)
    b, c1, c2 = jnp.float32(0.21), 0.7, 0.4
    if diag:
        invd_c, dg = None, st.cheb_diag_tables(ops, sp, p, dim)
    else:
        invd_c = pc(
            jax.vmap(lambda ai: 1.0 / operator_diagonal(ops, ai, b, dim))(a)
        )
        dg = None
    want = st.fused_cheb_iter_canon(
        ops, a, b, c1, c2, d0, r0, x0, invd_c, dim, interpret=True,
        force_yb=8, diag_tables=dg,
    )
    got = st.fused_cheb_iter_canon(
        ops, a, b, c1, c2, d0.astype(jnp.bfloat16), r0.astype(jnp.bfloat16),
        x0, invd_c, dim, interpret=True, force_yb=8, diag_tables=dg,
    )
    assert got[0].dtype == jnp.bfloat16  # r
    assert got[1].dtype == jnp.bfloat16  # d
    assert got[2].dtype == jnp.float32  # x
    for g, w in zip(got, want):
        g32 = np.asarray(g, np.float32)
        w32 = np.asarray(w, np.float32)
        # bf16 has an 8-bit mantissa: inputs AND outputs carry ~2^-9
        # relative rounding, amplified through the A d stencil sum
        tol = 0.05 * float(np.abs(w32).max())
        np.testing.assert_allclose(g32, w32, atol=tol)
        mask = np.ones(g32.shape, bool)
        mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
        assert float(np.abs(np.where(mask, g32, 0)).max()) == 0.0


def test_chebyshev_canon_bf16_gate(monkeypatch):
    """The gmg-side SPIRK_CHEB_BF16 gate: with the flag on and a
    y-blocked size, `_chebyshev_canon` runs the whole degree-5 smooth
    with bf16 r/d state and returns an f32 x close to the f32 smooth
    (small shapes are whole-plane, so the y-block decision is forced)."""
    from dealii_spirk_tpu.ops.pallas import stencil as st
    from dealii_spirk_tpu.solvers import gmg as gmg_mod

    dim, p, ref = 3, 1, 4
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(13)
    q = 2
    pc = lambda u: st.pad_canon(u, sp, p, dim)
    r_c = pc(jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32))
    a = jnp.asarray([1.3, 0.8], jnp.float32)
    b = jnp.float32(0.21)
    theta = jnp.asarray([1.1, 1.2], jnp.float32)
    delta = jnp.asarray([0.9, 1.0], jnp.float32)
    dg = st.cheb_diag_tables(ops, sp, p, dim)
    kw = dict(interpret=True, diag_tables=dg)
    want = gmg_mod._chebyshev_canon(
        ops, a, b, None, theta, delta, r_c, dim, **kw
    )
    monkeypatch.setattr(st, "_CHEB_BF16", True)
    monkeypatch.setattr(
        st, "_canon_by", lambda u_c, p_, dim_, kind="apply": 8
    )
    got = gmg_mod._chebyshev_canon(
        ops, a, b, None, theta, delta, r_c, dim, **kw
    )
    assert got.dtype == jnp.float32
    tol = 0.05 * float(np.abs(np.asarray(want)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=tol)
    mask = np.ones(got.shape, bool)
    mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
    assert float(np.abs(np.where(mask, np.asarray(got), 0)).max()) == 0.0


@pytest.mark.parametrize("p,ref", [(1, 4), (2, 3)])
def test_canon_cheb_pair_matches_chained(p, ref):
    """The paired Chebyshev kernel (``fused_cheb_pair_canon`` — TWO
    smoother iterations per HBM round trip via temporal blocking) must
    reproduce two chained single-iteration kernels to f32 roundoff,
    pads exactly zero — the halo-extended stage-1 window and the
    zero-padded pair tables must hand stage 2 valid intermediates on
    every tap (reference smoother loop: preconditioner.h:219-501)."""
    from dealii_spirk_tpu.ops.pallas import stencil as st

    dim = 3
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(7)
    q = 2
    pc = lambda u: st.pad_canon(u, sp, p, dim)
    mk = lambda: pc(jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32))
    d0, r0, x0 = mk(), mk(), mk()
    a = jnp.asarray([1.3, 0.8], jnp.float32)
    b = jnp.float32(0.21)
    c1a, c2a, c1b, c2b = 0.7, 0.4, 0.55, 0.3
    dg = st.cheb_diag_tables(ops, sp, p, dim)
    pair = st.cheb2_tables(ops, sp, p, dim)
    r1, d1, x1 = st.fused_cheb_iter_canon(
        ops, a, b, c1a, c2a, d0, r0, x0, None, dim, interpret=True,
        force_yb=8, diag_tables=dg,
    )
    want = st.fused_cheb_iter_canon(
        ops, a, b, c1b, c2b, d1, r1, x1, None, dim, interpret=True,
        force_yb=8, diag_tables=dg,
    )
    got = st.fused_cheb_pair_canon(
        ops, a, b, c1a, c2a, c1b, c2b, d0, r0, x0, dim,
        diag_tables=dg, pair_tables=pair, interpret=True, force_yb=8,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=4e-5)
        mask = np.ones(g.shape, bool)
        mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
        assert float(jnp.abs(jnp.where(mask, g, 0)).max()) == 0.0


@pytest.mark.parametrize("degree", [4, 5])
def test_chebyshev_canon_pair_path_matches_single(degree):
    """``_chebyshev_canon`` with pair tables (two-iteration kernel, plus
    one trailing single when degree-1 is odd) must match the plain
    single-iteration execution exactly in exact arithmetic — same
    Chebyshev recurrence, different blocking."""
    from dealii_spirk_tpu.ops.pallas import stencil as st
    from dealii_spirk_tpu.solvers.gmg import _chebyshev_canon

    dim, p, ref = 3, 1, 4
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(11)
    q = 2
    r = st.pad_canon(
        jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32), sp, p, dim
    )
    a = jnp.asarray([1.5, 4.0], jnp.float32)
    b = jnp.float32(0.1)
    theta = jnp.asarray([2.0, 2.4], jnp.float32)
    delta = jnp.asarray([1.1, 1.3], jnp.float32)
    dg = st.cheb_diag_tables(ops, sp, p, dim)
    pair = st.cheb2_tables(ops, sp, p, dim)
    want = _chebyshev_canon(
        ops, a, b, None, theta, delta, r, dim, degree=degree,
        interpret=True, diag_tables=dg,
    )
    got = _chebyshev_canon(
        ops, a, b, None, theta, delta, r, dim, degree=degree,
        interpret=True, diag_tables=dg, pair_tables=pair,
    )
    # different summation order (y-blocked pair vs whole-plane single):
    # f32 roundoff relative to the field scale
    w = np.asarray(want)
    np.testing.assert_allclose(
        np.asarray(got), w, atol=float(3e-5 * np.abs(w).max())
    )


def test_canon_vcycle_matches_classic():
    from dealii_spirk_tpu.fem.grid import make_space
    from dealii_spirk_tpu.ops.pallas import stencil as st
    from dealii_spirk_tpu.solvers.gmg import (
        build_gmg_data,
        gmg_reinit,
        vcycle,
        vcycle_canon,
    )

    for dim, pdeg, ref in [(3, 1, 5), (2, 1, 5)]:
        space = make_space(dim, pdeg, ref)
        gmg = build_gmg_data(space, dtype=jnp.float32, with_dense=False)
        shifts = jnp.asarray([1.5, 4.0], jnp.float32)
        prec = gmg_reinit(gmg, shifts, 0.1, dim, mode="stencil", batch=True)
        prec_c = prec._replace(
            inv_diags_canon=tuple(
                st.pad_canon(invd, (ops.m,) * dim, pdeg, dim)
                if st.canon_supported((ops.m,) * dim, pdeg, dim)
                else None
                for invd, ops in zip(prec.inv_diags, gmg.level_ops)
            )
        )
        rng = np.random.default_rng(3)
        r = jnp.asarray(rng.standard_normal((2,) + space.shape), jnp.float32)
        out_cls = vcycle(gmg, prec, shifts, 0.1, r, dim, "stencil", batch=True)
        r_c = st.pad_canon(r, space.shape, pdeg, dim)
        out_c = vcycle_canon(
            gmg, prec_c, shifts, 0.1, r_c, dim, interpret=True
        )
        got = st.unpad_canon(out_c, space.shape, dim)
        rel = float(jnp.abs(got - out_cls).max() / jnp.abs(out_cls).max())
        assert rel < 5e-5, (dim, pdeg, rel)
        mask = np.ones(out_c.shape, bool)
        mask[(slice(None),) + tuple(slice(0, s) for s in space.shape)] = False
        assert float(jnp.abs(jnp.where(mask, out_c, 0)).max()) == 0.0


def test_canon_vcycle_cheb_diag_wiring(monkeypatch):
    """End-to-end wiring of the in-kernel diag factors: gmg_reinit must
    build ``cheb_diag_canon`` (and drop the padded inverse at those
    levels), and ``vcycle_canon`` must dispatch the factor kernels — the
    real gate only opens at production sizes, so force it here and
    compare against the classic execution."""
    from dealii_spirk_tpu.fem.grid import make_space
    from dealii_spirk_tpu.ops.pallas import stencil as st
    from dealii_spirk_tpu.solvers.gmg import (
        build_gmg_data,
        gmg_reinit,
        vcycle,
        vcycle_canon,
    )

    monkeypatch.setattr(
        st,
        "cheb_diag_supported",
        lambda sp, p, dim: dim == 3
        and st.canon_supported(sp, p, dim, cheb=True),
    )
    # canon_worthwhile gates the whole canonical build at test scale
    monkeypatch.setattr(st, "canon_worthwhile", lambda *a, **k: True)
    dim, pdeg, ref = 3, 1, 5
    space = make_space(dim, pdeg, ref)
    gmg = build_gmg_data(space, dtype=jnp.float32, with_dense=False)
    shifts = jnp.asarray([1.5, 4.0], jnp.float32)
    prec = gmg_reinit(gmg, shifts, 0.1, dim, mode="pallas", batch=True)
    assert prec.cheb_diag_canon is not None
    n_dg = sum(dg is not None for dg in prec.cheb_diag_canon)
    assert n_dg > 0
    # exactly one of (factors, padded inverse) per canonical level
    for dg, invd in zip(prec.cheb_diag_canon, prec.inv_diags_canon):
        assert dg is None or invd is None
    rng = np.random.default_rng(4)
    r = jnp.asarray(rng.standard_normal((2,) + space.shape), jnp.float32)
    out_cls = vcycle(gmg, prec, shifts, 0.1, r, dim, "stencil", batch=True)
    r_c = st.pad_canon(r, space.shape, pdeg, dim)
    out_c = vcycle_canon(gmg, prec, shifts, 0.1, r_c, dim, interpret=True)
    got = st.unpad_canon(out_c, space.shape, dim)
    rel = float(jnp.abs(got - out_cls).max() / jnp.abs(out_cls).max())
    assert rel < 5e-5, rel
    mask = np.ones(out_c.shape, bool)
    mask[(slice(None),) + tuple(slice(0, s) for s in space.shape)] = False
    assert float(jnp.abs(jnp.where(mask, out_c, 0)).max()) == 0.0


@pytest.mark.parametrize(
    "p,ref,by", [(1, 4, 8), (2, 4, 8), (1, 5, 8), (2, 5, 24)]
)  # by=24: non-power-of-two block (the p>=2 production sizes)
def test_canon_yb_kernels_match(p, ref, by):
    """Canonical y-blocked kernels (m >= 255 path: zero-halo layout with
    (z, y)-windowed boundary-branch DMAs) match the XLA path and keep
    pads exactly zero — forced y-blocking on small grids."""
    from dealii_spirk_tpu.ops.mass_laplace import apply_shifted_batched
    from dealii_spirk_tpu.ops.pallas import stencil as st

    lev = make_level(ref, p)
    sp = (lev.m,) * 3
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(0)
    q = 2
    W = jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32)
    d = jnp.asarray(rng.standard_normal(q), jnp.float32)
    Wc = st.pad_canon(W, sp, p, 3)
    got = st.fused_stencil_apply_canon(
        ops, d, 0.37, Wc, 3, interpret=True, force_yb=by
    )
    want = apply_shifted_batched(ops, d, 0.37, W, 3, "stencil")
    np.testing.assert_allclose(
        st.unpad_canon(got, sp, 3), want,
        atol=float(1e-4 * np.abs(want).max() + 1e-6),
    )
    mask = np.ones(got.shape, bool)
    mask[(slice(None),) + tuple(slice(0, s) for s in sp)] = False
    assert float(jnp.abs(jnp.where(mask, got, 0)).max()) == 0.0

    rn, dn, xn = st.fused_cheb_iter_canon(
        ops, d, 0.21, 0.7, 0.4, Wc, Wc, Wc, Wc, 3,
        interpret=True, force_yb=by,
    )
    Ad = apply_shifted_batched(ops, d, 0.21, W, 3, "stencil")
    r_want = W - Ad
    d_want = 0.7 * W + 0.4 * (W * r_want)
    for got2, want2 in [(rn, r_want), (dn, d_want), (xn, W + d_want)]:
        np.testing.assert_allclose(
            st.unpad_canon(got2, sp, 3), want2,
            atol=float(5e-3 * np.abs(want2).max() + 1e-5),
        )
        assert float(jnp.abs(jnp.where(mask, got2, 0)).max()) == 0.0


def test_ymxu_canon_kernels_match_roll_path(monkeypatch):
    """SPIRK_YMXU=1 (MXU y contraction, default off — measured slower on
    v5e, docs/ROUND3_NOTES.md) must stay numerically equivalent for ALL
    three canonical kernel kinds: apply vs the XLA oracle, and the
    dual/cheb kernels vs their roll-path outputs.  bf16x3 accuracy is
    ~1e-5 relative."""
    from dealii_spirk_tpu.ops.mass_laplace import apply_shifted_batched
    from dealii_spirk_tpu.ops.pallas import stencil as st

    rng = np.random.default_rng(1)
    for p, ref in [(1, 4), (2, 3)]:
        lev = make_level(ref, p)
        sp = (lev.m,) * 3
        ops = level_ops(lev, jnp.float32)
        W = jnp.asarray(rng.standard_normal((2,) + sp), jnp.float32)
        d = jnp.asarray([1.0, 2.0], jnp.float32)
        Wc = st.pad_canon(W, sp, p, 3)
        invd = jnp.asarray(
            rng.uniform(0.5, 1.5, Wc.shape), jnp.float32
        )
        x0 = jnp.asarray(rng.standard_normal(Wc.shape), jnp.float32)

        # roll-path outputs (flag off)
        monkeypatch.setattr(st, "_YMXU", False)
        ms_roll = st.fused_mass_stiffness_apply_canon(
            ops, Wc, 3, interpret=True
        )
        cheb_roll = st.fused_cheb_iter_canon(
            ops, d, 0.37, 0.5, 0.25, Wc, Wc, x0, invd, 3, interpret=True
        )

        monkeypatch.setattr(st, "_YMXU", True)
        shape_c = (0,) + st.canon_shape(sp, p, 3)
        assert st._y_mxu_canon(shape_c, p, 3), (p, ref)
        got = st.fused_stencil_apply_canon(ops, d, 0.37, Wc, 3, interpret=True)
        want = apply_shifted_batched(ops, d, 0.37, W, 3, "stencil")
        np.testing.assert_allclose(
            st.unpad_canon(got, sp, 3), want,
            atol=float(3e-5 * np.abs(want).max() + 1e-6),
        )
        # dual kernel (E=Zk/F=Zm mapping) and fused cheb iteration
        ms_mxu = st.fused_mass_stiffness_apply_canon(
            ops, Wc, 3, interpret=True
        )
        for a, b in zip(ms_mxu, ms_roll):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                atol=float(3e-5 * np.abs(np.asarray(b)).max() + 1e-6),
            )
        cheb_mxu = st.fused_cheb_iter_canon(
            ops, d, 0.37, 0.5, 0.25, Wc, Wc, x0, invd, 3, interpret=True
        )
        for a, b in zip(cheb_mxu, cheb_roll):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                atol=float(3e-5 * np.abs(np.asarray(b)).max() + 1e-6),
            )
        # threaded tables must resolve the same layout (stacked square)
        tabs = st.canon_tables(ops, sp, p, 3)
        assert tabs[1].ndim == 3 and tabs[1].shape[0] == 2
        got2 = st.fused_stencil_apply_canon(
            ops, d, 0.37, Wc, 3, interpret=True, tables=tabs
        )
        np.testing.assert_allclose(np.asarray(got2), np.asarray(got))


def test_bf16x3_dots_carry_default_precision():
    """Regression guard for the round-3 root cause (ROUND3_NOTES.md): the
    package sets jax_default_matmul_precision=highest globally, and a
    bf16 dot that INHERITS it reaches Mosaic with an fp32 contract
    precision, which it rejects ("Bad lhs type").  The bf16x3 passes must
    pin precision=DEFAULT explicitly."""
    from dealii_spirk_tpu.ops.pallas import stencil as st

    a = jnp.ones((8, 16), jnp.float32)
    b = jnp.ones((16, 8), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda x, y: st._dot_bf16x3(x, y, (((1,), (0,)), ((), ())))
    )(a, b)
    dots = [
        e for e in jaxpr.eqns if e.primitive.name == "dot_general"
        and e.invars[0].aval.dtype == jnp.bfloat16
    ]
    assert len(dots) == 3  # hi*hi + hi*lo + lo*hi
    for e in dots:
        # None would INHERIT the global highest — must be explicit
        prec = e.params.get("precision")
        assert prec == (
            jax.lax.Precision.DEFAULT,
            jax.lax.Precision.DEFAULT,
        ), prec


def test_ymxu_classic_wrappers_match_xla_oracle(monkeypatch):
    """ADVICE r3: the SPIRK_YMXU=1 path through the CLASSIC (non-canonical)
    wrappers — classic pad/DMA geometry combined with the dense y table —
    had no direct test; the canonical-wrapper test above exercises only
    the canonical geometry.  Compare fused_stencil_apply and
    fused_mass_stiffness_apply against the XLA stencil oracle with the
    flag forced on (interpret mode relaxes the >=128-lane Mosaic gate)."""
    from dealii_spirk_tpu.ops.mass_laplace import (
        apply_mass_stiffness_batched,
        apply_shifted_batched,
    )
    from dealii_spirk_tpu.ops.pallas import stencil as st

    rng = np.random.default_rng(7)
    for p, ref in [(1, 4), (2, 3)]:
        lev = make_level(ref, p)
        sp = (lev.m,) * 3
        ops = level_ops(lev, jnp.float32)
        W = jnp.asarray(rng.standard_normal((2,) + sp), jnp.float32)
        d = jnp.asarray([1.0, 2.0], jnp.float32)

        monkeypatch.setattr(st, "_YMXU", True)
        assert st._y_mxu_ok(
            p, 3, st._ceil(W.shape[2] + p, 8), st._nx_pad(W.shape[-1], p, 3), 0
        ), (p, ref)
        got = st.fused_stencil_apply(ops, d, 0.37, W, 3, interpret=True)
        want = apply_shifted_batched(ops, d, 0.37, W, 3, "stencil")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want),
            atol=float(3e-5 * np.abs(np.asarray(want)).max() + 1e-6),
        )
        got_ms = st.fused_mass_stiffness_apply(ops, W, 3, interpret=True)
        want_ms = apply_mass_stiffness_batched(ops, W, 3, "stencil")
        for a, b in zip(got_ms, want_ms):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b),
                atol=float(3e-5 * np.abs(np.asarray(b)).max() + 1e-6),
            )


def test_stage_mix_canon_matches_gemm():
    """One-pass stage-mix kernel (r4): out_i = sum_j mat[i,j] W_j on
    aligned layouts must equal the reshaped GEMM (the T/T^-1/A^-1 basis
    changes of the IRK solve, reference main.cc:1443-1534), including a
    rectangular mat and the off-layout fallback."""
    from dealii_spirk_tpu.ops.pallas import stencil as st

    rng = np.random.default_rng(3)
    for q_out, q_in, shape in [
        (4, 4, (16, 16, 128)),   # canonical r-like block
        (2, 5, (8, 256)),        # rectangular, 2D layout
        (3, 3, (24, 40, 128)),   # rows not a power of two
    ]:
        W = jnp.asarray(
            rng.standard_normal((q_in,) + shape), jnp.float32
        )
        mat = jnp.asarray(rng.standard_normal((q_out, q_in)), jnp.float32)
        want = (mat @ W.reshape(q_in, -1)).reshape((q_out,) + shape)
        got = st.stage_mix_canon(mat, W, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want),
            atol=float(1e-6 * np.abs(want).max() + 1e-7),
        )

    # off-layout (lane extent not a multiple of 128): exact GEMM fallback
    W = jnp.asarray(rng.standard_normal((3, 8, 72)), jnp.float32)
    mat = jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)
    got = st.stage_mix_canon(mat, W, interpret=True)
    want = (mat @ W.reshape(3, -1)).reshape(W.shape)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("ref,p", [(4, 1), (4, 2), (3, 3)])
def test_fused_ms_mix_matches_unfused(ref, p):
    """Fused outer-vmult kernel (r4): A^-1 (M W) + tau (K W) in one pass
    must match the unfused ms kernel + mix (reference SystemMatrix vmult,
    main.cc:1556-1591) — p=1 exercises the in-kernel x-roll path, p>=2
    the dense x dot."""
    from dealii_spirk_tpu.ops.pallas import stencil as st

    lev = make_level(ref, p)
    ops = level_ops(lev, jnp.float32)
    q = 4
    spatial = (lev.m,) * 3
    if not st.ms_mix_supported(spatial, p, 3, q):
        pytest.skip(f"ms-mix unsupported at ref={ref} p={p}")
    rng = np.random.default_rng(11)
    W = jnp.asarray(rng.standard_normal((q,) + spatial), jnp.float32)
    Wc = st.pad_canon(W, spatial, p, 3)
    mat = jnp.asarray(rng.standard_normal((q, q)), jnp.float32)
    tau = 0.37
    MW, KW = st.fused_mass_stiffness_apply_canon(ops, Wc, 3, interpret=True)
    want = (mat @ MW.reshape(q, -1)).reshape(MW.shape) + tau * KW
    got = st.fused_ms_mix_apply_canon(ops, mat, tau, Wc, 3, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        atol=float(3e-5 * np.abs(np.asarray(want)).max() + 1e-6),
    )
    # zero pads in -> zero pads out (the canonical-layout contract)
    mask = np.ones(got.shape, bool)
    mask[(slice(None),) + tuple(slice(0, s) for s in spatial)] = False
    np.testing.assert_array_equal(np.asarray(got)[mask], 0.0)


@pytest.mark.parametrize("diag", [False, True])
def test_cheb_bz_geometry_bitwise(diag):
    """The joint (bz, by) cheb geometry (round-5: bz=16 cuts the
    d-window DMA re-read that binds the p >= 2 kernels) must not change
    a single bit: per output element the taps, band weights, and
    summation order are identical at every slab thickness."""
    from dealii_spirk_tpu.ops.pallas import stencil as st

    dim, p, ref = 3, 2, 4
    lev = make_level(ref, p)
    sp = (lev.m,) * dim
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(7)
    q = 2
    pc = lambda u: st.pad_canon(u, sp, p, dim)
    mk = lambda: pc(jnp.asarray(rng.standard_normal((q,) + sp), jnp.float32))
    d0, r0, x0 = mk(), mk(), mk()
    invd = pc(
        jnp.asarray(
            np.abs(rng.standard_normal((q,) + sp)) + 0.5, jnp.float32
        )
    )
    a = jnp.asarray([1.3, 0.8], jnp.float32)
    b, c1, c2 = jnp.float32(0.21), 0.7, 0.4
    nzp = r0.shape[1]
    assert nzp % 16 == 0, "pick a shape whose canonical z splits at bz=16"
    dg = st.cheb_diag_tables(ops, sp, p, dim) if diag else None
    kw = dict(interpret=True, force_yb=8, diag_tables=dg)
    outs = [
        st.fused_cheb_iter_canon(
            ops, a, b, c1, c2, d0, r0, x0, None if diag else invd, dim,
            force_bz=bz, **kw,
        )
        for bz in (8, 16)
    ]
    for g8, g16 in zip(*outs):
        np.testing.assert_array_equal(np.asarray(g8), np.asarray(g16))
