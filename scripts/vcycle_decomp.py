"""In-graph decomposition of the batched canonical V-cycle at bench
scale: slope-time (scripts/mix_bench.py::slope — two-point in-graph
fori chains, the only timing discipline the remote tunnel can't fool)
each fine-level slice of ``vcycle_canon``:

  * ``vcycle``   — the whole V-cycle (the solve's dominant component)
  * ``pre``      — fine-level pre-smooth (init + degree-1 fused iters)
  * ``post``     — fine-level post-smooth (r - A x0 + init + iters)
  * ``resid``    — r - A x (fused apply + XLA subtract, as in vcycle)
  * ``transfer`` — 3-axis restriction + prolongation + correction add
  * ``cheb1``    — one fused Chebyshev iteration (the workhorse unit)

Everything below ``vcycle - (pre + post + resid + transfer)`` is the
coarse subtree plus scheduling overhead.  prec/tables ride as jit
arguments (closure constants blow the remote compile cap at r8).

Usage: python -m scripts.vcycle_decomp [refinement]   (default 8)
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from bench import _build

    from dealii_spirk_tpu.ops.banded import apply_dense_1d
    from dealii_spirk_tpu.ops.pallas import stencil as st
    from dealii_spirk_tpu.solvers.gmg import (
        SMOOTHER_DEGREE,
        _chebyshev_canon,
        vcycle_canon,
    )
    from dealii_spirk_tpu.tables import irk_tables
    from scripts.mix_bench import slope

    params, problem, scheme = _build("irk_batched", refinement)
    tau = params.time_step_size
    prec = scheme._reinit(tau)
    jax.block_until_ready(prec)
    q = params.irk_stages
    dim = problem.space.dim
    p = problem.space.degree
    gmg = scheme.gmg
    ops = gmg.level_ops[-1]
    spatial = (ops.m,) * dim
    shifts = jnp.asarray(irk_tables(q).D, jnp.float32)
    assert getattr(scheme, "use_canon", False), "decomp expects canon path"

    rng = np.random.default_rng(0)
    mk = lambda: st.pad_canon(
        jnp.asarray(rng.standard_normal((q,) + spatial), jnp.float32),
        spatial, p, dim,
    )
    r0, x0 = mk(), mk()
    lvl = len(gmg.level_ops) - 1
    tabs = prec.canon_tables[lvl] if prec.canon_tables else None
    dg = prec.cheb_diag_canon[lvl] if prec.cheb_diag_canon else None
    invd = prec.inv_diags_canon[lvl] if prec.inv_diags_canon else None
    theta, delta = prec.thetas[lvl], prec.deltas[lvl]

    # canonical-embedded transfer matrices, fine <-> fine-1 (the
    # vcycle_canon _transfer_mats construction)
    P1 = np.asarray(gmg.prolongs[lvl - 1], dtype=np.float32)
    cs_f = st.canon_shape(spatial, p, dim)
    cs_c = st.canon_shape((gmg.level_ops[lvl - 1].m,) * dim, p, dim)
    mats_P, mats_R = [], []
    for ax in range(dim):
        Pp = np.zeros((cs_f[ax], cs_c[ax]), np.float32)
        Pp[: P1.shape[0], : P1.shape[1]] = P1
        mats_P.append(jnp.asarray(Pp))
        mats_R.append(jnp.asarray(Pp.T))

    def _axes(mats, u):
        for ax_i, m_ in enumerate(mats):
            u = apply_dense_1d(m_, u, 1 + ax_i)
        return u

    max_n = 20 if r0.size * 4 > 100 * 2**20 else 1000

    def row(name, fn, args, per=1.0):
        ms = slope(fn, args, max_n=max_n) * 1e3 / per
        print(f"{name:>9}: {ms:8.3f} ms")
        return ms

    print(
        f"device: {jax.devices()[0]}  refinement {refinement}, q={q}, "
        f"p={p}, fine {spatial}, degree {SMOOTHER_DEGREE}"
    )

    t_vc = row(
        "vcycle",
        lambda r, pr: vcycle_canon(gmg, pr, shifts, tau, r, dim),
        (r0, prec),
    )
    t_pre = row(
        "pre",
        lambda r, tb, dg_, iv: _chebyshev_canon(
            ops, shifts, tau, iv, theta, delta, r, dim,
            tables=tb, diag_tables=dg_,
        ),
        (r0, tabs, dg, invd),
    )

    def post(state, tb, dg_, iv):
        r, x = state
        xn = _chebyshev_canon(
            ops, shifts, tau, iv, theta, delta, r, dim,
            x0_c=x, tables=tb, diag_tables=dg_,
        )
        return r, xn

    t_post = row("post", post, ((r0, x0), tabs, dg, invd))

    def resid(state, tb):
        # production formulation: fused apply + XLA subtract (5 passes)
        r, x = state
        res = r - st.fused_stencil_apply_canon(
            ops, shifts, tau, x, dim, tables=tb
        )
        return res, x

    t_res = row("resid", resid, ((r0, x0), tabs))

    def resid_subfrom(state, tb):
        # kernel-epilogue variant — recorded NEGATIVE (BASELINE round 4:
        # 2.35 vs 1.34 ms; the extra blocked input degrades the DMA
        # schedule more than the saved pass gains)
        r, x = state
        res = st.fused_stencil_apply_canon(
            ops, shifts, tau, x, dim, tables=tb, sub_from=r
        )
        return res, x

    row("resid_subfrom", resid_subfrom, ((r0, x0), tabs))

    def post_old(state, tb, dg_, iv):
        # pre-fusion post-smooth ENTRY: apply + XLA subtract + XLA init
        # (the body iterations are identical either way, so the entry
        # delta is the whole old-vs-new difference)
        r, x = state
        rr = r - st.fused_stencil_apply_canon(
            ops, shifts, tau, x, dim, tables=tb
        )
        if dg_ is not None:
            dgz, dgy, dgx = dg_
            zmym = (
                dgz[:, 0][None, :, None, None]
                * dgy[:, 0][None, None, :, None]
            )
            zkym_zmyk = (
                dgz[:, 1][None, :, None, None]
                * dgy[:, 0][None, None, :, None]
                + dgz[:, 0][None, :, None, None]
                * dgy[:, 1][None, None, :, None]
            )
            aq = shifts[:, None, None, None]
            diag = (aq * zmym + tau * zkym_zmyk) * dgx[0] + (
                tau * zmym
            ) * dgx[1]
            z = rr / diag
        else:
            z = iv * rr
        d = z / theta[:, None, None, None]
        xn = x + d
        return r, xn

    row("post_entry_old", post_old, ((r0, x0), tabs, dg, invd))

    def post_entry(state, tb, dg_, iv):
        r, x = state
        _rr, _d, xn = st.fused_cheb_iter_canon(
            ops, shifts, tau, 0.0, 1.0 / theta, x, r, x, iv, dim,
            tables=tb, diag_tables=dg_,
        )
        return r, xn

    row("post_entry", post_entry, ((r0, x0), tabs, dg, invd))
    t_tr = row(
        "transfer",
        lambda x: x + _axes(mats_P, _axes(mats_R, x)),
        (x0,),
    )

    def cheb1(state, tb, dg_, iv):
        d, rr, x = state
        return st.fused_cheb_iter_canon(
            ops, shifts, tau, 0.9, 0.4, d, rr, x, iv, dim,
            tables=tb, diag_tables=dg_,
        )

    t_c1 = row("cheb1", cheb1, ((r0, x0, mk()), tabs, dg, invd))

    # fori-vs-unrolled A/B of the same pre-smooth: isolates the loop
    # carry-boundary cost (unrolled is the default since round 4; this
    # row re-measures the old lax.fori_loop variant)
    import dealii_spirk_tpu.solvers.gmg as gmg_mod

    saved = gmg_mod._UNROLL_LIMIT
    gmg_mod._UNROLL_LIMIT = 0
    t_pref = row(
        "pre_fori",
        lambda r, tb, dg_, iv: _chebyshev_canon(
            ops, shifts, tau, iv, theta, delta, r, dim,
            tables=tb, diag_tables=dg_,
        ),
        (r0, tabs, dg, invd),
    )
    gmg_mod._UNROLL_LIMIT = saved

    fine = t_pre + t_post + t_res + t_tr
    print(f"fine-level model (pre+post+resid+transfer): {fine:8.3f} ms")
    print(f"subtree + overhead (vcycle - fine):         {t_vc - fine:8.3f} ms")
    n_it = SMOOTHER_DEGREE - 1
    print(
        f"smoother iters alone (2x{n_it} x cheb1):       "
        f"{2 * n_it * t_c1:8.3f} ms"
    )
    print(
        f"XLA glue in pre+post (minus iters):         "
        f"{t_pre + t_post - 2 * n_it * t_c1:8.3f} ms"
    )
    print(f"fori carry cost per pre-smooth:             {t_pref - t_pre:8.3f} ms")


if __name__ == "__main__":
    main()
