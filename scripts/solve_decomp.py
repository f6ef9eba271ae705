"""Decompose the bench solve: time vmult, V-cycle, and full step
separately at bench scale (q=4, refinement 7, f32, pallas).

Usage: python -u scripts/solve_decomp.py [refinement]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, reps=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from bench import _build

    from dealii_spirk_tpu.ops.mass_laplace import (
        apply_mass_stiffness_batched,
        apply_shifted_batched,
    )
    from dealii_spirk_tpu.solvers.gmg import vcycle

    params, problem, scheme = _build("irk_batched", refinement)
    tau = params.time_step_size
    prec = scheme._reinit(tau)
    jax.block_until_ready(prec)

    q = params.irk_stages
    shape = (q,) + problem.space.shape
    W = jax.random.normal(jax.random.PRNGKey(0), shape, dtype=jnp.float32)

    from dealii_spirk_tpu.tables import irk_tables

    gmg = scheme.gmg
    ops = gmg.level_ops[-1]
    shifts = jnp.asarray(irk_tables(q).D, jnp.float32)
    dim = problem.space.dim

    use_canon = getattr(scheme, "use_canon", False)
    if use_canon:
        # the scheme's own execution: canonical layout + threaded tables
        # (in-graph tables at refinement 8 blow the remote compiler's
        # request cap — the schemes thread them for the same reason)
        from dealii_spirk_tpu.ops.pallas import stencil as st
        from dealii_spirk_tpu.solvers.gmg import vcycle_canon

        spatial = (ops.m,) * dim
        Wc = st.pad_canon(W, spatial, problem.space.degree, dim)
        tabs = prec.canon_tables[-1] if prec.canon_tables else None
        # prec/tables as jit ARGUMENTS (closure constants embed their
        # leaves in the program and blow the remote compile cap at r8)
        ms_jit = jax.jit(
            lambda u, tb: st.fused_mass_stiffness_apply_canon(
                ops, u, dim, tables=tb
            )
        )
        t_ms = timeit(ms_jit, Wc, tabs)
        sh_jit = jax.jit(
            lambda u, tb: st.fused_stencil_apply_canon(
                ops, shifts, tau, u, dim, tables=tb
            )
        )
        t_sh = timeit(sh_jit, Wc, tabs)
        vc_jit = jax.jit(
            lambda r, pr: vcycle_canon(gmg, pr, shifts, tau, r, dim)
        )
        t_vc = timeit(vc_jit, Wc, prec)
    else:
        t_ms = timeit(
            jax.jit(
                lambda u: apply_mass_stiffness_batched(ops, u, dim, "pallas")
            ),
            W,
        )
        t_sh = timeit(
            jax.jit(
                lambda u: apply_shifted_batched(
                    ops, shifts, tau, u, dim, "pallas"
                )
            ),
            W,
        )
        t_vc = timeit(
            jax.jit(
                lambda r: vcycle(
                    gmg, prec, shifts, tau, r, dim, "pallas", batch=True
                )
            ),
            W,
        )
    tau_ = jnp.asarray(tau, jnp.float32)
    solve_jit = jax.jit(scheme.solve_fn)  # prec as ARG (see above)
    n_outer = int(solve_jit(W, prec, tau_)[1])
    t_solve = timeit(lambda r: solve_jit(r, prec, tau_)[0], W, reps=5)

    print(f"dual vmult (M,K):   {t_ms * 1e3:7.2f} ms")
    print(f"shifted apply:      {t_sh * 1e3:7.2f} ms")
    print(f"vcycle (batched):   {t_vc * 1e3:7.2f} ms")
    print(f"full solve:         {t_solve * 1e3:7.2f} ms  ({n_outer} outer)")
    n_it = n_outer
    print(
        f"-> {n_it} iters x (vmult {t_ms * 1e3:.2f} + vcycle {t_vc * 1e3:.2f})"
        f" = {n_it * (t_ms + t_vc) * 1e3:.2f} ms;"
        f" overhead = {(t_solve - n_it * (t_ms + t_vc)) * 1e3:.2f} ms"
    )


if __name__ == "__main__":
    main()
