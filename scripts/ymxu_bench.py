"""A/B the MXU y-contraction (SPIRK_YMXU) on the canonical kernels.

Times the three canonical whole-plane kernels (apply, ms-dual, fused
cheb-iter) at the sizes where the y path changes (by == 0, ny_p >= 128).
Run twice — SPIRK_YMXU=0 and =1 — and diff (VERDICT r2 #2: the measured
next step on the kernel; estimates in docs/ROUND2_NOTES.md).

Usage: SPIRK_YMXU={0,1} python -m scripts.ymxu_bench [ref:p ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dealii_spirk_tpu.fem.grid import make_level
from dealii_spirk_tpu.ops.mass_laplace import level_ops
from dealii_spirk_tpu.ops.pallas import stencil as st

Q = 4


def timed(fn, x0, iters=30, reps=3):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda _, a: fn(a), x)

    out = loop(x0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(x0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    combos = sys.argv[1:] or ["7:1", "6:2", "5:3", "5:4"]
    ymxu = os.environ.get("SPIRK_YMXU", "0")
    print(f"device: {jax.devices()[0]}  q={Q} f32  SPIRK_YMXU={ymxu}")
    print(f"{'ref':>3} {'p':>2} {'m':>4} | {'apply':>9} {'ms':>9} {'cheb':>9}")
    for combo in combos:
        ref, p = (int(v) for v in combo.split(":"))
        lev = make_level(ref, p)
        m = lev.m
        ops = level_ops(lev, jnp.float32)
        if not st.canon_supported((m,) * 3, p, 3, cheb=True):
            print(f"{ref:>3} {p:>2} {m:>4} | canonical unsupported")
            continue
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.standard_normal((Q, m, m, m)).astype(np.float32))
        Wc = st.pad_canon(W, (m,) * 3, p, 3)
        d = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
        invd = jnp.ones_like(Wc)
        # thread the tables (as the solvers do via GMGPrec) so the timed
        # loop measures the kernel, not in-graph table rebuilds
        tabs = jax.jit(
            lambda: st.canon_tables(ops, (m,) * 3, p, 3)
        )()
        jax.block_until_ready(tabs)

        t_apply = timed(
            lambda u: st.fused_stencil_apply_canon(
                ops, d, 0.1, u, 3, tables=tabs
            ),
            Wc,
        )
        t_ms = timed(
            lambda u: st.fused_mass_stiffness_apply_canon(
                ops, u, 3, tables=tabs
            )[1],
            Wc,
        )

        def cheb(state):
            # kernel signature/return: (d, r, x) -> (r', d', x')
            rr, dd, xx = state
            return st.fused_cheb_iter_canon(
                ops, d, 0.1, 0.5, 0.25, dd, rr, xx, invd, 3, tables=tabs
            )

        t_cheb = timed(cheb, (Wc, Wc, jnp.zeros_like(Wc)))
        print(
            f"{ref:>3} {p:>2} {m:>4} | {t_apply * 1e3:>7.3f}ms "
            f"{t_ms * 1e3:>7.3f}ms {t_cheb * 1e3:>7.3f}ms"
        )


if __name__ == "__main__":
    main()
