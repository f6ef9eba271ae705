"""A/B the Chebyshev smoother kernel variants at production sizes:

  * ``invd``  — precomputed inverse-diagonal read (7 HBM passes/iter)
  * ``diag``  — in-kernel Kronecker diag factors (6 passes/iter)
  * ``pair``  — PAIRED kernel: two iterations per HBM round trip
                (~7 logical passes per TWO iterations)

Reports ms per TWO smoother iterations (the pair kernel's unit) and the
effective GB/s on the logical traffic of each variant.  Timing is the
two-point in-graph slope (scripts/mix_bench.py::slope — the only
trustworthy discipline on this machine's remote tunnel, CLAUDE.md);
the carried loop state is the (d, r, x) field triple so every link is
a real data dependence.

The smoother recurrence coefficients are fixed constants here — the
kernels are coefficient-oblivious; only memory movement and the
per-element schedule are under test.

Usage: python -m scripts.cheb_pair_bench [p:ref ...]   (default: 1:8 2:7)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from dealii_spirk_tpu.fem.grid import make_level
from dealii_spirk_tpu.ops.mass_laplace import level_ops, operator_diagonal
from dealii_spirk_tpu.ops.pallas import stencil as st
from scripts.mix_bench import slope

Q = 4
HBM_GBPS = 819.0


def main():
    combos = sys.argv[1:] or ["1:8", "2:7"]
    print(f"device: {jax.devices()[0]}  (q={Q}, f32, ms per TWO iterations)")
    print(
        f"{'p':>2} {'ref':>3} {'m':>4} | {'variant':>7} {'ms/2it':>8} "
        f"{'GB/s':>5} {'%HBM':>4} | {'vs invd':>7}"
    )
    for combo in combos:
        p, ref = (int(v) for v in combo.split(":"))
        lev = make_level(ref, p)
        m = lev.m
        spatial = (m,) * 3
        ops = level_ops(lev, jnp.float32)
        if not st.canon_supported(spatial, p, 3, cheb=True):
            print(f"{p:>2} {ref:>3} {m:>4}   — canonical cheb unsupported")
            continue
        rng = np.random.default_rng(0)
        mk = lambda: st.pad_canon(
            jnp.asarray(
                rng.standard_normal((Q,) + spatial).astype(np.float32)
            ),
            spatial,
            p,
            3,
        )
        d0, r0, x0 = mk(), mk(), mk()
        tabs = st.canon_tables(ops, spatial, p, 3)
        dvec = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
        tau = jnp.float32(0.1)
        invd = st.pad_canon(
            jax.vmap(lambda ai: 1.0 / operator_diagonal(ops, ai, tau, 3))(
                dvec
            ),
            spatial,
            p,
            3,
        )
        dg = (
            st.cheb_diag_tables(ops, spatial, p, 3)
            if st.cheb_diag_supported(spatial, p, 3)
            else None
        )
        pair = (
            st.cheb2_tables(ops, spatial, p, 3)
            if st.cheb2_supported(spatial, p, 3, Q)
            else None
        )
        nbytes = d0.size * 4  # one canonical field pass

        def two_single(state, invd_, tabs_):
            d, r, x = state
            r, d, x = st.fused_cheb_iter_canon(
                ops, dvec, tau, 0.9, 0.4, d, r, x, invd_, 3, tables=tabs_
            )
            r, d, x = st.fused_cheb_iter_canon(
                ops, dvec, tau, 0.8, 0.3, d, r, x, invd_, 3, tables=tabs_
            )
            return (d, r, x)

        def two_single_dg(state, dg_, tabs_):
            d, r, x = state
            r, d, x = st.fused_cheb_iter_canon(
                ops, dvec, tau, 0.9, 0.4, d, r, x, None, 3,
                tables=tabs_, diag_tables=dg_,
            )
            r, d, x = st.fused_cheb_iter_canon(
                ops, dvec, tau, 0.8, 0.3, d, r, x, None, 3,
                tables=tabs_, diag_tables=dg_,
            )
            return (d, r, x)

        def one_pair(state, dg_, pair_, tabs_):
            d, r, x = state
            r, d, x = st.fused_cheb_pair_canon(
                ops, dvec, tau, 0.9, 0.4, 0.8, 0.3, d, r, x, 3,
                tables=tabs_, diag_tables=dg_, pair_tables=pair_,
            )
            return (d, r, x)

        max_n = 20 if d0.size * 4 > 100 * 2**20 else 1000
        variants = [("invd", two_single, (invd, tabs), 14)]
        if dg is not None:
            variants.append(("diag", two_single_dg, (dg, tabs), 12))
        if pair is not None:
            variants.append(("pair", one_pair, (dg, pair, tabs), 7))
        base_ms = None
        for name, fn, extra, passes in variants:
            ms = (
                slope(fn, ((d0, r0, x0),) + extra, max_n=max_n) * 1e3
            )
            gbps = passes * nbytes / (ms * 1e-3) / 1e9
            pct = 100.0 * gbps / HBM_GBPS
            if base_ms is None:
                base_ms = ms
            print(
                f"{p:>2} {ref:>3} {m:>4} | {name:>7} {ms:>8.3f} "
                f"{gbps:>5.0f} {pct:>3.0f}% | {base_ms / ms:>6.2f}x"
            )


if __name__ == "__main__":
    main()
