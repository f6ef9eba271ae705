"""One-off bz-axis extension of cheb_geom_sweep (round-5, verdict #2):
the (bz 8 -> 16) arm won 1.06-1.12x at p in {2,3,4}; this probes bz=32
and the p=1 refinement-8 production shape to find where the z-halo
amortization saturates before wiring a per-kind bz into the dispatch.

Usage: python -u scripts/cheb_bz_probe.py [p:ref:bz ...]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dealii_spirk_tpu.fem.grid import make_level  # noqa: E402
from dealii_spirk_tpu.ops.mass_laplace import level_ops  # noqa: E402
from dealii_spirk_tpu.ops.pallas import stencil as st  # noqa: E402
from scripts.mix_bench import slope  # noqa: E402

Q = 4
HBM_GBPS = 819.0


def main():
    combos = sys.argv[1:] or [
        "2:7:32", "4:6:32", "1:8:8", "1:8:16", "1:8:32",
    ]
    print(f"device: {jax.devices()[0]}  (cheb kernel bz probe, q={Q}, f32)")
    print(f"{'p':>2} {'ref':>3} {'bz':>3} {'by':>4} {'reread':>6} | "
          f"{'ms':>8} {'GB/s':>5} {'%HBM':>4}")
    bz0 = st._BZ
    for combo in combos:
        p, ref, bz = (int(v) for v in combo.split(":"))
        lev = make_level(ref, p)
        spatial = (lev.m,) * 3
        ops = level_ops(lev, jnp.float32)
        rng = np.random.default_rng(0)
        Wc = st.pad_canon(
            jnp.asarray(
                rng.standard_normal((Q,) + spatial).astype(np.float32)
            ),
            spatial, p, 3,
        )
        d = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
        invd = jnp.ones_like(Wc)
        by = st._canon_by(Wc, p, 3, kind="cheb")
        if Wc.shape[1] % bz or (by and Wc.shape[2] % by):
            print(f"{p:>2} {ref:>3} {bz:>3} {by:>4}  (indivisible)")
            continue
        st._BZ = bz
        jax.clear_caches()
        tabs = st.canon_tables(ops, spatial, p, 3)
        fn = lambda x: st.fused_cheb_iter_canon(
            ops, d, 0.1, 0.9, 0.4, x, x, x, invd, 3, tables=tabs,
            force_yb=by,
        )
        byw = by if by else Wc.shape[2]
        f = ((bz + 2 * p) * (byw + (16 if by else 0))) / (bz * byw)
        n_log = Q * lev.m**3
        max_n = 40 if Wc.size * 4 > 100 * 2**20 else 2000
        try:
            out = fn(Wc)[0]
            jax.block_until_ready(out)
        except Exception as e:
            msg = str(e).splitlines()[0][:90]
            print(f"{p:>2} {ref:>3} {bz:>3} {by:>4} {f:>5.2f}x | "
                  f"FAILS ({msg})")
            st._BZ = bz0
            continue
        t = slope(lambda x: fn(x)[0], (Wc,), reps=5, max_n=max_n)
        gbps = 7 * n_log * 4 / t / 1e9
        print(f"{p:>2} {ref:>3} {bz:>3} {by:>4} {f:>5.2f}x | "
              f"{t * 1e3:>8.3f} {gbps:>5.0f} "
              f"{100 * gbps / HBM_GBPS:>3.0f}%")
        st._BZ = bz0
    st._BZ = bz0


if __name__ == "__main__":
    main()
