"""Cheb kernel block-geometry sweep (verdict-#2 post-mortem, part 3):
with the MXU ruled out (scripts/cheb_dot_ab.py: bf16x3 dots = 1.00-1.07x)
the remaining modeled gap at p >= 2 is the d-window DMA halo re-read —
at the default (bz=8, by=24) geometry the haloed window
(bz+2p, by+16, nx) re-reads the d field 2.5x (p=2) to 3.3x (p=4), vs
1.56x at the p=1 production shape (by=64).  The 11 MB VMEM budget in
``_canon_by_from_shape`` is what caps by; this sweep forces other
(bz, by) pairs through ``force_yb`` + a patched ``_BZ`` to measure
whether cutting the re-read factor moves the kernel.

  p=2 r7 (ny_p=264, divisible by in {8, 24, 88}):
    bz=8,  by=24 -> 2.50x re-read (default)
    bz=16, by=24 -> 2.08x (z-halo amortized; ~8.4 MB VMEM)
    bz=8,  by=88 -> 1.77x (~14.4 MB VMEM — may bust the ~16 MB core)

Timing: two-point in-graph slope; bz is read at trace time, so caches
are cleared per arm.

Usage: python -u scripts/cheb_geom_sweep.py [p:ref ...]  (default 2:7)
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
    combos = sys.argv[1:] or ["2:7"]
    print(f"device: {jax.devices()[0]}  (cheb kernel geometry, q={Q}, f32)")
    print(f"{'p':>2} {'ref':>3} {'bz':>3} {'by':>4} {'reread':>6} | "
          f"{'ms':>8} {'GB/s':>5} {'%HBM':>4}")
    bz0 = st._BZ
    for combo in combos:
        p, ref = (int(v) for v in combo.split(":"))
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
        ny_p = Wc.shape[2]
        by_def = st._canon_by(Wc, p, 3, kind="cheb")
        arms = [(bz0, by_def)]
        arms += [(2 * bz0, by_def)]
        bigger = [b for b in range(by_def + 8, min(ny_p, 257), 8)
                  if ny_p % b == 0]
        if bigger:
            arms += [(bz0, bigger[0]), (2 * bz0, bigger[0])]
        n_log = Q * lev.m**3
        max_n = 40 if Wc.size * 4 > 100 * 2**20 else 2000
        for bz, by in arms:
            if Wc.shape[1] % bz or ny_p % by:
                continue
            st._BZ = bz
            jax.clear_caches()
            tabs = st.canon_tables(ops, spatial, p, 3)
            fn = lambda x: st.fused_cheb_iter_canon(
                ops, d, 0.1, 0.9, 0.4, x, x, x, invd, 3, tables=tabs,
                force_yb=by,
            )
            f = ((bz + 2 * p) * (by + 16)) / (bz * by)
            try:
                out = fn(Wc)[0]
                jax.block_until_ready(out)
            except Exception as e:
                msg = str(e).splitlines()[0][:90]
                print(f"{p:>2} {ref:>3} {bz:>3} {by:>4} {f:>5.2f}x | "
                      f"FAILS ({msg})")
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
