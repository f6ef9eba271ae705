"""Within-run A/B: f32-HIGHEST vs bf16x3 DOTS inside the fused
Chebyshev smoother kernels at p >= 2 (SPIRK_CHEB_DOT_BF16).

The round-4 degree roofline left cheb as the outlier at p in {2,3,4}
(60-65% of sum-roof vs 71-94% for apply/ms-dual/Aop-mix) and the
round-4 verdict asked for a reconciliation: the model labels cheb
HBM-bound, yet the measured time matches the SERIAL sum of its HBM and
MXU components — the f32-HIGHEST x-dot (6 MXU passes, gated by
``_bf16_ok`` to protect the ACCURACY oracle) is ~half the kernel.  But
the accuracy argument does not apply to the smoother: cheb only ever
runs inside the preconditioner, so bf16x3 noise there perturbs M, not
A.  The oracle is therefore unchanged ITERATION COUNTS, enforced here
end-to-end (bench._time_scheme accumulates outer + summed per-lane
inner counts across all scanned steps).

Part 1 slope-times the bare kernel both ways per degree (within one
process; the flag is read at kernel trace time, so caches are cleared
between arms).  Part 2 runs the end-to-end irk_batched step at a p >= 2
config under the count oracle.

Usage: python -u scripts/cheb_dot_ab.py [p:ref ...]  (default 2:7 3:6 4:6)
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
from scripts.degree_roofline import (  # noqa: E402
    HBM_GBPS, MXU_MACS_BF16X3, MXU_MACS_HIGH, VPU_OPS, Q,
)


def _kernel_arm(p: int, ref: int, flag: bool):
    """Slope-time one cheb iteration with the dot flag set to ``flag``."""
    st._CHEB_DOT_BF16 = flag
    jax.clear_caches()  # the flag is read at kernel trace time
    lev = make_level(ref, p)
    spatial = (lev.m,) * 3
    ops = level_ops(lev, jnp.float32)
    rng = np.random.default_rng(0)
    Wc = st.pad_canon(
        jnp.asarray(rng.standard_normal((Q,) + spatial).astype(np.float32)),
        spatial, p, 3,
    )
    tabs = st.canon_tables(ops, spatial, p, 3)
    d = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
    invd = jnp.ones_like(Wc)
    fn = lambda x: st.fused_cheb_iter_canon(
        ops, d, 0.1, 0.9, 0.4, x, x, x, invd, 3, tables=tabs
    )[0]
    max_n = 40 if Wc.size * 4 > 100 * 2**20 else 2000
    t = slope(fn, (Wc,), reps=5, max_n=max_n)
    # sum-roof model (scripts/degree_roofline.py): cheb = 7 HBM passes,
    # 7*nb+8 VPU ops/elem, 2*nx MXU MACs/elem on the canonical count
    nb = 2 * p + 1
    n_can = Wc.size
    n_log = Q * lev.m**3
    rate = MXU_MACS_BF16X3 if (flag or st._bf16_ok(p)) else MXU_MACS_HIGH
    t_hbm = 7 * n_can * 4 / (HBM_GBPS * 1e9)
    t_cmp = (7 * nb + 8) * n_can / VPU_OPS + n_can * 2 * Wc.shape[-1] / rate
    t_sum = max(t_hbm, t_cmp)
    gbps = 7 * n_log * 4 / t / 1e9
    return t, gbps, 100 * t_sum / t


def main():
    combos = sys.argv[1:] or ["2:7", "3:6", "4:6"]
    print(f"device: {jax.devices()[0]}  (cheb kernel, q={Q}, f32 state)")
    print(f"{'p':>2} {'ref':>3} | {'HIGHEST ms':>10} {'%roof':>5} | "
          f"{'bf16x3 ms':>9} {'GB/s':>5} {'%roof':>5} | {'speedup':>7}")
    for combo in combos:
        p, ref = (int(v) for v in combo.split(":"))
        t0, _, roof0 = _kernel_arm(p, ref, False)
        t1, gbps1, roof1 = _kernel_arm(p, ref, True)
        print(f"{p:>2} {ref:>3} | {t0 * 1e3:>10.3f} {roof0:>4.0f}% | "
              f"{t1 * 1e3:>9.3f} {gbps1:>5.0f} {roof1:>4.0f}% | "
              f"{t0 / t1:>6.2f}x")

    # end-to-end count-oracle A/B at the first p >= 2 combo
    from bench import _time_scheme

    p, ref = next(
        (int(a), int(b))
        for a, b in (c.split(":") for c in combos)
        if int(a) >= 2
    )
    print(f"\nend-to-end irk_batched, degree {p}, refinement {ref}:")
    st._CHEB_DOT_BF16 = False
    jax.clear_caches()
    t_hi, n_hi, _, _err = _time_scheme("irk_batched", ref, degree=p)
    print(f"HIGHEST cheb dots: {t_hi * 1e3:8.2f} ms/step "
          f"(outer/inner totals {tuple(n_hi)})")
    st._CHEB_DOT_BF16 = True
    jax.clear_caches()
    t_bf, n_bf, _, _err = _time_scheme("irk_batched", ref, degree=p)
    print(f"bf16x3  cheb dots: {t_bf * 1e3:8.2f} ms/step "
          f"(outer/inner totals {tuple(n_bf)})")
    if tuple(n_hi) != tuple(n_bf):
        print(f"-> REJECT: iteration counts moved ({tuple(n_hi)} -> "
              f"{tuple(n_bf)}); preconditioner quality changed")
        sys.exit(1)
    print(f"-> bf16x3 smoother dots are {t_hi / t_bf:.2f}x end-to-end; "
          f"saves {(t_hi - t_bf) * 1e3:.1f} ms/step at equal counts")


if __name__ == "__main__":
    main()
