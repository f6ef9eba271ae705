"""Name the binding resource of the p >= 2 cheb/apply kernels
(round-4 verdict #2 follow-up): the bf16x3-dot A/B measured 1.00x at
p in {2,3,4} (scripts/cheb_dot_ab.py), so the f32-HIGHEST x-dot is NOT
what the kernel waits on — despite the roofline model charging it
~40% of the serial sum.  This probe times structurally reduced kernel
variants (same DMA schedule, same outputs) by monkeypatching the dot
and the y-pass out of the kernel body:

  * full       — the production kernel
  * no-xdot    — ``_x_dot`` replaced by a lane slice (zero MXU work;
                 measures the dot's true marginal cost)
  * no-ypass   — ``_yslice`` accumulation collapsed to one tap
                 (measures the y sublane-slice chain's marginal cost)

Each variant's DELTA from full names where the time actually goes.
Results are wrong mathematically — this is a timing probe only.

Usage: python -u scripts/cheb_probe.py [p:ref ...]  (default 2:7 1:8)
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


def _time_cheb(p, ref, patch):
    jax.clear_caches()
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
    saved = {}
    try:
        for name, repl in patch.items():
            saved[name] = getattr(st, name)
            setattr(st, name, repl)
        return slope(fn, (Wc,), reps=5, max_n=max_n)
    finally:
        for name, val in saved.items():
            setattr(st, name, val)


def main():
    combos = sys.argv[1:] or ["2:7", "1:8"]
    print(f"device: {jax.devices()[0]}  (cheb kernel probes, q={Q}, f32)")
    no_xdot = {
        "_x_dot": lambda CD, xm, p, **k: CD[..., : xm.shape[-1]]
    }
    orig_yslice = st._yslice
    no_ypass = {
        # every tap returns the CENTER slice: Mosaic CSEs the identical
        # slices, so the 2p+1 sublane-shifted slices collapse to one
        # (the FMA chain remains) — measures the slice chain's cost
        "_yslice": lambda E, k, p, by: orig_yslice(E, p, p, by)
    }
    print(f"{'p':>2} {'ref':>3} | {'full ms':>8} | {'no-xdot':>8} "
          f"{'dot cost':>8} | {'no-ypass':>8} {'y cost':>7}")
    for combo in combos:
        p, ref = (int(v) for v in combo.split(":"))
        t_full = _time_cheb(p, ref, {})
        t_nd = _time_cheb(p, ref, no_xdot)
        t_ny = _time_cheb(p, ref, no_ypass)
        print(f"{p:>2} {ref:>3} | {t_full * 1e3:>8.3f} | {t_nd * 1e3:>8.3f} "
              f"{(t_full - t_nd) * 1e3:>8.3f} | {t_ny * 1e3:>8.3f} "
              f"{(t_full - t_ny) * 1e3:>7.3f}")


if __name__ == "__main__":
    main()
