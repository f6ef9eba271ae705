"""One honest step-level efficiency number (round-4 verdict #7): divide
the sum of every component's AT-ITS-ROOF time by the measured step time
— the single-chip "MFU" statement for the flagship irk_batched step.

Every production component at degree 1 is HBM-bound (BASELINE
rooflines), so a component's at-roof time is its LOGICAL HBM traffic at
the v5e's 819 GB/s.  The pass model per step (canonical stage-block
bytes B at the fine level; all solver fields live in the canonical
layout, CLAUDE.md):

  * V-cycles (n_outer + 1 per step, left-preconditioned GMRES):
      pre-smooth  = init 3 + 4 fused iters x 6       = 27 passes
      post-smooth = entry (apply 2 + glue 5) + 4 x 6 = 31 passes
      residual    = apply 2 + subtract 3             =  5 passes
      transfers   = restrict 2.625 + prolong 2.625 + add 3 = 8.25
      -> 71.25 passes/level, x 8/7 for the 2:1^3 level geometric sum
  * outer vmults (n_outer + 1): fused Aop-mix, 2 passes each
  * T / T^-1 stage mixes (2 per preconditioner application): 2 passes
  * GMRES algebra: the scripts/gmres_overhead.py structural model,
      3*sum(1..n) + 2n + 3n + 13 passes
  * rhs/update glue: ~(2 + 4/q) passes (estimate; ~2% of the total)

Timing: bench._time_scheme (two-point in-graph slope).

Usage: python -u scripts/step_mfu.py [refinement=8]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

HBM_GBPS = 819.0


def main():
    ref = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from bench import _time_scheme

    from dealii_spirk_tpu.fem.grid import make_level
    from dealii_spirk_tpu.ops.pallas import stencil as st

    q = 4
    n_steps = 5
    print(f"device: {jax.devices()[0]}  (irk_batched, refinement {ref}, "
          f"q={q}, f32, canonical)")
    t, counts, _, _err = _time_scheme("irk_batched", ref)
    n_outer = counts.outer / (2 + n_steps)  # totals over n_hi steps
    lev = make_level(ref, 1)
    B = q * 1
    for s in st.canon_shape((lev.m,) * 3, 1, 3):
        B *= s
    B *= 4  # bytes

    n_vc = n_outer + 1
    vcycle_passes = 71.25 * (8.0 / 7.0)
    vmult_passes = (n_outer + 1) * 2
    mix_passes = 2 * n_vc * 2
    gm = n_outer
    gmres_passes = 3 * gm * (gm + 1) / 2 + 2 * gm + 3 * gm + 13
    glue_passes = 2 + 4 / q
    total_passes = (
        n_vc * vcycle_passes + vmult_passes + mix_passes + gmres_passes
        + glue_passes
    )
    t_roof = total_passes * B / (HBM_GBPS * 1e9)
    print(f"measured: {t * 1e3:8.2f} ms/step  ({n_outer:.2f} outer GMRES "
          f"per step; canonical block {B / 2**20:.0f} MB)")
    print(f"sum of component roofs: {t_roof * 1e3:8.2f} ms  "
          f"({total_passes:.1f} HBM passes of the stage block at "
          f"{HBM_GBPS:.0f} GB/s)")
    print(f"-> step-level HBM efficiency: {100 * t_roof / t:.0f}%")


if __name__ == "__main__":
    main()
