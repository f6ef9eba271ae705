"""Within-run end-to-end A/B of the joint (bz, by) cheb geometry
(round-5, verdict #2): ``cheb_canon_geom`` picks bz=16 at the p >= 2
y-blocked shapes, cutting the d-window DMA re-read factor
(2.50x -> 2.08x at p=2, 3.33x -> 2.50x at p=4) that the round-5 probes
identified as the binder (scripts/cheb_probe.py: removing the MXU dot
or the y-pass moves the kernel < 4%; scripts/cheb_geom_sweep.py:
bz=16 = 1.06-1.12x on the bare kernel).

This times the FULL irk_batched step both ways in one process
(bench._time_scheme two-point in-graph slope) under the equal-counts
oracle: the geometry must not change a single bit (the bitwise test
``test_cheb_bz_geometry_bitwise``), so any count shift is a REJECT.
``st._CHEB_BZ_FORCE = 8`` pins the pre-round-5 geometry for the arm.

Usage: python -u scripts/cheb_geom_ab.py [p:ref ...]  (default 2:7 4:6)
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

from dealii_spirk_tpu.ops.pallas import stencil as st  # noqa: E402


def main():
    combos = sys.argv[1:] or ["2:7", "4:6"]
    from bench import _time_scheme

    print(f"device: {jax.devices()[0]}  (irk_batched, 3D, q=4, f32)")
    for combo in combos:
        p, ref = (int(v) for v in combo.split(":"))
        rows = []
        for pin, tag in ((8, "bz=8 (old)"), (0, "auto geom")):
            st._CHEB_BZ_FORCE = pin
            jax.clear_caches()  # geometry is read at trace time
            t, n, _, err = _time_scheme("irk_batched", ref, degree=p)
            m = p * 2**ref - 1
            print(f"p={p} r={ref} ({m}^3/stage)  {tag:>10}: "
                  f"{t * 1e3:8.2f} ms/step  counts={tuple(n)}  "
                  f"L2={err:.3e}")
            rows.append((t, tuple(n)))
        st._CHEB_BZ_FORCE = 0
        (t0, n0), (t1, n1) = rows
        if n0 != n1:
            print(f"-> REJECT: iteration counts moved ({n0} -> {n1})")
            sys.exit(1)
        print(f"-> joint geometry is {t0 / t1:.3f}x end-to-end at equal "
              f"counts (saves {(t0 - t1) * 1e3:.1f} ms/step)\n")


if __name__ == "__main__":
    main()
