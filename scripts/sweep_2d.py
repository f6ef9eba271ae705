"""2D hardware table (round-4 verdict #6): the reference builds
``irk-2D`` as a co-equal executable (reference CMakeLists.txt:38-46);
this sweeps ``irk_batched`` in 2D on the real device — degree x
refinement, pallas vs the XLA stencil execution of the SAME solve —
and enforces the parity oracle per row (identical outer + summed inner
iteration counts; L2 match to f32 tolerance).

Timing: bench._time_scheme (two-point in-graph slope; the only
defensible number on this remote-tunnel machine, CLAUDE.md).

Usage: python -u scripts/sweep_2d.py [p:ref ...]
       (default: 1:9 1:10 1:11 1:12 2:10 3:9 4:9 — per-stage DoFs from
        0.26M to 16.8M; the p >= 2 rows sit at ~2-4M like the 3D table)
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402


def main():
    combos = sys.argv[1:] or [
        "1:9", "1:10", "1:11", "1:12", "2:10", "3:9", "4:9",
    ]
    from bench import _time_scheme

    print(f"device: {jax.devices()[0]}  (irk_batched, 2D, q=4, f32)")
    print(f"{'p':>2} {'ref':>3} {'DoF/stage':>10} | {'pallas ms':>9} "
          f"{'stencil ms':>10} {'speedup':>7} | {'out/in':>7} {'L2':>10}")
    for combo in combos:
        p, ref = (int(v) for v in combo.split(":"))
        m = p * 2**ref - 1
        t_p, n_p, _, err_p = _time_scheme(
            "irk_batched", ref, degree=p, dim=2
        )
        t_s, n_s, _, err_s = _time_scheme(
            "irk_batched", ref, degree=p, dim=2, operator_mode="stencil"
        )
        ok = tuple(n_p) == tuple(n_s)
        l2_rel = abs(float(err_p[0]) - float(err_s[0])) / max(
            float(err_s[0]), 1e-30
        )
        print(f"{p:>2} {ref:>3} {m * m:>10} | {t_p * 1e3:>9.2f} "
              f"{t_s * 1e3:>10.2f} {t_s / t_p:>6.2f}x | "
              f"{n_p.outer}/{n_p.inner} {float(err_p[0]):>10.4e}"
              + ("" if ok else f"  COUNTS DIFFER: stencil {tuple(n_s)}")
              + ("" if l2_rel < 1e-3 else f"  L2 DIFFERS: {l2_rel:.1e}"))
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
