"""Within-run A/B: f32 vs bf16 STORAGE for the fused Chebyshev
smoother state (SPIRK_CHEB_BF16) at full scale.

The y-blocked smoother iteration is HBM-bound (84% of roof at
refinement 8, ROUND4_NOTES); r/d are smoother-internal, so storing them
bf16 halves 4 of the iteration's 6 HBM passes.  ROUND2_NOTES parked
this as "plausible but changes preconditioner quality" — the oracle
here is UNCHANGED outer iteration counts (the smoother only steers the
preconditioner; if counts move, the variant is rejected regardless of
kernel time).  Timing: two-point in-graph slope (bench._time_scheme).

Usage: python -u scripts/cheb_bf16_ab.py [refinement=8] [scheme=irk_batched] [degree=1]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

import dealii_spirk_tpu.ops.pallas.stencil as st  # noqa: E402


def main():
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scheme = sys.argv[2] if len(sys.argv) > 2 else "irk_batched"
    degree = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    from bench import _time_scheme

    print(f"device: {jax.devices()[0]}  ({scheme}, refinement {refinement}, "
          f"degree {degree})")

    st._CHEB_BF16 = False
    t_f32, n_f32, _, _err = _time_scheme(scheme, refinement, degree=degree)
    print(f"f32  cheb state: {t_f32 * 1e3:8.2f} ms/step "
          f"(outer/inner totals {tuple(n_f32)})")

    st._CHEB_BF16 = True
    t_bf, n_bf, _, _err = _time_scheme(scheme, refinement, degree=degree)
    print(f"bf16 cheb state: {t_bf * 1e3:8.2f} ms/step "
          f"(outer/inner totals {tuple(n_bf)})")

    if n_f32 != n_bf:
        print(f"-> REJECT: iteration counts moved ({tuple(n_f32)} -> "
              f"{tuple(n_bf)}); preconditioner quality changed")
        sys.exit(1)
    print(f"-> bf16 state is {t_f32 / t_bf:.2f}x; "
          f"saves {(t_f32 - t_bf) * 1e3:.1f} ms/step at equal counts")


if __name__ == "__main__":
    main()
