"""Within-run A/B: smoother loop as lax.fori_loop vs unrolled at full
scale.  The fori path was added when in-graph kernel tables blew the
remote compiler's request cap at refinement 8; tables are now threaded
as jit arguments, and scripts/vcycle_decomp.py measured the fori carry
boundaries at ~11 ms per smooth (2x the unrolled smoother) — this
script checks the end-to-end step time and that the unrolled program
still compiles under the cap.

Usage: python -u scripts/unroll_ab.py [refinement=8] [scheme=irk_batched]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

import dealii_spirk_tpu.solvers.gmg as gmg_mod  # noqa: E402


def main():
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scheme = sys.argv[2] if len(sys.argv) > 2 else "irk_batched"
    from bench import _time_scheme

    print(f"device: {jax.devices()[0]}  ({scheme}, refinement {refinement})")

    # unrolled is the DEFAULT since round 4 — force the fori variant
    # explicitly for the A side
    gmg_mod._UNROLL_LIMIT = 0
    t_fori, n_fori, _, _err = _time_scheme(scheme, refinement)
    print(f"fori     smoother loop: {t_fori * 1e3:8.2f} ms/step "
          f"({n_fori} outer)")

    gmg_mod._UNROLL_LIMIT = 10**12
    t_unr, n_unr, _, _err = _time_scheme(scheme, refinement)
    print(f"unrolled smoother loop: {t_unr * 1e3:8.2f} ms/step "
          f"({n_unr} outer)")
    assert n_fori == n_unr, (n_fori, n_unr)
    print(f"-> unrolled is {t_fori / t_unr:.2f}x; "
          f"saves {(t_fori - t_unr) * 1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
