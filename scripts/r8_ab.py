"""Within-run A/B of the in-kernel stage coupling at full scale.

Cross-round absolute numbers on this machine are untrustworthy (the
tunnel's fixed costs drifted ~2x between rounds — ROUND3_NOTES), so the
r4 fused-Aop/one-pass-mix claim is measured as ONE process timing BOTH
executions with bench.py's two-point in-graph slope:

  * fused   — the default: `fused_ms_mix_apply_canon` outer vmult +
    `stage_mix_canon` T/T^-1 basis changes (schemes/irk.py)
  * unfused — the round-3 execution, recovered by monkeypatching the
    dispatch predicates: ms-dual kernel + XLA GEMM stage mixes

Counts and L2 must be identical (same mathematics, different fusion).

Usage: python -u scripts/r8_ab.py [refinement=8] [scheme=irk_batched]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

from dealii_spirk_tpu.ops.pallas import stencil as st  # noqa: E402


def main():
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scheme = sys.argv[2] if len(sys.argv) > 2 else "irk_batched"
    from bench import _time_scheme

    print(f"device: {jax.devices()[0]}  ({scheme}, refinement {refinement})")

    t_fused, n_fused, prob, _err = _time_scheme(scheme, refinement)
    print(f"fused   (ms-mix + mix kernels): {t_fused * 1e3:8.2f} ms/step "
          f"({n_fused} outer)")

    def gemm_mix(mat, W, **_):
        q = W.shape[0]
        return (mat @ W.reshape(q, -1)).reshape((mat.shape[0],) + W.shape[1:])

    st.ms_mix_supported = lambda *a, **k: False
    st.stage_mix_canon = gemm_mix
    t_unf, n_unf, _, _err = _time_scheme(scheme, refinement)
    print(f"unfused (ms-dual + GEMM mixes): {t_unf * 1e3:8.2f} ms/step "
          f"({n_unf} outer)")
    assert n_fused == n_unf, (n_fused, n_unf)
    print(f"-> fused is {t_unf / t_fused:.2f}x; "
          f"saves {(t_unf - t_fused) * 1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
