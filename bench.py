"""Headline benchmark: stage-batched IRK q=4, 3D heat equation, time per
timestep.

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

``value``       = seconds per timestep of ``irk_batched`` — the TPU-native
                  stage-batched formulation (fused Pallas sum-factorization
                  kernels, truncated-GMG with dense coarse solve) on the
                  available accelerator.  On one chip this is the same
                  compiled graph ``spirk`` produces (the stage mesh axis
                  degenerates), but what executes is irk_batched and the
                  metric name says so.
``vs_baseline`` = SELF-speedup: the identical solve (same mathematics,
                  same tolerances, iteration counts asserted equal)
                  executed as a mechanical non-TPU-first formulation (XLA
                  banded-roll sweeps).  It is NOT reference parity — the
                  reference repo publishes no absolute numbers
                  (BASELINE.md); cross-checking vs the reference is done
                  via iteration/error parity on the f64 CPU oracle.

Configuration mirrors the canonical runs (BASELINE.md: q=4, degree 1, 3D,
MatrixFree + GMG, InnerTolerance 0).  Precision is f32 — the TPU-native
choice; the f64 path is used for CPU parity testing.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _build(scheme_name: str, refinement: int, operator_mode: str = ""):
    from dealii_spirk_tpu.config import Parameters
    from dealii_spirk_tpu.problem import HeatProblem
    from dealii_spirk_tpu.schemes import make_scheme

    params = Parameters.from_dict(
        {
            "FEDegree": 1,
            "NRefinements": refinement,
            "TimeIntegrationScheme": scheme_name,
            "IRKStages": 4,
            "TimeStepSize": 0.1,
            "EndTime": 0.5,
            "OperatorType": "MatrixFree",
            "BlockPreconditionerType": "GMG",
            "InnerTolerance": 0.0,
            "OuterTolerance": 1e-4,
            "Precision": "f32",
            "OperatorMode": operator_mode,
        },
        dim=3,
    )
    problem = HeatProblem(params)
    scheme = make_scheme(problem, params)
    return params, problem, scheme


def _time_scheme(
    scheme_name: str, refinement: int, n_steps: int = 5, operator_mode: str = ""
):
    params, problem, scheme = _build(scheme_name, refinement, operator_mode)
    tau = params.time_step_size
    prec = scheme._reinit(tau)
    jax.block_until_ready(prec)

    @jax.jit
    def step(u, t, tau_):
        W_rhs = scheme.rhs_fn(u, t, tau_)
        W, n_outer, _ = scheme.solve_fn(W_rhs, prec, tau_)
        return scheme.update_fn(u, W, tau_), n_outer

    u = problem.initial_condition()
    tau_ = jnp.asarray(tau, dtype=problem.dtype)
    # warmup (compile + first step)
    u, n_outer = step(u, jnp.asarray(tau, problem.dtype), tau_)
    jax.block_until_ready(u)

    t0 = time.perf_counter()
    t = tau
    for _k in range(n_steps):
        t += tau
        u, n_outer = step(u, jnp.asarray(t, problem.dtype), tau_)
    jax.block_until_ready(u)
    elapsed = (time.perf_counter() - t0) / n_steps
    return elapsed, int(n_outer), problem


def main() -> None:
    import sys

    refinement = 7  # 127^3 interior DoFs per stage, q=4
    t_native, n_outer, _problem = _time_scheme("irk_batched", refinement)
    # baseline: identical mathematics, mechanical (non-TPU-first) execution
    t_baseline, n_outer_b, _ = _time_scheme(
        "irk_batched", refinement, operator_mode="stencil"
    )
    print(
        f"native: {t_native * 1e3:.1f} ms ({n_outer} outer); "
        f"baseline: {t_baseline * 1e3:.1f} ms ({n_outer_b} outer)",
        file=sys.stderr,
    )
    if n_outer <= 0 or n_outer_b <= 0 or n_outer >= 1000 or n_outer_b >= 1000:
        raise RuntimeError("benchmark solver did not converge properly")
    if n_outer != n_outer_b:
        raise RuntimeError(
            f"native ({n_outer}) and baseline ({n_outer_b}) outer counts "
            "differ — the speedup would not be like-for-like"
        )

    print(
        json.dumps(
            {
                "metric": "irk_batched_q4_3d_r7_step_time",
                "value": round(t_native, 6),
                "unit": "s/timestep",
                "vs_baseline": round(t_baseline / t_native, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
