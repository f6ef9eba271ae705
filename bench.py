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
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SolveCounts(NamedTuple):
    """Iteration counts accumulated over ALL timed steps (not just the
    final scan step): equal-count A/B oracles must see a shift on ANY
    step, and in the masked per-lane inner counts too (ADVICE r4)."""

    outer: int
    inner: int


def _build(scheme_name: str, refinement: int, operator_mode: str = "",
           degree: int = 1, dim: int = 3):
    from dealii_spirk_tpu.config import Parameters
    from dealii_spirk_tpu.problem import HeatProblem
    from dealii_spirk_tpu.schemes import make_scheme

    params = Parameters.from_dict(
        {
            "FEDegree": degree,
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
        dim=dim,
    )
    problem = HeatProblem(params)
    scheme = make_scheme(problem, params)
    return params, problem, scheme


def _time_scheme(
    scheme_name: str, refinement: int, n_steps: int = 5,
    operator_mode: str = "", degree: int = 1, dim: int = 3,
):
    """Per-timestep device time via a TWO-POINT in-graph measurement.

    The remote-device (axon) tunnel makes naive host timing lie in both
    directions: ``block_until_ready`` has been observed to return before
    execution finished (timing only dispatches — a 651x phantom
    "speedup"), and any device->host pull costs ~0.6 s regardless of
    size.  So each measurement runs N timesteps inside ONE jitted
    ``lax.scan`` and ends with a checksum pull; timing the same program
    at two different N and taking the slope cancels every fixed cost
    (dispatch, transfer, sync quirks) and leaves pure per-step device
    time.
    """
    params, problem, scheme = _build(
        scheme_name, refinement, operator_mode, degree, dim
    )
    tau = params.time_step_size
    prec = scheme._reinit(tau)
    jax.block_until_ready(prec)
    dtype = problem.dtype
    tau_ = jnp.asarray(tau, dtype=dtype)

    # prec rides as a jit ARGUMENT: embedded as a closure constant its
    # leaves inflate the program body past the remote compiler's request
    # cap (HTTP 413) at refinement 8 (CLAUDE.md)
    def make_runner(n: int):
        @jax.jit
        def run(u, prec):
            def body(carry, k):
                u, n_out, n_in = carry
                t = (k.astype(dtype) + 2.0) * tau_
                W_rhs = scheme.rhs_fn(u, t, tau_)
                W, n_outer, n_inner = scheme.solve_fn(W_rhs, prec, tau_)
                # accumulate across ALL steps (outer and the per-lane
                # inner vector summed): the A/B count oracles compare
                # these totals, so a shift on any step or lane triggers
                n_out = n_out + jnp.asarray(n_outer, jnp.int32)
                # dtype pinned: under x64 jnp.sum(int32) promotes to int64
                # and breaks the scan carry contract
                n_in = n_in + jnp.sum(n_inner, dtype=jnp.int32)
                return (scheme.update_fn(u, W, tau_), n_out, n_in), None

            carry0 = (
                u, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)
            )
            (u, n_out, n_in), _ = jax.lax.scan(
                body, carry0, jnp.arange(n, dtype=jnp.int32)
            )
            return u, n_out, n_in, jnp.sum(u * u)

        return run

    @jax.jit
    def first_step(u, prec):
        W_rhs = scheme.rhs_fn(u, tau_, tau_)
        W, n_outer, _ = scheme.solve_fn(W_rhs, prec, tau_)
        return scheme.update_fn(u, W, tau_), n_outer

    u0, _ = first_step(problem.initial_condition(), prec)
    jax.block_until_ready(u0)

    n_lo, n_hi = 2, 2 + n_steps

    def timed(n):
        run = make_runner(n)
        u, n_out, n_in, chk = run(u0, prec)  # warmup/compile
        c = float(chk)
        if not (c > 0 and c < 1e30):
            raise RuntimeError(f"non-finite solution checksum {c}")
        t0 = time.perf_counter()
        u, n_out, n_in, chk = run(u0, prec)
        c = float(chk)  # 4-byte pull: forces true completion
        counts = SolveCounts(int(n_out), int(n_in))
        return time.perf_counter() - t0, counts, u, n

    t_lo, counts, _u, _ = timed(n_lo)
    t_hi, counts, u, n = timed(n_hi)
    elapsed = (t_hi - t_lo) / (n_hi - n_lo)
    err = problem.errors(u, (n + 1) * tau)
    if not float(err[0]) < 1e-2:
        raise RuntimeError(f"benchmark solution error off: L2={err[0]}")
    return elapsed, counts, problem, err


def main() -> None:
    import sys

    refinement = 7  # 127^3 interior DoFs per stage, q=4
    t_native, counts, _problem, _err = _time_scheme("irk_batched", refinement)
    # baseline: identical mathematics, mechanical (non-TPU-first) execution
    t_baseline, counts_b, _, _err_b = _time_scheme(
        "irk_batched", refinement, operator_mode="stencil"
    )
    print(
        f"native: {t_native * 1e3:.1f} ms ({counts.outer} outer total); "
        f"baseline: {t_baseline * 1e3:.1f} ms ({counts_b.outer} outer)",
        file=sys.stderr,
    )
    if min(counts.outer, counts_b.outer) <= 0 or max(
        counts.outer, counts_b.outer
    ) >= 1000:
        raise RuntimeError("benchmark solver did not converge properly")
    if counts != counts_b:
        raise RuntimeError(
            f"native {counts} and baseline {counts_b} iteration counts "
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
