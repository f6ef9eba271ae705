"""Hardware sweep over the reference's axes (VERDICT round-1 #5).

Mirrors the reference's sweep definitions (degree: scripts/parameters_p.py,
q: parameters_all_q.py, inner tolerance: parameters_tolerance.py) at sizes
a single v5e chip holds, and records (ms/step, outer iters, L2 error) per
configuration.  Results print as JSON lines; append the table to
BASELINE.md.

Usage: python -m scripts.hw_sweep [group ...]   groups: p q tol complex r8
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def run_one(scheme, ref, q, p, inner_tol=0.0, outer_tol=1e-4, n_steps=3,
            op_mode="", dt=0.1, dim=3):
    from dealii_spirk_tpu.config import Parameters
    from dealii_spirk_tpu.problem import HeatProblem
    from dealii_spirk_tpu.schemes import make_scheme

    raw = {
        "FEDegree": p,
        "NRefinements": ref,
        "TimeIntegrationScheme": scheme,
        "IRKStages": q,
        "TimeStepSize": dt,
        "EndTime": dt * (n_steps + 1),
        "OperatorType": "MatrixFree",
        "BlockPreconditionerType": "GMG",
        "InnerTolerance": inner_tol,
        "OuterTolerance": outer_tol,
        "Precision": "f32",
    }
    if op_mode:
        raw["OperatorMode"] = op_mode
    params = Parameters.from_dict(raw, dim=dim)
    problem = HeatProblem(params)
    scheme_o = make_scheme(problem, params)
    tau = params.time_step_size
    prec = scheme_o._reinit(tau)
    jax.block_until_ready(prec)

    # separate phase jits (like the CLI/solve_step path): ONE combined
    # step program at refinement 8 exceeds the remote compiler's request
    # cap, while the phases individually compile fine
    rhs_jit = jax.jit(scheme_o.rhs_fn)
    solve_jit = jax.jit(scheme_o.solve_fn)
    update_jit = jax.jit(scheme_o.update_fn)

    def step(u, t, tau_):
        W_rhs = rhs_jit(u, t, tau_)
        W, n_outer, n_inner = solve_jit(W_rhs, prec, tau_)
        return update_jit(u, W, tau_), n_outer, n_inner

    u = problem.initial_condition()
    tau_ = jnp.asarray(tau, problem.dtype)
    u, n_outer, n_inner = step(u, jnp.asarray(tau, problem.dtype), tau_)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    t = tau
    for _ in range(n_steps):
        t += tau
        u, n_outer, n_inner = step(u, jnp.asarray(t, problem.dtype), tau_)
    jax.block_until_ready(u)
    ms = (time.perf_counter() - t0) / n_steps * 1e3
    err = problem.errors(u, t)
    import numpy as np

    return {
        "scheme": scheme,
        "dim": dim,
        "ref": ref,
        "q": q,
        "p": p,
        "inner_tol": inner_tol,
        "dt": dt,
        "op_mode": op_mode or params.operator_mode,
        "n_dofs": problem.space.n_dofs,
        "ms_per_step": round(ms, 2),
        "n_outer": float(jnp.sum(n_outer)),
        "n_inner": float(np.asarray(n_inner).sum()),
        "error_L2": float(err[0]),
    }


# Each entry: kwargs for run_one.  Reference axes (all at q=4, degree 1,
# refinement 8 in scripts/default.json; sized to a single v5e chip here):
#   p   — scripts/parameters_p.py:22-31, degree in {1..4}; both the
#         default (pallas) and the XLA stencil path are timed so the
#         fused-kernel speedup at p>=2 is on the record (VERDICT r2 #1)
#   q   — scripts/parameters_all_q.py:31-52
#   tol — scripts/parameters_tolerance.py:21-30, inner in {0,1e-1..1e-4}
#   dt  — scripts/parameters_dt.py:23-32, dt in {1e-3..1e1},
#         EndTime = 10*dt, InnerTolerance 1e-8 (f32-floored, documented)
_B = {"scheme": "irk_batched", "ref": 6, "q": 4, "p": 1}
GROUPS = {
    "p": [{**_B, "p": p, "op_mode": m}
          for p in (1, 2, 3, 4) for m in ("", "stencil")],
    "q": [{**_B, "q": q} for q in (2, 3, 6, 8)],
    # the reference's tolerance sweep drives the NON-batched schemes
    # (parameters_tolerance.py:23-28 uses irk/spirk) — the batched
    # preconditioner is a single block V-cycle that ignores
    # InnerTolerance by design (main.cc:1115-1119), so an irk_batched
    # ladder is flat by construction
    "tol": [{**_B, "scheme": "irk", "inner_tol": t}
            for t in (0.0, 1e-1, 1e-2, 1e-3, 1e-4)],
    "dt": [{**_B, "dt": dt, "inner_tol": 1e-8, "n_steps": 9}
           for dt in (1e-3, 1e-2, 1e-1, 1e0, 1e1)]
          + [{**_B, "p": 3, "dt": dt, "inner_tol": 1e-8, "n_steps": 9}
             for dt in (1e-2, 1e-1, 1e0)],
    "complex": [
        {**_B, "scheme": "complex_irk_batched"},
        {**_B, "scheme": "complex_irk_batched", "p": 4},
    ],
    "r8": [{**_B, "ref": 8}],
    # 2D (the reference's co-equal irk-2D executable) lives in
    # scripts/sweep_2d.py: it times with the two-point in-graph slope
    # and enforces the pallas-vs-stencil count/L2 parity oracle per row
    # (this script's host-side loop timing is only within-run honest on
    # the remote-tunnel machine, BASELINE.md)
}


def main():
    groups = sys.argv[1:] or ["p", "q", "tol", "complex"]
    print(f"device: {jax.devices()[0]}", flush=True)
    for g in groups:
        for kw in GROUPS[g]:
            try:
                row = run_one(**kw)
            except Exception as e:
                row = {**kw, "error": str(e)[:200]}
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
