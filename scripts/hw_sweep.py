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


def run_one(scheme, ref, q, p, inner_tol=0.0, outer_tol=1e-4, n_steps=3):
    from dealii_spirk_tpu.config import Parameters
    from dealii_spirk_tpu.problem import HeatProblem
    from dealii_spirk_tpu.schemes import make_scheme

    params = Parameters.from_dict(
        {
            "FEDegree": p,
            "NRefinements": ref,
            "TimeIntegrationScheme": scheme,
            "IRKStages": q,
            "TimeStepSize": 0.1,
            "EndTime": 0.1 * (n_steps + 1),
            "OperatorType": "MatrixFree",
            "BlockPreconditionerType": "GMG",
            "InnerTolerance": inner_tol,
            "OuterTolerance": outer_tol,
            "Precision": "f32",
        },
        dim=3,
    )
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
        "ref": ref,
        "q": q,
        "p": p,
        "inner_tol": inner_tol,
        "n_dofs": problem.space.n_dofs,
        "ms_per_step": round(ms, 2),
        "n_outer": float(jnp.sum(n_outer)),
        "n_inner": float(np.asarray(n_inner).sum()),
        "error_L2": float(err[0]),
    }


GROUPS = {
    # reference parameters_p.py:22-31 (degree sweep)
    "p": [("irk_batched", 6, 4, p) for p in (1, 2, 3, 4)],
    # reference parameters_all_q.py:31-52 (q sweep; 4, 8 recorded r1)
    "q": [("irk_batched", 6, q, 1) for q in (2, 3, 6)],
    # reference parameters_tolerance.py:21-30
    "tol": [
        ("irk_batched", 6, 4, 1, 1e-2),
        ("irk_batched", 6, 4, 1, 1e-4),
    ],
    "complex": [
        ("complex_irk_batched", 6, 4, 1),
        ("complex_irk_batched", 6, 4, 4),
    ],
    "r8": [("irk_batched", 8, 4, 1)],
}


def main():
    groups = sys.argv[1:] or ["p", "q", "tol", "complex"]
    print(f"device: {jax.devices()[0]}", flush=True)
    for g in groups:
        for cfg in GROUPS[g]:
            scheme, ref, q, p, *rest = cfg
            tol = rest[0] if rest else 0.0
            try:
                row = run_one(scheme, ref, q, p, inner_tol=tol)
            except Exception as e:
                row = {"scheme": scheme, "ref": ref, "q": q, "p": p,
                       "error": str(e)[:200]}
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
