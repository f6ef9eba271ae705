"""End-to-end scheme tests using the reference's own validation strategy
(SURVEY.md §4): manufactured-solution errors + cross-scheme consistency
(all schemes implement the same mathematics, so equal errors are the
oracle — reference main.cc:945-954 etc.)."""

import numpy as np
import pytest

from dealii_spirk_tpu.config import Parameters
from dealii_spirk_tpu.runner import run_config

BASE = {
    "FEDegree": 1,
    "NRefinements": 4,
    "IRKStages": 3,
    "TimeStepSize": 0.1,
    "EndTime": 0.2,
    "OperatorType": "MatrixFree",
    "BlockPreconditionerType": "GMG",
    "InnerTolerance": 0.0,
    "DoOutputParaview": False,
}


def _run(over, dim=2):
    p = Parameters.from_dict({**BASE, **over}, dim=dim)
    return run_config(p, verbose=False)


def test_ost_tracks_analytical_solution():
    out = _run({"TimeIntegrationScheme": "ost", "NRefinements": 5})
    # spatial discretization error level for p=1, h=1/32
    assert out["error_L2"] < 5e-3
    assert out["error_Linf"] < 2e-2


def test_ost_spatial_convergence():
    e = [
        _run({"TimeIntegrationScheme": "ost", "NRefinements": r,
              "TimeStepSize": 0.025})["error_L2"]
        for r in (3, 4, 5)
    ]
    # O(h^2) until the temporal error floor
    assert e[0] / e[1] > 3.0
    assert e[1] / e[2] > 2.0


def test_scheme_cross_consistency():
    """All IRK variants solve the same equations: identical errors."""
    results = {
        s: _run({"TimeIntegrationScheme": s})
        for s in ("irk", "irk_batched", "complex_irk", "complex_irk_batched")
    }
    l2 = {s: r["error_L2"] for s, r in results.items()}
    vals = list(l2.values())
    for v in vals[1:]:
        np.testing.assert_allclose(v, vals[0], rtol=1e-6)
    # iteration counts are sane and bounded
    for s, r in results.items():
        assert 0 < r["n_outer"] < 60, (s, r["n_outer"])


def test_irk_temporal_convergence_q2():
    """Radau IIA with q=2 has order 3: halving dt cuts the *temporal*
    error ~8x.  Isolate it by Richardson comparison against a tiny-dt
    solution on the same grid (the analytic-error metric saturates at the
    spatial floor)."""
    over = {
        "TimeIntegrationScheme": "irk",
        "FEDegree": 1,
        "NRefinements": 4,
        "IRKStages": 2,
        "EndTime": 0.4,
        "OuterTolerance": 1e-12,
    }
    u_ref = _run({**over, "TimeStepSize": 0.025})["u"]
    e1 = np.linalg.norm(_run({**over, "TimeStepSize": 0.2})["u"] - u_ref)
    e2 = np.linalg.norm(_run({**over, "TimeStepSize": 0.1})["u"] - u_ref)
    assert e1 / e2 > 5.0, (e1, e2)


def test_irk_inner_tolerance_cg():
    """InnerTolerance > 0 switches the block solves to CG+GMG (reference
    main.cc:1126-1148); errors must stay at the same level."""
    ref = _run({"TimeIntegrationScheme": "irk"})
    cg = _run({"TimeIntegrationScheme": "irk", "InnerTolerance": 1e-4})
    np.testing.assert_allclose(cg["error_L2"], ref["error_L2"], rtol=1e-4)
    assert cg["n_inner"] > ref["n_inner"]  # real CG iterations counted


def test_matrix_based_equals_matrix_free():
    a = _run({"TimeIntegrationScheme": "irk"})
    b = _run({"TimeIntegrationScheme": "irk", "OperatorType": "MatrixBased"})
    np.testing.assert_allclose(a["error_L2"], b["error_L2"], rtol=1e-10)
    assert a["n_outer"] == b["n_outer"]


def test_auto_time_step_rule():
    p = Parameters.from_dict(
        {**BASE, "TimeIntegrationScheme": "irk", "TimeStepSize": 0.0}, dim=2
    )
    dx = 1.0 / 2**p.n_refinements
    expect = dx ** ((p.fe_degree + 1.0) / (2.0 * p.irk_stages - 1.0))
    assert np.isclose(p.auto_time_step(dx), expect)


def test_end_time_truncation():
    out = _run({"TimeIntegrationScheme": "ost", "TimeStepSize": 0.15,
                "EndTime": 0.2})
    # steps: 0.15 then truncated 0.05 (reference main.cc:3326-3339)
    assert out["n_timesteps"] == 2


def test_3d_runs():
    out = _run({"TimeIntegrationScheme": "irk", "NRefinements": 3}, dim=3)
    assert out["error_L2"] < 0.1


def test_table_output():
    from dealii_spirk_tpu.utils.table import ConvergenceTable

    t = ConvergenceTable()
    p = Parameters.from_dict({**BASE, "TimeIntegrationScheme": "irk"}, dim=2)
    run_config(p, t, verbose=False)
    s = t.to_string()
    for col in ("n_dofs", "n_stages", "error_L2", "n_outer_avg", "t_solver"):
        assert col in s


def test_complex_temporal_convergence_q3():
    """Radau IIA q=3: high-order temporal convergence in the asymptotic
    regime (stiff problems show some order reduction below the classical
    order 5; measured ~4.2 at these steps).  Richardson against a tiny-dt
    run; also irk and complex_irk agree to ~1e-14 on the same problem."""
    over = {
        "FEDegree": 1,
        "NRefinements": 4,
        "IRKStages": 3,
        "EndTime": 0.4,
        "OuterTolerance": 1e-12,
    }
    cov = {**over, "TimeIntegrationScheme": "complex_irk"}
    u_ref = _run({**cov, "TimeStepSize": 0.025})["u"]
    e1 = np.linalg.norm(_run({**cov, "TimeStepSize": 0.1})["u"] - u_ref)
    e2 = np.linalg.norm(_run({**cov, "TimeStepSize": 0.05})["u"] - u_ref)
    assert e1 / e2 > 12.0, (e1, e2)
    # cross-oracle: the real-diagonalized solver produces the same states
    u_irk = _run(
        {**over, "TimeIntegrationScheme": "irk", "TimeStepSize": 0.1}
    )["u"]
    u_cpx = _run({**cov, "TimeStepSize": 0.1})["u"]
    np.testing.assert_allclose(u_cpx, u_irk, atol=1e-10)


def test_phase_timer_replay():
    """--phase-timers fills the t_vmult / t_prec_* columns (reference
    main.cc:998-1173 in-loop timers, reproduced by replay)."""
    from dealii_spirk_tpu.utils.table import ConvergenceTable

    t = ConvergenceTable()
    p = Parameters.from_dict({**BASE, "TimeIntegrationScheme": "irk"}, dim=2)
    run_config(p, t, verbose=False, profile_phases=True)
    row = t.rows[0]
    assert row["t_vmult"] > 0
    assert row["t_prec_bc"] > 0
    assert row["t_prec_solver"] > 0


def test_spatial_convergence_p2():
    """Q2 elements: O(h^3) L2 convergence (temporal error kept below the
    spatial floor with the 5th-order q=3 integrator and small dt)."""
    e = [
        _run(
            {
                "TimeIntegrationScheme": "irk_batched",
                "FEDegree": 2,
                "NRefinements": r,
                "TimeStepSize": 0.05,
                "EndTime": 0.1,
                "OuterTolerance": 1e-10,
            }
        )["error_L2"]
        for r in (2, 3, 4)
    ]
    assert e[0] / e[1] > 5.0, e
    assert e[1] / e[2] > 5.0, e


def test_canon_solve_matches_stencil_counts_and_errors(monkeypatch):
    """The canonical-layout pallas solve (schemes/irk.py use_canon) is a
    drop-in: identical outer/inner iteration counts and matching errors
    vs the compact stencil execution of the same scheme (pads are exactly
    zero, so every Krylov dot/norm is unchanged).  SPIRK_FORCE_CANON
    engages the layout on this small grid (production gates it to
    near-tight aligned shapes)."""
    monkeypatch.setenv("SPIRK_FORCE_CANON", "1")
    from dealii_spirk_tpu.config import Parameters
    from dealii_spirk_tpu.runner import run_config

    base = {
        "FEDegree": 1,
        "NRefinements": 4,
        "TimeIntegrationScheme": "irk_batched",
        "IRKStages": 3,
        "TimeStepSize": 0.1,
        "EndTime": 0.2,
        "OperatorType": "MatrixFree",
        "InnerTolerance": 0.0,
        "OuterTolerance": 1e-8,
        "Precision": "f32",
        "BlockPreconditionerType": "GMG",
    }
    # the canonical layout must actually engage (guards against the
    # worthwhile-gate silently disabling it and this test passing
    # vacuously)
    from dealii_spirk_tpu.problem import HeatProblem
    from dealii_spirk_tpu.schemes import make_scheme

    prm = Parameters.from_dict({**base, "OperatorMode": "pallas"}, dim=3)
    assert make_scheme(HeatProblem(prm), prm).use_canon

    outs = {}
    for om in ("stencil", "pallas"):
        outs[om] = run_config(
            Parameters.from_dict({**base, "OperatorMode": om}, dim=3),
            verbose=False,
        )
    s, p = outs["stencil"], outs["pallas"]
    assert abs(p["error_L2"] - s["error_L2"]) / s["error_L2"] < 1e-4
    # GMRES exits on the f32 Givens residual estimate; different fusion/
    # kernel rounding paths can shift the crossing by one iteration
    assert abs(p["n_outer"] - s["n_outer"]) <= 1, (p["n_outer"], s["n_outer"])
    assert abs(p["n_inner"] - s["n_inner"]) <= 1


def test_canon_complex_solve_matches_stencil_counts(monkeypatch):
    monkeypatch.setenv("SPIRK_FORCE_CANON", "1")
    from dealii_spirk_tpu.config import Parameters
    from dealii_spirk_tpu.runner import run_config

    base = {
        "FEDegree": 1,
        "NRefinements": 4,
        "TimeIntegrationScheme": "complex_irk_batched",
        "IRKStages": 4,
        "TimeStepSize": 0.1,
        "EndTime": 0.2,
        "OperatorType": "MatrixFree",
        "InnerTolerance": 0.0,
        "OuterTolerance": 1e-8,
        "Precision": "f32",
        "BlockPreconditionerType": "GMG",
    }
    outs = {}
    for om in ("stencil", "pallas"):
        outs[om] = run_config(
            Parameters.from_dict({**base, "OperatorMode": om}, dim=3),
            verbose=False,
        )
    s, p = outs["stencil"], outs["pallas"]
    assert abs(p["error_L2"] - s["error_L2"]) / s["error_L2"] < 1e-4
    # per-pair GMRES lanes exit on a Givens residual estimate; at
    # OuterTolerance 1e-8 (floored near the f32 noise floor) the kernel
    # paths' different fp reduction orders can flip a lane by one
    # iteration — allow +-1 per pair lane, errors must still match
    assert abs(p["n_outer"] - s["n_outer"]) <= 2, (p["n_outer"], s["n_outer"])
    assert abs(p["n_inner"] - s["n_inner"]) <= 2 * 2


def test_compact_basis_escalation_guard(monkeypatch):
    """The huge-grid compact-basis guard (VERDICT r3 weak #4): when a
    solve runs past the fixed compact basis, a restart fires where
    deal.II's 30-vector default would not — schemes/irk.py warns loudly
    about the parity divergence (irk.py solve_step) and the restarted
    solve must still converge to the same answer (deal.II full-restart
    semantics, tested directly in test_solvers.py's manual-chain test)."""
    import dealii_spirk_tpu.schemes.irk as irk_mod

    ref = _run({"TimeIntegrationScheme": "irk_batched"})
    assert ref["n_outer"] > 2  # the guard below must actually trip

    # pretend this tiny grid is "huge": compact 2-column basis
    monkeypatch.setattr(irk_mod, "COMPACT_GRID_DOFS", 0)
    monkeypatch.setattr(irk_mod, "COMPACT_BASIS", 2)
    with pytest.warns(RuntimeWarning, match="compact basis"):
        out = _run({"TimeIntegrationScheme": "irk_batched"})

    # restarts past the basis keep full-restart correctness: identical
    # final error, at >= the un-restarted iteration count
    np.testing.assert_allclose(out["error_L2"], ref["error_L2"], rtol=1e-7)
    assert out["n_outer"] >= ref["n_outer"]
