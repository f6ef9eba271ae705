"""Auxiliary subsystems: GCR solver, ParaView output."""

import os

import jax.numpy as jnp
import numpy as np

from dealii_spirk_tpu.solvers.gcr import gcr
from dealii_spirk_tpu.solvers.krylov import gmres
from dealii_spirk_tpu.utils.vtk import ParaviewSeries, write_vtr


def test_gcr_solves():
    n = 40
    rng = np.random.default_rng(0)
    A = jnp.asarray(np.eye(n) * 4 + 0.4 * rng.standard_normal((n, n)))
    b = jnp.asarray(rng.standard_normal(n))
    res = gcr(lambda x: A @ x, b, maxiter=40, reltol=1e-10)
    np.testing.assert_allclose(res.x, np.linalg.solve(A, b), atol=1e-7)
    # same answer as GMRES
    res2 = gmres(lambda x: A @ x, b, maxiter=200, reltol=1e-10)
    np.testing.assert_allclose(res.x, res2.x, atol=1e-6)


def test_gcr_preconditioned():
    n = 30
    rng = np.random.default_rng(1)
    A = jnp.asarray(np.diag(np.linspace(1, 100, n)))
    b = jnp.ones(n)
    plain = gcr(lambda x: A @ x, b, maxiter=40, reltol=1e-8)
    prec = gcr(
        lambda x: A @ x,
        b,
        M=lambda r: r / jnp.diag(A),
        maxiter=40,
        reltol=1e-8,
    )
    assert int(prec.n_iterations) <= int(plain.n_iterations)
    np.testing.assert_allclose(prec.x, np.linalg.solve(A, b), atol=1e-6)


def test_write_vtr(tmp_path):
    x = np.linspace(0, 1, 5)
    vals = np.outer(np.sin(x), np.cos(x))
    path = str(tmp_path / "out.vtr")
    write_vtr(path, [x, x], vals)
    text = open(path).read()
    assert "RectilinearGrid" in text
    assert "U" in text
    # binary payload round-trips
    import base64
    import struct

    payload = text.split('format="binary">')[1].split("<")[0]
    raw = base64.b64decode(payload)
    (nbytes,) = struct.unpack("<I", raw[:4])
    data = np.frombuffer(raw[4 : 4 + nbytes], dtype="<f8")
    np.testing.assert_allclose(data, vals.ravel(order="F"))


def test_per_stage_split_nonuniform():
    """With InnerTolerance > 0 the per-lane CG counts differ (the stage
    blocks have different shifts), so the t_prec_solver_0..9 attribution
    must be non-uniform — the column carries real information exactly
    where the reference's in-loop per-stage timers would show a spread
    (main.cc:810-813).  With InnerTolerance 0 — or the block-batched
    schemes, whose preconditioner is one V-cycle per application by
    construction — the uniform split is exact (see PARITY.md)."""
    from dealii_spirk_tpu.config import Parameters
    from dealii_spirk_tpu.problem import HeatProblem
    from dealii_spirk_tpu.schemes import make_scheme

    p = Parameters.from_dict(
        {
            "FEDegree": 1,
            "NRefinements": 4,
            "TimeIntegrationScheme": "irk",
            "IRKStages": 3,
            "TimeStepSize": 0.1,
            "EndTime": 0.2,
            "OperatorType": "MatrixFree",
            "BlockPreconditionerType": "GMG",
            "InnerTolerance": 1e-4,
            "DoOutputParaview": False,
        },
        dim=2,
    )
    problem = HeatProblem(p)
    sch = make_scheme(problem, p)
    tau = p.time_step_size
    u = problem.initial_condition()
    sch.solve_step(u, 2, tau, tau)  # timestep 2: stats not reset
    counts = np.asarray(sch.n_inner_stage, dtype=float)
    assert counts.sum() > 0
    assert counts.max() > counts.min(), counts

    # the per-stage columns reflect that spread
    sch.timers.seconds["preconditioner_solver"] = 1.0

    class Tab:
        vals = {}

        def add_value(self, k, v):
            self.vals[k] = v

        def set_scientific(self, k, f):
            pass

    tab = Tab()
    sch.add_per_stage_times(tab, 1.0, p.irk_stages)
    split = [tab.vals[f"t_prec_solver_{i}"] for i in range(p.irk_stages)]
    assert max(split) > min(split), split
    np.testing.assert_allclose(sum(tab.vals.values()), 1.0, rtol=1e-12)


def test_paraview_series(tmp_path):
    s = ParaviewSeries(str(tmp_path))
    u = np.ones((3, 3))
    x_int = np.array([0.25, 0.5, 0.75])
    s.write(u, x_int, 0.0, 0)
    s.write(0.5 * u, x_int, 0.1, 1)
    assert os.path.exists(tmp_path / "result_0000.vtr")
    assert os.path.exists(tmp_path / "result_0001.vtr")
    pvd = open(tmp_path / "result.pvd").read()
    assert 'timestep="0.1"' in pvd
