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
