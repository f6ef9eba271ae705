"""Plain-aggregation AMG (``BlockPreconditionerType: "AMG"``, reference
``preconditioner.h:176-215``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dealii_spirk_tpu.fem.grid import make_space
from dealii_spirk_tpu.solvers.amg import (
    aggregation_prolongator,
    build_amg_data,
    dense_to_band,
)
from dealii_spirk_tpu.solvers.gmg import gmg_reinit, vcycle
from dealii_spirk_tpu.solvers.krylov import pcg


def test_aggregation_prolongator_shape_and_partition():
    P = aggregation_prolongator(7)
    assert P.shape == (7, 4)
    # every fine unknown belongs to exactly one aggregate
    np.testing.assert_allclose(P.sum(axis=1), 1.0)


def test_dense_to_band_roundtrip():
    from dealii_spirk_tpu.fem.assembly import band_to_dense
    from dealii_spirk_tpu.fem.grid import make_level

    lev = make_level(4, 2)
    band = dense_to_band(lev.mass_dense, 2)
    np.testing.assert_allclose(band_to_dense(band), lev.mass_dense)


def test_galerkin_products_stay_banded():
    """Aggregation coarse operators must fit the fine bandwidth (the
    builder raises otherwise) at every degree."""
    for degree in (1, 2, 3, 4):
        space = make_space(2, degree, 4)
        build_amg_data(space, dtype=jnp.float64)  # raises on truncation


@pytest.mark.parametrize("dim,degree,ref", [(2, 1, 5), (3, 1, 3), (2, 2, 4)])
def test_amg_preconditioned_cg_converges(dim, degree, ref):
    space = make_space(dim, degree, ref)
    amg = build_amg_data(space, dtype=jnp.float64)
    a, b = 1.0, 0.1
    prec = gmg_reinit(amg, a, b, dim, "stencil")
    fine = amg.level_ops[-1]
    from dealii_spirk_tpu.ops.mass_laplace import apply_shifted

    A = lambda u: apply_shifted(fine, a, b, u, dim, "stencil")
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((fine.m,) * dim))
    res = pcg(
        A,
        rhs,
        M=lambda r: vcycle(amg, prec, a, b, r, dim, "stencil"),
        maxiter=200,
        reltol=1e-10,
    )
    # plain aggregation: more iterations than GMG's ~3, but convergent
    # and mesh-independent-ish
    assert int(res.n_iterations) < 60
    x = res.x
    r = rhs - A(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(rhs)) < 1e-9


def test_scheme_with_amg_matches_gmg_solution():
    """The preconditioner changes iteration counts, not the solution:
    an irk_batched run with AMG must reproduce the GMG run's errors
    (mutual-oracle discipline, SURVEY §4.4)."""
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
        "InnerTolerance": 1e-6,
        "OuterTolerance": 1e-8,
    }
    out_amg = run_config(
        Parameters.from_dict(
            {**base, "BlockPreconditionerType": "AMG"}, dim=2
        ),
        verbose=False,
    )
    out_gmg = run_config(
        Parameters.from_dict(
            {**base, "BlockPreconditionerType": "GMG"}, dim=2
        ),
        verbose=False,
    )
    rel = abs(out_amg["error_L2"] - out_gmg["error_L2"]) / out_gmg["error_L2"]
    assert rel < 1e-6, rel
