"""Slope-timed A/B of the V-cycle grid-transfer formulations at
refinement-8 canonical shapes: the `transfer` row of
scripts/vcycle_decomp.py measured 4.5 ms against a ~2.7 ms HBM traffic
model, so ~40% of the slice is formulation overhead.  Times the exact
vcycle_canon composition  x + P(R(x))  (3-axis restriction into the
coarse level, 3-axis prolongation back, correction add) for:

  v0  moveaxis -> matmul(u, M^T) -> moveaxis   (current apply_dense_1d)
  v1  dot_general contracting the axis in place, then moveaxis
  v2  always contract the LAST axis, rotating spatial axes each round
      (restriction rotates one way, prolongation must undo it)

Usage: python -u scripts/transfer_r8.py [refinement=8]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def main():
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from dealii_spirk_tpu.fem.grid import make_space
    from dealii_spirk_tpu.ops.pallas import stencil as st
    from scripts.mix_bench import slope

    dim, p, q = 3, 1, 4
    space = make_space(dim, p, refinement)
    m_f = 2**refinement - 1
    m_c = 2 ** (refinement - 1) - 1
    P1 = np.asarray(space.prolongations[-1], dtype=np.float32)
    cs_f = st.canon_shape((m_f,) * dim, p, dim)
    cs_c = st.canon_shape((m_c,) * dim, p, dim)
    # canonical-embedded transfer matrices (vcycle_canon _transfer_mats)
    mats_P, mats_R = [], []
    for ax in range(dim):
        Pp = np.zeros((cs_f[ax], cs_c[ax]), np.float32)
        Pp[: P1.shape[0], : P1.shape[1]] = P1
        mats_P.append(jnp.asarray(Pp))
        mats_R.append(jnp.asarray(Pp.T))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((q,) + cs_f), jnp.float32)
    print(
        f"device: {jax.devices()[0]}  fine {cs_f} coarse {cs_c} "
        f"({x.size * 4 / 2**20:.0f} MB/field)"
    )

    def v0_apply(mat, u, axis):
        u_moved = jnp.moveaxis(u, axis, -1)
        out = jnp.matmul(u_moved, mat.T, precision="highest")
        return jnp.moveaxis(out, -1, axis)

    def v1_apply(mat, u, axis):
        out = lax.dot_general(
            mat, u, (((1,), (axis,)), ((), ())), precision="highest"
        )
        return jnp.moveaxis(out, 0, axis)

    def mk_roundtrip(apply_fn):
        def rt(u):
            v = u
            for ax in range(dim):
                v = apply_fn(mats_R[ax], v, 1 + ax)
            for ax in range(dim):
                v = apply_fn(mats_P[ax], v, 1 + ax)
            return u + v

        return rt

    def v2_roundtrip(u):
        # restriction: contract last axis with R[2-k], rotating spatial
        # axes backwards; prolongation mirrors it so order is restored
        v = u
        for k in range(dim):
            v = jnp.matmul(v, mats_R[dim - 1 - k].T, precision="highest")
            v = jnp.transpose(v, (0, 3, 1, 2))
        for k in range(dim):
            v = jnp.matmul(v, mats_P[dim - 1 - k].T, precision="highest")
            v = jnp.transpose(v, (0, 3, 1, 2))
        return u + v

    fns = [
        ("v0 moveaxis+matmul", mk_roundtrip(v0_apply)),
        ("v1 dot_general", mk_roundtrip(v1_apply)),
        ("v2 rotate-last", v2_roundtrip),
    ]
    ref = fns[0][1](x)
    max_n = 20
    for name, fn in fns:
        err = float(jnp.max(jnp.abs(fn(x) - ref)))
        ms = slope(fn, (x,), max_n=max_n) * 1e3
        print(f"{name:22s} {ms:8.3f} ms   max|diff| = {err:.2e}")


if __name__ == "__main__":
    main()
