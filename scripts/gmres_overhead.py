"""Isolate the GMRES algebra cost at production scale: slope-time a
fixed-iteration masked-batched GMRES cycle on refinement-8-sized fields
with a free operator (scalar multiply) and no preconditioner, so the
only work on the clock is the Krylov algebra itself — basis zeroing,
MGS dots/axpys, norms, the basis dynamic-update, the dx accumulation,
and whatever carry copies the while_loop inserts.

A pass model for k = 0..n-1 live columns (one pass = one full-field
HBM read or write):  MGS sum(k+1) x 3 + norm n + V-write n + dx 3n +
basis zeroing (R+1).  Comparing measured ms against the model at
819 GB/s says how much the loop structure itself costs.

Usage: python -m scripts.gmres_overhead [n_iters=4] [ref=8]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dealii_spirk_tpu.solvers.krylov import gmres  # noqa: E402
from scripts.mix_bench import slope  # noqa: E402

Q = 4
HBM_GBPS = 819.0


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ref = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    m = 2**ref - 1
    shape = (Q, m + 1, m + 1, m + 1)  # ~canonical r8 field
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    print(
        f"device: {jax.devices()[0]}  field {shape} "
        f"({b.size * 4 / 2**20:.0f} MB), {n_iters} fixed iterations"
    )

    def run(b_):
        res = gmres(
            lambda v: v * jnp.float32(1.0001),
            b_,
            maxiter=n_iters,
            abstol=1e-30,
            reltol=0.0,
            batch=True,
            adaptive=12,
        )
        return res[0]

    ms = slope(run, (b,), max_n=20) * 1e3
    passes = (
        3 * sum(range(1, n_iters + 1))  # MGS dots+axpys
        + 2 * n_iters  # norm + V column write
        + 3 * n_iters  # dx accumulation
        + 13  # adaptive-basis zeroing
    )
    model = passes * b.size * 4 / HBM_GBPS / 1e9 * 1e3
    print(
        f"gmres algebra: {ms:8.3f} ms  (traffic model {model:.3f} ms "
        f"= {passes} passes; overhead {ms - model:.3f} ms)"
    )


if __name__ == "__main__":
    main()
