"""Microbench: GMRES loop overhead on TPU — MGS vs CGS orthogonalization.

Uses a near-trivial operator (diagonal + tiny coupling) on bench-sized
batched fields (4, 127^3) and a tolerance chosen so the solver runs a
fixed ~15 iterations: the measured time is dominated by the Krylov loop
machinery (basis writes, orthogonalization, carry copies), not the
operator.  Not part of the test suite — a perf-engineering tool.

Usage: python -u scripts/gmres_bench.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from dealii_spirk_tpu.solvers.krylov import gmres  # noqa: E402


def main():
    n = 127
    shape = (4, n, n, n)
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, shape, dtype=jnp.float32)
    # mildly non-normal operator => GMRES needs a good handful of iters
    scale = 1.0 + 0.5 * jax.random.uniform(
        jax.random.PRNGKey(1), shape, dtype=jnp.float32
    )

    def A(v):
        return scale * v + 0.3 * jnp.roll(v, 1, axis=-1)

    for orthog in ("mgs", "cgs"):
        fn = jax.jit(
            lambda bb: gmres(
                A,
                bb,
                maxiter=100,
                reltol=1e-6,
                restart=28,
                batch=True,
                orthog=orthog,
            )
        )
        res = fn(b)
        jax.block_until_ready(res.x)
        iters = [int(i) for i in res.n_iterations]
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            res = fn(b)
        jax.block_until_ready(res.x)
        dt = (time.perf_counter() - t0) / reps
        per_it = dt / max(iters)
        print(
            f"{orthog}: {dt * 1e3:7.2f} ms/solve  iters={iters}  "
            f"{per_it * 1e3:6.3f} ms/iter"
        )


if __name__ == "__main__":
    main()
