"""TPU check: y-blocked fused kernel at m=255 (refinement 8, degree 1).

Verifies the kernel compiles within Mosaic's scoped-VMEM budget on real
hardware, matches the XLA banded path, and times it (in-jit fori_loop,
per CLAUDE.md benchmarking discipline).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dealii_spirk_tpu.fem.grid import make_level
from dealii_spirk_tpu.ops.mass_laplace import (
    apply_shifted_batched,
    level_ops,
)
from dealii_spirk_tpu.ops.pallas.stencil import (
    fused_mass_stiffness_apply,
    fused_stencil_apply,
    yb_for,
)


def timed(fn, *args, iters=20):
    @jax.jit
    def loop(x):
        def body(_, acc):
            return fn(acc)

        return jax.lax.fori_loop(0, iters, body, x)

    out = loop(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    import os
    import sys

    dev = jax.devices()[0]
    print("device:", dev)
    refs = tuple(
        int(r) for r in (sys.argv[1:] or os.environ.get("REFS", "8").split())
    )
    for ref in refs:
        lev = make_level(ref, 1)
        m = lev.m
        ops = level_ops(lev, jnp.float32)
        by = yb_for((m,) * 3, 1, 3)
        print(f"ref={ref} m={m} yb={by}")
        q = 4
        rng = np.random.default_rng(0)
        W = jnp.asarray(
            rng.standard_normal((q, m, m, m)).astype(np.float32)
        )
        d = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
        got = fused_stencil_apply(ops, d, 0.1, W, 3)
        want = jax.jit(
            lambda: apply_shifted_batched(ops, d, 0.1, W, 3, "stencil")
        )()
        err = float(
            jnp.abs(got - want).max() / jnp.abs(want).max()
        )
        print(f"  apply rel err vs XLA: {err:.2e}")
        assert err < 1e-4, err

        gm, gk = fused_mass_stiffness_apply(ops, W, 3)
        wm = jax.jit(
            lambda: apply_shifted_batched(
                ops, jnp.ones(q, jnp.float32), 0.0, W, 3, "stencil"
            )
        )()
        errm = float(jnp.abs(gm - wm).max() / jnp.abs(wm).max())
        print(f"  ms(M) rel err vs XLA: {errm:.2e}")
        assert errm < 1e-4, errm

        nbytes = 2 * W.size * 4  # in + out
        t_f, _ = timed(
            lambda u: fused_stencil_apply(ops, d, 0.1, u, 3), W
        )
        t_x, _ = timed(
            lambda u: apply_shifted_batched(ops, d, 0.1, u, 3, "stencil"), W
        )
        t_ms, _ = timed(
            lambda u: fused_mass_stiffness_apply(ops, u, 3)[1], W
        )
        print(
            f"  fused {t_f*1e3:.3f} ms ({nbytes/t_f/1e9:.0f} GB/s) | "
            f"xla {t_x*1e3:.3f} ms | ms-dual {t_ms*1e3:.3f} ms "
            f"| speedup {t_x/t_f:.2f}x"
        )


if __name__ == "__main__":
    main()
