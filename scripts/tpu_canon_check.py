"""TPU check + microbench for the zero-halo canonical layout.

Verifies the canonical kernels compile and match the XLA path on real
hardware, then times classic (pad + kernel + slice) vs canonical (one
HBM pass) applies and the fused-Chebyshev V-cycle step, in-jit per
CLAUDE.md benchmarking discipline.

Usage: python -m scripts.tpu_canon_check [ref ...]   (default: 7)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dealii_spirk_tpu.fem.grid import make_level
from dealii_spirk_tpu.ops.mass_laplace import (
    apply_shifted_batched,
    level_ops,
)
from dealii_spirk_tpu.ops.pallas import stencil as st

Q = 4
PEAK_GBPS = 819.0  # v5e HBM


def timed(fn, x, iters=30):
    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, iters, lambda _, a: fn(a), x)

    out = loop(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    refs = [int(r) for r in (sys.argv[1:] or ["7"])]
    print(f"device: {jax.devices()[0]}  (q={Q}, f32)")
    for ref in refs:
        lev = make_level(ref, 1)
        m = lev.m
        sp = (m,) * 3
        if not st.canon_supported(sp, 1, 3):
            print(f"ref={ref} m={m}: canon not supported, skipping")
            continue
        ops = level_ops(lev, jnp.float32)
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.standard_normal((Q,) + sp).astype(np.float32))
        d = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
        Wc = st.pad_canon(W, sp, 1, 3)

        got = st.fused_stencil_apply_canon(ops, d, 0.1, Wc, 3)
        want = jax.jit(
            lambda: apply_shifted_batched(ops, d, 0.1, W, 3, "stencil")
        )()
        err = float(
            jnp.abs(st.unpad_canon(got, sp, 3) - want).max()
            / jnp.abs(want).max()
        )
        print(f"ref={ref} m={m} canon shape {Wc.shape}: rel err {err:.2e}")
        assert err < 1e-4, err

        nbytes = 2 * Wc.size * 4
        t_cls = timed(lambda u: st.fused_stencil_apply(ops, d, 0.1, u, 3), W)
        t_can = timed(
            lambda u: st.fused_stencil_apply_canon(ops, d, 0.1, u, 3), Wc
        )
        t_ms = timed(
            lambda u: st.fused_mass_stiffness_apply_canon(ops, u, 3)[1], Wc
        )
        gbps = nbytes / t_can / 1e9
        print(
            f"  apply: classic {t_cls*1e3:.3f} ms | canon {t_can*1e3:.3f} ms "
            f"({gbps:.0f} GB/s, {100*gbps/PEAK_GBPS:.0f}% peak) | "
            f"speedup {t_cls/t_can:.2f}x | ms-dual canon {t_ms*1e3:.3f} ms"
        )

        # fused Chebyshev iteration: canonical vs classic elementwise chain
        invd = jnp.asarray(
            np.abs(rng.standard_normal((Q,) + sp)).astype(np.float32) + 0.5
        )
        invd_c = st.pad_canon(invd, sp, 1, 3)

        def cheb_canon(x):
            r, dd, xx = st.fused_cheb_iter_canon(
                ops, d, 0.1, 0.7, 0.4, x, x, x, invd_c, 3
            )
            return xx

        def cheb_classic(x):
            Ad = st.fused_stencil_apply(ops, d, 0.1, x, 3)
            r = x - Ad
            z = invd * r
            dd = 0.7 * x + 0.4 * z
            return x + dd

        t_cc = timed(cheb_canon, Wc)
        t_cl = timed(cheb_classic, W)
        print(
            f"  cheb-iter: classic {t_cl*1e3:.3f} ms | canon {t_cc*1e3:.3f} ms "
            f"| speedup {t_cl/t_cc:.2f}x"
        )


if __name__ == "__main__":
    main()
