"""Per-kernel roofline: bytes-moved / time for every fused-kernel variant.

VERDICT round-1 #3: the hot apply ran at ~13% of HBM peak (0.63 ms for
66 MB at q=4, 127^3); this script records GB/s for each kernel variant so
optimization targets are measured, not guessed.  Logical traffic model:
read q*m^3 + write q*m^3 f32 (the minimum an out-of-place apply can move;
pads/slices and halo re-reads are overhead the kernel pays on top, so
"GB/s" here is EFFECTIVE bandwidth — directly comparable to the 819 GB/s
v5e HBM roofline).

Usage: python -m scripts.kernel_roofline [ref:p ...]   (default sweep)
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
    from dealii_spirk_tpu.ops.pallas import stencil as st

    combos = sys.argv[1:] or ["7:1", "8:1", "6:2", "6:3", "6:4"]
    print(f"device: {jax.devices()[0]}  (q={Q}, f32; model: 2*q*m^3*4 B)")
    print(
        f"{'ref':>3} {'p':>2} {'m':>4} {'MB':>6} | "
        f"{'apply':>9} {'GB/s':>5} {'%pk':>4} | "
        f"{'ms-dual':>9} {'GB/s':>5} | {'xla':>9} | {'pad':>8}"
    )
    for combo in combos:
        ref, p = (int(v) for v in combo.split(":"))
        lev = make_level(ref, p)
        m = lev.m
        ops = level_ops(lev, jnp.float32)
        rng = np.random.default_rng(0)
        W = jnp.asarray(rng.standard_normal((Q, m, m, m)).astype(np.float32))
        d = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
        nbytes = 2 * W.size * 4

        t_apply = timed(
            lambda u: st.fused_stencil_apply(ops, d, 0.1, u, 3), W
        )
        t_ms = timed(
            lambda u: st.fused_mass_stiffness_apply(ops, u, 3)[1], W
        )
        t_xla = timed(
            lambda u: apply_shifted_batched(ops, d, 0.1, u, 3, "stencil"), W
        )
        # cost of the per-apply pad alone (one extra HBM round trip)
        by = st.yb_for((m,) * 3, p, 3)
        if by:
            _, _, _, pad = st._geometry_yb(W, p, st._ceil(m + p, 128), by)
        else:
            _, _, _, pad = st._geometry(W, p, 3, st._ceil(m + p, 128))
        t_pad = timed(
            lambda u: jnp.pad(u, pad)[
                tuple(slice(0, s) for s in u.shape)
            ],
            W,
        )  # pad + slice round trip
        gbps = nbytes / t_apply / 1e9
        gbps_ms = 3 * W.size * 4 / t_ms / 1e9  # 1 read, 2 writes
        print(
            f"{ref:>3} {p:>2} {m:>4} {W.size * 4 / 2**20:>6.0f} | "
            f"{t_apply * 1e3:>7.3f}ms {gbps:>5.0f} {100 * gbps / PEAK_GBPS:>3.0f}% | "
            f"{t_ms * 1e3:>7.3f}ms {gbps_ms:>5.0f} | "
            f"{t_xla * 1e3:>7.3f}ms | {t_pad * 1e3:>6.2f}ms"
        )


if __name__ == "__main__":
    main()
