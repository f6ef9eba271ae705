"""A/B the in-kernel stage mixing (r4) against the unfused XLA paths.

Measures, per refinement (q=4, degree 1, f32, canonical layout):

  * ``mix``     — standalone T-style stage mix: XLA GEMM vs
    ``stage_mix_canon`` (one read + one write pass).
  * ``Aop``     — the outer-system vmult: unfused (ms kernel + mix
    einsum + AXPY) vs ``fused_ms_mix_apply_canon`` (one HBM round trip).

Timing discipline (CLAUDE.md): ONE jitted ``lax.fori_loop`` program per
measurement, timed at two iteration counts, slope = per-iteration device
time — immune to the remote tunnel's dispatch/sync artifacts.  Tables
are threaded as jit arguments (closure constants blow the remote
compile cap at refinement 8).

Usage: python -m scripts.mix_bench [ref ...]   (default: 7 8)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dealii_spirk_tpu.fem.grid import make_level
from dealii_spirk_tpu.ops.mass_laplace import level_ops
from dealii_spirk_tpu.ops.pallas import stencil as st

Q = 4


def slope(fn, args, reps=3, max_n=40000):
    """Per-iteration time of ``x -> fn(x, *args)`` chained in-graph.

    Auto-scaled two-point slope: the tunnel's fixed costs (a ~0.6 s
    device->host pull with its own variance; occasional early or late
    sync returns) are +-0.1 s-class, so the iteration DELTA between the
    two points is sized to ~2 s of device time (a crude 64-iteration
    probe sets the scale), and each point takes min-of-``reps``.
    Small fixed deltas produced garbage readings here — above-peak and
    even negative slopes."""

    def runner(n):
        @jax.jit
        def run(x, *a):
            return jax.lax.fori_loop(0, n, lambda _, v: fn(v, *a), x)

        return run

    def pull(out):
        # tiny pull forces true completion; pytree-aware (loop state may
        # be a field tuple)
        return sum(float(jnp.sum(l)) for l in jax.tree_util.tree_leaves(out))

    n_probe = min(8, max_n)
    r0 = runner(n_probe)
    pull(r0(*args))  # compile
    t0 = time.perf_counter()
    pull(r0(*args))
    # the probe includes the pull cost -> overestimates -> only makes
    # the timed runs longer (safe)
    est = max((time.perf_counter() - t0 - 0.4) / n_probe, 5e-6)
    # max_n bounds the chain: >=64-iteration loops over refinement-8
    # fields reproducibly CRASH the remote TPU worker (three kills at
    # the identical site; the same program at 8 iterations runs fine)
    n_hi = min(int(2.0 / est) + n_probe, max_n)
    n_lo = max(n_hi // 8, 1)

    ts = []
    for n in (n_lo, n_hi):
        run = runner(n)
        pull(run(*args))  # compile + settle
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(*args)
            pull(out)
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (n_hi - n_lo)


def main():
    refs = [int(r) for r in sys.argv[1:]] or [7, 8]
    p = 1
    print(f"device: {jax.devices()[0]}  (q={Q}, p={p}, f32)")
    for ref in refs:
        lev = make_level(ref, p)
        m = lev.m
        spatial = (m,) * 3
        ops = level_ops(lev, jnp.float32)
        rng = np.random.default_rng(0)
        W = jnp.asarray(
            rng.standard_normal((Q,) + spatial).astype(np.float32)
        )
        Wc = st.pad_canon(W, spatial, p, 3)
        nbytes = 2 * Wc.size * 4  # one read + one write of the block
        A = jnp.asarray(rng.standard_normal((Q, Q)).astype(np.float32))
        tabs = st.canon_tables(ops, spatial, p, 3)
        tau = jnp.float32(0.1)

        # refinement-8 fields: bounded chains + more reps (see slope)
        max_n = 40 if Wc.size * 4 > 100 * 2**20 else 40000
        reps = 5 if max_n == 40 else 3
        t_gemm = slope(
            lambda x, mat: (mat @ x.reshape(Q, -1)).reshape(x.shape),
            (Wc, A), reps=reps, max_n=max_n,
        )
        t_mixk = slope(
            lambda x, mat: st.stage_mix_canon(mat, x), (Wc, A),
            reps=reps, max_n=max_n,
        )

        def aop_unfused(x, mat, t, tb):
            MW, KW = st.fused_mass_stiffness_apply_canon(
                ops, x, 3, tables=tb
            )
            return (mat @ MW.reshape(Q, -1)).reshape(x.shape) + t * KW

        def aop_fused(x, mat, t, tb):
            return st.fused_ms_mix_apply_canon(ops, mat, t, x, 3, tables=tb)

        t_un = slope(aop_unfused, (Wc, A, tau, tabs), reps=reps, max_n=max_n)
        ok = st.ms_mix_supported(spatial, p, 3, Q)
        t_fu = (
            slope(aop_fused, (Wc, A, tau, tabs), reps=reps, max_n=max_n)
            if ok
            else float("nan")
        )
        gb = nbytes / 1e9
        print(
            f"r{ref} m={m} canon={Wc.shape} "
            f"by={st._ms_mix_by(Wc.shape, p, Q)}\n"
            f"  mix: gemm {t_gemm * 1e3:7.3f} ms ({gb / t_gemm:5.0f} GB/s)"
            f"  kernel {t_mixk * 1e3:7.3f} ms ({gb / t_mixk:5.0f} GB/s)"
            f"  -> {t_gemm / t_mixk:4.2f}x\n"
            f"  Aop: unfused {t_un * 1e3:7.3f} ms"
            f"  fused {t_fu * 1e3:7.3f} ms"
            f"  -> {t_un / t_fu:4.2f}x"
        )


if __name__ == "__main__":
    main()
