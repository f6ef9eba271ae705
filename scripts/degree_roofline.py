"""Degree-axis roofline (VERDICT r3 #3): per-kernel effective GB/s and
op accounting for the canonical production kernels at p in {2, 3, 4}.

The p=1 roofline (ROUND2_NOTES) established the methodology: count the
kernel's per-element vector ops analytically, compare the measured time
against the binding resource — VPU (~3.5 T op/s on v5e), MXU (dense x
dots at p >= 2; bf16x3 ~66 T MAC/s, f32-HIGHEST ~33 T MAC/s effective),
or HBM (819 GB/s on the LOGICAL traffic: pads/halo re-reads are kernel
overhead, so "GB/s" is effective bandwidth).  Measured time at or above
~70% of the modeled bound = at the roof; below = headroom, go look.

Per-element op model for the canonical y-blocked kernels (nb = 2p+1;
rolls and FMAs each counted as one VPU op, matching the p=1 ~40-op
count):

  * z pass: 2*nb FMA (two accumulated streams)
  * y pass: per tap 2 sublane slices + 3 FMA -> 5*nb
  * dense x dot (p >= 2): apply contracts (.., 2*nx)@(2*nx, nx) ->
    2*nx MAC/element on the MXU; the ms dual pays 3*nx (nx for M,
    2*nx for K); cheb adds ~6 elementwise ops to the apply.

Logical HBM traffic per apply: read + write of the (q, m^3) block
(2 passes); ms dual: 1 read + 2 writes (3); cheb: 4 reads + 3 writes
(7); ms-mix fused Aop: 2.

Timing: slope of one jitted chained loop at two lengths (see
scripts/mix_bench.py — chains are CAPPED at 40 links for > 100 MB
fields: longer loops crash this machine's remote TPU worker).

Usage: python -m scripts.degree_roofline [p:ref ...]
       (default: 2:7 3:6 4:6 — the BASELINE degree-sweep grids)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from dealii_spirk_tpu.fem.grid import make_level
from dealii_spirk_tpu.ops.mass_laplace import level_ops
from dealii_spirk_tpu.ops.pallas import stencil as st
from scripts.mix_bench import slope

Q = 4
HBM_GBPS = 819.0
VPU_OPS = 3.5e12
# v5e MXU peak: 197 TFLOP/s bf16 = 98.5 T MAC/s (1 MAC = 2 FLOPs).
# bf16x3 f32 emulation costs 3 passes, HIGHEST costs 6.
MXU_MACS_BF16X3 = 98.5e12 / 3
MXU_MACS_HIGH = 98.5e12 / 6


def main():
    combos = sys.argv[1:] or ["2:7", "3:6", "4:6"]
    print(
        f"device: {jax.devices()[0]}  (q={Q}, f32, canonical kernels, "
        "slope-timed)"
    )
    hdr = (
        f"{'p':>2} {'ref':>3} {'m':>4} {'by':>3} | {'kernel':>7} "
        f"{'ms':>8} {'GB/s':>5} {'%HBM':>4} | {'bound':>7} {'model ms':>8} "
        f"{'%roof':>5}"
    )
    print(hdr)
    for combo in combos:
        p, ref = (int(v) for v in combo.split(":"))
        lev = make_level(ref, p)
        m = lev.m
        spatial = (m,) * 3
        ops = level_ops(lev, jnp.float32)
        if not st.canon_supported(spatial, p, 3):
            print(f"{p:>2} {ref:>3} {m:>4}   — canonical unsupported")
            continue
        rng = np.random.default_rng(0)
        Wc = st.pad_canon(
            jnp.asarray(
                rng.standard_normal((Q,) + spatial).astype(np.float32)
            ),
            spatial,
            p,
            3,
        )
        tabs = st.canon_tables(ops, spatial, p, 3)
        d = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
        A = jnp.asarray(rng.standard_normal((Q, Q)).astype(np.float32))
        tau = jnp.float32(0.1)
        invd = jnp.ones_like(Wc)
        by = st.canon_yb_for(spatial, p, 3)
        nx = Wc.shape[-1]
        nb = 2 * p + 1
        n_log = Q * m**3  # logical elements
        n_can = Wc.size  # canonical (padded) elements actually computed
        max_n = 40 if Wc.size * 4 > 100 * 2**20 else 2000
        reps = 5

        kernels = {
            "apply": (
                lambda x: st.fused_stencil_apply_canon(
                    ops, d, tau, x, 3, tables=tabs
                ),
                2,  # logical HBM passes
                7 * nb + 2,  # VPU ops/element (z 2nb + y 5nb + epilogue)
                2 * nx,  # MXU MACs/element
            ),
            "ms-dual": (
                lambda x: st.fused_mass_stiffness_apply_canon(
                    ops, x, 3, tables=tabs
                )[1],
                3,
                7 * nb,
                3 * nx,
            ),
            "cheb": (
                lambda x: st.fused_cheb_iter_canon(
                    ops, d, tau, 0.9, 0.4, x, x, x, invd, 3, tables=tabs
                )[0],
                7,
                7 * nb + 8,
                2 * nx,
            ),
            "Aop-mix": (
                (
                    lambda x: st.fused_ms_mix_apply_canon(
                        ops, A, tau, x, 3, tables=tabs
                    )
                )
                if st.ms_mix_supported(spatial, p, 3, Q)
                else None,
                2,
                7 * nb + 2 * Q,
                3 * nx,
            ),
        }
        bf16 = st._bf16_ok(p)
        for name, (fn, passes, vpu_ops, mxu_macs) in kernels.items():
            if fn is None:
                continue
            # the cheb kernel's dots are smoother-only (perturb M, not
            # A), so they run bf16x3 at every degree under
            # SPIRK_CHEB_DOT_BF16 (default on) — model that rate
            bf16_k = bf16 or (name == "cheb" and st._CHEB_DOT_BF16)
            mxu_rate = MXU_MACS_BF16X3 if bf16_k else MXU_MACS_HIGH
            t = slope(fn, (Wc,), reps=reps, max_n=max_n)
            nbytes = passes * n_log * 4
            gbps = nbytes / t / 1e9
            # model bounds on the CANONICAL element count (the kernel
            # computes pads too)
            t_hbm = passes * n_can * 4 / (HBM_GBPS * 1e9)
            t_vpu = vpu_ops * n_can / VPU_OPS
            t_mxu = n_can * mxu_macs / mxu_rate
            t_bound = max(t_hbm, t_vpu, t_mxu)
            which = ["HBM", "VPU", "MXU"][
                [t_hbm, t_vpu, t_mxu].index(t_bound)
            ]
            print(
                f"{p:>2} {ref:>3} {m:>4} {by:>3} | {name:>7} "
                f"{t * 1e3:>8.3f} {gbps:>5.0f} "
                f"{100 * gbps / HBM_GBPS:>3.0f}% | "
                f"{which:>7} {t_bound * 1e3:>8.3f} "
                f"{100 * t_bound / t:>4.0f}%"
            )


if __name__ == "__main__":
    main()
