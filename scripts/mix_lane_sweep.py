"""Stage-mix interleaving experiments (round-4 verdict #4): the r8 mix
kernel plateaus at 429 GB/s (52% of HBM roof) for a pure streaming
q x q combine; ROUND4_NOTES attributed it to read+write-interleaved
access at 256-lane rows but never tested the hypothesis.  Two cheap,
bit-identical layout experiments on the SAME canonical field:

  * lane-width aspect: the mix is elementwise over rows, so the
    (q, n_rows, nx_p) reshape is free to trade rows for lanes —
    L in {128, 256, 512, 1024, 2048} changes the DMA burst geometry
    without changing a single arithmetic op.
  * in-place (input_output_aliases): aliasing the input buffer to the
    output makes the read and write streams hit the SAME HBM pages —
    if read/write interleave is the plateau, in-place should move it
    (either direction is informative).

Timing: two-point in-graph slope (scripts/mix_bench.slope).

Usage: python -u scripts/mix_lane_sweep.py [refinement=8]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402

from dealii_spirk_tpu.fem.grid import make_level  # noqa: E402
from dealii_spirk_tpu.ops.pallas import stencil as st  # noqa: E402
from scripts.mix_bench import slope  # noqa: E402

Q = 4
HBM_GBPS = 819.0


@functools.partial(
    jax.jit, static_argnames=("q", "br", "alias")
)
def _mix_arm(mat, w2, *, q, br, alias):
    n_rows, nx_p = w2.shape[1], w2.shape[2]
    return pl.pallas_call(
        st._make_kernel_stage_mix(q, q),
        grid=(n_rows // br,),
        in_specs=[
            pl.BlockSpec(memory_space=st.pltpu.SMEM),
            pl.BlockSpec((q, br, nx_p), lambda ir: st._i32(0, ir, 0)),
        ],
        out_specs=pl.BlockSpec((q, br, nx_p), lambda ir: st._i32(0, ir, 0)),
        out_shape=jax.ShapeDtypeStruct((q, n_rows, nx_p), jnp.float32),
        input_output_aliases={1: 0} if alias else {},
    )(mat, w2)


def main():
    ref = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    lev = make_level(ref, 1)
    spatial = (lev.m,) * 3
    rng = np.random.default_rng(0)
    Wc = st.pad_canon(
        jnp.asarray(rng.standard_normal((Q,) + spatial).astype(np.float32)),
        spatial, 1, 3,
    )
    mat = jnp.asarray(rng.standard_normal((Q, Q)).astype(np.float32))
    # keep the chained iterate bounded: the slope harness applies the
    # mix hundreds of times (mat^n W must not overflow)
    mat = mat / (2.0 * jnp.linalg.norm(mat, 2))
    n_elem = Wc.size // Q
    nbytes = 2 * Wc.size * 4  # one read + one write pass
    print(f"device: {jax.devices()[0]}  (refinement {ref}, canonical "
          f"{tuple(Wc.shape)}, {Wc.size * 4 / 2**20:.0f} MB field)")
    print(f"{'layout':>22} {'br':>5} {'ms':>7} {'GB/s':>5} {'%HBM':>5}")

    ref_out = None
    for L in (128, 256, 512, 1024, 2048):
        if n_elem % L:
            continue
        w2 = Wc.reshape(Q, n_elem // L, L)
        br = st._mix_rows_block(n_elem // L, L, Q, Q)
        if br == 0:
            print(f"{f'lanes={L}':>22} {'—':>5}  (no admissible row block)")
            continue
        for alias in (False, True):
            fn = lambda x: _mix_arm(mat, x, q=Q, br=br, alias=alias)
            out = fn(w2)
            if ref_out is None:
                ref_out = np.asarray(out).reshape(Q, -1)
            else:  # bit-identical across layouts (pure elementwise mix)
                np.testing.assert_array_equal(
                    np.asarray(out).reshape(Q, -1), ref_out
                )
            t = slope(fn, (w2,), reps=5, max_n=40)
            gbps = nbytes / t / 1e9
            tag = f"lanes={L}" + (" in-place" if alias else "")
            print(f"{tag:>22} {br:>5} {t * 1e3:>7.3f} {gbps:>5.0f} "
                  f"{100 * gbps / HBM_GBPS:>4.0f}%")


if __name__ == "__main__":
    main()
