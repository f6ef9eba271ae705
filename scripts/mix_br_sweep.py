"""Row-block-size sweep for the stage-mix kernel at refinement-8 shapes:
`stage_mix_canon` picks its block from a conservative 6 MB VMEM budget
(br=256 at r8 → 1 MB pipelined blocks), and the kernel measures 327 GB/s
against an 819 GB/s roof — this sweeps br to see whether bigger blocks
close the gap.  Slope-timed (scripts/mix_bench.py::slope).

Usage: python -u scripts/mix_br_sweep.py [refinement=8]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from dealii_spirk_tpu.ops.pallas import stencil as st
    from scripts.mix_bench import slope

    q = 4
    n = 2**refinement
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((q, n, n, n)), jnp.float32)
    mat = jnp.asarray(rng.standard_normal((q, q)), jnp.float32)
    n_rows = n * n
    gb = 2 * W.size * 4 / 1e9
    print(
        f"device: {jax.devices()[0]}  ({q}, {n}^3) "
        f"({W.size * 4 / 2**20:.0f} MB), logical {gb * 1e3:.0f} MB/mix"
    )

    for br in [64, 128, 256, 512, 1024, 2048]:
        if n_rows % br:
            continue
        try:
            fn = lambda w: st._stage_mix_canon(
                mat, w.reshape(q, n_rows, n), q_out=q, q_in=q, br=br,
                interpret=False,
            ).reshape(w.shape)
            max_n = 20 if W.size * 4 > 100 * 2**20 else 600
            ms = slope(fn, (W,), max_n=max_n) * 1e3
            vmem = 2 * (q + q) * br * n * 4 / 2**20
            print(
                f"br={br:5d} ({vmem:5.1f} MB pipelined): {ms:7.3f} ms  "
                f"{gb / ms * 1e3:6.0f} GB/s"
            )
        except Exception as e:
            print(f"br={br:5d}: FAILED {str(e).splitlines()[0][:80]}")


if __name__ == "__main__":
    main()
