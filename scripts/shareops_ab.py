"""Within-run A/B: Aop/Mop as shared jit sub-computations (share_ops,
the compile-cap workaround that keeps ONE copy of the V-cycle machinery
in the XLA program) vs fully inlined at the gmres call sites.  The call
boundaries block fusion at the Mop edges (~5 ms/step at refinement 7,
an estimated ~25 ms of the refinement-8 step); the cap pressure came
from embedded table constants, which now ride as jit arguments — this
checks whether the inlined program compiles and how much the
boundaries actually cost end-to-end.

Usage: python -u scripts/shareops_ab.py [refinement=8] [scheme=irk_batched]
Not part of the test suite — a perf-engineering tool.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402


def main():
    refinement = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scheme = sys.argv[2] if len(sys.argv) > 2 else "irk_batched"
    from bench import _time_scheme

    print(f"device: {jax.devices()[0]}  ({scheme}, refinement {refinement})")

    os.environ["SPIRK_SHARE_OPS"] = "1"
    t_sh, n_sh, _, _err = _time_scheme(scheme, refinement)
    print(f"shared  Aop/Mop: {t_sh * 1e3:8.2f} ms/step ({n_sh} outer)")

    os.environ["SPIRK_SHARE_OPS"] = "0"
    t_in, n_in, _, _err = _time_scheme(scheme, refinement)
    print(f"inlined Aop/Mop: {t_in * 1e3:8.2f} ms/step ({n_in} outer)")
    assert n_sh == n_in, (n_sh, n_in)
    print(f"-> inlined is {t_sh / t_in:.2f}x; "
          f"saves {(t_sh - t_in) * 1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
