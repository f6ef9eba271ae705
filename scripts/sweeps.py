#!/usr/bin/env python3
"""Parameter-sweep generators, mirroring the reference's scripts/ tooling
(reference ``scripts/parameters_all_q.py``, ``parameters_p.py``,
``parameters_dt.py``, ``parameters_tolerance.py``, ``parameters_vt.py``,
``small_scaling.py``, ``large_scaling.py``).

Each subcommand writes numbered ``input_NNNN.json`` files into the current
directory, starting from scripts/default.json, to be consumed as

    python -m dealii_spirk_tpu --dim 3 input_*.json

Subcommands map one-to-one onto the paper's experiment sections (see
reference ``experiments-skx/README.MD``):

    all_q       refinements 3..19 x q in {2,4,6,8} x all 7 IRK schemes
    q           refinements 3..19 x q in {2,4,6,8}, irk vs spirk
    p           FE degree 1..4
    dt          time-step sizes 1e-3 .. 1e+1
    tolerance   inner tolerances {0, 1e-1 .. 1e-4}
    vt          virtual-topology variants (row/column-major, sm)
    small       strong scaling via MaxRanks caps
    large       weak scaling q in {2,4,9}
"""

from __future__ import annotations

import argparse
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

ALL_SCHEMES = (
    "irk",
    "spirk",
    "irk_batched",
    "complex_irk",
    "complex_spirk",
    "complex_irk_batched",
    "complex_spirk_batched",
)


def _default() -> dict:
    with open(os.path.join(HERE, "default.json")) as f:
        return json.load(f)


class Writer:
    def __init__(self, outdir: str = "."):
        self.counter = 0
        self.outdir = outdir

    def write(self, **overrides) -> None:
        data = _default()
        data.update(overrides)
        if str(data["TimeIntegrationScheme"]).startswith("complex_"):
            data["InnerTolerance"] = 0.0
        path = os.path.join(
            self.outdir, f"input_{str(self.counter).zfill(4)}.json"
        )
        with open(path, "w") as f:
            json.dump(data, f, indent=4, separators=(",", ": "))
        self.counter += 1


def sweep_all_q(w: Writer) -> None:
    for n_refinements in range(3, 20):
        for n_stages in (2, 4, 6, 8):
            for scheme in ALL_SCHEMES:
                w.write(
                    NRefinements=n_refinements,
                    TimeIntegrationScheme=scheme,
                    IRKStages=n_stages,
                )


def sweep_q(w: Writer) -> None:
    for n_refinements in range(3, 20):
        for n_stages in (2, 4, 6, 8):
            for scheme in ("irk", "spirk"):
                w.write(
                    NRefinements=n_refinements,
                    TimeIntegrationScheme=scheme,
                    IRKStages=n_stages,
                )


def sweep_p(w: Writer) -> None:
    for degree in (1, 2, 3, 4):
        for scheme in ("irk", "spirk"):
            w.write(FEDegree=degree, TimeIntegrationScheme=scheme)


def sweep_dt(w: Writer) -> None:
    for dt in (1e-3, 1e-2, 1e-1, 1e0, 1e1):
        for scheme in ("irk", "spirk"):
            w.write(
                TimeStepSize=dt,
                EndTime=10 * dt,
                TimeIntegrationScheme=scheme,
            )


def sweep_tolerance(w: Writer) -> None:
    for tol in (0.0, 1e-1, 1e-2, 1e-3, 1e-4):
        for scheme in ("irk", "spirk"):
            w.write(InnerTolerance=tol, TimeIntegrationScheme=scheme)


def sweep_vt(w: Writer) -> None:
    for do_row_major, use_sm, padding in (
        (True, False, -1),
        (True, True, 0),
        (False, False, -1),
    ):
        w.write(
            TimeIntegrationScheme="spirk",
            DoRowMajor=do_row_major,
            UseSharedMemory=use_sm,
            Padding=padding,
        )


def sweep_small(w: Writer) -> None:
    for max_ranks in (1, 2, 4, 8, 16, 32, 64):
        for scheme in ("irk", "spirk"):
            w.write(MaxRanks=max_ranks, TimeIntegrationScheme=scheme)


def sweep_large(w: Writer) -> None:
    for n_stages, refinement in ((2, 7), (4, 8), (9, 9)):
        w.write(
            TimeIntegrationScheme="spirk",
            IRKStages=n_stages,
            NRefinements=refinement,
        )


SWEEPS = {
    "all_q": sweep_all_q,
    "q": sweep_q,
    "p": sweep_p,
    "dt": sweep_dt,
    "tolerance": sweep_tolerance,
    "vt": sweep_vt,
    "small": sweep_small,
    "large": sweep_large,
}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("sweep", choices=sorted(SWEEPS))
    parser.add_argument("--outdir", default=".")
    args = parser.parse_args()
    w = Writer(args.outdir)
    SWEEPS[args.sweep](w)
    print(f"wrote {w.counter} config files")


if __name__ == "__main__":
    main()
