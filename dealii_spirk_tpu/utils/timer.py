"""Named-phase wall-clock timers.

Mirrors the reference's hand-rolled phase counters (``time_total``,
``time_rhs``, ``time_outer_solver``, ``time_solution_update``, ...,
reference ``main.cc:754-760``).  Timers are cleared after the first
timestep so preconditioner setup is excluded (reference
``main.cc:971-973``).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class PhaseTimers:
    PHASES = (
        "total",
        "rhs",
        "outer_solver",
        "solution_update",
        "system_vmult",
        "preconditioner_bc",
        "preconditioner_solver",
    )

    def __init__(self) -> None:
        self.seconds = {p: 0.0 for p in self.PHASES}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0

    def clear(self) -> None:
        for p in self.seconds:
            self.seconds[p] = 0.0
