from .table import ConvergenceTable
from .timer import PhaseTimers

__all__ = ["ConvergenceTable", "PhaseTimers"]
