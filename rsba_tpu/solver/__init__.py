from . import assembly, residuals
from .lm import solve
from .options import SolverOptions
from .summary import IterationSummary, Summary

__all__ = ["assembly", "residuals", "solve", "SolverOptions",
           "IterationSummary", "Summary"]
