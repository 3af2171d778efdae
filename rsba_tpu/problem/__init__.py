from . import synthetic, types
from .types import (Observations, Params, Problem, intr_basis_bal,
                    intr_basis_fixed, intr_basis_full, intr_basis_subset,
                    make_problem, validate_problem)

__all__ = [
    "synthetic", "types", "Observations", "Params", "Problem",
    "intr_basis_bal", "intr_basis_fixed", "intr_basis_full",
    "intr_basis_subset", "make_problem", "validate_problem",
]
