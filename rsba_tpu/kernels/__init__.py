"""Pallas TPU kernels for the solver hot loops (SURVEY.md §7.1 M4)."""
