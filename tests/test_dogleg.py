"""Dogleg trust-region strategy (solver/dogleg.py) — SURVEY.md §2 C17.

Parity oracle (VERDICT r3 item 8): dogleg and LM share the same fixed
points — on configs 1-2 both must converge to the same final RMSE with a
comparable iteration count.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import SolverOptions, solve


@pytest.mark.parametrize("name,scale,solver", [
    ("gs_small", 0.2, "dense"),
    ("gs_bal", 0.05, "dense_schur"),
])
def test_dogleg_matches_lm(name, scale, solver):
    ba = synthetic.CONFIGS[name](scale=scale, seed=0, dtype=jnp.float64)
    # device_loop="off" for the LM reference: the comparison is between
    # trust-region strategies, and skipping the whole-loop compile keeps
    # this parity test fast.
    p_lm, s_lm = solve(ba.problem, ba.params0,
                       SolverOptions(linear_solver=solver,
                                     max_iterations=40,
                                     device_loop="off"))
    p_dl, s_dl = solve(ba.problem, ba.params0,
                       SolverOptions(linear_solver=solver,
                                     trust_region_strategy="dogleg",
                                     max_iterations=40))
    assert s_dl.evaluator == "xla-flat-dogleg"
    assert s_lm.termination == "CONVERGENCE", s_lm.message
    assert s_dl.termination == "CONVERGENCE", s_dl.message
    # Same optimum.
    assert s_dl.final_rmse_inlier == pytest.approx(
        s_lm.final_rmse_inlier, rel=1e-3)
    assert s_dl.final_cost == pytest.approx(s_lm.final_cost, rel=1e-4)
    # Comparable effort (dogleg typically needs no more outer iterations;
    # allow 2x either way).
    assert s_dl.num_iterations <= 2 * s_lm.num_iterations + 5


def test_dogleg_cheap_retries_reuse_factorization():
    """Rejected dogleg steps must not re-factorize: force a tiny initial
    radius so the first accepted step follows several blends."""
    ba = synthetic.CONFIGS["gs_small"](scale=0.1, seed=1, dtype=jnp.float64)
    opts = SolverOptions(linear_solver="dense",
                         trust_region_strategy="dogleg",
                         initial_radius=1e-4, max_iterations=40)
    params, s = solve(ba.problem, ba.params0, opts)
    assert s.termination == "CONVERGENCE", s.message
    assert s.final_rmse_inlier < 1.7 * ba.pixel_noise


def test_dogleg_rejects_inexact_solvers():
    ba = synthetic.CONFIGS["gs_small"](scale=0.2, seed=0, dtype=jnp.float64)
    opts = SolverOptions(linear_solver="iterative_schur",
                         trust_region_strategy="dogleg")
    with pytest.raises(ValueError, match="exact step"):
        solve(ba.problem, ba.params0, opts)


def test_dogleg_step_geometry():
    """Unit geometry: GN inside the radius → GN step; tiny radius → the
    scaled Cauchy direction (parallel to −g)."""
    from rsba_tpu.solver.dogleg import make_dogleg_solver
    ba = synthetic.CONFIGS["gs_small"](scale=0.06, seed=2, dtype=jnp.float64)
    opts = SolverOptions(linear_solver="dense")
    prepare, solve_step = make_dogleg_solver(
        ba.problem, SolverOptions(linear_solver="dense",
                                  trust_region_strategy="dogleg"))
    aux = prepare(ba.params0)
    n_gn = float(jnp.linalg.norm(aux["dx_gn"]))
    dx, pred, _ = solve_step(aux, jnp.asarray(10.0 * n_gn, jnp.float64))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(aux["dx_gn"]))
    assert float(pred) > 0
    tiny = 1e-6 * n_gn
    dx2, pred2, _ = solve_step(aux, jnp.asarray(tiny, jnp.float64))
    g = np.asarray(aux["g_flat"])
    cos = -np.dot(np.asarray(dx2), g) / (
        np.linalg.norm(dx2) * np.linalg.norm(g))
    assert cos == pytest.approx(1.0, abs=1e-8)
    assert np.linalg.norm(dx2) == pytest.approx(tiny, rel=1e-6)
    assert float(pred2) > 0
