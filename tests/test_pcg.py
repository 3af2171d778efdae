"""Iterative-Schur (PCG) solver tests.

Mirrors Ceres's linear-solver tests (SURVEY.md §4.1): the iterative path is
cross-checked against the dense-Schur oracle on the same problem — same
step at tight CG tolerance, same converged RMSE end-to-end.
"""
import jax.numpy as jnp
import numpy as np

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import lm
from rsba_tpu.solver.options import SolverOptions


def _tiny_rs(seed=0):
    return synthetic.make_ba_problem(
        n_poses=9, n_points=120, track_len=4, rolling_shutter=True,
        rotation_interp="slerp", use_distortion=True, pixel_noise=0.3,
        seed=seed, dtype=jnp.float64, pad_to=64)


def test_pcg_step_matches_dense_schur():
    ba = _tiny_rs()
    opts_d = SolverOptions(linear_solver="dense_schur", refinement_steps=2)
    opts_i = SolverOptions(linear_solver="iterative_schur",
                           preconditioner="schur_jacobi",
                           max_cg_iterations=500, cg_eta=1e-12)
    fns_d = lm.make_solver_fns(ba.problem, opts_d)
    fns_i = lm.make_solver_fns(ba.problem, opts_i)
    radius = jnp.asarray(1e4, jnp.float64)

    aux_d = fns_d["prepare"](ba.params0)
    aux_i = fns_i["prepare"](ba.params0)
    np.testing.assert_allclose(float(aux_d["cost"]), float(aux_i["cost"]),
                               rtol=1e-12)
    dx_d, pred_d, _ = fns_d["solve_step"](aux_d, radius)
    dx_i, pred_i, iters = fns_i["solve_step"](aux_i, radius)
    assert int(iters) > 0
    np.testing.assert_allclose(np.asarray(dx_i), np.asarray(dx_d),
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(float(pred_i), float(pred_d), rtol=1e-6)


def test_pcg_converges_to_noise_floor():
    ba = _tiny_rs(seed=3)
    opts = SolverOptions(linear_solver="iterative_schur",
                         preconditioner="schur_jacobi",
                         max_cg_iterations=200, cg_eta=1e-4,
                         max_iterations=50)
    params, summary = lm.solve(ba.problem, ba.params0, opts)
    assert summary.termination == "CONVERGENCE", summary.message
    # converged RMSE ≈ injected pixel noise
    assert summary.final_rmse < 1.5 * ba.pixel_noise
    assert summary.final_rmse < 0.25 * summary.initial_rmse


def test_pcg_jacobi_preconditioner_also_converges():
    ba = _tiny_rs(seed=5)
    opts = SolverOptions(linear_solver="iterative_schur",
                         preconditioner="jacobi",
                         max_cg_iterations=400, cg_eta=1e-4,
                         max_iterations=50)
    params, summary = lm.solve(ba.problem, ba.params0, opts)
    assert summary.termination == "CONVERGENCE", summary.message
    assert summary.final_rmse < 1.5 * ba.pixel_noise


def test_schur_jacobi_beats_jacobi_iterations():
    """The Schur-Jacobi preconditioner must reduce CG iterations (C16)."""
    ba = _tiny_rs(seed=7)
    radius = jnp.asarray(1e4, jnp.float64)
    iters = {}
    for precond in ("schur_jacobi", "jacobi"):
        opts = SolverOptions(linear_solver="iterative_schur",
                             preconditioner=precond,
                             max_cg_iterations=1000, cg_eta=1e-8)
        fns = lm.make_solver_fns(ba.problem, opts)
        aux = fns["prepare"](ba.params0)
        _, _, it = fns["solve_step"](aux, radius)
        iters[precond] = int(it)
    assert iters["schur_jacobi"] < iters["jacobi"]


def test_flat_solver_supports_cluster_jacobi():
    """cluster_jacobi on the flat path: visibility-clustered blocks
    (solver/cluster.py; round-5 — it used to be banded-only).  Full
    coverage lives in tests/test_cluster.py; here: the factory accepts
    it and one step decreases the cost."""
    import jax.numpy as jnp

    from rsba_tpu.problem import synthetic
    from rsba_tpu.solver import SolverOptions, lm

    ba = synthetic.make_ba_problem(
        n_poses=5, n_points=60, track_len=3, rolling_shutter=False,
        pixel_noise=0.5, seed=1, dtype=jnp.float64, pad_to=32)
    opts = SolverOptions(linear_solver="iterative_schur",
                         preconditioner="cluster_jacobi",
                         max_iterations=3, device_loop="off")
    _, summary = lm.solve(ba.problem, ba.params0, opts)
    assert summary.final_cost < summary.initial_cost
