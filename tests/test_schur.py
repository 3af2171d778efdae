"""Schur path tests: eliminator cross-check vs dense oracle + config 2.

Mirrors Ceres's ``schur_eliminator_test`` strategy (SURVEY.md §4.1): the
eliminated/reduced solve must produce the same step as the explicit dense
normal equations on the same problem.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import (SolverOptions, assembly, residuals, schur,
                             solve)


@pytest.fixture(scope="module")
def tiny_gs():
    return synthetic.config1_gs_small(scale=0.1, seed=1)


@pytest.fixture(scope="module")
def tiny_bal():
    # GS + distortion + per-camera [f,k1,k2] intrinsics, BAL-style.
    # Small enough that the dense oracle (explicit J) stays cheap.
    return synthetic.make_ba_problem(
        n_poses=6, n_points=300, track_len=6, rolling_shutter=False,
        use_distortion=True, per_camera_intrinsics=True,
        optimize_intrinsics=True, pixel_noise=0.5, seed=2, name="tiny_bal")


def _dense_step(problem, params, radius, options):
    from rsba_tpu.solver.dense import make_dense_solver
    prepare, solve_step = make_dense_solver(problem, options)
    aux = prepare(params)
    dx, pred, _ = solve_step(aux, jnp.asarray(radius, jnp.float64))
    return np.asarray(dx), float(pred)


def _schur_step(problem, params, radius, options):
    prepare, solve_step = schur.make_dense_schur_solver(problem, options)
    aux = prepare(params)
    dx, pred, _ = solve_step(aux, jnp.asarray(radius, jnp.float64))
    return np.asarray(dx), float(pred)


@pytest.mark.parametrize("ba_name", ["tiny_gs", "tiny_bal"])
def test_schur_step_equals_dense_step(ba_name, request):
    """The Schur-eliminated step must equal the full dense LM step."""
    ba = request.getfixturevalue(ba_name)
    opts = SolverOptions(refinement_steps=2)
    for radius in [1e4, 1.0]:
        dx_d, pred_d = _dense_step(ba.problem, ba.params0, radius, opts)
        dx_s, pred_s = _schur_step(ba.problem, ba.params0, radius, opts)
        scale = np.linalg.norm(dx_d)
        np.testing.assert_allclose(dx_s, dx_d, atol=1e-8 * max(scale, 1.0),
                                   rtol=1e-6)
        np.testing.assert_allclose(pred_s, pred_d, rtol=1e-8)


def test_schur_solve_config2_converges(tiny_bal):
    ba = tiny_bal
    opts = SolverOptions(linear_solver="dense_schur", max_iterations=50)
    params, summary = solve(ba.problem, ba.params0, opts)
    assert summary.termination == "CONVERGENCE", summary.message
    assert summary.final_rmse < 0.75, summary.final_rmse
    # intrinsics were perturbed by ~1%; must recover most of it (focal is
    # weakly observable on a 6-camera scene — 0.5% is a real recovery)
    f_err = np.abs(np.asarray(params.intr[:, 0] - ba.params_gt.intr[:, 0]))
    assert np.median(f_err / np.asarray(ba.params_gt.intr[:, 0])) < 5e-3


def test_schur_solve_matches_dense_solve(tiny_gs):
    ba = tiny_gs
    p_d, s_d = solve(ba.problem, ba.params0,
                     SolverOptions(linear_solver="dense", max_iterations=30))
    p_s, s_s = solve(ba.problem, ba.params0,
                     SolverOptions(linear_solver="dense_schur",
                                   max_iterations=30))
    assert abs(s_s.final_cost - s_d.final_cost) / s_d.final_cost < 1e-6


def test_gn_hessian_apply_matches_dense(tiny_bal):
    """Matrix-free J̃ᵀJ̃x == dense (J̃ᵀJ̃)x — PCG building block."""
    ba = tiny_bal
    problem, params = ba.problem, ba.params0
    shapes = assembly.tangent_shapes(problem, params)
    ev = residuals.evaluate(params, problem, with_jacobians=True)
    H, _ = assembly.dense_normal_equations(ev, problem, shapes)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(shapes.total_dim))
    want = np.asarray(H @ x)
    Dc = shapes.cam_dim
    hx_cam, hx_pt = schur.gn_hessian_apply(
        ev, problem, shapes, x[:Dc], x[Dc:].reshape(shapes.n_points, 3))
    got = np.concatenate([np.asarray(hx_cam), np.asarray(hx_pt).reshape(-1)])
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8 *
                               max(1.0, np.abs(want).max()))
