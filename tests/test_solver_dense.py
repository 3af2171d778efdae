"""End-to-end dense LM tests + gradient checker (SURVEY.md §4.2 items 2-4)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsba_tpu.geometry import Loss
from rsba_tpu.problem import synthetic
from rsba_tpu.solver import SolverOptions, assembly, residuals, solve

sys.path.insert(0, "/root/repo")  # for benchmarks.baselines


@pytest.fixture(scope="module")
def tiny_gs():
    return synthetic.config1_gs_small(scale=0.1, seed=1)  # 5 poses, 500 pts


def test_dense_solve_reaches_noise_floor(tiny_gs):
    ba = tiny_gs
    opts = SolverOptions(linear_solver="dense", max_iterations=30)
    params, summary = solve(ba.problem, ba.params0, opts)
    assert summary.termination == "CONVERGENCE", summary.message
    # per-obs 2D RMSE floor is sqrt(2)*sigma = 0.707; BA overfits slightly
    assert summary.final_rmse < 0.75
    assert summary.final_cost < summary.initial_cost * 1e-2
    assert summary.num_successful_steps >= 2


def test_dense_solve_matches_scipy(tiny_gs):
    from benchmarks.baselines.scipy_lm import solve_scipy
    ba = tiny_gs
    opts = SolverOptions(linear_solver="dense", max_iterations=40,
                         function_tolerance=1e-10)
    _, summary = solve(ba.problem, ba.params0, opts)
    _, info = solve_scipy(ba.problem, ba.params0, max_nfev=200)
    # identical objective, both converged: costs match tightly
    assert abs(summary.final_cost - info["cost"]) / info["cost"] < 1e-3, (
        summary.final_cost, info["cost"])
    assert abs(summary.final_rmse - info["rmse"]) < 5e-3


def test_gradient_matches_finite_differences(tiny_gs):
    """GradientChecker parity (SURVEY.md §2 C25): assembled g vs FD of cost."""
    ba = tiny_gs
    problem, params = ba.problem, ba.params0
    shapes = assembly.tangent_shapes(problem, params)
    ev = residuals.evaluate(params, problem, with_jacobians=True)
    gp, gi, gpt = assembly.gradient_blocks(ev, problem, shapes)
    g = assembly.flatten_tangent(gp, gi, gpt)

    rng = np.random.RandomState(0)
    idxs = rng.choice(shapes.total_dim, size=25, replace=False)
    eps = 1e-6
    for i in idxs:
        e = jnp.zeros(shapes.total_dim).at[i].set(eps)
        def cost_at(dx):
            d_pose, d_intr, d_pt = assembly.unflatten_tangent(dx, shapes)
            p = residuals.apply_tangent(params, problem, d_pose, d_intr, d_pt)
            return float(residuals.cost_only(p, problem))
        fd = (cost_at(e) - cost_at(-e)) / (2 * eps)
        assert abs(fd - float(g[i])) <= 1e-4 * max(1.0, abs(fd)), (
            i, fd, float(g[i]))


def test_huber_downweights_outliers():
    ba = synthetic.make_ba_problem(
        n_poses=10, n_points=400, track_len=5, rolling_shutter=False,
        loss=Loss("huber", 3.0), outlier_fraction=0.05, pixel_noise=0.5,
        seed=3, name="huber_test")
    # dense_schur: same semantics as the dense path (cross-checked in
    # test_schur.py) at a fraction of the wall time on this size.
    opts = SolverOptions(linear_solver="dense_schur", max_iterations=60)
    params, summary = solve(ba.problem, ba.params0, opts)
    assert summary.termination == "CONVERGENCE"
    # The solver must at least match the robust cost at ground truth.
    gt_cost = float(residuals.cost_only(ba.params_gt, ba.problem))
    assert summary.final_cost <= gt_cost * 1.001

    def median_err(p):
        r = residuals.residuals_raw(p, ba.problem)
        e = np.linalg.norm(np.asarray(r), axis=-1)
        return float(np.median(e[np.asarray(ba.problem.obs.mask, bool)]))

    # Median (≈ inlier) reprojection error: robust solve sits at the noise
    # floor; a trivial-loss solve is dragged away by the 5% outliers.
    # (Absolute pose/point metrics are meaningless here — the scene has a
    # free gauge direction outliers can exploit.)
    params_t, _ = solve(ba.problem.replace(loss=Loss()), ba.params0, opts)
    assert median_err(params) < 1.0
    assert median_err(params_t) > 3.0 * median_err(params)


def test_resolve_from_optimum_terminates_immediately(tiny_gs):
    ba = tiny_gs
    opts = SolverOptions(linear_solver="dense", max_iterations=30)
    params, s1 = solve(ba.problem, ba.params0, opts)
    _, s2 = solve(ba.problem, params, opts)
    assert s2.termination == "CONVERGENCE"
    assert s2.num_successful_steps <= 1


def test_constant_blocks_stay_constant(tiny_gs):
    ba = tiny_gs
    problem = ba.problem.replace(
        point_free=ba.problem.point_free.at[:50].set(0.0))
    opts = SolverOptions(linear_solver="dense", max_iterations=10)
    params, _ = solve(problem, ba.params0, opts)
    np.testing.assert_array_equal(np.asarray(params.points[:50]),
                                  np.asarray(ba.params0.points[:50]))
    # pose 0 is the gauge anchor — must not move
    np.testing.assert_array_equal(np.asarray(params.q[0]),
                                  np.asarray(ba.params0.q[0]))


def test_runtime_gradient_checker():
    """SolverOptions(check_gradients=True): autodiff-vs-FD verification
    runs before the solve (Ceres check_gradients parity, SURVEY C25) and
    a corrupted Jacobian path is caught."""
    import pytest
    from rsba_tpu.problem import synthetic
    from rsba_tpu.solver import SolverOptions, solve
    from rsba_tpu.solver.gradient_check import check_gradients

    ba = synthetic.CONFIGS["rs_slerp_robust"](scale=0.02, seed=0,
                                              dtype=jnp.float64)
    report = check_gradients(ba.problem, ba.params0)
    assert report["max_relative_error"] < 1e-5
    assert report["n_checked"] == 64

    # End-to-end through the solver flag (passes and solves).
    opts = SolverOptions(linear_solver="auto", max_iterations=5,
                         check_gradients=True, device_loop="off")
    _, s = solve(ba.problem, ba.params0, opts)
    assert s.num_successful_steps >= 1

    # A mismatch must raise: check against deliberately wrong params
    # shape of tolerance — emulate by absurdly tight precision.
    with pytest.raises(ValueError, match="gradient check FAILED"):
        check_gradients(ba.problem, ba.params0, relative_precision=1e-14)
