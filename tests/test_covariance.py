"""Covariance estimation vs dense pseudo-inverse oracle (SURVEY C27)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import SolverOptions, assembly, residuals, solve
from rsba_tpu.solver.covariance import compute_covariance


@pytest.fixture(scope="module")
def solved():
    ba = synthetic.make_ba_problem(
        n_poses=8, n_points=120, track_len=4, rolling_shutter=True,
        rotation_interp="nlerp", pixel_noise=0.5, seed=11,
        dtype=jnp.float64, pad_to=32)
    # Full 7-dof gauge: the generator fixes pose 0 (similarity gauge
    # minus scale); pin pose 1 too so H restricted to free dims is PD —
    # covariance is only defined on a fully gauge-fixed problem.
    ba.problem = ba.problem.replace(
        pose_free=ba.problem.pose_free.at[1].set(0.0))
    params, s = solve(ba.problem, ba.params0,
                      SolverOptions(linear_solver="dense_schur",
                                    max_iterations=30))
    assert s.termination == "CONVERGENCE"
    return ba, params


def test_covariance_matches_dense_inverse(solved):
    ba, params = solved
    problem = ba.problem
    cov = compute_covariance(problem, params)

    # Oracle: dense H over free tangent dims, plain inverse.
    shapes = assembly.tangent_shapes(problem, params)
    ev = residuals.evaluate(params, problem, with_jacobians=True)
    H, _ = assembly.dense_normal_equations(ev, problem, shapes)
    H = np.asarray(H)
    pose_free6 = np.repeat(np.asarray(problem.pose_free), 6)
    # Points without valid observations carry no information — exclude
    # from the oracle inverse exactly as compute_covariance pins them.
    obs = problem.obs
    counts = np.zeros(shapes.n_points)
    valid = np.asarray(obs.mask) > 0
    np.add.at(counts, np.asarray(obs.point)[valid], 1.0)
    pt_free3 = np.repeat(np.asarray(problem.point_free) * (counts >= 2), 3)
    free = np.concatenate([pose_free6, pt_free3]) > 0
    Hf = H[np.ix_(free, free)]
    Hinv = np.linalg.inv(Hf)
    full = np.zeros_like(H)
    full[np.ix_(free, free)] = Hinv

    P = shapes.n_poses
    Dc = shapes.cam_dim
    for p in [0, 3, P - 1]:
        blk = full[p * 6:(p + 1) * 6, p * 6:(p + 1) * 6]
        np.testing.assert_allclose(np.asarray(cov.pose[p]), blk,
                                   rtol=1e-6, atol=1e-12)
    for m in [0, 50, 119]:
        blk = full[Dc + m * 3:Dc + (m + 1) * 3, Dc + m * 3:Dc + (m + 1) * 3]
        np.testing.assert_allclose(np.asarray(cov.point[m]), blk,
                                   rtol=1e-6, atol=1e-12)

    # Gauge-fixed first pose: exactly zero covariance.
    np.testing.assert_array_equal(np.asarray(cov.pose[0]), 0.0)
    assert cov.sigma2_estimate > 0


def test_covariance_is_spd_on_free_blocks(solved):
    ba, params = solved
    cov = compute_covariance(ba.problem, params)
    pose = np.asarray(cov.pose[2:])          # skip gauge-fixed poses 0, 1
    assert np.all(np.diagonal(pose, axis1=-2, axis2=-1) > 0)
    np.testing.assert_allclose(pose, np.swapaxes(pose, -1, -2),
                               rtol=1e-6, atol=1e-12)
    pts = np.asarray(cov.point)
    observed = np.trace(pts, axis1=-2, axis2=-1) > 0   # unobserved → 0
    assert observed.sum() > 100
    assert np.all(np.diagonal(pts[observed], axis1=-2, axis2=-1) > 0)


def test_covariance_refuses_oversized_dense():
    ba = synthetic.make_ba_problem(
        n_poses=8, n_points=60, track_len=3, rolling_shutter=False,
        pixel_noise=0.5, seed=2, dtype=jnp.float64, pad_to=32)
    with pytest.raises(ValueError):
        compute_covariance(ba.problem, ba.params0, max_cam_dim=10)
