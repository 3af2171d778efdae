"""RS-PnP / new-frame registration (SURVEY.md §2 C19, §3.2).

Oracle: a synthetic video sequence with known ground truth; register one
frame from its 2D-3D correspondences (map points fixed) seeded with the
PREVIOUS frame's pose — the video-tracking prior — and require the
recovered keyframe pair to match ground truth.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rsba_tpu.geometry import Loss
from rsba_tpu.geometry import quaternion as quat
from rsba_tpu.problem import synthetic
from rsba_tpu.solver.pnp import register_frame


def _angle_between(q1, q2) -> float:
    """Geodesic rotation angle between two unit quaternions (rad)."""
    d = abs(float(jnp.dot(q1, q2)))
    return 2.0 * float(np.arccos(min(d, 1.0)))


@pytest.fixture(scope="module")
def seq():
    return synthetic.make_ba_problem(
        n_poses=15, n_points=400, track_len=6, rolling_shutter=True,
        rotation_interp="nlerp", use_distortion=False, pixel_noise=0.4,
        seed=7, dtype=jnp.float64, pad_to=32)


def _frame_obs(ba, k):
    """All valid observations of frame k (pose pair k, k+1)."""
    obs = ba.problem.obs
    sel = np.asarray((obs.pose_a == k) & (obs.mask > 0))
    idx = np.nonzero(sel)[0]
    pts3d = np.asarray(ba.params_gt.points)[np.asarray(obs.point)[idx]]
    uv = np.asarray(obs.uv)[idx]
    return pts3d, uv


def test_rs_pnp_registers_held_out_frame(seq):
    ba = seq
    k = 7
    W, H = ba.image_size
    pts3d, uv = _frame_obs(ba, k)
    assert pts3d.shape[0] >= 50

    # Prior: previous frame's pose (zero-velocity video-tracking seed).
    q_a, c_a, q_b, c_b, s = register_frame(
        pts3d, uv, uv[:, 1], np.asarray(ba.params_gt.intr[0]),
        ba.problem.model,
        q_prior=np.asarray(ba.params_gt.q[k - 1]),
        c_prior=np.asarray(ba.params_gt.c[k - 1]),
        image_height=H, loss=Loss("huber", 4.0), dtype=jnp.float64)

    assert s.termination == "CONVERGENCE", s.message
    assert _angle_between(q_a, ba.params_gt.q[k]) < 2e-3
    assert _angle_between(q_b, ba.params_gt.q[k + 1]) < 2e-3
    assert float(jnp.linalg.norm(c_a - ba.params_gt.c[k])) < 5e-3
    assert float(jnp.linalg.norm(c_b - ba.params_gt.c[k + 1])) < 5e-3
    # Reprojection at the recovered pose sits at the noise floor.
    assert s.final_rmse_inlier < 1.5 * ba.pixel_noise


def test_rs_pnp_robust_to_outliers(seq):
    ba = seq
    k = 5
    W, H = ba.image_size
    pts3d, uv = _frame_obs(ba, k)
    rng = np.random.RandomState(0)
    out = rng.rand(uv.shape[0]) < 0.1
    uv = uv.copy()
    uv[out, 0] = rng.rand(out.sum()) * W
    uv[out, 1] = rng.rand(out.sum()) * H

    q_a, c_a, q_b, c_b, s = register_frame(
        pts3d, uv, uv[:, 1], np.asarray(ba.params_gt.intr[0]),
        ba.problem.model,
        q_prior=np.asarray(ba.params_gt.q[k - 1]),
        c_prior=np.asarray(ba.params_gt.c[k - 1]),
        image_height=H, loss=Loss("huber", 4.0), dtype=jnp.float64)

    assert s.termination == "CONVERGENCE", s.message
    assert _angle_between(q_a, ba.params_gt.q[k]) < 5e-3
    assert float(jnp.linalg.norm(c_a - ba.params_gt.c[k])) < 1e-2


def test_gs_pnp_single_pose(seq):
    """Global shutter: one pose, q_b/c_b aliases of q_a/c_a."""
    ba = synthetic.make_ba_problem(
        n_poses=6, n_points=300, track_len=4, rolling_shutter=False,
        use_distortion=True, pixel_noise=0.4, seed=9, dtype=jnp.float64,
        pad_to=32)
    k = 3
    pts3d, uv = _frame_obs(ba, k)

    q_a, c_a, q_b, c_b, s = register_frame(
        pts3d, uv, uv[:, 1], np.asarray(ba.params_gt.intr[0]),
        ba.problem.model,
        q_prior=np.asarray(quat.boxplus(ba.params_gt.q[k],
                                        jnp.asarray([0.02, -0.01, 0.015]))),
        c_prior=np.asarray(ba.params_gt.c[k]) + 0.05,
        dtype=jnp.float64)
    assert s.termination == "CONVERGENCE", s.message
    np.testing.assert_array_equal(np.asarray(q_a), np.asarray(q_b))
    assert _angle_between(q_a, ba.params_gt.q[k]) < 2e-3
    assert float(jnp.linalg.norm(c_a - ba.params_gt.c[k])) < 5e-3


def test_pnp_rejects_degenerate_input():
    model = synthetic.CameraModel(rolling_shutter=True)
    with pytest.raises(ValueError):
        register_frame(np.zeros((2, 3)), np.zeros((2, 2)), np.zeros(2),
                       np.ones(9), model, np.array([1.0, 0, 0, 0]),
                       np.zeros(3), image_height=768)
    with pytest.raises(ValueError):
        register_frame(np.zeros((10, 3)), np.zeros((10, 2)), np.zeros(10),
                       np.ones(9), model, np.array([1.0, 0, 0, 0]),
                       np.zeros(3))  # missing image_height for RS
