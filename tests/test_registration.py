"""Triangulation, two-view bootstrap, P3P, and RANSAC registration.

SURVEY.md §2 C19 / §3.2 (VERDICT r3 items 4-5): these are the pipeline
building blocks; each is tested against synthetic ground truth generated
with the framework's own camera model (the same oracle strategy as the
solver tests).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsba_tpu.geometry import (CameraModel, camera, epipolar, quaternion,
                               triangulate)
from rsba_tpu.solver import p3p as p3p_mod
from rsba_tpu.solver.ransac import ransac_pnp

DT = jnp.float64


def _scene(n_cams=4, n_pts=50, seed=0, distortion=False, noise=0.0):
    rng = np.random.RandomState(seed)
    model = CameraModel(rolling_shutter=False, use_distortion=distortion)
    intr = np.array([800.0, 800.0, 320.0, 240.0,
                     -0.1 if distortion else 0.0,
                     0.02 if distortion else 0.0, 0.0, 0.0, 0.0])
    # Cameras on an arc looking at the origin cloud.
    q, c = [], []
    for i in range(n_cams):
        ang = 0.25 * i
        eye = np.array([2.0 * np.sin(ang), 0.1 * i, -2.0 * np.cos(ang)])
        # look-at via two-vector frame (z towards origin)
        z = -eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)
        q.append(np.asarray(quaternion.from_matrix(jnp.asarray(R, DT))))
        c.append(eye)
    q = np.stack(q); c = np.stack(c)
    pts = rng.randn(n_pts, 3) * 0.5
    uv = np.asarray(camera.project_global(
        jnp.asarray(q, DT)[:, None], jnp.asarray(c, DT)[:, None],
        jnp.asarray(intr, DT), jnp.asarray(pts, DT)[None], model))
    uv = uv + rng.randn(*uv.shape) * noise
    return model, intr, q, c, pts, uv


# --- quaternion.from_matrix ---------------------------------------------------

def test_from_matrix_roundtrip():
    key = jax.random.PRNGKey(0)
    qs = quaternion.random_unit(key, (64,), DT)
    back = quaternion.from_matrix(quaternion.to_matrix(qs))
    # Same rotation up to the double cover.
    dot = jnp.abs(jnp.sum(qs * back, axis=-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-12)


def test_from_matrix_180deg():
    aa = jnp.asarray([np.pi, 0.0, 0.0], DT)
    q = quaternion.from_axis_angle(aa)
    back = quaternion.from_matrix(quaternion.to_matrix(q))
    assert float(jnp.abs(jnp.sum(q * back))) == pytest.approx(1.0, abs=1e-12)


# --- triangulation -------------------------------------------------------------

def test_triangulate_recovers_points():
    model, intr, q, c, pts, uv = _scene(n_cams=4, distortion=True)
    L = q.shape[0]
    M = pts.shape[0]
    qa = jnp.broadcast_to(jnp.asarray(q, DT)[None], (M, L, 4))
    ca = jnp.broadcast_to(jnp.asarray(c, DT)[None], (M, L, 3))
    X, valid = triangulate.triangulate(
        qa, ca, qa, ca, jnp.asarray(intr, DT),
        jnp.asarray(uv.transpose(1, 0, 2), DT),
        jnp.zeros((M, L), DT), jnp.ones((M, L), DT), model)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(X), pts, atol=1e-8)


def test_triangulate_flags_degenerate_and_masked():
    model, intr, q, c, pts, uv = _scene(n_cams=2)
    M = pts.shape[0]
    qa = jnp.broadcast_to(jnp.asarray(q, DT)[None], (M, 2, 4))
    ca = jnp.broadcast_to(jnp.asarray(c, DT)[None], (M, 2, 3))
    mask = jnp.ones((M, 2), DT).at[:, 1].set(0.0)   # single view
    _, valid = triangulate.triangulate(
        qa, ca, qa, ca, jnp.asarray(intr, DT),
        jnp.asarray(uv.transpose(1, 0, 2), DT),
        jnp.zeros((M, 2), DT), mask, model)
    assert not bool(jnp.any(valid))
    # Identical camera twice: parallel rays → invalid, no NaN.
    ca_same = jnp.broadcast_to(jnp.asarray(c, DT)[None, :1], (M, 2, 3))
    qa_same = jnp.broadcast_to(jnp.asarray(q, DT)[None, :1], (M, 2, 4))
    uv0 = np.stack([uv[0], uv[0]], axis=1)
    X, valid = triangulate.triangulate(
        qa_same, ca_same, qa_same, ca_same, jnp.asarray(intr, DT),
        jnp.asarray(uv0, DT), jnp.zeros((M, 2), DT),
        jnp.ones((M, 2), DT), model)
    assert not bool(jnp.any(valid))
    assert bool(jnp.all(jnp.isfinite(X)))


def test_triangulate_rolling_shutter_interpolated_pose():
    # RS observations triangulated with the interpolated-pose variant land
    # on the GT points; treating them as GS does measurably worse.
    from rsba_tpu.problem import synthetic
    ba = synthetic.CONFIGS["rs_video_linear"](scale=0.05, seed=3, dtype=DT)
    pr, gt = ba.problem, ba.params_gt
    obs = pr.obs
    m = np.asarray(obs.mask) > 0
    pid = np.asarray(obs.point)[m]
    order = np.argsort(pid, kind="stable")
    pid = pid[order]
    # Take points with >= 3 observations, pad to L views.
    counts = np.bincount(pid, minlength=gt.points.shape[0])
    sel_pts = np.nonzero(counts >= 3)[0][:40]
    L = int(counts[sel_pts].max())
    offs = np.cumsum(counts) - counts
    rows_of = {int(p): np.nonzero(m)[0][order][offs[p]:offs[p] + counts[p]]
               for p in sel_pts}

    def gather(field, p):
        a = np.asarray(field)[rows_of[p]]
        pad = np.zeros((L - a.shape[0],) + a.shape[1:], a.dtype)
        return np.concatenate([a, pad])

    qa = np.stack([np.asarray(gt.q)[gather(obs.pose_a, p).astype(int)]
                   for p in sel_pts])
    ca = np.stack([np.asarray(gt.c)[gather(obs.pose_a, p).astype(int)]
                   for p in sel_pts])
    qb = np.stack([np.asarray(gt.q)[gather(obs.pose_b, p).astype(int)]
                   for p in sel_pts])
    cb = np.stack([np.asarray(gt.c)[gather(obs.pose_b, p).astype(int)]
                   for p in sel_pts])
    uv = np.stack([gather(obs.uv, p) for p in sel_pts])
    t = np.stack([gather(obs.t, p) for p in sel_pts])
    mask = np.stack([np.concatenate([np.ones(counts[p]),
                                     np.zeros(L - counts[p])])
                     for p in sel_pts])
    args = (jnp.asarray(qa, DT), jnp.asarray(ca, DT), jnp.asarray(qb, DT),
            jnp.asarray(cb, DT), jnp.asarray(gt.intr[0], DT),
            jnp.asarray(uv, DT), jnp.asarray(t, DT), jnp.asarray(mask, DT))
    X_rs, valid = triangulate.triangulate(*args, pr.model)
    gs = CameraModel(rolling_shutter=False,
                     use_distortion=pr.model.use_distortion)
    X_gs, _ = triangulate.triangulate(*args, gs)
    gt_pts = np.asarray(gt.points)[sel_pts]
    ok = np.asarray(valid)
    assert ok.mean() > 0.9
    err_rs = np.linalg.norm(np.asarray(X_rs)[ok] - gt_pts[ok], axis=1)
    err_gs = np.linalg.norm(np.asarray(X_gs)[ok] - gt_pts[ok], axis=1)
    # Noise-limited accuracy, and clearly better than ignoring the RS warp
    # (the injected noise is 0.5 px; the RS warp is several px).
    assert np.median(err_rs) < 0.5 * np.median(err_gs)


# --- two-view bootstrap --------------------------------------------------------

def test_two_view_init_recovers_relative_pose():
    model, intr, q, c, pts, uv = _scene(n_cams=2, n_pts=60, noise=0.2)
    # Express GT in camera-1 coordinates (the bootstrap's frame).
    q1, c1 = jnp.asarray(q[0], DT), jnp.asarray(c[0], DT)
    q2, c2, X, good, quality = epipolar.two_view_init(
        jnp.asarray(uv[0], DT), jnp.asarray(uv[1], DT),
        jnp.asarray(intr, DT), jnp.ones((uv.shape[1],), DT), model)
    assert float(quality) > 0.9
    # GT relative pose, scaled to the unit-baseline gauge.
    q_rel = quaternion.multiply(jnp.asarray(q[1], DT),
                                quaternion.conjugate(q1))
    c_rel = quaternion.rotate(q1, jnp.asarray(c[1], DT) - c1)
    scale = float(jnp.linalg.norm(c_rel))
    dot = float(jnp.abs(jnp.sum(q2 * q_rel)))
    assert dot > 1.0 - 1e-4
    np.testing.assert_allclose(np.asarray(c2),
                               np.asarray(c_rel) / scale, atol=2e-3)
    # Triangulated structure matches GT (camera-1 frame, same scale).
    gt_c1 = np.asarray(quaternion.rotate(
        q1, jnp.asarray(pts, DT) - c1)) / scale
    ok = np.asarray(good)
    assert ok.mean() > 0.9
    err = np.linalg.norm(np.asarray(X)[ok] - gt_c1[ok], axis=1)
    assert np.median(err) < 0.02


# --- P3P ------------------------------------------------------------------------

def test_quartic_solver_known_roots():
    rng = np.random.RandomState(1)
    true = rng.randn(128, 4)
    c4 = np.ones(128)
    c3 = -true.sum(axis=1)
    c2 = (true[:, 0] * true[:, 1] + true[:, 0] * true[:, 2]
          + true[:, 0] * true[:, 3] + true[:, 1] * true[:, 2]
          + true[:, 1] * true[:, 3] + true[:, 2] * true[:, 3])
    c1 = -(true[:, 0] * true[:, 1] * true[:, 2]
           + true[:, 0] * true[:, 1] * true[:, 3]
           + true[:, 0] * true[:, 2] * true[:, 3]
           + true[:, 1] * true[:, 2] * true[:, 3])
    c0 = true.prod(axis=1)
    roots = p3p_mod.solve_quartic_roots(*(jnp.asarray(x, DT)
                                          for x in (c4, c3, c2, c1, c0)))
    roots = p3p_mod._polish_roots(*(jnp.asarray(x, DT)
                                    for x in (c4, c3, c2, c1, c0)), roots)
    r = np.sort(np.real(np.asarray(roots)), axis=1)
    np.testing.assert_allclose(r, np.sort(true, axis=1), atol=1e-7)
    assert np.abs(np.imag(np.asarray(roots))).max() < 1e-7


def test_p3p_recovers_pose():
    rng = np.random.RandomState(7)
    n = 64
    key = jax.random.PRNGKey(3)
    q_gt = quaternion.random_unit(key, (n,), DT)
    c_gt = jnp.asarray(rng.randn(n, 3), DT)
    # Points in front of each camera: backproject random pixels at random
    # positive depths.
    depths = jnp.asarray(rng.uniform(2.0, 6.0, (n, 3)), DT)
    dirs = jnp.asarray(rng.randn(n, 3, 3), DT)
    dirs = dirs.at[..., 2].set(jnp.abs(dirs[..., 2]) + 1.0)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    X = c_gt[:, None, :] + quaternion.rotate_inverse(
        q_gt[:, None, :], depths[..., None] * dirs)
    q, c, valid = p3p_mod.p3p(dirs, X)
    assert bool(jnp.all(jnp.any(valid, axis=-1)))
    # At least one of the ≤4 solutions matches GT.
    dq = jnp.abs(jnp.sum(q * q_gt[:, None, :], axis=-1))
    dc = jnp.linalg.norm(c - c_gt[:, None, :], axis=-1)
    hit = valid & (dq > 1.0 - 1e-6) & (dc < 1e-5)
    assert bool(jnp.all(jnp.any(hit, axis=-1)))


# --- RANSAC registration --------------------------------------------------------

def test_ransac_pnp_40pct_outliers_no_prior():
    model, intr, q, c, pts, uv = _scene(n_cams=1, n_pts=200, seed=5,
                                        distortion=True, noise=0.5)
    rng = np.random.RandomState(9)
    uv1 = uv[0].copy()
    out = rng.rand(uv1.shape[0]) < 0.4
    uv1[out] = rng.uniform(0, 640, size=(out.sum(), 2))
    q_a, c_a, _, _, inliers, info = ransac_pnp(
        pts, uv1, intr, model, n_hypotheses=256, inlier_threshold=4.0,
        seed=0)
    assert info["num_inliers"] >= 0.9 * (~out).sum()
    dq = float(jnp.abs(jnp.sum(q_a * jnp.asarray(q[0], DT))))
    assert dq > 1.0 - 1e-5
    np.testing.assert_allclose(np.asarray(c_a), c[0], atol=5e-3)
    # Recovered inliers should overwhelmingly be true inliers.
    assert (inliers & out).sum() <= 0.05 * out.sum()


def test_ransac_pnp_fails_cleanly_on_garbage():
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3)
    uv = rng.uniform(0, 640, (50, 2))
    intr = np.array([800.0, 800, 320, 240, 0, 0, 0, 0, 0])
    with pytest.raises(ValueError, match="RANSAC failed"):
        ransac_pnp(pts, uv, intr, CameraModel(), n_hypotheses=64,
                   inlier_threshold=2.0, min_inliers=25, seed=1)
