"""Projection / distortion / interpolation tests (SURVEY.md §4.2 items 1-2)."""
import jax
import jax.numpy as jnp
import numpy as np

from rsba_tpu.geometry import (CameraModel, camera, distortion, interpolate,
                               intrinsics_vector, losses, quaternion as quat)


def _numpy_project_gs(q, c, intr, X, sign=1.0):
    """Straightforward NumPy reimplementation as oracle."""
    w, x, y, z = q
    Rm = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    Xc = Rm @ (np.asarray(X) - np.asarray(c))
    xn, yn = sign * Xc[0] / Xc[2], sign * Xc[1] / Xc[2]
    fx, fy, cx, cy, k1, k2, p1, p2, k3 = intr
    r2 = xn * xn + yn * yn
    rad = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xd = xn * rad + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * rad + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    return np.array([fx * xd + cx, fy * yd + cy])


def test_project_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    model = CameraModel(use_distortion=True)
    intr = intrinsics_vector(500.0, 510.0, 320.0, 240.0, k1=-0.1, k2=0.02,
                             p1=1e-3, p2=-5e-4, k3=1e-3)
    for _ in range(10):
        q = np.asarray(quat.random_unit(jax.random.PRNGKey(rng.randint(1 << 30)),
                                        (), jnp.float64))
        c = rng.randn(3)
        X = c + np.asarray(quat.rotate_inverse(jnp.asarray(q),
                                               jnp.asarray([0.1 * rng.randn(),
                                                            0.1 * rng.randn(),
                                                            4.0])))
        got = camera.project_global(jnp.asarray(q), jnp.asarray(c),
                                    jnp.asarray(intr), jnp.asarray(X), model)
        want = _numpy_project_gs(q, c, intr, X)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_bal_sign_convention():
    model = CameraModel(use_distortion=False, projection_sign=-1.0)
    intr = intrinsics_vector(100.0)
    q = jnp.asarray([1.0, 0, 0, 0])
    c = jnp.zeros(3)
    X = jnp.asarray([0.5, -0.25, -2.0])  # in front of a −z-looking camera
    uv = camera.project_global(q, c, intr, X, model)
    np.testing.assert_allclose(uv, [100 * 0.25, 100 * -0.125], atol=1e-12)


def test_distortion_zero_coeffs_identity():
    xy = jax.random.normal(jax.random.PRNGKey(0), (100, 2), dtype=jnp.float64)
    out = distortion.distort(xy, jnp.zeros(5))
    np.testing.assert_allclose(out, xy, atol=0)


def test_undistort_inverts_distort():
    xy = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (50, 2),
                                 dtype=jnp.float64)
    coeffs = jnp.asarray([-0.2, 0.05, 1e-3, -2e-3, 0.01])
    xyd = distortion.distort(xy, coeffs)
    back = distortion.undistort(xyd, coeffs, iters=20)
    np.testing.assert_allclose(back, xy, atol=1e-8)


def test_rs_reduces_to_gs_when_poses_equal():
    """Key consistency oracle: pose_a == pose_b ⇒ RS == GS for any t."""
    intr = intrinsics_vector(400.0, 400.0, 0, 0, k1=-0.1)
    q = quat.random_unit(jax.random.PRNGKey(2), (), jnp.float64)
    c = jnp.asarray([0.1, -0.2, 0.3])
    X = c + quat.rotate_inverse(q, jnp.asarray([0.2, 0.1, 5.0]))
    gs = camera.project_global(q, c, jnp.asarray(intr), X,
                               CameraModel(use_distortion=True))
    for mode in interpolate.ROTATION_INTERP_MODES:
        model = CameraModel(rolling_shutter=True, rotation_interp=mode)
        for t in [0.0, 0.37, 1.0]:
            rs = camera.project_rolling(q, c, q, c, jnp.asarray(intr), X,
                                        jnp.asarray(t), model)
            np.testing.assert_allclose(rs, gs, atol=1e-9, err_msg=mode)


def test_rs_t0_t1_hit_endpoint_poses():
    intr = jnp.asarray(intrinsics_vector(400.0))
    qa = quat.random_unit(jax.random.PRNGKey(3), (), jnp.float64)
    qb = quat.boxplus(qa, jnp.asarray([0.02, -0.01, 0.03]))
    ca = jnp.asarray([0.0, 0.0, 0.0])
    cb = jnp.asarray([0.1, 0.0, 0.0])
    X = jnp.asarray([0.3, -0.2, 5.0])
    for mode in interpolate.ROTATION_INTERP_MODES:
        model = CameraModel(rolling_shutter=True, rotation_interp=mode)
        np.testing.assert_allclose(
            camera.project_rolling(qa, ca, qb, cb, intr, X, 0.0, model),
            camera.project_global(qa, ca, intr, X, model), atol=1e-9)
        np.testing.assert_allclose(
            camera.project_rolling(qa, ca, qb, cb, intr, X, 1.0, model),
            camera.project_global(qb, cb, intr, X, model), atol=1e-9)


def test_interp_modes_agree_to_first_order():
    """All rotation modes agree when the two poses are close (video)."""
    qa = quat.random_unit(jax.random.PRNGKey(4), (), jnp.float64)
    qb = quat.boxplus(qa, jnp.asarray([1e-3, -2e-3, 1.5e-3]))
    for t in [0.25, 0.5, 0.9]:
        qs = interpolate.interpolate_rotation(qa, qb, t, "slerp")
        for mode in ("lerp_aa", "nlerp"):
            ql = interpolate.interpolate_rotation(qa, qb, t, mode)
            ang = jnp.linalg.norm(quat.log(quat.relative(qs, ql)))
            # agreement is second order in the pose delta (‖δ‖² ≈ 7e-6)
            assert float(ang) < 1e-6, mode


def test_nlerp_continuous_across_pi_rotation():
    """nlerp stays sane where global-aa lerp is discontinuous (angle ≈ π)."""
    axis = jnp.asarray([0.0, 1.0, 0.0])
    qa = quat.from_axis_angle((jnp.pi - 0.01) * axis)
    qb = quat.from_axis_angle(jnp.asarray(
        [0.02, jnp.pi - 0.005, 0.01]))  # just past the π boundary region
    for t in [0.0, 0.3, 0.7, 1.0]:
        qn = interpolate.interpolate_rotation(qa, qb, t, "nlerp")
        # interpolant stays within the endpoints' geodesic ball
        da = jnp.linalg.norm(quat.log(quat.relative(qa, qn)))
        db = jnp.linalg.norm(quat.log(quat.relative(qb, qn)))
        dab = jnp.linalg.norm(quat.log(quat.relative(qa, qb)))
        assert float(da) <= float(dab) + 1e-6
        assert float(db) <= float(dab) + 1e-6


def test_huber_loss_values_and_corrector():
    loss = losses.Loss("huber", scale=2.0)
    # inlier: identity
    s = jnp.asarray(1.0, dtype=jnp.float64)
    rho, r1, r2 = loss.evaluate(s)
    assert np.allclose([rho, r1, r2], [1.0, 1.0, 0.0])
    # outlier: rho = 2a√s − a²
    s = jnp.asarray(100.0, dtype=jnp.float64)
    rho, r1, r2 = loss.evaluate(s)
    assert np.allclose(rho, 2 * 2 * 10 - 4)
    assert np.allclose(r1, 2.0 / 10.0)
    # corrected residual: ‖r̃‖² ≈ ρ′·s for ρ″≤0 (pure rescale)
    r = jnp.asarray([6.0, 8.0], dtype=jnp.float64)  # ‖r‖²=100
    rt, _, rho_out = loss.correct(r, None)
    assert np.allclose(jnp.sum(rt * rt), r1 * 100.0)
    assert np.allclose(rho_out, rho)


def test_corrector_gauss_newton_equivalence():
    """½‖r̃‖² must equal ½ρ(s) in value to first order — the GN surrogate.

    For ρ″≤0 losses the corrector is r̃=√ρ′·r; check J̃ᵀr̃ = ρ′·Jᵀr
    (the robustified gradient), the identity trust-region steps rely on.
    """
    loss = losses.Loss("cauchy", scale=1.5)
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(2) * 3)
    J = jnp.asarray(rng.randn(2, 5))
    rt, Jt, rho = loss.correct(r, J)
    s = float(jnp.sum(r * r))
    _, rho1, _ = loss.evaluate(jnp.asarray(s))
    g_true = rho1 * (J.T @ r)
    g_corr = Jt.T @ rt
    np.testing.assert_allclose(g_corr, g_true, rtol=1e-10)
