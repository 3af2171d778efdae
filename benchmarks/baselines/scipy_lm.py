"""CPU baseline solver: scipy.optimize.least_squares on the same problem.

Role: the judged comparison target (SURVEY.md §3.5, §6).  Ceres is NOT
installed in this environment (verified in the survey session), so the
clearly-labeled CPU stand-in is scipy's trust-region reflective / LM with
**analytic sparse Jacobians supplied by our own evaluator running on CPU**
— i.e. the baseline gets the benefit of exact derivatives and a sparse
linear solver, making the wall-clock comparison honest.

Parameterization: identical tangent space (pose ⊞, intrinsics basis,
points), applied as a delta from the initial parameters — so both solvers
minimize the same function of the same unknowns.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
import scipy.optimize
import scipy.sparse

from rsba_tpu.problem.types import POSE_DOF, Params, Problem
from rsba_tpu.solver import assembly, residuals


def solve_scipy(problem: Problem, params0: Params, max_nfev: int = 200,
                ftol: float = 1e-8, verbose: int = 0):
    """Returns (params, info dict with cost/rmse/time/nfev).

    Robustness: scipy applies its own loss to RAW residuals
    (``loss="huber", f_scale=scale``) — feeding it Triggs-corrected
    residuals would make it minimize ‖r_corrected(x)‖², which is NOT the
    robust cost and stalls far from the optimum (observed: RMSE 110 px at
    config-4 scale 0.1 in round 2).  scipy's Huber is per residual
    component while ours (like Ceres) is per 2-D residual block, so the
    objectives differ slightly in the outlier tail; the judged comparison
    quantity is the inlier reprojection RMSE, reported identically for
    both solvers.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params0 = jax.device_put(params0, cpu)
        shapes = assembly.tangent_shapes(problem, params0)
        D = shapes.total_dim
        mask = np.asarray(problem.obs.mask, dtype=bool)
        # Raw (uncorrected, masked) residuals/Jacobians: evaluate with a
        # trivial loss; scipy's `loss=` handles the robustness.
        from rsba_tpu.geometry import Loss
        problem_raw = problem.replace(loss=Loss())
        if problem.loss.kind == "trivial":
            scipy_loss, f_scale = "linear", 1.0
        elif problem.loss.kind == "huber":
            scipy_loss, f_scale = "huber", problem.loss.scale
        elif problem.loss.kind == "soft_l1":
            scipy_loss, f_scale = "soft_l1", problem.loss.scale
        elif problem.loss.kind == "cauchy":
            scipy_loss, f_scale = "cauchy", problem.loss.scale
        else:
            raise ValueError(problem.loss.kind)

        @jax.jit
        def res_fn(x):
            d_pose, d_intr, d_pt = assembly.unflatten_tangent(x, shapes)
            p = residuals.apply_tangent(params0, problem_raw, d_pose,
                                        d_intr, d_pt)
            ev = residuals.evaluate(p, problem_raw, with_jacobians=False)
            return ev.r.reshape(-1)  # raw masked residuals

        @jax.jit
        def jac_blocks(x):
            d_pose, d_intr, d_pt = assembly.unflatten_tangent(x, shapes)
            p = residuals.apply_tangent(params0, problem_raw, d_pose,
                                        d_intr, d_pt)
            ev = residuals.evaluate(p, problem_raw, with_jacobians=True)
            return ev.J_pose, ev.J_intr, ev.J_pt

        obs = problem.obs
        N = obs.n_obs
        p6 = shapes.n_poses * POSE_DOF
        kni = shapes.n_intr * shapes.ni
        pa = np.asarray(obs.pose_a)
        pb = np.asarray(obs.pose_b)
        ii = np.asarray(obs.intr_idx)
        pt = np.asarray(obs.point)

        # Column index pattern (static): per obs row → its tangent columns.
        cols_a = pa[:, None] * POSE_DOF + np.arange(POSE_DOF)[None, :]
        cols_b = pb[:, None] * POSE_DOF + np.arange(POSE_DOF)[None, :]
        col_list = [cols_a, cols_b]
        if shapes.ni > 0:
            col_list.append(p6 + ii[:, None] * shapes.ni
                            + np.arange(shapes.ni)[None, :])
        col_list.append(p6 + kni + pt[:, None] * 3 + np.arange(3)[None, :])
        cols_per_obs = np.concatenate(col_list, axis=1)       # (N, 12+ni+3)
        w = cols_per_obs.shape[1]
        rows = np.repeat(np.arange(2 * N), w)
        cols = np.tile(cols_per_obs[:, None, :], (1, 2, 1)).reshape(-1)

        def jac_fn(x):
            Jp, Ji, Jpt = jac_blocks(jnp.asarray(x))
            blocks = [np.asarray(Jp[:, :, 0, :]), np.asarray(Jp[:, :, 1, :])]
            if shapes.ni > 0:
                blocks.append(np.asarray(Ji))
            blocks.append(np.asarray(Jpt))
            data = np.concatenate(blocks, axis=2).reshape(-1)
            J = scipy.sparse.coo_matrix(
                (data, (rows, cols)), shape=(2 * N, D)).tocsr()
            return J

        x0 = np.zeros(D)
        t0 = time.perf_counter()
        result = scipy.optimize.least_squares(
            lambda x: np.asarray(res_fn(jnp.asarray(x))), x0, jac=jac_fn,
            method="trf", tr_solver="lsmr", loss=scipy_loss,
            f_scale=f_scale, x_scale="jac", ftol=ftol, xtol=1e-10,
            gtol=1e-12, max_nfev=max_nfev, verbose=verbose)
        wall = time.perf_counter() - t0

        d_pose, d_intr, d_pt = assembly.unflatten_tangent(
            jnp.asarray(result.x), shapes)
        params = residuals.apply_tangent(params0, problem, d_pose, d_intr,
                                         d_pt)
        sq = float(residuals.squared_pixel_error(params, problem))
        n_valid = float(np.sum(mask))
        # Inlier RMSE with the same gate lm.solve reports
        # (Summary.final_rmse_inlier) — the judged equal-RMSE quantity.
        from rsba_tpu.solver.lm import inlier_threshold
        sq_a, n_a, sq_in, n_in = residuals.error_stats(
            params, problem, inlier_threshold(problem))
        info = {
            "cost": float(result.cost),
            "our_cost": float(residuals.cost_only(params, problem)),
            "rmse": float(np.sqrt(sq / max(n_valid, 1.0))),
            "rmse_inlier": float(np.sqrt(float(sq_in)
                                         / max(float(n_in), 1.0))),
            "time": wall,
            "nfev": int(result.nfev),
            "njev": int(result.njev),
            "status": int(result.status),
        }
        return params, info
