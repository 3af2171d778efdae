"""Fused Pallas kernel (interpret mode) vs the XLA window engine.

The kernel's plane-form geometry chain and in-VMEM assembly must reproduce
solver/banded.py's evaluate+assemble (itself tested against the flat/dense
oracle) to f64 round-off.  Runs on CPU via Pallas interpreter mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import banded, banded_tpu, lm, window
from rsba_tpu.solver.options import SolverOptions


@pytest.fixture(scope="module", params=["rs_slerp", "rs_nlerp", "gs"])
def ba(request):
    if request.param == "rs_slerp":
        return synthetic.make_ba_problem(
            n_poses=11, n_points=120, track_len=4, rolling_shutter=True,
            rotation_interp="slerp", use_distortion=True,
            loss=synthetic.Loss("huber", 4.0), pixel_noise=0.5, seed=3,
            dtype=jnp.float64, pad_to=32)
    if request.param == "rs_nlerp":
        return synthetic.make_ba_problem(
            n_poses=9, n_points=96, track_len=3, rolling_shutter=True,
            rotation_interp="nlerp", use_distortion=False,
            pixel_noise=0.5, seed=5, dtype=jnp.float64, pad_to=32)
    return synthetic.make_ba_problem(
        n_poses=9, n_points=96, track_len=3, rolling_shutter=False,
        use_distortion=True, pixel_noise=0.5, seed=4, dtype=jnp.float64,
        pad_to=32)


@pytest.fixture(scope="module")
def plan(ba):
    p = window.build_window_plan(ba.problem)
    assert p is not None
    return p


def _close(a, b, **kw):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), **kw)


def test_kernel_matches_xla_assembly(ba, plan):
    opts = SolverOptions()
    params_v1 = banded.to_internal(ba.params0, plan)
    ev = banded.evaluate(params_v1, plan, ba.problem)
    a = banded.assemble(ev, plan)

    params_pl = banded_tpu.to_internal(ba.params0, plan)
    aux = banded_tpu.prepare(plan, ba.problem,
                             SolverOptions(jacobi_scaling=False),
                             params_pl, interpret=True)

    _close(aux["cost"], ev.cost, rtol=1e-12)
    _close(aux["g_cam"], a.g_cam, rtol=1e-9, atol=1e-9)
    _close(aux["B0"], a.B_band[:, 0], rtol=1e-9, atol=1e-9)
    if plan.W > 1:
        _close(aux["B1"], a.B_band[:, 1], rtol=1e-9, atol=1e-9)
    # planes → window layout for per-point quantities
    _close(aux["g_pt"].transpose(0, 2, 1), a.g_pt, rtol=1e-9, atol=1e-9)
    C_full = banded_tpu._sym_full(aux["c6"])         # (NR,3,3,G)
    _close(C_full.transpose(0, 3, 1, 2), a.C, rtol=1e-9, atol=1e-9)
    F5 = aux["F"].reshape(plan.NR, plan.W, 6, 3, plan.G)
    _close(F5.transpose(0, 4, 1, 2, 3), a.F, rtol=1e-9, atol=1e-9)


def test_tpu_solve_step_matches_xla(ba, plan):
    opts = SolverOptions(max_cg_iterations=500, cg_eta=1e-12)
    fns_pl = banded_tpu.make_tpu_solver_fns(ba.problem, plan, opts,
                                            interpret=True)
    fns_w = banded.make_window_solver_fns(ba.problem, plan, opts)

    p_pl = fns_pl["to_internal"](ba.params0)
    p_w = fns_w["to_internal"](ba.params0)
    aux_pl = fns_pl["prepare"](p_pl)
    aux_w = fns_w["prepare"](p_w)
    _close(aux_pl["cost"], aux_w["cost"], rtol=1e-12)
    _close(aux_pl["gradient_max_norm"], aux_w["gradient_max_norm"],
           rtol=1e-9)

    radius = jnp.asarray(1e4, jnp.float64)
    dx_pl, pred_pl, _ = fns_pl["solve_step"](aux_pl, radius)
    dx_w, pred_w, _ = fns_w["solve_step"](aux_w, radius)
    _close(dx_pl["pose"], dx_w["pose"], rtol=1e-6, atol=1e-12)
    _close(dx_pl["pt"].transpose(0, 2, 1).reshape(-1, 3),
           dx_w["pt"].reshape(-1, 3), rtol=1e-6, atol=1e-12)
    _close(pred_pl, pred_w, rtol=1e-8)


def test_tpu_full_solve_converges(ba, plan):
    opts = SolverOptions(linear_solver="banded_schur", evaluator="pallas",
                         max_iterations=30)
    fns = banded_tpu.make_tpu_solver_fns(ba.problem, plan, opts,
                                         interpret=True)
    params, summary = lm.solve(ba.problem, ba.params0, opts, fns=fns)
    assert summary.termination == "CONVERGENCE"
    assert params.points.shape == ba.params0.points.shape

    opts_w = SolverOptions(linear_solver="banded_schur", evaluator="xla",
                           max_iterations=30)
    _, summary_w = lm.solve(ba.problem, ba.params0, opts_w)
    assert abs(summary.final_rmse_inlier
               - summary_w.final_rmse_inlier) < 0.02
