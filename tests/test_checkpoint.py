"""Checkpoint/resume tests (SURVEY.md §5.3-5.4)."""
import jax.numpy as jnp
import numpy as np

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import lm
from rsba_tpu.solver.options import SolverOptions
from rsba_tpu.utils import SolverCheckpointer


def test_checkpoint_restart_resumes_solve(tmp_path):
    ba = synthetic.config1_gs_small(scale=0.05, dtype=jnp.float64)
    opts = SolverOptions(linear_solver="dense", max_iterations=3)

    ckpt = SolverCheckpointer(str(tmp_path / "ckpt"))
    p1, s1 = lm.solve(ba.problem, ba.params0, opts, callback=ckpt.callback)
    ckpt.wait()
    restored = ckpt.restore()
    assert restored is not None
    it0, params_r, radius = restored
    np.testing.assert_array_equal(np.asarray(params_r.points),
                                  np.asarray(p1.points))
    assert radius > 0

    # resume: continue to convergence from the checkpoint
    opts2 = SolverOptions(linear_solver="dense", max_iterations=50,
                          initial_radius=radius)
    p2, s2 = lm.solve(ba.problem, params_r, opts2)
    assert s2.termination == "CONVERGENCE", s2.message
    assert s2.final_rmse <= s1.final_rmse + 1e-9


def test_checkpoint_restart_with_banded_solver(tmp_path):
    """Checkpoint/resume through the window-native banded solver: the
    callback must receive EXTERNAL-layout params (lm.solve converts from
    the padded internal point order), and a restored checkpoint must
    resume cleanly into a fresh banded solve."""
    ba = synthetic.make_ba_problem(
        n_poses=9, n_points=140, track_len=4, rolling_shutter=True,
        rotation_interp="nlerp", pixel_noise=0.5, seed=17,
        dtype=jnp.float64, pad_to=32)
    opts = SolverOptions(linear_solver="banded_schur", max_iterations=3)

    ckpt = SolverCheckpointer(str(tmp_path / "ckpt_banded"))
    p1, s1 = lm.solve(ba.problem, ba.params0, opts, callback=ckpt.callback)
    ckpt.wait()
    restored = ckpt.restore()
    assert restored is not None
    it0, params_r, radius = restored
    # External layout: same shapes as the user-facing params, and the
    # checkpointed points equal the solve's returned (external) points.
    assert params_r.points.shape == ba.params0.points.shape
    np.testing.assert_array_equal(np.asarray(params_r.points),
                                  np.asarray(p1.points))

    opts2 = SolverOptions(linear_solver="banded_schur", max_iterations=50,
                          initial_radius=radius)
    p2, s2 = lm.solve(ba.problem, params_r, opts2)
    assert s2.termination == "CONVERGENCE", s2.message
    assert s2.final_rmse_inlier <= s1.final_rmse_inlier + 1e-9


def test_checkpoint_history_and_options_continuity(tmp_path):
    """The checkpoint persists the iteration history + options fingerprint
    (SURVEY.md §5.5): a resumed run's Summary continues the record stream
    instead of restarting from zero, and mismatched options warn."""
    import warnings
    from rsba_tpu.solver.summary import Summary

    ba = synthetic.config1_gs_small(scale=0.05, dtype=jnp.float64)
    opts = SolverOptions(linear_solver="dense", max_iterations=3)
    ckpt = SolverCheckpointer(str(tmp_path / "ck"), options=opts)
    p1, s1 = lm.solve(ba.problem, ba.params0, opts, callback=ckpt.callback)
    ckpt.wait()
    n1 = s1.num_successful_steps

    opts2 = SolverOptions(linear_solver="dense", max_iterations=50)
    ckpt2 = SolverCheckpointer(str(tmp_path / "ck"), options=opts2)
    it0, params_r, radius = ckpt2.restore()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        history = ckpt2.restore_history()
    # max_iterations changed -> fingerprint mismatch surfaces
    assert any("different solver options" in str(x.message) for x in w)
    assert len(history) == n1
    resume = Summary(iterations=list(history))
    resume.initial_cost = history[0].cost
    p2, s2 = lm.solve(
        ba.problem, params_r,
        SolverOptions(linear_solver="dense", max_iterations=50,
                      initial_radius=radius),
        callback=ckpt2.callback, summary=resume)
    assert s2.termination == "CONVERGENCE", s2.message
    # Record stream spans both runs, monotone iteration labels from 0.
    assert s2.num_iterations > n1
    assert [it.iteration for it in s2.iterations[:n1]] == list(range(n1))
    ckpt2.wait()
    h2 = SolverCheckpointer(str(tmp_path / "ck")).restore_history()
    assert len(h2) >= s2.num_successful_steps
