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
