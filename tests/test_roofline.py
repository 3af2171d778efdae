"""utils.roofline: phase reports carry XLA cost-model placement."""
import jax.numpy as jnp

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import SolverOptions, lm
from rsba_tpu.utils import roofline


def test_solver_report_structure():
    ba = synthetic.make_ba_problem(
        n_poses=9, n_points=120, track_len=4, rolling_shutter=True,
        rotation_interp="nlerp", pixel_noise=0.5, seed=5,
        dtype=jnp.float64, pad_to=32)
    fns = lm.make_solver_fns(ba.problem,
                             SolverOptions(linear_solver="banded_schur"))
    rr = roofline.solver_report(fns, ba.params0, 1e4, repeats=1)
    for phase in ("prepare", "solve_step", "iteration"):
        assert rr[phase]["time_s"] > 0
    # XLA's CPU backend provides cost analysis too — check the roofline
    # fields when present (they are on this backend).
    prep = rr["prepare"]
    if "flops" in prep:
        assert prep["flops"] > 0 and prep["bytes"] > 0
        assert 0 <= prep["mfu"]
        assert prep["bound"] in ("compute", "memory")
        assert prep["roofline_util"] > 0


def test_phase_report_without_jitted_attr():
    """Callables without _jitted still get timed (no cost analysis)."""
    import jax.numpy as jnp

    def f(x):
        return jnp.sum(x * x)

    rec = roofline.phase_report(f, (jnp.ones((64,)),), repeats=1)
    assert rec["time_s"] > 0
    assert "flops" not in rec
