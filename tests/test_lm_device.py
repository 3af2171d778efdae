"""On-device LM loop (solver/lm_device.py) vs the host driver.

The device loop must reproduce the host loop's trust-region trajectory —
same accepted/rejected sequence, same termination, same final cost — since
both implement the identical Ceres LM semantics (SURVEY.md §2 C17); the
device loop merely moves the control flow into one lax.while_loop dispatch.
"""
import jax.numpy as jnp
import pytest

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import SolverOptions, solve


def _solve(dl, **kw):
    ba = synthetic.CONFIGS["rs_slerp_robust"](scale=0.02, seed=0,
                                              dtype=jnp.float64)
    opts = SolverOptions(linear_solver="auto", max_iterations=40,
                         device_loop=dl, **kw)
    return solve(ba.problem, ba.params0, opts)


def test_device_loop_matches_host_loop():
    p_host, s_host = _solve("off")
    p_dev, s_dev = _solve("auto")
    assert s_dev.evaluator.endswith("+device_loop")
    assert s_host.termination == s_dev.termination == "CONVERGENCE"
    assert s_host.num_iterations == s_dev.num_iterations
    assert s_host.num_successful_steps == s_dev.num_successful_steps
    assert s_host.num_unsuccessful_steps == s_dev.num_unsuccessful_steps
    assert s_dev.final_cost == pytest.approx(s_host.final_cost, rel=1e-9)
    assert s_dev.final_rmse_inlier == pytest.approx(
        s_host.final_rmse_inlier, rel=1e-9)
    # Per-attempt records mirror the host IterationSummary sequence.
    for a, b in zip(s_host.iterations, s_dev.iterations):
        assert a.accepted == b.accepted
        assert a.cost == pytest.approx(b.cost, rel=1e-9)
        assert a.trust_region_radius == pytest.approx(
            b.trust_region_radius, rel=1e-6)


def test_device_loop_blocks_fire_callback():
    seen = []
    ba = synthetic.CONFIGS["rs_video_linear"](scale=0.05, seed=0,
                                              dtype=jnp.float64)
    opts = SolverOptions(linear_solver="auto", max_iterations=8,
                         device_loop="auto", device_block_iters=1,
                         function_tolerance=0.0, gradient_tolerance=0.0,
                         parameter_tolerance=0.0)
    params, s = solve(ba.problem, ba.params0, opts,
                      callback=lambda i, p, it: seen.append((i, it.cost)))
    # One callback per block that contained an accepted step; iteration
    # labels strictly increase and the params argument is usable.
    assert len(seen) >= 2
    assert [i for i, _ in seen] == sorted({i for i, _ in seen})


def test_device_loop_on_requires_raw_engine():
    # Dogleg keeps the host loop (its radius rules differ); device_loop
    # "on" must refuse rather than silently use LM rules.
    ba = synthetic.CONFIGS["gs_small"](scale=0.2, seed=0,
                                       dtype=jnp.float64)
    opts = SolverOptions(linear_solver="dense", device_loop="on",
                         trust_region_strategy="dogleg")
    with pytest.raises(ValueError, match="device_loop"):
        solve(ba.problem, ba.params0, opts)


def test_device_loop_flat_engines_match_host():
    ba = synthetic.CONFIGS["gs_small"](scale=0.2, seed=0,
                                       dtype=jnp.float64)
    outs = {}
    for dl in ("off", "on"):
        opts = SolverOptions(linear_solver="dense", max_iterations=30,
                             device_loop=dl)
        _, outs[dl] = solve(ba.problem, ba.params0, opts)
    assert outs["on"].evaluator.endswith("+device_loop")
    assert outs["off"].termination == outs["on"].termination
    assert outs["off"].num_iterations == outs["on"].num_iterations
    assert outs["on"].final_cost == pytest.approx(outs["off"].final_cost,
                                                  rel=1e-9)


def test_device_loop_respects_max_iterations():
    ba = synthetic.CONFIGS["rs_video_linear"](scale=0.05, seed=0,
                                              dtype=jnp.float64)
    opts = SolverOptions(linear_solver="auto", max_iterations=3,
                         device_loop="auto",
                         function_tolerance=0.0, gradient_tolerance=0.0,
                         parameter_tolerance=0.0)
    _, s = solve(ba.problem, ba.params0, opts)
    assert s.termination == "NO_CONVERGENCE"
    assert s.num_successful_steps + s.num_unsuccessful_steps <= 12
    assert sum(it.accepted for it in s.iterations) <= 3
