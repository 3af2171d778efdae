"""fcf_band_planes timing at config-5 scale (warm)."""
import time

import jax
import jax.numpy as jnp

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import banded_tpu, lm, window
from rsba_tpu.solver.options import SolverOptions

ba = synthetic.CONFIGS["rs_mhost_pcg"](scale=1.0, dtype=jnp.float32)
plan = window.build_window_plan(ba.problem)
opts = SolverOptions(linear_solver="auto")
fns = lm.make_solver_fns(ba.problem, opts)
params = fns["to_internal"](ba.params0)
aux = jax.block_until_ready(fns["prepare"](params))
radius = jnp.asarray(1e4, jnp.float32)


def t(name, f, *args):
    out = jax.block_until_ready(jax.jit(f)(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jax.jit(f)(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.2f} ms", flush=True)
    return out


# Damp only the diagonal slots (C6_DIAG) — the same operation solve_step
# performs, not a jitter of the off-diagonals.
c6inv = jax.block_until_ready(
    jax.jit(banded_tpu.invert_sym3_planes)(
        aux["c6"].at[:, banded_tpu.C6_DIAG, :].add(1e-3)))
t("fcf_band_planes", lambda F, ci: banded_tpu.fcf_band_planes(F, ci, plan),
  aux["F"], c6inv)
t("solve_step (full)", fns["solve_step"], aux, radius)
t("prepare (pallas)", fns["prepare"], params)
