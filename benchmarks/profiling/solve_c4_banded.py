"""End-to-end config-4 solve with the banded solver on TPU."""
import time

import jax
import jax.numpy as jnp

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import lm
from rsba_tpu.solver.options import SolverOptions

ba = synthetic.CONFIGS["rs_slerp_robust"](scale=1.0, dtype=jnp.float32)
opts = SolverOptions(linear_solver="auto", max_iterations=60, verbose=True)

t0 = time.perf_counter()
params, summary = lm.solve(ba.problem, ba.params0, opts)
wall = time.perf_counter() - t0

print(f"wall={wall:.2f}s termination={summary.termination} "
      f"iters={summary.num_iterations} "
      f"rmse_inlier={summary.final_rmse_inlier:.4f}")
print(f"eval_time={summary.evaluation_time:.2f}s "
      f"linsolve_time={summary.linear_solver_time:.2f}s "
      f"prep={summary.preprocessing_time:.2f}s")
for it in summary.iterations:
    print(f"  it{it.iteration:3d} cost={it.cost:.6e} acc={int(it.accepted)} "
          f"cg={it.linear_solver_iterations:3d} wall={it.wall_time*1000:7.1f}ms "
          f"rho={it.relative_decrease:+.2f}")
