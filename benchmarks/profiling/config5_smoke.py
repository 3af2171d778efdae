"""Config-5 (10k cams / 1M pts / ~8M obs) smoke + memory audit on one chip."""
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
from rsba_tpu.problem import synthetic            # noqa: E402
from rsba_tpu.solver import lm, window            # noqa: E402
from rsba_tpu.solver.options import SolverOptions  # noqa: E402

t0 = time.perf_counter()
ba = synthetic.CONFIGS["rs_mhost_pcg"](scale=1.0, dtype=jnp.float32)
n_obs = int(jnp.sum(ba.problem.obs.mask))
print(f"generate: {time.perf_counter()-t0:.1f}s  n_obs={n_obs} "
      f"poses={ba.params0.n_poses} pts={ba.params0.n_points}", flush=True)

t0 = time.perf_counter()
plan = window.build_window_plan(ba.problem)
print(f"plan: {time.perf_counter()-t0:.1f}s  NR={plan.NR} G={plan.G} "
      f"L={plan.L} W={plan.W} slots={plan.n_slots} "
      f"(pad {plan.n_slots/max(n_obs,1):.2f}x)", flush=True)

opts = SolverOptions(linear_solver="auto", max_iterations=6,
                     max_cg_iterations=100, cg_eta=1e-2)
t0 = time.perf_counter()
fns = lm.make_solver_fns(ba.problem, opts)
print(f"build+trial-compile ({fns['engine']}): "
      f"{time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
params_int = fns["to_internal"](ba.params0)
params, s = lm.solve(ba.problem, ba.params0, opts, fns=fns)
print(f"6-iter solve: {time.perf_counter()-t0:.1f}s  "
      f"cost {s.initial_cost:.3e} -> {s.final_cost:.3e}  "
      f"rmse_inlier {s.final_rmse_inlier:.3f}px  "
      f"eval_t {s.evaluation_time:.2f}s lin_t {s.linear_solver_time:.2f}s",
      flush=True)

# memory_stats is unavailable through the axon tunnel; XLA's own
# accounting of the hot executable is the audit (see scaling_report.py).
try:
    jf = fns["prepare"]._jitted
    ma = jf.lower(*fns["prepare"]._bound, params_int).compile().memory_analysis()
    print(f"prepare memory: args {ma.argument_size_in_bytes/2**30:.2f} GiB, "
          f"temp {ma.temp_size_in_bytes/2**30:.2f} GiB, "
          f"out {ma.output_size_in_bytes/2**30:.2f} GiB", flush=True)
except Exception as e:
    print("memory_analysis unavailable:", e)
