"""Profile the banded window solver phases at config-4 scale on TPU."""
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices())
from rsba_tpu.problem import synthetic            # noqa: E402
from rsba_tpu.solver import banded, window        # noqa: E402
from rsba_tpu.solver.options import SolverOptions  # noqa: E402

t0 = time.perf_counter()
ba = synthetic.CONFIGS["rs_slerp_robust"](scale=1.0, dtype=jnp.float32)
print(f"generate: {time.perf_counter()-t0:.1f}s  "
      f"n_obs={ba.problem.obs.uv.shape[0]} poses={ba.params0.n_poses} "
      f"pts={ba.params0.n_points}")

t0 = time.perf_counter()
plan = window.build_window_plan(ba.problem)
print(f"plan: {time.perf_counter()-t0:.1f}s  NR={plan.NR} G={plan.G} "
      f"L={plan.L} W={plan.W} slots={plan.n_slots} "
      f"(pad {plan.n_slots/float(jnp.sum(plan.mask)):.2f}x)")

opts = SolverOptions(linear_solver="banded_schur", max_cg_iterations=100,
                     cg_eta=1e-2)
fns = banded.make_window_solver_fns(ba.problem, plan, opts)

params = fns["to_internal"](ba.params0)
aux = jax.block_until_ready(fns["prepare"](params))
radius = jnp.asarray(1e4, jnp.float32)
out = jax.block_until_ready(fns["solve_step"](aux, radius))
c = jax.block_until_ready(fns["cost"](params))
cand, sn, xn = fns["apply_step"](params, out[0])
jax.block_until_ready(cand)

for name, fn, args in [
        ("prepare(eval+assemble)", fns["prepare"], (params,)),
        ("solve_step(PCG banded)", fns["solve_step"], (aux, radius)),
        ("cost_only", fns["cost"], (params,)),
        ("cost_decrease", fns["cost_decrease"], (params, cand)),
        ("apply_step", fns["apply_step"], (params, out[0]))]:
    t0 = time.perf_counter()
    for _ in range(5):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name:26s}: {(time.perf_counter()-t0)/5*1000:8.2f} ms")
print("cg_iters in solve_step:", int(out[2]))
