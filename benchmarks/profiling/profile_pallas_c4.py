"""Profile the fused Pallas solver phases at config-4 scale on TPU."""
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices())
from rsba_tpu.problem import synthetic            # noqa: E402
from rsba_tpu.solver import banded_tpu, window    # noqa: E402
from rsba_tpu.solver.options import SolverOptions  # noqa: E402

ba = synthetic.CONFIGS["rs_slerp_robust"](scale=1.0, dtype=jnp.float32)
plan = window.build_window_plan(ba.problem)
print(f"NR={plan.NR} G={plan.G} L={plan.L} W={plan.W}")

opts = SolverOptions(linear_solver="banded_schur", evaluator="pallas",
                     max_cg_iterations=100, cg_eta=1e-2)
fns = banded_tpu.make_tpu_solver_fns(ba.problem, plan, opts)

params = fns["to_internal"](ba.params0)
t0 = time.perf_counter()
aux = jax.block_until_ready(fns["prepare"](params))
print(f"prepare compile+run: {time.perf_counter()-t0:.1f}s")
radius = jnp.asarray(1e4, jnp.float32)
out = jax.block_until_ready(fns["solve_step"](aux, radius))
c = jax.block_until_ready(fns["cost"](params))
cand, sn, xn = fns["apply_step"](params, out[0])
jax.block_until_ready(cand)

for name, fn, args in [
        ("prepare(pallas fused)", fns["prepare"], (params,)),
        ("solve_step(PCG banded)", fns["solve_step"], (aux, radius)),
        ("cost_only", fns["cost"], (params,)),
        ("cost_decrease", fns["cost_decrease"], (params, cand)),
        ("apply_step", fns["apply_step"], (params, out[0]))]:
    t0 = time.perf_counter()
    for _ in range(5):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name:26s}: {(time.perf_counter()-t0)/5*1000:8.2f} ms")
print("cg_iters:", int(out[2]))

# Numeric sanity vs the XLA engine on-device (f32 both, scaling off so
# g_cam is directly comparable).
from rsba_tpu.solver import banded                 # noqa: E402
o_ns = SolverOptions(linear_solver="banded_schur", jacobi_scaling=False)
fns_p = banded_tpu.make_tpu_solver_fns(ba.problem, plan, o_ns)
fns_x = banded.make_window_solver_fns(ba.problem, plan, o_ns)
aux_p = jax.block_until_ready(fns_p["prepare"](
    fns_p["to_internal"](ba.params0)))
aux_x = jax.block_until_ready(fns_x["prepare"](
    fns_x["to_internal"](ba.params0)))
import numpy as np                                 # noqa: E402
print("cost rel err:",
      float(abs(aux_p["cost"] - aux_x["cost"]) / abs(aux_x["cost"])))
g1 = np.asarray(aux_p["g_cam"])
g2 = np.asarray(aux_x["a"].g_cam)
print("g_cam rel err:",
      float(np.max(np.abs(g1 - g2)) / (np.max(np.abs(g2)) + 1e-30)))
