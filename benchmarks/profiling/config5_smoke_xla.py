"""Config-5 smoke with the XLA window engine (evaluator=xla)."""
import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
from rsba_tpu.problem import synthetic            # noqa: E402
from rsba_tpu.solver import lm                    # noqa: E402
from rsba_tpu.solver.options import SolverOptions  # noqa: E402

t0 = time.perf_counter()
ba = synthetic.CONFIGS["rs_mhost_pcg"](scale=1.0, dtype=jnp.float32)
print(f"generate: {time.perf_counter()-t0:.1f}s", flush=True)

opts = SolverOptions(linear_solver="auto", evaluator="xla",
                     max_iterations=6, max_cg_iterations=100, cg_eta=1e-2)
t0 = time.perf_counter()
fns = lm.make_solver_fns(ba.problem, opts)
print(f"build ({fns['engine']}): {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
params, s = lm.solve(ba.problem, ba.params0, opts, fns=fns)
print(f"6-iter solve: {time.perf_counter()-t0:.1f}s  "
      f"cost {s.initial_cost:.3e} -> {s.final_cost:.3e}  "
      f"rmse_inlier {s.final_rmse_inlier:.3f}px  "
      f"eval_t {s.evaluation_time:.2f}s lin_t {s.linear_solver_time:.2f}s",
      flush=True)
ms = jax.devices()[0].memory_stats()
print(f"peak {ms.get('peak_bytes_in_use',0)/2**30:.2f} GiB / "
      f"limit {ms.get('bytes_limit',0)/2**30:.2f} GiB", flush=True)
