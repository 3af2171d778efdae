import time, jax, jax.numpy as jnp
print("devices:", jax.devices())
from rsba_tpu.problem import synthetic
from rsba_tpu.solver import lm
from rsba_tpu.solver.options import SolverOptions
from rsba_tpu.solver.pcg import make_iterative_schur_solver
from rsba_tpu.solver import assembly, residuals

ba = synthetic.CONFIGS["rs_slerp_robust"](scale=1.0, dtype=jnp.float32)
print("n_obs:", ba.problem.obs.uv.shape[0], "n_poses:", ba.params0.n_poses, "n_pts:", ba.params0.n_points)
opts = SolverOptions(linear_solver="iterative_schur", preconditioner="schur_jacobi",
                     max_cg_iterations=100, cg_eta=1e-2, max_iterations=60)
prepare, solve_step = make_iterative_schur_solver(ba.problem, opts)
prepare = jax.jit(prepare); solve_step = jax.jit(solve_step)
cost = jax.jit(lambda p: residuals.cost_only(p, ba.problem))

aux = jax.block_until_ready(prepare(ba.params0))
radius = jnp.asarray(1e4, jnp.float32)
out = jax.block_until_ready(solve_step(aux, radius))
c = jax.block_until_ready(cost(ba.params0))

for name, fn, args in [("prepare(eval+assemble)", prepare, (ba.params0,)),
                       ("solve_step(PCG)", solve_step, (aux, radius)),
                       ("cost_only", cost, (ba.params0,))]:
    t0 = time.perf_counter()
    for _ in range(5):
        r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/5*1000:.2f} ms")
print("cg_iters in solve_step:", out[2])
