"""solve_step internal breakdown on the real chip (config selectable).

Pipelined-dispatch timing (tunnel latency amortized — see
utils/roofline._time_call).  Usage:

    PYTHONPATH=. RSBA_PROF_CONFIG=rs_slerp_robust python \
        benchmarks/profiling/profile_solvestep.py

Round-4 findings this script produced (config 4 / config 5):
  fcf_band_planes dominated solve_step (11.0 / 28.8 ms) → rhs-as-reshape
  + single-fold band extraction cut it to 3.8 ms at config 4; the
  remaining cost splits ~equally between the Y=F·C⁻¹ construction and
  the batched (NR, W6, 3G)·(NR, W6, 3G) dot (many small MXU matmuls).
"""
import os
import time

import jax
import jax.numpy as jnp

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import banded, banded_tpu, lm, window
from rsba_tpu.solver.options import SolverOptions
from rsba_tpu.solver.pcg import pcg

CONFIG = os.environ.get("RSBA_PROF_CONFIG", "rs_slerp_robust")
SCALE = float(os.environ.get("RSBA_PROF_SCALE", "1.0"))

ba = synthetic.CONFIGS[CONFIG](scale=SCALE, dtype=jnp.float32)
plan = window.build_window_plan(ba.problem)
print(f"plan: NR={plan.NR} G={plan.G} L={plan.L} W={plan.W} "
      f"P={plan.n_poses} slots={plan.n_slots}")
opts = SolverOptions(linear_solver="auto")
fns = lm.make_solver_fns(ba.problem, opts)
params = fns["to_internal"](ba.params0)
problem = ba.problem
NR, W, G, P = plan.NR, plan.W, plan.G, plan.n_poses


def t(name, f, *args, K=10):
    jf = jax.jit(f)
    jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    outs = [jf(*args) for _ in range(K)]
    jax.block_until_ready(outs)
    print(f"{name:30s} {(time.perf_counter() - t0) / K * 1e3:9.2f} ms",
          flush=True)
    return outs[0]


with jax.default_matmul_precision("highest"):
    aux = jax.block_until_ready(jax.jit(
        lambda p: banded_tpu.prepare(plan, problem, opts, p, False))(params))
    radius = jnp.asarray(1e4, jnp.float32)
    t("solve_step (full)",
      lambda a: banded_tpu.solve_step(plan, opts, a, radius), aux)
    ci = jax.block_until_ready(banded_tpu.invert_sym3_planes(
        aux["c6"].at[:, banded_tpu.C6_DIAG, :].add(1e-3)))
    F = aux["F"]
    t("  fcf_band_planes",
      lambda F_, c_: banded_tpu.fcf_band_planes(F_, c_, plan), F, ci)

    def lhs_only(F_, ci_):
        Ycomps = [sum(F_[:, :, 3 * a + x, :]
                      * ci_[:, banded_tpu._C6_AT[(x, y)], :][:, None, :]
                      for x in range(3))
                  for a in range(6) for y in range(3)]
        return banded_tpu._yg_major(Ycomps, NR, W)

    lhs = t("    lhs (Y) construction", lhs_only, F, ci)
    rhs = F.reshape(NR, W * 6, -1)
    t("    batched dot", lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,)))), lhs, rhs)
    full = jax.block_until_ready(jax.lax.dot_general(
        lhs, rhs, (((2,), (2,)), ((0,), (0,)))))

    def extract(full_):
        full6 = full_.reshape(NR, W, 6, W, 6)
        wd = jnp.arange(W)[:, None] + jnp.arange(W)[None, :]
        gath = jnp.take_along_axis(full6,
                                   (wd % W)[None, :, None, :, None], axis=3)
        gath = gath * (wd < W)[None, :, None, :, None]
        v = gath.transpose(0, 1, 3, 2, 4)
        return plan.fold(v.reshape(NR, W, W * 36)).reshape(P, W, 6, 6)

    t("    band extract+fold", extract, full)

    S = jax.block_until_ready(jax.jit(
        lambda F_, c_: banded_tpu.schur_band_planes(
            F_, c_, aux["B0"], aux["B1"],
            jnp.full((P, 6), 1e-3, jnp.float32), plan))(F, ci))
    b = jnp.ones((P * 6,), jnp.float32)

    def run_pcg(S_, b_):
        precond = banded.make_band_preconditioner(S_, opts.preconditioner)
        mv = lambda p_: banded.band_matvec(  # noqa: E731
            S_, p_.reshape(P, 6)).reshape(-1)
        return pcg(mv, precond, b_, opts.max_cg_iterations, opts.cg_eta)

    _, _, it = t("  precond+PCG", run_pcg, S, b)
    print("  CG iterations:", int(it))
    t("cost_decrease_aux",
      lambda a, c: banded_tpu.cost_decrease_from_aux(plan, problem, a, c),
      aux, params)
