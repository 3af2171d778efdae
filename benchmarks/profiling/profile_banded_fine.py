"""Fine-grained phase profile of the banded solver at config-4 scale."""
import time
from functools import partial

import jax
import jax.numpy as jnp

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import banded, window
from rsba_tpu.solver.options import SolverOptions
from rsba_tpu.solver.schur import _lm_scaled_damp, invert_3x3_psd

ba = synthetic.CONFIGS["rs_slerp_robust"](scale=1.0, dtype=jnp.float32)
plan = window.build_window_plan(ba.problem)
problem = ba.problem
params = jax.jit(lambda pl, p: banded.to_internal(p, pl))(plan, ba.params0)


def bench(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s}: {(time.perf_counter()-t0)/reps*1000:8.2f} ms")
    return out


with jax.default_matmul_precision("highest"):
    r = bench("residuals_raw", jax.jit(banded.residuals_raw),
              params, plan, problem)
    bench("cost_only", jax.jit(banded.cost_only), plan, problem, params)
    bench("cost_decrease", jax.jit(banded.cost_decrease), plan, problem,
          params, params)
    ev = bench("evaluate (jacfwd+Triggs)", jax.jit(banded.evaluate),
               params, plan, problem)
    a = bench("assemble", jax.jit(banded.assemble), ev, plan)

    opts = SolverOptions()

    @jax.jit
    def damp(a, radius):
        P = plan.n_poses
        d_cam = jnp.diagonal(a.B_band[:, 0], axis1=-2, axis2=-1)
        lm_cam, _ = _lm_scaled_damp(d_cam.reshape(-1), radius, opts)
        lm_cam = lm_cam.reshape(P, 6)
        c_diag = jnp.diagonal(a.C, axis1=-2, axis2=-1)
        lm_pt, _ = _lm_scaled_damp(c_diag.reshape(-1), radius, opts)
        lm_pt = lm_pt.reshape(plan.NR, plan.G, 3)
        C_l = a.C + jax.vmap(jax.vmap(jnp.diag))(lm_pt)
        return lm_cam, invert_3x3_psd(C_l)

    radius = jnp.asarray(1e4, jnp.float32)
    lm_cam, C_inv = bench("damp+C_inv", damp, a, radius)
    S = bench("schur_band",
              jax.jit(lambda a, ci, lc: banded.schur_band(a, plan, ci, lc)),
              a, C_inv, lm_cam)
    x = jnp.ones((plan.n_poses, 6), jnp.float32)
    bench("band_matvec", jax.jit(banded.band_matvec), S, x, reps=20)

    @jax.jit
    def chol(S):
        return jax.vmap(jnp.linalg.cholesky)(S[:, 0])

    L0 = bench("chol diag blocks", chol, S, reps=20)

    @jax.jit
    def prec(L0, rr):
        return jax.vmap(lambda L, v: jax.scipy.linalg.cho_solve((L, True),
                                                                v))(L0, rr)

    bench("precond apply", prec, L0, x, reps=20)

    @jax.jit
    def cg_iteration(S, L0, x):
        q = banded.band_matvec(S, x)
        z = jax.vmap(lambda L, v: jax.scipy.linalg.cho_solve((L, True), v))(
            L0, q)
        return z + jnp.vdot(q, x) * x

    bench("one cg-ish iteration", cg_iteration, S, L0, x, reps=20)

    bench("e_apply", jax.jit(lambda F, y: banded.e_apply(F, plan, y)),
          a.F, C_inv[..., 0], reps=20)
    bench("et_apply", jax.jit(lambda F, p: banded.et_apply(F, plan, p)),
          a.F, jnp.ones((plan.n_poses, 6), jnp.float32), reps=20)
