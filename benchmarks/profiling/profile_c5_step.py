"""Break down solve_step cost at config-5 scale on the real chip."""
import time

import jax
import jax.numpy as jnp

from rsba_tpu.problem import synthetic
from rsba_tpu.solver import banded, banded_tpu, lm, window
from rsba_tpu.solver.options import SolverOptions
from rsba_tpu.solver.schur import _lm_scaled_damp, invert_3x3_psd

ba = synthetic.CONFIGS["rs_mhost_pcg"](scale=1.0, dtype=jnp.float32)
plan = window.build_window_plan(ba.problem)
print(f"NR={plan.NR} G={plan.G} L={plan.L} W={plan.W} P={plan.n_poses}",
      flush=True)
opts = SolverOptions(linear_solver="auto", max_cg_iterations=100,
                     cg_eta=1e-2)
fns = lm.make_solver_fns(ba.problem, opts)
params = fns["to_internal"](ba.params0)
aux = jax.block_until_ready(fns["prepare"](params))
radius = jnp.asarray(1e4, jnp.float32)


def t(name, f, *args):
    out = jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.2f} ms", flush=True)
    return out


dx = t("solve_step (full)", fns["solve_step"], aux, radius)
print("cg iters:", int(dx[2]), flush=True)

F, c6 = aux["F"], aux["c6"]
P = plan.n_poses

@jax.jit
def damp_inv(c6, radius):
    d_pt = c6[:, banded_tpu.C6_DIAG, :]
    lm_pt, _ = _lm_scaled_damp(d_pt.reshape(-1), radius, opts)
    c6_l = c6.at[:, banded_tpu.C6_DIAG, :].add(lm_pt.reshape(d_pt.shape))
    return banded_tpu.invert_sym3_planes(c6_l)

c6inv = t("damp + 3x3 inverse", damp_inv, c6, radius)

@jax.jit
def fcf(F, c6inv):
    return banded_tpu.fcf_band_planes(F, c6inv, plan)

S_fcf = t("fcf_band_planes", fcf, F, c6inv)

@jax.jit
def chol(S0):
    return jax.vmap(jnp.linalg.cholesky)(S0)

lm_cam = jnp.ones((P, 6), jnp.float32)
S = jax.block_until_ready(
    jax.jit(lambda: banded_tpu.schur_band_planes(
        F, c6inv, aux["B0"], aux["B1"], lm_cam, plan))())
L0 = t("vmap cholesky 6x6 (P)", chol, S[:, 0])

@jax.jit
def one_chosolve(r):
    return jax.vmap(lambda L, v: jax.scipy.linalg.cho_solve((L, True), v))(
        L0, r)

r = jnp.ones((P, 6), jnp.float32)
t("one cho_solve (P,6)", one_chosolve, r)

@jax.jit
def one_matvec(x):
    return banded.band_matvec(S, x)

t("one band_matvec", one_matvec, r)

@jax.jit
def eapply(F, y0):
    return banded_tpu.e_apply_planes(F, y0, plan)

y0 = jnp.ones((plan.NR, 3, plan.G), jnp.float32)
t("e_apply_planes", eapply, F, y0)

@jax.jit
def etapply(F, pw):
    return banded_tpu.et_apply_planes(F, pw)

pw = jnp.ones((plan.NR, plan.W, 6), jnp.float32)
t("et_apply_planes", etapply, F, pw)
