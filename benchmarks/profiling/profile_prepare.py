"""Phase-internal breakdown of the banded-TPU ``prepare`` at config-4 scale.

Times (warm, best-of-5) the three stages of banded_tpu.prepare separately:
  1. _kernel_inputs   — window gathers + one-hot pose selects (XLA)
  2. fused kernel     — the Pallas evaluate+assemble call
  3. post             — folds, gradients-max, Jacobi scaling of F/c6/B

to locate the 3.6 GB/iter of prepare traffic (VERDICT r3 item 2).
"""
import time

import jax
import jax.numpy as jnp

from rsba_tpu.kernels import fused
from rsba_tpu.problem import synthetic
from rsba_tpu.solver import banded_tpu, lm, window
from rsba_tpu.solver.options import SolverOptions

SCALE = 1.0
ba = synthetic.CONFIGS["rs_slerp_robust"](scale=SCALE, dtype=jnp.float32)
plan = window.build_window_plan(ba.problem)
print(f"plan: NR={plan.NR} G={plan.G} L={plan.L} W={plan.W} "
      f"P={plan.n_poses} M={plan.n_points} slots={plan.n_slots}")
opts = SolverOptions(linear_solver="auto")
fns = lm.make_solver_fns(ba.problem, opts)
params = fns["to_internal"](ba.params0)
problem = ba.problem


def t(name, f, *args):
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(*args))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jf(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.2f} ms", flush=True)
    return out


with jax.default_matmul_precision("highest"):
    t("prepare (full)", lambda p: banded_tpu.prepare(
        plan, problem, opts, p, False), params)
    kin = t("  _kernel_inputs", lambda p: banded_tpu._kernel_inputs(
        p, plan, problem)[:9], params)

    def kernel_only(pose, points, ptf, uv, tt, mask, offs, rsf, intr):
        return fused.fused_evaluate_assemble(
            pose, points, ptf, uv, tt, mask, offs, rsf, intr, plan.W,
            model=problem.model, loss=problem.loss, row_tile=opts.row_tile,
            interpret=False)

    out = t("  fused kernel", kernel_only, *kin)

    def post(out):
        P = plan.n_poses
        g_cam = plan.fold(out["gw"])
        B0 = plan.fold(out["b0"]).reshape(P, 6, 6)
        B1 = plan.fold(out["b1"]).reshape(P, 6, 6)
        g_pt, c6, F = out["g_pt"], out["c6"], out["F"]
        gmax = jnp.maximum(jnp.max(jnp.abs(g_cam)), jnp.max(jnp.abs(g_pt)))
        d_cam = jnp.diagonal(B0, axis1=-2, axis2=-1)
        d_pt = c6[:, banded_tpu.C6_DIAG, :]
        s_cam = jnp.where(d_cam > 0,
                          1.0 / (1.0 + jnp.sqrt(jnp.maximum(d_cam, 0.0))),
                          1.0)
        s_pt = jnp.where(d_pt > 0,
                         1.0 / (1.0 + jnp.sqrt(jnp.maximum(d_pt, 0.0))),
                         1.0)
        g_cam = g_cam * s_cam
        g_pt = g_pt * s_pt
        c6s = c6 * jnp.stack([s_pt[:, p] * s_pt[:, q]
                              for (p, q) in banded_tpu.C6_PAIRS], axis=1)
        scw = plan.pose_windows(s_cam)
        F2 = jnp.stack([
            F[:, :, 3 * a + p, :] * scw[:, :, a][:, :, None]
            * s_pt[:, p, :][:, None, :]
            for a in range(6) for p in range(3)], axis=2)
        return g_cam, g_pt, c6s, F2, gmax

    t("  post (fold+scale)", post, out)

    def f_scale_only(F, s_cam, s_pt):
        scw = plan.pose_windows(s_cam)
        return jnp.stack([
            F[:, :, 3 * a + p, :] * scw[:, :, a][:, :, None]
            * s_pt[:, p, :][:, None, :]
            for a in range(6) for p in range(3)], axis=2)

    s_cam = jnp.ones((plan.n_poses, 6), jnp.float32)
    s_pt = jnp.ones((plan.NR, 3, plan.G), jnp.float32)
    t("    F scaling alone", f_scale_only, out["F"], s_cam, s_pt)

    def inputs_pose_only(p):
        win = jnp.concatenate(
            [plan.pose_windows(p.q), plan.pose_windows(p.c),
             plan.pose_windows(problem.pose_free)[..., None]], axis=-1)
        sa = plan.select_a(win)
        sb = plan.select_b(win)
        return jnp.concatenate(
            [sa[..., :7], sb[..., :7], sa[..., 7:], sb[..., 7:]],
            axis=-1).transpose(0, 3, 2, 1)

    t("    pose one-hot select", inputs_pose_only, params)

    for k, v in out.items():
        print(f"  out[{k!r}]: {v.shape} {v.nbytes/2**20:.1f} MiB")
    F = out["F"]
    print(f"F bytes: {F.nbytes/2**20:.1f} MiB; "
          f"slots bytes (NR,L,G): "
          f"{plan.NR*plan.L*plan.G*4/2**20:.1f} MiB/plane")
