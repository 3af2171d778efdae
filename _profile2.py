import time, jax, jax.numpy as jnp
from rsba_tpu.problem import synthetic
from rsba_tpu.solver import assembly, residuals
from rsba_tpu.solver.options import SolverOptions
from rsba_tpu.solver.pcg import (SchurFreeOperator, schur_jacobi_blocks,
                                 make_block_preconditioner)
from rsba_tpu.solver.schur import camera_jtj_diag, camera_gradient, invert_3x3_psd, _lm_scaled_damp

ba = synthetic.CONFIGS["rs_slerp_robust"](scale=1.0, dtype=jnp.float32)
problem = ba.problem
obs = problem.obs
import numpy as np
pa = np.asarray(obs.pose_a); pt = np.asarray(obs.point)
print("pose_a sorted:", bool(np.all(np.diff(pa) >= 0)), "point sorted:", bool(np.all(np.diff(pt) >= 0)))
print("N:", pa.shape, "counts per pose min/max:", np.bincount(pa).min(), np.bincount(pa).max())

opts = SolverOptions(linear_solver="iterative_schur", preconditioner="schur_jacobi")
shapes = assembly.tangent_shapes(problem, ba.params0)

@jax.jit
def build(params, radius):
    ev = residuals.evaluate(params, problem, with_jacobians=True)
    d_cam = camera_jtj_diag(ev, problem, shapes)
    lm_cam, _ = _lm_scaled_damp(d_cam, radius, opts)
    C = assembly.point_hessian_blocks(ev, problem, shapes)
    c_diag = jnp.diagonal(C, axis1=-2, axis2=-1).reshape(-1)
    lm_pt, _ = _lm_scaled_damp(c_diag, radius, opts)
    C_l = C + jax.vmap(jnp.diag)(lm_pt.reshape(-1, 3))
    return ev, lm_cam, invert_3x3_psd(C_l)

radius = jnp.asarray(1e4, jnp.float32)
ev, lm_cam, C_inv = jax.block_until_ready(build(ba.params0, radius))
op = SchurFreeOperator(ev=ev, problem=problem, shapes=shapes, lm_cam=lm_cam, C_inv=C_inv)

p = jnp.ones((shapes.cam_dim,), jnp.float32)
mv = jax.jit(op.matvec)
jca = jax.jit(op._jcam_apply)
jct = jax.jit(lambda u: op._jcam_transpose_apply(u))
eta = jax.jit(op.et_apply)
sjb = jax.jit(lambda: schur_jacobi_blocks(ev, problem, shapes, lm_cam, C_inv))
u = jax.block_until_ready(jca(p))

def bench(name, fn, *args):
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5): r = fn(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/5*1000:.2f} ms")

bench("matvec", mv, p)
bench("jcam_apply (gather)", jca, p)
bench("jcam_T_apply (scatter)", jct, u)
bench("et_apply (segsum pts)", eta, p)
bench("schur_jacobi_blocks", sjb)
