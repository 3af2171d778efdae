import time, jax, jax.numpy as jnp
from rsba_tpu.problem import synthetic
from rsba_tpu.solver import assembly, residuals
from rsba_tpu.solver.options import SolverOptions
from rsba_tpu.solver.pcg import SchurFreeOperator
from rsba_tpu.solver.schur import camera_jtj_diag, invert_3x3_psd, _lm_scaled_damp

ba = synthetic.CONFIGS["rs_slerp_robust"](scale=1.0, dtype=jnp.float32)
problem = ba.problem
opts = SolverOptions()
shapes = assembly.tangent_shapes(problem, ba.params0)
radius = jnp.asarray(1e4, jnp.float32)

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

ev, lm_cam, C_inv = jax.block_until_ready(build(ba.params0, radius))
p = jnp.ones((shapes.cam_dim,), jnp.float32)

# matvec with ev as ARGUMENT (pytree) instead of closure
@jax.jit
def mv_arg(ev, lm_cam, C_inv, p):
    op = SchurFreeOperator(ev=ev, problem=problem, shapes=shapes, lm_cam=lm_cam, C_inv=C_inv)
    return op.matvec(p)

def bench(name, fn, *a):
    r = jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(10): r = fn(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.3f} ms")

bench("matvec ev-as-arg", mv_arg, ev, lm_cam, C_inv, p)
op = SchurFreeOperator(ev=ev, problem=problem, shapes=shapes, lm_cam=lm_cam, C_inv=C_inv)
bench("matvec closure", jax.jit(op.matvec), p)
