import time, jax, jax.numpy as jnp
from rsba_tpu.problem import synthetic
from rsba_tpu.solver import assembly, residuals
from rsba_tpu.solver.options import SolverOptions
from rsba_tpu.solver.schur import camera_jtj_diag, invert_3x3_psd, _lm_scaled_damp

ba = synthetic.CONFIGS["rs_slerp_robust"](scale=1.0, dtype=jnp.float32)
problem = ba.problem
obs = problem.obs
opts = SolverOptions()
shapes = assembly.tangent_shapes(problem, ba.params0)
radius = jnp.asarray(1e4, jnp.float32)

@jax.jit
def build(params, radius):
    ev = residuals.evaluate(params, problem, with_jacobians=True)
    C = assembly.point_hessian_blocks(ev, problem, shapes)
    c_diag = jnp.diagonal(C, axis1=-2, axis2=-1).reshape(-1)
    lm_pt, _ = _lm_scaled_damp(c_diag, radius, opts)
    C_l = C + jax.vmap(jnp.diag)(lm_pt.reshape(-1, 3))
    return ev, invert_3x3_psd(C_l)
ev, C_inv = jax.block_until_ready(build(ba.params0, radius))

Ja = ev.J_pose[:, :, 0, :].copy()
Jb = ev.J_pose[:, :, 1, :].copy()
Jpt = ev.J_pt
pa, pb, pt = obs.pose_a, obs.pose_b, obs.point
P = shapes.n_poses
p2 = jnp.ones((P, 6), jnp.float32)

def bench(name, fn, *a):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(10): r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.3f} ms")

# piece 1: u = Ja·p[pa] + Jb·p[pb]
def u_fn(Ja, Jb, p2, pa, pb):
    return (jnp.einsum("nrw,nw->nr", Ja, p2[pa])
            + jnp.einsum("nrw,nw->nr", Jb, p2[pb]))
bench("u = Jcam·p (args)", u_fn, Ja, Jb, p2, pa, pb)

u = jax.jit(u_fn)(Ja, Jb, p2, pa, pb)
# piece 2: scatter JcamT u
def bt_fn(Ja, Jb, u, pa, pb):
    out = jnp.zeros((P, 6), jnp.float32)
    out = out.at[pa].add(jnp.einsum("nrw,nr->nw", Ja, u))
    out = out.at[pb].add(jnp.einsum("nrw,nr->nw", Jb, u))
    return out
bench("JcamT·u (args)", bt_fn, Ja, Jb, u, pa, pb)

# piece 3: w = segsum JptT u; y = Cinv w
def w_fn(Jpt, u, pt, C_inv):
    w = jax.ops.segment_sum(jnp.einsum("nrd,nr->nd", Jpt, u), pt, num_segments=C_inv.shape[0])
    return jnp.einsum("mab,mb->ma", C_inv, w)
bench("EtU + Cinv (args)", w_fn, Jpt, u, pt, C_inv)

y = jax.jit(w_fn)(Jpt, u, pt, C_inv)
# piece 4: v = Jpt y[pt], then JcamT v
def e_fn(Ja, Jb, Jpt, y, pa, pb, pt):
    v = jnp.einsum("nrd,nd->nr", Jpt, y[pt])
    out = jnp.zeros((P, 6), jnp.float32)
    out = out.at[pa].add(jnp.einsum("nrw,nr->nw", Ja, v))
    out = out.at[pb].add(jnp.einsum("nrw,nr->nw", Jb, v))
    return out
bench("E·y (args)", e_fn, Ja, Jb, Jpt, y, pa, pb, pt)

# all fused
def mv(Ja, Jb, Jpt, p2, pa, pb, pt, C_inv):
    u = u_fn(Ja, Jb, p2, pa, pb)
    Bp = bt_fn(Ja, Jb, u, pa, pb)
    y = w_fn(Jpt, u, pt, C_inv)
    return Bp - e_fn(Ja, Jb, Jpt, y, pa, pb, pt)
bench("full matvec (args, row-layout)", mv, Ja, Jb, Jpt, p2, pa, pb, pt, C_inv)
