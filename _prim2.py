import time, jax, jax.numpy as jnp
N = 910592
J = jnp.ones((N, 2, 6), jnp.float32)
p = jnp.ones((N, 6), jnp.float32)
u = jnp.ones((N, 2), jnp.float32)
C = jnp.ones((N, 3, 3), jnp.float32)
w3 = jnp.ones((N, 3), jnp.float32)

def bench(name, fn, *a):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(10): r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.3f} ms")

bench("einsum nrw,nw->nr", lambda J,p: jnp.einsum("nrw,nw->nr", J, p), J, p)
bench("mul+sum same", lambda J,p: jnp.sum(J * p[:,None,:], axis=-1), J, p)
bench("einsum nrw,nr->nw", lambda J,u: jnp.einsum("nrw,nr->nw", J, u), J, u)
bench("mul+sum same2", lambda J,u: jnp.sum(J * u[:,:,None], axis=1), J, u)
bench("einsum nri,nrk->nik (outer)", lambda J: jnp.einsum("nri,nrk->nik", J, J), J)
bench("mul+sum outer", lambda J: jnp.sum(J[:,:,:,None]*J[:,:,None,:], axis=1), J)
bench("einsum mab,mb->ma 3x3", lambda C,w: jnp.einsum("mab,mb->ma", C, w), C, w3)
bench("mul+sum 3x3", lambda C,w: jnp.sum(C * w[:,None,:], axis=-1), C, w3)
