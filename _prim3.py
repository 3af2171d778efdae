import time, jax, jax.numpy as jnp
N, P = 910592, 1001
Dc = P*6
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N,), 0, P)
base = idx * 6
cols = base[:, None] + jnp.arange(6)[None, :]
x6 = jnp.ones((N, 6), jnp.float32)
p_flat = jnp.ones((Dc,), jnp.float32)

def bench(name, fn, *a):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(10): r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.3f} ms")

bench("elem gather p[cols] (N,6)", lambda p, c: p[c], p_flat, cols)
bench("row gather p2[idx] (N,6)", lambda p, i: p.reshape(P,6)[i], p_flat, idx)
bench("elem scatter (N,6)->flat", lambda c, x: jnp.zeros((Dc,), jnp.float32).at[c].add(x), cols, x6)
bench("row scatter (N,6)->(P,6)", lambda i, x: jnp.zeros((P,6), jnp.float32).at[i].add(x), idx, x6)
