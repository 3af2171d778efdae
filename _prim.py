import time, jax, jax.numpy as jnp, numpy as np
N, P, M, T = 910592, 1001, 100000, 8
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (N,), 0, P)          # unsorted pose ids
idx_sorted = jnp.sort(idx)
pt = jax.random.randint(key, (N,), 0, M)
perm = jax.random.permutation(key, N)
x = jnp.ones((N, 24), jnp.float32)
v = jnp.ones((P, 12), jnp.float32)
c3 = jnp.ones((N, 3), jnp.float32)

def bench(name, fn, *a):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(10): r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/10*1000:.3f} ms")

bench("elementwise (N,24)*2", lambda x: x*2.0+1.0, x)
bench("gather v[idx] (N,12) unsorted", lambda v,i: v[i], v, idx)
bench("gather v[idx] (N,12) sorted", lambda v,i: v[i], v, idx_sorted)
bench("perm gather x[perm]", lambda x,p: x[p], x, perm)
bench("scatter-add (N,12)->P unsorted", lambda v,i,x: jnp.zeros((P,12),jnp.float32).at[i].add(x[:, :12]), v, idx, x)
bench("scatter-add sorted+hint", lambda i,x: jax.ops.segment_sum(x[:, :12], i, num_segments=P, indices_are_sorted=True), idx_sorted, x)
bench("segment_sum pts unsorted (N,3)->M", lambda i,c: jax.ops.segment_sum(c, i, num_segments=M), pt, c3)
bench("reshape-sum (M,T,3)->M", lambda c: c.reshape(M, 9, 3).sum(1), jnp.ones((M*9,3), jnp.float32))
bench("batched matmul (P,1024,12)x(P,12)", lambda A,v: jnp.einsum("plw,pw->pl", A, v), jnp.ones((P,1024,12),jnp.float32), v)
# one-hot matmul segment sum: (P, N) too big; try blocked via MXU: skip
