"""Microbenchmark: obs-axis-last vs obs-axis-first layouts on TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 909_312  # divisible by 1024
P = 888      # N/P = 1024 exactly for the reshape test
M = 100_000

rng = np.random.RandomState(0)


def bench(name, fn, *args, reps=20):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:46s} {dt:9.3f} ms")
    return dt


a_nf = jnp.asarray(rng.randn(N, 6).astype(np.float32))   # obs-first
a_fn = jnp.asarray(rng.randn(6, N).astype(np.float32))   # obs-last
b_nf = jnp.asarray(rng.randn(N, 6).astype(np.float32))
b_fn = jnp.asarray(rng.randn(6, N).astype(np.float32))
point = rng.randint(0, M, N).astype(np.int32)
point_j = jnp.asarray(point)

bench("ew mult (N,6)*(N,6)", lambda a, b: a * b, a_nf, b_nf)
bench("ew mult (6,N)*(6,N)", lambda a, b: a * b, a_fn, b_fn)

K = N // P
bench("reduce (N,6)->(P,6) reshape-sum",
      lambda a: a.reshape(P, K, 6).sum(1), a_nf)
bench("reduce (6,N)->(6,P) reshape-sum",
      lambda a: a.reshape(6, P, K).sum(2), a_fn)

# gather: params (P, 6) -> per-obs (6, N): transpose-gather
params = jnp.asarray(rng.randn(P, 6).astype(np.float32))
paramsT = params.T
pose_sorted = np.sort(rng.randint(0, P, N)).astype(np.int32)
pose_j = jnp.asarray(pose_sorted)
bench("gather (P,6)->(N,6)", lambda p: p[pose_j], params)
bench("gather (6,P)->(6,N) take axis1",
      lambda p: jnp.take(p, pose_j, axis=1), paramsT)

# batched tiny matmul: J (2,6,N) * p (6,N) -> (2,N)
J_fn = jnp.asarray(rng.randn(2, 6, N).astype(np.float32))
J_nf = jnp.asarray(rng.randn(N, 2, 6).astype(np.float32))
p_fn = jnp.asarray(rng.randn(6, N).astype(np.float32))
p_nf = jnp.asarray(rng.randn(N, 6).astype(np.float32))
bench("einsum nrw,nw->nr (obs-first)",
      lambda J, p: jnp.einsum("nrw,nw->nr", J, p), J_nf, p_nf)
bench("einsum rwn,wn->rn (obs-last)",
      lambda J, p: jnp.einsum("rwn,wn->rn", J, p), J_fn, p_fn)

# segment-sum by point: obs-last via one-hot? vs gather-pad-sum obs-last
vals3_fn = jnp.asarray(rng.randn(3, N).astype(np.float32))


def build_perm(seg, G):
    order = np.argsort(seg, kind="stable")
    sseg = seg[order]
    counts = np.bincount(sseg, minlength=G)
    Kk = int(counts.max())
    perm = np.full((G, Kk), N, dtype=np.int32)
    slot = np.arange(N) - np.repeat(np.cumsum(counts) - counts, counts)
    perm[sseg, slot] = order
    return jnp.asarray(perm), Kk


perm_point, Km = build_perm(point, M)
print(f"K_point={Km}")
bench("pt reduce obs-last: take+reshape-sum (3,N)->(3,M)",
      lambda v: jnp.take(
          jnp.concatenate([v, jnp.zeros((3, 1), v.dtype)], axis=1),
          perm_point.reshape(-1), axis=1).reshape(3, M, Km).sum(2),
      vals3_fn)
bench("pt reduce obs-first: segment_sum (N,3)->(M,3)",
      lambda v: jax.ops.segment_sum(v.T, point_j, num_segments=M), vals3_fn)
