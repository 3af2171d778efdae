"""Microbenchmark: reduction strategies for JᵀJ/Jᵀr assembly on TPU.

Compares, at config-4 scale (N≈910k obs, P=1k poses, M=100k points):
  a. scatter-add  out.at[cols].add(v)                    (round-1 approach)
  b. segment_sum  unsorted ids
  c. segment_sum  sorted ids (indices_are_sorted=True)
  d. gather-pad-sum: vals[perm].sum(1) over a (G, K) padded permutation
  e. reshape-sum: contiguous equal-sized groups (best case; layout-sorted)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 910_592
P = 1_001
M = 100_000

rng = np.random.RandomState(0)
pose = np.sort(rng.randint(0, P, N)).astype(np.int32)      # sorted by camera
point = rng.randint(0, M, N).astype(np.int32)              # unsorted
vals6 = jnp.asarray(rng.randn(N, 6).astype(np.float32))
vals3 = jnp.asarray(rng.randn(N, 3).astype(np.float32))


def bench(name, fn, *args, reps=20):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:42s} {dt:9.3f} ms")
    return dt


def build_perm(seg, G):
    order = np.argsort(seg, kind="stable")
    sseg = seg[order]
    counts = np.bincount(sseg, minlength=G)
    K = int(counts.max())
    perm = np.full((G, K), N, dtype=np.int32)
    slot = np.arange(N) - np.repeat(np.cumsum(counts) - counts, counts)
    perm[sseg, slot] = order
    return jnp.asarray(perm), K


pose_j = jnp.asarray(pose)
point_j = jnp.asarray(point)
perm_pose, Kp = build_perm(pose, P)
perm_point, Km = build_perm(point, M)
print(f"K_pose={Kp} (mean {N/P:.0f}), K_point={Km} (mean {N/M:.1f})")

cols6 = pose_j[:, None] * 6 + jnp.arange(6)[None, :]

bench("a. at[cols].add (N,6)->(P*6,)",
      lambda v: jnp.zeros(P * 6, jnp.float32).at[cols6].add(v), vals6)
bench("b. segment_sum unsorted (N,3)->(M,3)",
      lambda v: jax.ops.segment_sum(v, point_j, num_segments=M), vals3)
bench("c. segment_sum sorted (N,6)->(P,6)",
      lambda v: jax.ops.segment_sum(v, pose_j, num_segments=P,
                                    indices_are_sorted=True), vals6)
bench("d1. gather-pad-sum pose (N,6)->(P,6)",
      lambda v: jnp.concatenate([v, jnp.zeros((1, 6), v.dtype)])[perm_pose]
      .sum(1), vals6)
bench("d2. gather-pad-sum point (N,3)->(M,3)",
      lambda v: jnp.concatenate([v, jnp.zeros((1, 3), v.dtype)])[perm_point]
      .sum(1), vals3)

Nr = (N // P) * P
bench("e. reshape-sum equal groups (Nr,6)->(P,6)",
      lambda v: v[:Nr].reshape(P, -1, 6).sum(1), vals6)

# gathers for reference
bench("f. gather (N,6) by pose", lambda v: v[pose_j], jnp.zeros((P, 6)))
bench("g. gather (N,3) by point", lambda v: v[point_j], jnp.zeros((M, 3)))
