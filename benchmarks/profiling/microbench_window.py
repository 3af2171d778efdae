"""Microbenchmark: window-layout primitives for the banded RS-BA engine."""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 100_000       # points
L = 10            # track length (obs per point)
W = 12            # window span (L + 1 for RS, rounded)
P = 1_001         # poses
NS = 990          # distinct starts

rng = np.random.RandomState(0)


def bench(name, fn, *args, reps=20):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:52s} {dt:9.3f} ms")
    return dt


starts = np.sort(rng.randint(0, NS, M)).astype(np.int32)
starts_j = jnp.asarray(starts)

# 1. window gather: pose windows (P, W*8) rows gathered by M starts
pose_flat = jnp.asarray(rng.randn(P, W * 8).astype(np.float32))
bench("window gather (P,96) by (M,) starts", lambda p: p[starts_j], pose_flat)

# 2. one-hot local scatter: contrib (M,L,6) x onehot (M,L,W) -> (M,W,6)
contrib = jnp.asarray(rng.randn(M, L, 6).astype(np.float32))
offs = jnp.asarray(rng.randint(0, W, (M, L)).astype(np.int32))


def onehot_scatter(c, o):
    oh = (o[:, :, None] == jnp.arange(W)[None, None, :]).astype(c.dtype)
    return jnp.einsum("mlw,mlx->mwx", oh, c)


bench("one-hot window scatter (M,L,6)->(M,W,6)", onehot_scatter, contrib,
      offs)


def onehot_scatter_cmp(c, o):
    eq = (o[:, :, None, None] == jnp.arange(W)[None, None, :, None])
    return jnp.sum(jnp.where(eq, c[:, :, None, :], 0.0), axis=1)


bench("compare-select window scatter", onehot_scatter_cmp, contrib, offs)

# 3. segment reduce by start via padded groups: (NS, G, W, 6) sum axis 1
counts = np.bincount(starts, minlength=NS)
G = int(counts.max())
print(f"G(max pts/start)={G}, mean={M/NS:.1f}")
padded = jnp.asarray(rng.randn(NS, G, W, 6).astype(np.float32))
bench("group reshape-sum (NS,G,W,6)->(NS,W,6)",
      lambda a: a.sum(axis=1), padded)

# 4. fold windows into band rows: out[s+w] += v[s, w]  via W shifted adds
v = jnp.asarray(rng.randn(NS, W, 6).astype(np.float32))


def fold(v):
    out = jnp.zeros((P, 6), v.dtype)
    for w in range(W):
        out = out.at[w:w + NS].add(v[:, w])
    return out


bench("fold W shifted adds (NS,W,6)->(P,6)", fold, v)

# 5. per-point band outer products: (M,W,6,3)x(M,3,3)x(M,W,6,3)->(M,W,W,6,6)
F = jnp.asarray(rng.randn(M, W, 6, 3).astype(np.float32))
Cinv = jnp.asarray(rng.randn(M, 3, 3).astype(np.float32))


def band_outer(F, Cinv):
    Y = jnp.einsum("mab,mwxb->mwxa", Cinv, F)
    return jnp.einsum("mvya,mwxa->mvwyx", F, Y)


d = bench("band outer (M,W,6,3)->(M,W,W,6,6)", band_outer, F, Cinv)

# 6. reduce those to band: (NS,G,W,W,6,6) too big; sum in same kernel?
def band_outer_reduced(F, Cinv):
    Y = jnp.einsum("mab,mwxb->mwxa", Cinv, F)
    contrib = jnp.einsum("mvya,mwxa->mvwyx", F, Y)
    return contrib.reshape(NS, G, W, W, 6, 6).sum(axis=1)


Fp = jnp.asarray(rng.randn(NS * G, W, 6, 3).astype(np.float32))
Cp = jnp.asarray(rng.randn(NS * G, 3, 3).astype(np.float32))
bench("band outer + group-sum -> (NS,W,W,6,6)", band_outer_reduced, Fp, Cp)

# 7. banded matvec: band (P, 2W, 6, 6), x windows via shifts
band = jnp.asarray(rng.randn(P, 2 * W, 6, 6).astype(np.float32))
x = jnp.asarray(rng.randn(P, 6).astype(np.float32))


def banded_matvec(band, x):
    xp = jnp.pad(x, ((W, W), (0, 0)))
    xw = jnp.stack([xp[W + d: W + d + P] for d in range(-W, W)], axis=1)
    return jnp.einsum("pdab,pdb->pa", band, xw)


bench("banded matvec (P,2W,6,6)x(P,6)", banded_matvec, band, x)
