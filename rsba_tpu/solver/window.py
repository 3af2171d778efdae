"""Window (track-major) observation layout — the TPU-native hot layout.

Parity: this replaces the *storage layout* of Ceres's residual-block program
(SURVEY.md §2 C10/C11) for video-style problems.  The flat structure-of-arrays
layout (problem.types.Observations) is the general API/oracle layout; this
module re-packs a problem whose feature tracks span bounded pose windows into
a ``(row, point, slot)`` grid where **every reduction the solver needs
becomes a reshape-sum, a small-window one-hot contraction, or a tiny
row-level scatter — zero observation-sized scatters and zero
per-observation gathers**:

* Each point's observations sit in one row of a ``(NR, G, L)`` grid:
  ``NR`` window rows, ``G`` points per row (padded), ``L`` observation
  slots per point (padded track length).  Every point in a row shares the
  same W-pose window base ``row_base[r]``; heavily-populated bases are
  split across multiple rows, so padding stays bounded under skew.
* Pose data for a whole row is one W-pose window → fetched with an
  (NR·W)-row gather (thousands of indices, not millions) and **broadcast**
  over (G, L); per-slot pose selection is a compare-select over W.
* Point-side reductions (g_pt, C blocks, Eᵀu) are sums over the L axis.
* Camera-side reductions contract (G, L) against a one-hot over W (an MXU
  matmul), then fold per-row windows into per-pose rows with an
  (NR·W)-index scatter-add — thousands of rows, negligible.

Measured on TPU v5e at config-4 scale (910k obs): the flat layout's
observation-sized scatter-adds cost 15-50 ms *per reduction*; every
primitive above is ≤2 ms (benchmarks/profiling/microbench_window.py).

Applicability: any problem where every point's observations touch a pose
window of bounded span (video sequences — configs 3/4/5) and pose_b ∈
{pose_a, pose_a+1} (global shutter or adjacent-keyframe rolling shutter),
with a single fixed intrinsics block.  ``build_window_plan`` returns None
otherwise and callers fall back to the flat solvers.

The plan is a pytree: jitted solver phases take it as an *argument* so its
arrays are runtime inputs, never captured constants.
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..problem.types import Problem


@flax.struct.dataclass
class WindowPlan:
    """Static re-packing of a Problem into the (NR, G, L) window grid.

    Padding: slots with mask == 0; padded point cells have point_id == M
    (the sentinel row appended to gathered point arrays).
    """
    # --- static geometry (hashable → jit-stable) -------------------------
    NR: int = flax.struct.field(pytree_node=False)
    G: int = flax.struct.field(pytree_node=False)
    L: int = flax.struct.field(pytree_node=False)
    W: int = flax.struct.field(pytree_node=False)
    n_poses: int = flax.struct.field(pytree_node=False)
    n_points: int = flax.struct.field(pytree_node=False)
    # --- per-row window base ----------------------------------------------
    row_base: jax.Array  # (NR,) int32 first pose of the row's window
    # --- observation data in window layout --------------------------------
    uv: jax.Array        # (NR, G, L, 2)
    t: jax.Array         # (NR, G, L)
    mask: jax.Array      # (NR, G, L) 1.0 valid / 0.0 padding
    offs_a: jax.Array    # (NR, G, L) int32 pose_a − row_base ∈ [0, W)
    rs_ab: jax.Array     # (NR, G, L) 1.0 where pose_b == pose_a + 1 else 0.0
    point_id: jax.Array  # (NR, G) int32 original point index (M for padding)
    point_mask: jax.Array  # (NR, G) 1.0 real point / 0.0 padding

    @property
    def n_slots(self) -> int:
        return self.NR * self.G * self.L

    def pose_windows(self, arr: jax.Array) -> jax.Array:
        """(P, ...) per-pose array → (NR, W, ...) per-row windows.

        win[r, w] = arr[row_base[r] + w]; an (NR·W)-row gather (thousands
        of indices — negligible next to observation-sized gathers).
        """
        idx = self.row_base[:, None] + jnp.arange(self.W)[None, :]
        pad = jnp.zeros((self.W,) + arr.shape[1:], arr.dtype)
        ext = jnp.concatenate([arr, pad], axis=0)
        return ext[idx]

    def fold(self, v: jax.Array) -> jax.Array:
        """Adjoint of pose_windows: (NR, W, ...) → (P, ...).

        out[row_base[r] + w] += v[r, w] — an (NR·W)-index scatter-add.
        """
        idx = self.row_base[:, None] + jnp.arange(self.W)[None, :]
        out = jnp.zeros((self.n_poses + self.W,) + v.shape[2:], v.dtype)
        return out.at[idx].add(v)[:self.n_poses]

    def select_a(self, win: jax.Array) -> jax.Array:
        """Per-slot pose_a values: (NR, W, ...) windows → (NR, G, L, ...).

        Compare-select over the W axis (elementwise; avoids TPU gathers).
        """
        return self._select(win, self.offs_a)

    def select_b(self, win: jax.Array) -> jax.Array:
        """Per-slot pose_b values (pose_a + rs_ab — adjacent keyframe)."""
        offs_b = self.offs_a + self.rs_ab.astype(jnp.int32)
        return self._select(win, offs_b)

    def _select(self, win: jax.Array, offs: jax.Array) -> jax.Array:
        squeeze = win.ndim == 2
        if squeeze:                               # (NR, W) scalar-per-pose
            win = win[..., None]
        # One-hot contraction over the W axis: one pass over the
        # slot-sized output instead of W compare-select passes (the
        # W-loop form reads+writes the (NR, G, L, C) tensor W times —
        # measured ~2 GB of traffic per prepare at config-4 scale).
        oh = (offs[..., None]
              == jnp.arange(self.W)[None, None, None, :]).astype(win.dtype)
        out = jnp.einsum("sglw,swc->sglc", oh, win)
        return out[..., 0] if squeeze else out

    def onehot_a(self, dtype) -> jax.Array:
        """(NR, G, L, W) one-hot of offs_a, masked by the slot mask."""
        oh = (self.offs_a[..., None]
              == jnp.arange(self.W)[None, None, None, :]).astype(dtype)
        return oh * self.mask[..., None]

    def onehot_b(self, dtype) -> jax.Array:
        """(NR, G, L, W) one-hot of offs_b, masked by the slot mask.

        Not gated on rs_ab: a same-pose slot (pose_b == pose_a) must still
        route its J_pb contribution to the shared pose (J_pb ≡ 0 for pure
        global shutter, but not for an RS model with a degenerate pair).
        """
        offs_b = self.offs_a + self.rs_ab.astype(jnp.int32)
        oh = (offs_b[..., None]
              == jnp.arange(self.W)[None, None, None, :]).astype(dtype)
        return oh * self.mask[..., None]

    def gather_points(self, points: jax.Array) -> jax.Array:
        """(M, D) → (NR, G, D) padded window layout (sentinel row zero)."""
        ext = jnp.concatenate(
            [points, jnp.zeros((1, points.shape[1]), points.dtype)])
        return ext[self.point_id]

    def scatter_points(self, pts_w: jax.Array) -> jax.Array:
        """(NR, G, D) window layout → (M, D), original order.

        Every point (including zero-observation ones) occupies exactly one
        cell, so this is a set (not an accumulate); padded cells write into
        a dropped sentinel row.
        """
        flat = pts_w.reshape(-1, pts_w.shape[-1])
        ids = self.point_id.reshape(-1)
        ext = jnp.zeros((self.n_points + 1, pts_w.shape[-1]), pts_w.dtype)
        return ext.at[ids].set(flat)[:self.n_points]

    def gather_point_scalar(self, v: jax.Array) -> jax.Array:
        """(M,) → (NR, G) via the point permutation (sentinel 0)."""
        ext = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        return ext[self.point_id]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_window_plan(problem: Problem, max_window: int = 24,
                      g_multiple: int = 8,
                      g_target: Optional[int] = None,
                      nr_multiple: int = 8) -> Optional[WindowPlan]:
    """Host-side plan construction.  Returns None when the problem does not
    fit the window layout (see module docstring for the conditions)."""
    if problem.intr_tangent_dim != 0:
        return None
    obs = problem.obs
    from ..utils import hostcache
    pose_a = hostcache.asnumpy(obs.pose_a)
    pose_b = hostcache.asnumpy(obs.pose_b)
    point = hostcache.asnumpy(obs.point)
    mask = hostcache.asnumpy(obs.mask) > 0
    d_ab = pose_b - pose_a
    if not np.all(np.isin(d_ab[mask], (0, 1))):
        return None
    if int(np.asarray(problem.intr_free).shape[0]) != 1:
        return None

    n_points = int(problem.point_free.shape[0])
    n_poses = int(problem.pose_free.shape[0])

    # Per-point observation lists (valid obs only), via one stable sort.
    valid_idx = np.nonzero(mask)[0]
    order = valid_idx[np.argsort(point[valid_idx], kind="stable")]
    pts_sorted = point[order]
    counts = np.bincount(pts_sorted, minlength=n_points)
    if counts.size == 0 or counts.max() == 0:
        return None
    L = int(counts.max())
    offsets = np.cumsum(counts) - counts                       # (M,)

    # Window base and span per point (over both pose_a and pose_b).
    lo = np.full(n_points, np.iinfo(np.int32).max, dtype=np.int64)
    hi = np.full(n_points, -1, dtype=np.int64)
    np.minimum.at(lo, pts_sorted, pose_a[order])
    np.maximum.at(hi, pts_sorted, pose_b[order])
    has_obs = counts > 0
    lo[~has_obs] = 0
    hi[~has_obs] = 0
    span = hi - lo + 1
    W = int(span[has_obs].max())
    if W > max_window:
        return None
    base = lo.astype(np.int64)

    # Rows: group points by base, splitting heavy bases into chunks of G so
    # padding stays bounded regardless of skew (zero-observation points all
    # have base 0, real data may cluster too).  Fully vectorized — config-5
    # scale (1M points, ~100k rows) builds in well under a second where the
    # round-2 Python loops took tens of seconds (VERDICT r2 weak #8).
    porder = np.argsort(base, kind="stable")
    b_counts = np.bincount(base, minlength=int(base.max()) + 1)
    pos_counts = b_counts[b_counts > 0]
    if g_target is None:
        g_target = int(np.percentile(pos_counts, 95))
    G = _round_up(max(min(g_target, int(pos_counts.max())), 1), g_multiple)

    # Each base b yields ceil(cnt/G) rows; row r of base b covers points
    # porder[base_start[b] + r·G : … + min(G, cnt − r·G)].
    n_chunks = -(-b_counts // G)                               # per base
    base_start = np.cumsum(b_counts) - b_counts                # into porder
    NR0 = int(n_chunks.sum())
    row_base0 = np.repeat(np.arange(b_counts.size), n_chunks)  # (NR0,)
    first_row = np.cumsum(n_chunks) - n_chunks                 # per base
    row_in_base = np.arange(NR0) - first_row[row_base0]
    row_of_chunk = base_start[row_base0] + row_in_base * G
    row_len = np.minimum(G, b_counts[row_base0] - row_in_base * G)

    # Pad the row count (empty masked rows) so kernels can tile it.
    NR = _round_up(max(NR0, 1), nr_multiple)
    row_base = np.zeros(NR, dtype=np.int32)
    row_base[:NR0] = row_base0

    cols = np.arange(G)
    cell_valid = cols[None, :] < row_len[:, None]              # (NR0, G)
    src = row_of_chunk[:, None] + cols[None, :]
    point_id = np.full((NR, G), n_points, dtype=np.int32)
    point_id[:NR0][cell_valid] = porder[src[cell_valid]]

    # Per-slot flat obs index (sentinel = len(obs) → zero row).
    n_flat = pose_a.shape[0]
    obs_sel = np.full((NR * G, L), n_flat, dtype=np.int64)
    pid_flat = point_id.reshape(-1)
    rows = np.nonzero(pid_flat < n_points)[0]
    pj = pid_flat[rows]
    slot_valid = np.arange(L)[None, :] < counts[pj][:, None]   # (n_real, L)
    slot_src = offsets[pj][:, None] + np.arange(L)[None, :]
    obs_sel[rows[:, None], np.broadcast_to(np.arange(L), slot_valid.shape)
            ] = np.where(slot_valid, order[np.minimum(slot_src,
                                                      order.size - 1)],
                         n_flat)
    obs_sel = obs_sel.reshape(NR, G, L)

    def pack(a, fill=0.0):
        a = np.asarray(a)
        ext = np.concatenate(
            [a, np.full((1,) + a.shape[1:], fill, dtype=a.dtype)])
        return ext[obs_sel]

    uv_h = hostcache.asnumpy(obs.uv)
    uv = pack(uv_h)
    t = pack(hostcache.asnumpy(obs.t))
    m = pack(mask.astype(uv_h.dtype))
    pa = pack(pose_a, fill=0)
    dab = pack(d_ab, fill=0)
    base_grid = np.broadcast_to(row_base[:, None, None].astype(np.int64),
                                (NR, G, L))
    offs_a = np.where(obs_sel < n_flat, pa - base_grid, 0)
    if offs_a.min() < 0 or (offs_a + dab).max() >= W:
        return None

    dtype = uv_h.dtype
    return WindowPlan(
        NR=NR, G=G, L=L, W=W, n_poses=n_poses, n_points=n_points,
        row_base=jnp.asarray(row_base),
        uv=jnp.asarray(uv, dtype),
        t=jnp.asarray(t, dtype),
        mask=jnp.asarray(m, dtype),
        offs_a=jnp.asarray(offs_a, np.int32),
        rs_ab=jnp.asarray(dab, dtype),
        point_id=jnp.asarray(point_id, np.int32),
        point_mask=jnp.asarray((point_id < n_points), dtype),
    )
