"""Rolling-shutter PnP: register a new frame against the existing map.

Parity: the reference's RS-PnP initialization path (SURVEY.md §2 C19,
§3.2 — new-frame registration in the video-SfM pipeline: pose of a new
frame from 2D-3D matches under the rolling-shutter model, with the map
points held fixed).  The reference solves a small pose-only Ceres problem
(or a minimal solver); here it is the same trust-region LM driver on a
two-pose problem with every point block constant — the free-mask
machinery (Ceres ``SetParameterBlockConstant`` semantics) makes this a
12-dof (RS) or 6-dof (GS) solve batched over all correspondences.

A rolling-shutter frame exposes between keyframe pose A (row 0) and pose
B (row H); both are estimated.  ``register_frame`` defaults the initial
guess of both to the supplied prior pose (e.g. the previous frame's
solution — the standard video-tracking prior, matching the reference's
use of the last pose as the PnP seed).

Robustness: pass a robust ``loss`` (e.g. Huber) to tolerate outlier
matches — the solver's Triggs correction downweights them exactly as the
full BA does.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry import CameraModel, Loss
from ..problem.types import (Observations, Params,
                             intr_basis_fixed, make_problem)
from . import lm
from .options import SolverOptions
from .summary import Summary


def register_frame(
    points3d,
    uv,
    rows,
    intr,
    model: CameraModel,
    q_prior,
    c_prior,
    *,
    image_height: Optional[int] = None,
    q_b_prior=None,
    c_b_prior=None,
    loss: Loss = Loss("huber", 4.0),
    options: Optional[SolverOptions] = None,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, Summary]:
    """Estimate a new frame's pose(s) from 2D-3D correspondences.

    Args:
      points3d: (M, 3) map points (held constant).
      uv: (M, 2) measured pixels.
      rows: (M,) measured image rows (used for shutter time t = row / H
        when ``model.rolling_shutter``; ignored for global shutter).
      intr: (9,) intrinsics vector (held constant).
      model: camera model (GS or RS, interpolation mode, distortion).
      q_prior, c_prior: initial pose guess (wxyz quaternion, center) —
        e.g. the previous frame's pose.
      image_height: required for rolling shutter (row → t normalization).
      q_b_prior, c_b_prior: optional distinct initial guess for the
        row-H keyframe pose (default: same as the prior — zero-velocity
        seed).
      loss: robust loss over the correspondences (default Huber(4px)).
      options: solver knobs; default = dense solve, tight tolerances.

    Returns (q_a, c_a, q_b, c_b, summary); for global shutter q_b/c_b
    equal q_a/c_a.
    """
    points3d = np.asarray(points3d)
    uv = np.asarray(uv)
    rows = np.asarray(rows)
    M = points3d.shape[0]
    if M < 3:
        raise ValueError(f"need >= 3 correspondences, got {M}")
    rs = model.rolling_shutter
    if rs and image_height is None:
        raise ValueError("image_height is required for rolling-shutter PnP")

    n_poses = 2 if rs else 1
    t = (np.clip(rows, 0, image_height) / float(image_height)
         if rs else np.zeros(M))

    # Pad the correspondence count to a shape bucket (next multiple of
    # 32) so repeated registrations — e.g. every frame of an SfmSession —
    # reuse the jit cache instead of recompiling per match count.
    Mp = -(-M // 32) * 32

    def pad(a, fill=0.0):
        a = np.asarray(a)
        return np.concatenate(
            [a, np.full((Mp - M,) + a.shape[1:], fill, a.dtype)])

    obs = Observations(
        uv=jnp.asarray(pad(uv), dtype),
        t=jnp.asarray(pad(t), dtype),
        pose_a=jnp.zeros((Mp,), jnp.int32),
        pose_b=jnp.full((Mp,), n_poses - 1, jnp.int32),
        intr_idx=jnp.zeros((Mp,), jnp.int32),
        point=jnp.arange(Mp, dtype=jnp.int32),
        mask=jnp.asarray(pad(np.ones(M)), dtype),
    )
    problem = make_problem(obs, n_poses, Mp, 1, model, loss,
                           intr_basis=intr_basis_fixed(), dtype=dtype)
    points3d = pad(points3d, fill=1.0)   # padded rows: masked out anyway
    # Pose-only solve: the map is constant (reference parity: RS-PnP
    # optimizes the frame pose against the fixed map).
    problem = problem.replace(point_free=jnp.zeros((Mp,), dtype))

    qb = q_prior if q_b_prior is None else q_b_prior
    cb = c_prior if c_b_prior is None else c_b_prior
    q0 = np.stack([np.asarray(q_prior)] + ([np.asarray(qb)] if rs else []))
    c0 = np.stack([np.asarray(c_prior)] + ([np.asarray(cb)] if rs else []))
    params0 = Params(q=jnp.asarray(q0, dtype), c=jnp.asarray(c0, dtype),
                     intr=jnp.asarray(np.asarray(intr)[None, :], dtype),
                     points=jnp.asarray(points3d, dtype))

    if options is None:
        # Schur-eliminated solve: the reduced camera system is 6/12-dof
        # regardless of M (a dense solve over 12 + 3M dims would not
        # scale to thousands of correspondences).
        options = SolverOptions(linear_solver="dense_schur",
                                max_iterations=50,
                                function_tolerance=1e-8)
    params, summary = lm.solve(problem, params0, options)
    q_a, c_a = params.q[0], params.c[0]
    q_b, c_b = params.q[-1], params.c[-1]
    return q_a, c_a, q_b, c_b, summary
