"""Camera models: world → image projection for global- and rolling-shutter.

Parity: the reference's templated camera header (``project``/``w2i`` free
functions — SURVEY.md §2 C2/C5, §3.3 call stack).  All convention choices
live HERE (SURVEY.md §7.2 item 4):

* Pose is (q, c): ``q`` world→camera Hamilton quaternion (wxyz), ``c`` camera
  center in world coordinates.  ``X_cam = R(q) · (X_world − c)``.
* Perspective divide with configurable sign: ``xy = s · X_cam.xy / X_cam.z``
  with ``s = +1`` (camera looks down +z, standard CV) or ``s = −1``
  (BAL convention, camera looks down −z).
* Intrinsics are a fixed 9-vector ``[fx, fy, cx, cy, k1, k2, p1, p2, k3]``;
  distortion coefficients in OpenCV order (see geometry.distortion).
* Pixel: ``u = fx·x' + cx``, ``v = fy·y' + cy``.
* Rolling shutter: row time ``t = v_row / image_height`` selects the pose by
  interpolating the observation's two keyframe poses (geometry.interpolate).

Everything is a pure jax function of arrays — `jax.jacfwd` through these is
the framework's equivalent of Ceres ``Jet`` autodiff (SURVEY.md §2 C8).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import distortion as dist
from . import interpolate
from . import quaternion as quat

# Intrinsics vector layout indices.
FX, FY, CX, CY, K1, K2, P1, P2, K3 = range(9)
NUM_INTR = 9


@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Static configuration of the projection chain (hashable; jit-static).

    Attributes:
      rolling_shutter: if False the interpolation is skipped entirely
        (pose_a is used as-is) — the global-shutter fast path.
      rotation_interp: "slerp" or "lerp_aa" (rolling shutter only).
      use_distortion: apply radial-tangential distortion.
      projection_sign: +1.0 standard CV; −1.0 for BAL-convention cameras.
    """
    rolling_shutter: bool = False
    rotation_interp: str = "slerp"
    use_distortion: bool = True
    projection_sign: float = 1.0

    def __post_init__(self):
        if self.rotation_interp not in interpolate.ROTATION_INTERP_MODES:
            raise ValueError(
                f"rotation_interp must be one of "
                f"{interpolate.ROTATION_INTERP_MODES}, got "
                f"{self.rotation_interp!r}")


def intrinsics_vector(fx, fy=None, cx=0.0, cy=0.0, k1=0.0, k2=0.0, p1=0.0,
                      p2=0.0, k3=0.0, dtype=np.float64) -> np.ndarray:
    """Convenience constructor for the 9-vector intrinsics layout."""
    fy = fx if fy is None else fy
    return np.array([fx, fy, cx, cy, k1, k2, p1, p2, k3], dtype=dtype)


def project_camera_point(x_cam: jax.Array, intr: jax.Array,
                         model: CameraModel) -> jax.Array:
    """Camera-frame point → pixel. Shared tail of all projection paths."""
    z = x_cam[..., 2:3]
    xy = model.projection_sign * x_cam[..., :2] / z
    if model.use_distortion:
        xy = dist.distort(xy, intr[..., 4:9])
    f = intr[..., 0:2]
    pp = intr[..., 2:4]
    return f * xy + pp


def project_global(q: jax.Array, c: jax.Array, intr: jax.Array,
                   point: jax.Array, model: CameraModel) -> jax.Array:
    """Global-shutter world→pixel projection."""
    x_cam = quat.rotate(q, point - c)
    return project_camera_point(x_cam, intr, model)


def project_rolling(qa: jax.Array, ca: jax.Array, qb: jax.Array,
                    cb: jax.Array, intr: jax.Array, point: jax.Array,
                    t: jax.Array, model: CameraModel) -> jax.Array:
    """Rolling-shutter world→pixel: interpolate pose at row time t, project."""
    q, c = interpolate.interpolate_pose(qa, ca, qb, cb, t,
                                        model.rotation_interp)
    return project_global(q, c, intr, point, model)


def project(qa: jax.Array, ca: jax.Array, qb: jax.Array, cb: jax.Array,
            intr: jax.Array, point: jax.Array, t: jax.Array,
            model: CameraModel) -> jax.Array:
    """Unified projection: rolling-shutter if the model says so, else GS.

    The GS path ignores (qb, cb, t) — XLA dead-code-eliminates them, and the
    Jacobian w.r.t. pose_b is exactly zero, which the assembly relies on.
    """
    if model.rolling_shutter:
        return project_rolling(qa, ca, qb, cb, intr, point, t, model)
    return project_global(qa, ca, intr, point, model)


def depth_in_camera(qa: jax.Array, ca: jax.Array, qb: jax.Array,
                    cb: jax.Array, point: jax.Array, t: jax.Array,
                    model: CameraModel) -> jax.Array:
    """z-depth of a world point in the (possibly interpolated) camera frame.

    Used by synthetic generators and cheirality checks (sign matches
    projection_sign: positive means "in front").
    """
    if model.rolling_shutter:
        q, c = interpolate.interpolate_pose(qa, ca, qb, cb, t,
                                            model.rotation_interp)
    else:
        q, c = qa, ca
    z = quat.rotate(q, point - c)[..., 2]
    return model.projection_sign * z
