"""Pose interpolation across rolling-shutter scanlines.

Parity: reference's templated lerp/slerp pose interpolation (SURVEY.md §2
C5/C6; BASELINE.json:5 "per-row pose interpolation: linear/SLERP between
keyframe poses").  Two rotation modes, both required by the judged configs:

* ``"nlerp"``   — normalized linear quaternion interpolation (config 3,
  "linear pose interpolation per scanline").
* ``"slerp"``   — geodesic quaternion SLERP (config 4).
* ``"lerp_aa"`` — linear interpolation of global angle-axis vectors; kept
  for parity/experiments, but discontinuous where the global rotation
  angle crosses π — prefer nlerp for the linear mode.

Camera center is always linearly interpolated.  ``t ∈ [0, 1]`` is the
row-normalized shutter time (``t = row / image_height``; ``t = 0`` top row).
Global shutter is exactly the ``t = 0`` / ``pose_b == pose_a`` special case,
which both modes reduce to smoothly — the key consistency oracle used by the
tests (SURVEY.md §4.2 item 1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import quaternion as quat

ROTATION_INTERP_MODES = ("slerp", "nlerp", "lerp_aa")


def interpolate_rotation(qa: jax.Array, qb: jax.Array, t: jax.Array,
                         mode: str) -> jax.Array:
    """Interpolate rotation between two unit quaternions. ``mode`` is static."""
    if mode == "slerp":
        return quat.slerp(qa, qb, t)
    if mode == "nlerp":
        return quat.nlerp(qa, qb, t)
    if mode == "lerp_aa":
        return quat.lerp_axis_angle(quat.to_axis_angle(qa),
                                    quat.to_axis_angle(qb), t)
    raise ValueError(f"unknown rotation interpolation mode: {mode!r}")


def interpolate_pose(qa: jax.Array, ca: jax.Array,
                     qb: jax.Array, cb: jax.Array,
                     t: jax.Array, mode: str) -> tuple[jax.Array, jax.Array]:
    """(q(t), c(t)) between keyframe poses (qa, ca) and (qb, cb)."""
    q = interpolate_rotation(qa, qb, t, mode)
    tt = jnp.asarray(t)[..., None]
    c = (1.0 - tt) * ca + tt * cb
    return q, c
