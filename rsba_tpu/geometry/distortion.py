"""Radial-tangential (Brown–Conrady) lens distortion.

Parity target: the reference's templated distortion in its camera header and
Ceres's BAL-style radial model (SURVEY.md §2 C4; BASELINE.json:5
"radial/tangential distortion").  Model matches OpenCV's ``distortPoints``:

    r² = x² + y²
    radial = 1 + k1·r² + k2·r⁴ + k3·r⁶
    x' = x·radial + 2·p1·x·y + p2·(r² + 2x²)
    y' = y·radial + p1·(r² + 2y²) + 2·p2·x·y

Coefficients are packed ``[k1, k2, p1, p2, k3]`` (OpenCV order).  A zero
vector is the identity (property-tested).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

#: number of distortion coefficients in a full pack
NUM_COEFFS = 5


def distort(xy: jax.Array, coeffs: jax.Array) -> jax.Array:
    """Apply distortion to normalized image coordinates.

    Args:
      xy: (..., 2) normalized (pre-intrinsics) image points.
      coeffs: (..., 5) ``[k1, k2, p1, p2, k3]`` (broadcastable).

    Returns:
      (..., 2) distorted normalized coordinates.
    """
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2, k3 = (coeffs[..., i] for i in range(5))
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort(xy_d: jax.Array, coeffs: jax.Array, iters: int = 8) -> jax.Array:
    """Iteratively invert :func:`distort` (fixed-point, OpenCV-style).

    Used only for initialization paths (e.g. PnP from distorted detections),
    never inside the optimizer hot loop.  ``iters`` is static so the loop
    unrolls under jit.
    """
    xy = xy_d

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        k1, k2, p1, p2, k3 = (coeffs[..., i] for i in range(5))
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack(
            [(xy_d[..., 0] - dx) / radial, (xy_d[..., 1] - dy) / radial],
            axis=-1,
        )

    return jax.lax.fori_loop(0, iters, body, xy)
