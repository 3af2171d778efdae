"""Robust loss functions and the Triggs corrector.

Parity: ``ceres::LossFunction`` (Huber/SoftL1/Cauchy) and ``ceres::Corrector``
(SURVEY.md §2 C9; BASELINE.json:10 "robust Huber loss").

A loss ρ maps the *squared* residual norm s = ‖r‖² to a robustified cost;
total cost = ½ Σ ρ(s) (Ceres convention).  ``evaluate`` returns
(ρ, ρ′, ρ″) analytically.  ``correct`` applies the Triggs correction so a
plain Gauss-Newton step on the corrected (r̃, J̃) equals the robustified
step: r̃ = (√ρ′ / (1−α))·r,  J̃ = √ρ′·(J − (α/s)·r rᵀ J),
α the Triggs root (zero in the ρ″ ≤ 0 outlier regime — the entire Huber
tail — so the common case is a pure √ρ′ rescale).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

LOSS_KINDS = ("trivial", "huber", "soft_l1", "cauchy")


@dataclasses.dataclass(frozen=True)
class Loss:
    """Static (jit-hashable) robust loss spec.

    ``scale`` is the Ceres loss parameter ``a`` in *residual units*
    (e.g. pixels): Huber transitions at ‖r‖ = a.
    """
    kind: str = "trivial"
    scale: float = 1.0

    def __post_init__(self):
        if self.kind not in LOSS_KINDS:
            raise ValueError(f"loss kind must be one of {LOSS_KINDS}")
        if self.scale <= 0:
            raise ValueError("loss scale must be positive")

    def evaluate(self, s: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        """ρ(s), ρ′(s), ρ″(s) for squared norm s ≥ 0."""
        a2 = self.scale * self.scale
        if self.kind == "trivial":
            one = jnp.ones_like(s)
            return s, one, jnp.zeros_like(s)
        if self.kind == "huber":
            # s ≤ a²: ρ = s;  s > a²: ρ = 2a√s − a².
            r_ = jnp.sqrt(jnp.maximum(s, a2))  # only used in outlier branch
            out = s > a2
            rho = jnp.where(out, 2.0 * self.scale * r_ - a2, s)
            rho1 = jnp.where(out, self.scale / r_, jnp.ones_like(s))
            rho2 = jnp.where(out, -0.5 * self.scale / (r_ * s + 1e-30),
                             jnp.zeros_like(s))
            return rho, rho1, rho2
        if self.kind == "soft_l1":
            t = 1.0 + s / a2
            sq = jnp.sqrt(t)
            return 2.0 * a2 * (sq - 1.0), 1.0 / sq, -0.5 / (a2 * t * sq)
        if self.kind == "cauchy":
            t = 1.0 + s / a2
            return a2 * jnp.log(t), 1.0 / t, -1.0 / (a2 * t * t)
        raise AssertionError(self.kind)

    def correct(self, r: jax.Array, J: jax.Array | None,
                ) -> tuple[jax.Array, jax.Array | None, jax.Array]:
        """Triggs-correct residual (…, d) and optional Jacobian (…, d, p).

        Returns (r̃, J̃, ρ) — ρ per residual block, so Σ½ρ is the true
        robustified cost.  Trivial loss short-circuits to the inputs.
        """
        if self.kind == "trivial":
            s = jnp.sum(r * r, axis=-1)
            return r, J, s
        s = jnp.sum(r * r, axis=-1)
        rho, rho1, rho2 = self.evaluate(s)
        sqrt_rho1 = jnp.sqrt(jnp.maximum(rho1, 1e-30))
        # Triggs α: root of α² − α + s·ρ″/ρ′ = 0 with α < 1.  Only active
        # when ρ″ > 0 (none of our losses) — kept for completeness/parity.
        d = jnp.maximum(1.0 + 2.0 * s * rho2 / rho1, 0.0)
        alpha = jnp.where(rho2 > 0.0, 1.0 - jnp.sqrt(d), 0.0)
        res_scale = sqrt_rho1 / (1.0 - alpha)
        r_t = res_scale[..., None] * r
        J_t = None
        if J is not None:
            alpha_over_s = jnp.where(s > 0, alpha / jnp.maximum(s, 1e-30), 0.0)
            rTJ = jnp.einsum("...d,...dp->...p", r, J)
            J_t = sqrt_rho1[..., None, None] * (
                J - alpha_over_s[..., None, None]
                * r[..., :, None] * rTJ[..., None, :])
        return r_t, J_t, rho
