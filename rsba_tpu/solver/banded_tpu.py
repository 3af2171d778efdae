"""Banded Schur solver driven by the fused Pallas kernel (the TPU path).

Same math as solver/banded.py (the XLA window engine, which remains the
portable oracle), but ``prepare`` runs the fused evaluate+assemble Pallas
kernel (kernels/fused.py) and ``solve_step`` works on the kernel's
**planes layout** — per-point quantities carry the point axis G on the
TPU lane dimension:

    g_pt (NR, 3, G),  C (NR, 6, G) packed symmetric,  F (NR, W, 18, G)

so the band contractions are lane-major MXU matmuls instead of XLA
einsums over (…, 6, 3)-trailing tensors (which pad 6→8/3→128 lanes and
run ~20× off bandwidth).

Internal parameter layout: points as (NR, 3, G) planes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import quaternion as quat
from ..kernels import fused
from ..problem.types import POSE_DOF, Params, Problem
from . import banded
from .options import SolverOptions
from .pcg import pcg
from .schur import _lm_scaled_damp
from .window import WindowPlan

C6_DIAG = fused.C6_DIAG
C6_PAIRS = fused.C6_PAIRS


# --- layout helpers ----------------------------------------------------------

def to_internal(params: Params, plan: WindowPlan) -> Params:
    """External (M, 3) points → planes (NR, 3, G)."""
    pts = plan.gather_points(params.points)          # (NR, G, 3)
    return params.replace(points=pts.transpose(0, 2, 1))


def to_external(params: Params, plan: WindowPlan) -> Params:
    """Planes (NR, 3, G) → external (M, 3)."""
    pts_w = params.points.transpose(0, 2, 1)         # (NR, G, 3)
    return params.replace(points=plan.scatter_points(pts_w))


def _as_v1(params: Params, plan: WindowPlan) -> Params:
    """Planes-internal params → window-internal (NR·G, 3) params, for the
    shared residual/cost path in solver/banded.py."""
    return params.replace(
        points=params.points.transpose(0, 2, 1).reshape(-1, 3))


def invert_sym3_planes(c6: jax.Array) -> jax.Array:
    """Closed-form inverse of symmetric PD 3×3 packed planes (NR, 6, G)."""
    a, b, c, d, e, f = (c6[:, i] for i in range(6))   # 00 01 02 11 12 22
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    det = a * co00 + b * co01 + c * co02
    inv = 1.0 / det
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    return jnp.stack([co00, co01, co02, co11, co12, co22], axis=1) * \
        inv[:, None]


def _sym_full(c6: jax.Array) -> jax.Array:
    """(NR, 6, G) packed symmetric → (NR, 3, 3, G) full."""
    a, b, c, d, e, f = (c6[:, i] for i in range(6))
    return jnp.stack([
        jnp.stack([a, b, c], axis=1),
        jnp.stack([b, d, e], axis=1),
        jnp.stack([c, e, f], axis=1)], axis=1)


# All solve_step algebra below stays on ≤4-D arrays with the point axis G
# on the TPU lane dimension.  5-D intermediates like (NR, W, 6, 3, G) are
# poison at config-5 scale: XLA's layout assignment can put a tiny axis
# (W or the 3) on the 128-wide lane dim, padding a 753 MB tensor to 14 GB
# (observed: HBM OOM, 30.3 GB program at 10k poses / 1M points).

#: packed symmetric component index for (x, y) pairs
_C6_AT = {(0, 0): 0, (0, 1): 1, (1, 0): 1, (0, 2): 2, (2, 0): 2,
          (1, 1): 3, (1, 2): 4, (2, 1): 4, (2, 2): 5}


def _cinv_apply(c6inv: jax.Array, v: jax.Array) -> jax.Array:
    """(NR, 6, G) packed symmetric × (NR, 3, G) → (NR, 3, G)."""
    return jnp.stack([
        sum(c6inv[:, _C6_AT[(x, y)], :] * v[:, y, :] for y in range(3))
        for x in range(3)], axis=1)


def _yg_major(comps, NR: int, W: int) -> jax.Array:
    """18 (NR, W, G) component planes, indexed 3a+y → (NR, W·6, 3G) with
    rows (w·6 + a) and the (y, g) pair flattened as the contraction axis."""
    rows = [jnp.concatenate([comps[3 * a + y] for y in range(3)], axis=-1)
            for a in range(6)]                        # each (NR, W, 3G)
    return jnp.stack(rows, axis=2).reshape(NR, W * 6, -1)


def fcf_band_planes(F: jax.Array, c6inv: jax.Array,
                    plan: WindowPlan) -> jax.Array:
    """F C⁻¹ Fᵀ folded into the (P, W, 6, 6) band, planes layout.

    One batched MXU matmul computes ALL (w, w+d) window pairs at once:
    both sides are laid out (NR, W·6, 3·G) with the point dimension y and
    the lane axis G flattened into one 336-wide contraction axis, so the
    product (NR, W·6, W·6) directly contains every 6×6 band block as a
    CONTIGUOUS slice.  Every tensor stays ≤3-D with a wide minor axis —
    5-D einsum forms let XLA pad a tiny axis onto the 128 lanes (19×
    memory blowup → HBM OOM at config-5 scale, see layout note above).

    The rhs is a PURE reshape of F — the kernel's (NR, W, 18, G) output
    is a-major/p-minor, i.e. exactly (NR, W·6, 3·G) flattened — and the
    band extraction is one take_along_axis diagonal-shift gather plus a
    SINGLE fold.  Measured on chip at config-4 scale: 11.0 → 3.8 ms for
    the whole routine vs the per-d slice/stack/fold form (W separate
    row-level scatter-adds and a full rhs copy).
    """
    NR, W = F.shape[0], F.shape[1]
    # Y = F · C⁻¹ per point (block-diagonal in the camera index):
    # Y[3a+y] = Σ_x F[3a+x] C⁻¹[x, y]
    Ycomps = [sum(F[:, :, 3 * a + x, :]
                  * c6inv[:, _C6_AT[(x, y)], :][:, None, :]
                  for x in range(3))
              for a in range(6) for y in range(3)]    # index 3a+y
    lhs = _yg_major(Ycomps, NR, W)                    # (NR, W6, 3G)
    rhs = F.reshape(NR, W * 6, -1)
    full = jax.lax.dot_general(
        lhs, rhs, (((2,), (2,)), ((0,), (0,))))       # (NR, W6, W6)
    # band[n, w, d] = full6[n, w, :, w+d, :]: diagonal-shifted gather
    # over the second window axis, then ONE (NR, W)-row fold for every
    # (w, d) pair at once.
    full6 = full.reshape(NR, W, 6, W, 6)
    wd = jnp.arange(W)[:, None] + jnp.arange(W)[None, :]      # w + d
    gath = jnp.take_along_axis(full6, (wd % W)[None, :, None, :, None],
                               axis=3)                # (NR, w, 6, d, 6)
    gath = gath * (wd < W)[None, :, None, :, None]
    v = gath.transpose(0, 1, 3, 2, 4)                 # (NR, w, d, 6, 6)
    folded = plan.fold(v.reshape(NR, W, W * 36))      # (P, W*36)
    return folded.reshape(plan.n_poses, W, 6, 6)


def e_apply_planes(F: jax.Array, y0: jax.Array,
                   plan: WindowPlan) -> jax.Array:
    """(E·y)_cam from planes: F (NR, W, 18, G), y0 (NR, 3, G) → (P, 6)."""
    cols = []
    for a in range(6):
        acc = sum(F[:, :, 3 * a + x, :] * y0[:, x, :][:, None, :]
                  for x in range(3))
        cols.append(jnp.sum(acc, axis=-1))            # (NR, W)
    return plan.fold(jnp.stack(cols, axis=2))         # (P, 6)


def et_apply_planes(F: jax.Array, pw: jax.Array) -> jax.Array:
    """Eᵀ·p per point: F (NR, W, 18, G), pw (NR, W, 6) → (NR, 3, G)."""
    outs = []
    for x in range(3):
        acc = sum(F[:, :, 3 * a + x, :] * pw[:, :, a][:, :, None]
                  for a in range(6))
        outs.append(jnp.sum(acc, axis=1))             # (NR, G)
    return jnp.stack(outs, axis=1)


# --- prepare -----------------------------------------------------------------

def _kernel_inputs(params: Params, plan: WindowPlan, problem: Problem):
    # Per-slot pose planes (NR, 16, L, G): the W-window compare-select runs
    # here in XLA (Mosaic cannot splat a (RT,1,1) window value over both
    # sublanes and lanes inside the kernel); order = fused._POSE_PLANES.
    # One (NR, W, 8) window per shutter side → a single one-hot select
    # each (vs six separate slot-sized passes).
    win = jnp.concatenate(
        [plan.pose_windows(params.q), plan.pose_windows(params.c),
         plan.pose_windows(problem.pose_free)[..., None]], axis=-1)
    sa = plan.select_a(win)                          # (NR, G, L, 8)
    sb = plan.select_b(win)
    # _POSE_PLANES order: qa(4) ca(3) qb(4) cb(3) pf_a pf_b.
    pose = jnp.concatenate(
        [sa[..., :7], sb[..., :7], sa[..., 7:], sb[..., 7:]],
        axis=-1).transpose(0, 3, 2, 1)               # (NR, 16, L, G)
    ptf = plan.gather_point_scalar(problem.point_free)
    uv = plan.uv.transpose(0, 3, 2, 1)               # (NR, 2, L, G)
    tt = plan.t.transpose(0, 2, 1)                   # (NR, L, G)
    mask = plan.mask.transpose(0, 2, 1)
    offs = plan.offs_a.transpose(0, 2, 1)
    rsf = plan.rs_ab.transpose(0, 2, 1)
    intr = params.intr[0][None, :]                   # (1, 9)
    return (pose, params.points, ptf, uv, tt, mask, offs, rsf, intr,
            plan.W)


def prepare(plan: WindowPlan, problem: Problem, options: SolverOptions,
            params: Params, interpret: bool, exact: bool | None = None):
    with jax.named_scope("fused_evaluate_assemble"):
        out = fused.fused_evaluate_assemble(
            *_kernel_inputs(params, plan, problem),
            model=problem.model, loss=problem.loss,
            row_tile=options.row_tile, interpret=interpret, exact=exact)
    P = plan.n_poses
    g_cam = plan.fold(out["gw"])                     # (P, 6)
    B0 = plan.fold(out["b0"]).reshape(P, 6, 6)
    B1 = plan.fold(out["b1"]).reshape(P, 6, 6)
    g_pt, c6, F = out["g_pt"], out["c6"], out["F"]

    gmax = jnp.maximum(jnp.max(jnp.abs(g_cam)), jnp.max(jnp.abs(g_pt)))
    d_cam = jnp.diagonal(B0, axis1=-2, axis2=-1)     # (P, 6)
    d_pt = c6[:, C6_DIAG, :]                         # (NR, 3, G)
    if options.jacobi_scaling:
        s_cam = jnp.where(
            d_cam > 0, 1.0 / (1.0 + jnp.sqrt(jnp.maximum(d_cam, 0.0))), 1.0)
        s_pt = jnp.where(
            d_pt > 0, 1.0 / (1.0 + jnp.sqrt(jnp.maximum(d_pt, 0.0))), 1.0)
        g_cam = g_cam * s_cam
        g_pt = g_pt * s_pt
        c6 = c6 * jnp.stack([s_pt[:, p] * s_pt[:, q]
                             for (p, q) in C6_PAIRS], axis=1)
        scw = plan.pose_windows(s_cam)               # (NR, W, 6)
        # Per-component scaling keeps F 4-D (see layout note above).
        F = jnp.stack([
            F[:, :, 3 * a + p, :] * scw[:, :, a][:, :, None]
            * s_pt[:, p, :][:, None, :]
            for a in range(6) for p in range(3)], axis=2)
        s_next = jnp.concatenate([s_cam[1:], jnp.zeros_like(s_cam[:1])])
        B0 = B0 * s_cam[:, :, None] * s_cam[:, None, :]
        B1 = B1 * s_cam[:, :, None] * s_next[:, None, :]
    else:
        s_cam = jnp.ones_like(d_cam)
        s_pt = jnp.ones_like(d_pt)
    return {
        "cost": out["cost"], "g_cam": g_cam, "g_pt": g_pt, "c6": c6,
        "F": F, "B0": B0, "B1": B1, "s_cam": s_cam, "s_pt": s_pt,
        "gradient_max_norm": gmax,
    }


def rho_slots(plan: WindowPlan, problem: Problem, params: Params):
    """Per-slot robust costs ρ (NR, G, L) from the XLA residual path.

    The pairwise cost decrease must difference ρ values from the SAME
    evaluator: the fused kernel's fast-math atan (exact=False on chip)
    and the XLA path disagree by ~1e-6 relative per slot, the same order
    as function_tolerance·cost near convergence — differencing across
    evaluators can drive accept/terminate decisions (ADVICE r4).  The
    device loop therefore seeds ρ_ref here once per dispatch and carries
    the accepted candidate's ρ forward, so every decrease is XLA−XLA."""
    r = banded.residuals_raw(_as_v1(params, plan), plan, problem)
    rho, _, _ = problem.loss.evaluate(jnp.sum(r * r, axis=-1))
    return rho


def cost_decrease_pair(plan: WindowPlan, problem: Problem, rho_ref,
                       cand: Params):
    """(Σ (ρ_ref − ρ_new)/2, ρ_new) — one XLA residual pass on the
    candidate; ρ_ref is the loop-carried ρ of the current params."""
    rho_new = rho_slots(plan, problem, cand)
    decrease = 0.5 * jnp.sum(
        jnp.where(plan.mask > 0, rho_ref - rho_new, 0.0))
    return decrease, rho_new


# --- solve step --------------------------------------------------------------

def schur_band_planes(F: jax.Array, c6inv: jax.Array, B0: jax.Array,
                      B1: jax.Array, lm_cam: jax.Array,
                      plan: WindowPlan) -> jax.Array:
    """S_λ band (P, W, 6, 6) from planes-layout F and packed C⁻¹."""
    W = plan.W
    S = -fcf_band_planes(F, c6inv, plan)             # (P, W, 6, 6)
    S = S.at[:, 0].add(B0 + jax.vmap(jnp.diag)(lm_cam))
    if W > 1:
        S = S.at[:, 1].add(B1)
    return S


def solve_step(plan: WindowPlan, options: SolverOptions, aux, radius):
    P = plan.n_poses
    F, c6 = aux["F"], aux["c6"]
    g_cam, g_pt = aux["g_cam"], aux["g_pt"]

    d_cam = jnp.diagonal(aux["B0"], axis1=-2, axis2=-1)
    lm_cam, _ = _lm_scaled_damp(d_cam.reshape(-1), radius, options)
    lm_cam = lm_cam.reshape(P, POSE_DOF)
    d_pt = c6[:, C6_DIAG, :]
    lm_pt, _ = _lm_scaled_damp(d_pt.reshape(-1), radius, options)
    lm_pt = lm_pt.reshape(d_pt.shape)                # (NR, 3, G)
    c6_l = c6.at[:, C6_DIAG, :].add(lm_pt)
    c6inv = invert_sym3_planes(c6_l)                 # (NR, 6, G) packed

    with jax.named_scope("schur_band"):
        S = schur_band_planes(F, c6inv, aux["B0"], aux["B1"], lm_cam, plan)

    # rhs: b = −g_cam − E C_λ⁻¹ (−g_pt)
    y0 = _cinv_apply(c6inv, -g_pt)
    b = -g_cam - e_apply_planes(F, y0, plan)

    precond = banded.make_band_preconditioner(S, options.preconditioner)

    def matvec(p_flat):
        return banded.band_matvec(S, p_flat.reshape(P, POSE_DOF)).reshape(-1)

    with jax.named_scope("pcg"):
        dc_flat, r_cg, iters = pcg(matvec, precond, b.reshape(-1),
                                   options.max_cg_iterations, options.cg_eta)
    dc = dc_flat.reshape(P, POSE_DOF)

    # Back-substitute landmarks (planes layout).
    with jax.named_scope("back_substitute"):
        pw = plan.pose_windows(dc)                   # (NR, W, 6)
        dp = _cinv_apply(c6inv, -g_pt - et_apply_planes(F, pw))

    gTdx = jnp.sum(g_cam * dc) + jnp.sum(g_pt * dp)
    dDd = jnp.sum(lm_cam * dc * dc) + jnp.sum(lm_pt * dp * dp)
    predicted = 0.5 * (dDd - gTdx) - 0.5 * jnp.dot(r_cg, dc_flat)

    dx = {"pose": aux["s_cam"] * dc, "pt": aux["s_pt"] * dp}
    return dx, predicted, iters


# --- solver-fns dict ----------------------------------------------------------

def make_tpu_solver_fns(problem: Problem, plan: WindowPlan,
                        options: SolverOptions, interpret: bool = False,
                        exact: bool | None = None):
    """lm.solve phase functions: Pallas prepare + planes solve_step.

    ``interpret=True`` runs the kernel in Pallas interpreter mode (CPU
    tests); on TPU leave False.  ``exact`` forces the kernel's atan path
    (see fused.fused_evaluate_assemble).
    """
    from .lm import inlier_threshold
    thresh = inlier_threshold(problem)

    def apply_step(plan: WindowPlan, problem: Problem, params: Params, dx):
        ptf = plan.gather_point_scalar(problem.point_free)   # (NR, G)
        d_pose = dx["pose"] * problem.pose_free[:, None]
        d_pt = dx["pt"] * ptf[:, None, :]
        q = quat.boxplus(params.q, d_pose[:, :3])
        c = params.c + d_pose[:, 3:]
        new = params.replace(q=q, c=c, points=params.points + d_pt)
        step_norm = jnp.sqrt(jnp.sum(d_pose ** 2) + jnp.sum(d_pt ** 2))
        x_norm = jnp.sqrt(
            jnp.sum(params.c ** 2) + jnp.sum(params.points ** 2)
            + jnp.sum(params.q ** 2) + jnp.sum(params.intr ** 2))
        return new, step_norm, x_norm

    def _wrap(f, *bound):
        jf = jax.jit(f)

        def call(*args):
            with jax.default_matmul_precision(options.matmul_precision):
                return jf(*bound, *args)

        call._jitted = jf       # for utils.roofline (XLA cost analysis)
        call._bound = bound
        call._precision = options.matmul_precision
        return call

    raw = {
        "bound": (plan, problem),
        "prepare": lambda b, p: prepare(b[0], b[1], options, p, interpret,
                                        exact),
        "solve_step": lambda b, aux, radius: solve_step(
            b[0], options, aux, radius),
        "apply_step": lambda b, params, dx: apply_step(
            b[0], b[1], params, dx),
        "cost_decrease": lambda b, po, pn: banded.cost_decrease(
            b[0], b[1], _as_v1(po, b[0]), _as_v1(pn, b[0])),
        "rho_slots": lambda b, p: rho_slots(b[0], b[1], p),
        "cost_decrease_pair": lambda b, rho_ref, pn: cost_decrease_pair(
            b[0], b[1], rho_ref, pn),
    }

    return {
        "raw": raw,
        "prepare": _wrap(
            lambda pl_, pr_, p: prepare(pl_, pr_, options, p, interpret,
                                        exact),
            plan, problem),
        "solve_step": _wrap(
            lambda pl_, aux, radius: solve_step(pl_, options, aux, radius),
            plan),
        "apply_step": _wrap(apply_step, plan, problem),
        "cost": _wrap(
            lambda pl_, pr_, p: banded.cost_only(pl_, pr_, _as_v1(p, pl_)),
            plan, problem),
        "cost_decrease": _wrap(
            lambda pl_, pr_, a, b: banded.cost_decrease(
                pl_, pr_, _as_v1(a, pl_), _as_v1(b, pl_)),
            plan, problem),
        "error_stats": _wrap(
            lambda pl_, pr_, p: banded.error_stats(
                pl_, pr_, _as_v1(p, pl_), thresh),
            plan, problem),
        "to_internal": _wrap(lambda pl_, p: to_internal(p, pl_), plan),
        "to_external": _wrap(lambda pl_, p: to_external(p, pl_), plan),
        "engine": ("banded_schur", "pallas"),
    }
