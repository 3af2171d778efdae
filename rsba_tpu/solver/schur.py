"""Schur-complement solver: landmark elimination + dense blocked Cholesky.

Parity: Ceres ``DENSE_SCHUR`` — ``SchurEliminator`` + dense Cholesky of the
reduced camera system (SURVEY.md §2 C12-C14, §3.1 hot loops #1-2).

TPU-native formulation: instead of Ceres's per-point outer-product scatter
into a block-sparse S, we materialize the **camera-point matrix Eᵀ densely
per point** — shape (M, 3, Dc) — and form

    E C_λ⁻¹ Eᵀ = Σ_j A_jᵀ (C_λ⁻¹)_j A_j = einsum('mjd,mje->de', A, C_λ⁻¹A)

one big (3M × Dc)ᵀ(3M × Dc) matmul that maps straight onto the MXU,
chunked over points when A would not fit memory.  The per-point 3×3
inverses are a batched closed-form solve (hot loop #2's 3×3 inverts,
vectorized).  Landmarks never enter the factored system (SURVEY.md §5.7).

Tangent layout: camera vector x_cam = [poses (P·6) | intrinsics (K·ni)],
points eliminated.  Column bases: pose p → p·6, intr k → 6P + k·ni.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..problem.types import POSE_DOF, Params, Problem
from . import assembly, flatplan, residuals
from .options import SolverOptions
from .residuals import Evaluation


class CamEntry(NamedTuple):
    """One camera-side Jacobian slot: J (N,2,w) + its column base (N,)."""
    J: jax.Array
    base: jax.Array
    width: int


def camera_entries(ev: Evaluation, problem: Problem,
                   shapes: assembly.TangentShapes) -> list[CamEntry]:
    """Static list of camera-side Jacobian entries per observation.

    Global shutter: the pose_b Jacobian is identically zero (camera.project
    ignores it), so its entry is statically dropped.
    """
    obs = problem.obs
    entries = [CamEntry(ev.J_pose[:, :, 0, :], obs.pose_a * POSE_DOF,
                        POSE_DOF)]
    if problem.model.rolling_shutter:
        entries.append(CamEntry(ev.J_pose[:, :, 1, :], obs.pose_b * POSE_DOF,
                                POSE_DOF))
    if shapes.ni > 0:
        p6 = shapes.n_poses * POSE_DOF
        entries.append(CamEntry(ev.J_intr, p6 + obs.intr_idx * shapes.ni,
                                shapes.ni))
    return entries


def camera_gradient(ev: Evaluation, problem: Problem,
                    shapes: assembly.TangentShapes) -> jax.Array:
    """g_cam (Dc,) = camera part of J̃ᵀr̃."""
    Dc = shapes.cam_dim
    g = jnp.zeros((Dc,), ev.r.dtype)
    for e in camera_entries(ev, problem, shapes):
        contrib = jnp.einsum("nrw,nr->nw", e.J, ev.r)
        cols = e.base[:, None] + jnp.arange(e.width)[None, :]
        g = g.at[cols].add(contrib)
    return g


def camera_jtj_diag(ev: Evaluation, problem: Problem,
                    shapes: assembly.TangentShapes) -> jax.Array:
    """diag of the camera-camera block B (Dc,)."""
    d = jnp.zeros((shapes.cam_dim,), ev.r.dtype)
    for e in camera_entries(ev, problem, shapes):
        cols = e.base[:, None] + jnp.arange(e.width)[None, :]
        d = d.at[cols].add(jnp.sum(e.J ** 2, axis=1))
    return d


def assemble_B_dense(ev: Evaluation, problem: Problem,
                     shapes: assembly.TangentShapes) -> jax.Array:
    """Dense camera-camera block B = Σ J_camᵀ J_cam (Dc, Dc)."""
    Dc = shapes.cam_dim
    B = jnp.zeros((Dc, Dc), ev.r.dtype)
    entries = camera_entries(ev, problem, shapes)
    for ei in entries:
        ci = ei.base[:, None] + jnp.arange(ei.width)[None, :]
        for ek in entries:
            ck = ek.base[:, None] + jnp.arange(ek.width)[None, :]
            blk = jnp.einsum("nri,nrk->nik", ei.J, ek.J)
            B = B.at[ci[:, :, None], ck[:, None, :]].add(blk)
    return B


def assemble_E_dense(ev: Evaluation, problem: Problem,
                     shapes: assembly.TangentShapes) -> jax.Array:
    """Eᵀ stored per point: A (M, 3, Dc) with A_j = E_jᵀ.

    A[j, :, cols_i] accumulates J_pt_iᵀ J_cam_i over observations i of
    point j.
    """
    M = shapes.n_points
    Dc = shapes.cam_dim
    A = jnp.zeros((M, 3, Dc), ev.r.dtype)
    pt = problem.obs.point
    for e in camera_entries(ev, problem, shapes):
        blk = jnp.einsum("nrp,nrw->npw", ev.J_pt, e.J)        # (N, 3, w)
        cols = e.base[:, None] + jnp.arange(e.width)[None, :]  # (N, w)
        A = A.at[pt[:, None, None], jnp.arange(3)[None, :, None],
                 cols[:, None, :]].add(blk)
    return A


# --- plan-based assembly (the TPU hot path) ---------------------------------
#
# The legacy assemblers above scatter per-observation blocks with
# duplicate indices — serialized on TPU (338 ms for B, 157 ms for E at
# config-2 scale).  These variants reduce via host-built groupings
# (solver/flatplan.py): gather → dense slot-sum → near-unique row fold,
# plus a one-hot MXU matmul for E's per-camera column placement.  Same
# math, different summation order (f32-rounding-level differences only);
# the legacy forms remain the cross-check oracles and the sharded
# solver's per-shard kernels.

def _col_products(Ji: jax.Array, Jk: jax.Array) -> jax.Array:
    """All (i, k) column products Σ_r Ji[:, r, i]·Jk[:, r, k] → (wi·wk, N).

    TPU layout rule (same as kernels/fused.py's planes layout): keep the
    observation axis N on the minor/lane dimension and unroll the tiny
    block dims in Python — (N, w, w) block tensors put two tiny dims
    minor, which XLA pads to (8, 128) tiles (measured 13 GB of temp for
    one einsum→gather chain at config-2 scale).
    """
    wi, wk = Ji.shape[2], Jk.shape[2]
    return jnp.stack(
        [sum(Ji[:, r, i] * Jk[:, r, k] for r in range(Ji.shape[1]))
         for i in range(wi) for k in range(wk)], axis=0)


def _grad_cols(J: jax.Array, r: jax.Array) -> jax.Array:
    """Σ_s J[:, s, i]·r[:, s] for all i → (w, N)."""
    return jnp.stack(
        [sum(J[:, s, i] * r[:, s] for s in range(J.shape[1]))
         for i in range(J.shape[2])], axis=0)


def gradient_blocks_planned(ev: Evaluation, problem: Problem,
                            shapes: assembly.TangentShapes,
                            plans: flatplan.FlatPlans):
    """g per block via plans: (P,6), (K,ni), (M,3)."""
    g_pose = plans.pose_a.reduce_cols(
        _grad_cols(ev.J_pose[:, :, 0, :], ev.r))
    if plans.pose_b is not None:
        g_pose = g_pose + plans.pose_b.reduce_cols(
            _grad_cols(ev.J_pose[:, :, 1, :], ev.r))
    if shapes.ni > 0:
        g_intr = plans.intr.reduce_cols(_grad_cols(ev.J_intr, ev.r))
    else:
        g_intr = jnp.zeros((shapes.n_intr, 0), ev.r.dtype)
    g_pt = plans.point.reduce_cols(_grad_cols(ev.J_pt, ev.r))
    return g_pose, g_intr, g_pt


def jtj_diag_planned(ev: Evaluation, problem: Problem,
                     shapes: assembly.TangentShapes,
                     plans: flatplan.FlatPlans):
    """diag(J̃ᵀJ̃): camera part flattened (Dc,), point part (M,3)."""

    def sq_cols(J):
        return jnp.stack(
            [sum(J[:, s, i] ** 2 for s in range(J.shape[1]))
             for i in range(J.shape[2])], axis=0)

    d_pose = plans.pose_a.reduce_cols(sq_cols(ev.J_pose[:, :, 0, :]))
    if plans.pose_b is not None:
        d_pose = d_pose + plans.pose_b.reduce_cols(
            sq_cols(ev.J_pose[:, :, 1, :]))
    parts = [d_pose.reshape(-1)]
    if shapes.ni > 0:
        parts.append(plans.intr.reduce_cols(
            sq_cols(ev.J_intr)).reshape(-1))
    d_cam = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    d_pt = plans.point.reduce_cols(sq_cols(ev.J_pt))
    return d_cam, d_pt


#: symmetric 3×3 component order (point Hessian blocks)
_SYM3 = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]


def point_hessian_planned(ev: Evaluation, plans: flatplan.FlatPlans):
    """C (M, 3, 3) via symmetric column components."""
    Jp = ev.J_pt
    comps = jnp.stack(
        [sum(Jp[:, r, d] * Jp[:, r, e] for r in range(Jp.shape[1]))
         for (d, e) in _SYM3], axis=0)
    c6 = plans.point.reduce_cols(comps)              # (M, 6)
    a, b, c, d, e, f = (c6[:, i] for i in range(6))
    row0 = jnp.stack([a, b, c], axis=-1)
    row1 = jnp.stack([b, d, e], axis=-1)
    row2 = jnp.stack([c, e, f], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def assemble_B_planned(ev: Evaluation, problem: Problem,
                       shapes: assembly.TangentShapes,
                       plans: flatplan.FlatPlans) -> jax.Array:
    """Dense camera-camera block B (Dc, Dc) with unique-index placement."""
    Dc = shapes.cam_dim
    p6 = shapes.n_poses * POSE_DOF
    ni = shapes.ni
    rs = plans.pose_b is not None
    Ja = ev.J_pose[:, :, 0, :]
    B = jnp.zeros((Dc, Dc), ev.r.dtype)

    def blocks(plan, Ji, Jk):
        wi, wk = Ji.shape[2], Jk.shape[2]
        return plan.reduce_cols(_col_products(Ji, Jk)).reshape(-1, wi, wk)

    B = flatplan.place_diag_blocks(
        B, blocks(plans.pose_a, Ja, Ja), 0, POSE_DOF)
    if rs:
        Jb = ev.J_pose[:, :, 1, :]
        B = flatplan.place_diag_blocks(
            B, blocks(plans.pose_b, Jb, Jb), 0, POSE_DOF)
        B = flatplan.place_pair_blocks(
            B, plans.ab, blocks(plans.ab.group, Ja, Jb),
            0, POSE_DOF, 0, POSE_DOF)
    if ni > 0:
        Ji = ev.J_intr
        B = flatplan.place_diag_blocks(
            B, blocks(plans.intr, Ji, Ji), p6, ni)
        B = flatplan.place_pair_blocks(
            B, plans.ai, blocks(plans.ai.group, Ja, Ji),
            0, POSE_DOF, p6, ni)
        if rs:
            B = flatplan.place_pair_blocks(
                B, plans.bi, blocks(plans.bi.group, Jb, Ji),
                0, POSE_DOF, p6, ni)
    return B


def assemble_E_planned(ev: Evaluation, problem: Problem,
                       shapes: assembly.TangentShapes,
                       plans: flatplan.FlatPlans) -> jax.Array:
    """Eᵀ per point, A (M, 3, Dc) — one-hot MXU placement, no scatter.

    Column components (x·w, N) → point-slot layout (C, L, R) → one
    batched contraction against the per-slot camera one-hot → fold.
    """
    M = shapes.n_points
    pp = plans.point

    def entry_part(J, slot_ids, n_e):
        w = J.shape[2]
        comps = _col_products(ev.J_pt, J)            # (3w, N)
        g = pp.gather_cols(comps)                    # (3w, L, R)
        oh = jax.nn.one_hot(slot_ids.T, n_e, dtype=comps.dtype)  # (L,R,E)
        out = jnp.einsum("clr,lre->rce", g, oh)      # (R, 3w, E)
        folded = pp.fold_rows(out)                   # (M, 3w, E)
        part = folded.reshape(M, 3, w, n_e).transpose(0, 1, 3, 2)
        return part.reshape(M, 3, n_e * w)

    A = entry_part(ev.J_pose[:, :, 0, :], plans.pt_pose_a, shapes.n_poses)
    if plans.pose_b is not None:
        A = A + entry_part(ev.J_pose[:, :, 1, :], plans.pt_pose_b,
                           shapes.n_poses)
    if shapes.ni > 0:
        A = jnp.concatenate(
            [A, entry_part(ev.J_intr, plans.pt_intr, shapes.n_intr)],
            axis=2)
    return A


def _use_planned_E(shapes: assembly.TangentShapes,
                   plans: flatplan.FlatPlans) -> bool:
    n_e = max(shapes.n_poses, shapes.n_intr)
    return (plans.point.R * plans.point.L * n_e
            <= flatplan.ONEHOT_MAX_ELEMS)


def invert_3x3_psd(C: jax.Array) -> jax.Array:
    """Batched closed-form inverse of symmetric PD 3×3 blocks (…,3,3)."""
    a, b, c = C[..., 0, 0], C[..., 0, 1], C[..., 0, 2]
    d, e, f = C[..., 1, 1], C[..., 1, 2], C[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / det
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    row0 = jnp.stack([co00, co01, co02], axis=-1)
    row1 = jnp.stack([co01, co11, co12], axis=-1)
    row2 = jnp.stack([co02, co12, co22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def invert_6x6_psd(M: jax.Array) -> jax.Array:
    """Batched closed-form inverse of symmetric PD 6×6 blocks (…,6,6).

    Blocked 2×2-of-3×3 Schur form on top of invert_3x3_psd — pure
    elementwise VPU math.  XLA's batched ``cholesky``/``cho_solve`` on
    tiny blocks lowers to a serialized loop on TPU (measured: seconds
    for a (10k,6,6) batch at config-5 scale); this is microseconds.
    Used for preconditioner factors, where closed-form round-off is
    harmless (it only perturbs the CG convergence rate, not the fixed
    point).
    """
    A = M[..., :3, :3]
    Bt = M[..., :3, 3:]
    C = M[..., 3:, 3:]
    Ai = invert_3x3_psd(A)
    # W = A⁻¹ Bᵀ ; S = C − B A⁻¹ Bᵀ
    Wb = Ai @ Bt
    Si = invert_3x3_psd(C - jnp.swapaxes(Bt, -1, -2) @ Wb)
    WSi = Wb @ Si
    top_left = Ai + WSi @ jnp.swapaxes(Wb, -1, -2)
    top = jnp.concatenate([top_left, -WSi], axis=-1)
    bot = jnp.concatenate([-jnp.swapaxes(WSi, -1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def gn_hessian_apply(ev: Evaluation, problem: Problem,
                     shapes: assembly.TangentShapes, dx_cam: jax.Array,
                     dx_pt: jax.Array):
    """Matrix-free Gauss-Newton Hessian product (undamped).

    (Hx_cam, Hx_pt) = J̃ᵀ(J̃·[dx_cam; dx_pt]).  Shared by the predicted-
    decrease computation and the PCG matvec (SURVEY.md §3.4 hot loop #3).
    dx_pt: (M, 3).
    """
    entries = camera_entries(ev, problem, shapes)
    pt = problem.obs.point
    u = jnp.einsum("nrp,np->nr", ev.J_pt, dx_pt[pt])
    for e in entries:
        cols = e.base[:, None] + jnp.arange(e.width)[None, :]
        u = u + jnp.einsum("nrw,nw->nr", e.J, dx_cam[cols])
    Hx_cam = jnp.zeros_like(dx_cam)
    for e in entries:
        cols = e.base[:, None] + jnp.arange(e.width)[None, :]
        Hx_cam = Hx_cam.at[cols].add(jnp.einsum("nrw,nr->nw", e.J, u))
    Hx_pt = jax.ops.segment_sum(jnp.einsum("nrp,nr->np", ev.J_pt, u), pt,
                                num_segments=shapes.n_points)
    return Hx_cam, Hx_pt


def gn_hessian_apply_planned(ev: Evaluation, problem: Problem,
                             shapes: assembly.TangentShapes,
                             plans: flatplan.FlatPlans, dx_cam: jax.Array,
                             dx_pt: jax.Array):
    """Matrix-free J̃ᵀ(J̃·dx) via plans (no duplicate-index scatters)."""
    obs = problem.obs
    p6 = shapes.n_poses * POSE_DOF
    dxp = dx_cam[:p6].reshape(shapes.n_poses, POSE_DOF)
    Ja = ev.J_pose[:, :, 0, :]
    u = jnp.einsum("nrp,np->nr", ev.J_pt, dx_pt[obs.point])
    u = u + jnp.einsum("nrw,nw->nr", Ja, dxp[obs.pose_a])
    if plans.pose_b is not None:
        Jb = ev.J_pose[:, :, 1, :]
        u = u + jnp.einsum("nrw,nw->nr", Jb, dxp[obs.pose_b])
    if shapes.ni > 0:
        dxi = dx_cam[p6:].reshape(shapes.n_intr, shapes.ni)
        u = u + jnp.einsum("nrw,nw->nr", ev.J_intr, dxi[obs.intr_idx])
    Hx_pose = plans.pose_a.reduce_cols(_grad_cols(Ja, u))
    if plans.pose_b is not None:
        Hx_pose = Hx_pose + plans.pose_b.reduce_cols(_grad_cols(Jb, u))
    parts = [Hx_pose.reshape(-1)]
    if shapes.ni > 0:
        parts.append(plans.intr.reduce_cols(
            _grad_cols(ev.J_intr, u)).reshape(-1))
    Hx_cam = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    Hx_pt = plans.point.reduce_cols(_grad_cols(ev.J_pt, u))
    return Hx_cam, Hx_pt


def _lm_scaled_damp(diag: jax.Array, radius, options: SolverOptions):
    """Ceres LM diagonal: clamp(diag)/radius, dead dims pinned to 1."""
    dead = diag <= 0.0
    lm = jnp.clip(diag, options.min_lm_diagonal,
                  options.max_lm_diagonal) / radius
    return jnp.where(dead, 1.0, lm), dead


#: dense-Schur memory guard: refuse if E-transpose storage would exceed this
_DENSE_SCHUR_MAX_BYTES = 2 << 30


def make_dense_schur_solver(problem: Problem, options: SolverOptions):
    """(prepare, solve_step) for the LM driver — DENSE_SCHUR equivalent.

    Guarded against out-of-memory misuse: ``assemble_E_dense`` materializes
    Eᵀ as (M, 3, Dc), which is quadratic-ish in problem size.  Large
    problems must use ``iterative_schur`` (matrix-free) or the banded
    window solver — the crossover is enforced here rather than silently
    OOMing mid-solve (VERDICT r1 weak #3).
    """
    n_points = int(problem.point_free.shape[0])
    cam_dim = (int(problem.pose_free.shape[0]) * POSE_DOF
               + int(problem.intr_free.shape[0]) * problem.intr_tangent_dim)
    itemsize = jnp.dtype(problem.obs.uv.dtype).itemsize
    e_bytes = n_points * 3 * cam_dim * itemsize
    b_bytes = cam_dim ** 2 * itemsize
    if e_bytes + b_bytes > _DENSE_SCHUR_MAX_BYTES:
        raise ValueError(
            f"dense_schur would materialize ~{(e_bytes + b_bytes) / 2**30:.1f}"
            f" GiB (M={n_points}, Dc={cam_dim}); use "
            f"linear_solver='iterative_schur' (matrix-free PCG) or 'auto' "
            f"for problems this size")

    def _static_shapes():
        return assembly.TangentShapes(
            problem.pose_free.shape[0], problem.intr_free.shape[0],
            problem.intr_tangent_dim, problem.point_free.shape[0])

    from . import flatcols
    try:
        cplan = flatcols.build_cols_plan(problem, problem.obs.uv.dtype)
    except ValueError:
        cplan = None
    plans = None
    if cplan is None:
        plans = flatplan.build_flat_plans(problem,
                                          problem.intr_tangent_dim)
        planned_E = _use_planned_E(_static_shapes(), plans)

    def _scaling(d_cam, C_diag_blocks):
        if options.jacobi_scaling:
            s_cam = jnp.where(d_cam > 0,
                              1.0 / (1.0 + jnp.sqrt(jnp.maximum(d_cam, 0.0))),
                              1.0)
            s_pt = jnp.where(C_diag_blocks > 0,
                             1.0 / (1.0 + jnp.sqrt(
                                 jnp.maximum(C_diag_blocks, 0.0))), 1.0)
        else:
            s_cam = jnp.ones_like(d_cam)
            s_pt = jnp.ones_like(C_diag_blocks)
        return s_cam, s_pt

    def _aux(ev, g_pose, g_intr, g_pt, B, A, C, s_cam, s_pt):
        g_cam = jnp.concatenate([g_pose.reshape(-1), g_intr.reshape(-1)])
        s_pt_flat = s_pt.reshape(-1)
        gmax = jnp.maximum(
            jnp.max(jnp.abs(g_cam / jnp.where(s_cam == 0, 1.0, s_cam))),
            jnp.max(jnp.abs(g_pt.reshape(-1)
                            / jnp.where(s_pt_flat == 0, 1.0, s_pt_flat))))
        return {
            "cost": ev.cost, "ev": ev, "g_cam": g_cam, "g_pt": g_pt,
            "B": B, "A": A, "C": C, "s_cam": s_cam, "s_pt": s_pt_flat,
            "gradient_max_norm": gmax,
        }

    def prepare_cols(params: Params):
        ev = flatcols.evaluate_cols(params, problem, cplan)
        d_cam, C_diag_blocks = flatcols.jtj_diag_cols(ev, cplan)
        s_cam, s_pt = _scaling(d_cam, C_diag_blocks)
        ev = flatcols.scale_cols(ev, cplan, s_cam, s_pt)
        g_pose, g_intr, g_pt = flatcols.gradient_cols(ev, cplan)
        B = flatcols.assemble_B_cols(ev, cplan, _static_shapes().cam_dim)
        A = flatcols.assemble_E_cols(ev, cplan)
        C = flatcols.point_hessian_cols(ev, cplan)
        return _aux(ev, g_pose, g_intr, g_pt, B, A, C, s_cam, s_pt)

    def prepare_legacy(params: Params):
        ev = residuals.evaluate(params, problem, with_jacobians=True)
        shapes = assembly.tangent_shapes(problem, params)
        d_cam, C_diag_blocks = jtj_diag_planned(ev, problem, shapes, plans)
        s_cam, s_pt = _scaling(d_cam, C_diag_blocks)
        ev = scale_evaluation(ev, problem, shapes, s_cam,
                              s_pt.reshape(-1))
        g_pose, g_intr, g_pt = gradient_blocks_planned(ev, problem, shapes,
                                                       plans)
        B = assemble_B_planned(ev, problem, shapes, plans)
        A = (assemble_E_planned(ev, problem, shapes, plans) if planned_E
             else assemble_E_dense(ev, problem, shapes))
        C = point_hessian_planned(ev, plans)
        return _aux(ev, g_pose, g_intr, g_pt, B, A, C, s_cam, s_pt)

    prepare = prepare_cols if cplan is not None else prepare_legacy

    def solve_step(aux, radius):
        ev = aux["ev"]
        B, A, C = aux["B"], aux["A"], aux["C"]
        g_cam, g_pt = aux["g_cam"], aux["g_pt"]
        Dc = B.shape[0]
        M = C.shape[0]

        # LM damping in scaled space.
        lm_cam, dead_cam = _lm_scaled_damp(jnp.diagonal(B), radius, options)
        B_l = B + jnp.diag(lm_cam)
        c_diag = jnp.diagonal(C, axis1=-2, axis2=-1)           # (M,3)
        lm_pt, dead_pt = _lm_scaled_damp(c_diag.reshape(-1), radius, options)
        C_l = C + jax.vmap(jnp.diag)(lm_pt.reshape(M, 3))
        # Barriers are LOAD-BEARING on TPU: XLA fuses the closed-form
        # inverse / the Y product into the MXU contraction operands and
        # the fused form corrupts the result (measured: S gained
        # negative diagonal entries, Cholesky → NaN, solver FAILURE; see
        # flatcols.ColsPlan.cam_reduce for the same bug class).
        C_inv = jax.lax.optimization_barrier(invert_3x3_psd(C_l))

        # Reduced system: S = B_λ − Σ_j A_jᵀ C_j⁻¹ A_j.
        Y = jax.lax.optimization_barrier(
            jnp.einsum("mab,mbd->mad", C_inv, A))              # (M,3,Dc)
        S = B_l - jnp.einsum("mad,mae->de", A, Y)
        L = jnp.linalg.cholesky(S)

        def schur_solve(rc, rp):
            """Solve the damped full system K·[dc;dp] = [rc;rp] via S."""
            w = jax.lax.optimization_barrier(
                jnp.einsum("mab,mb->ma", C_inv, rp))
            rhs = rc - jnp.einsum("mad,ma->d", A, w)
            y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
            dc = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
            dp = jnp.einsum("mab,mb->ma", C_inv,
                            rp - jnp.einsum("mad,d->ma", A, dc))
            return dc, dp

        dxc, dxp = schur_solve(-g_cam, -g_pt)

        # Full-system iterative refinement against the MATRIX-FREE damped
        # operator (J̃ᵀJ̃ + λD²) — corrects both the f32 Cholesky and the
        # cancellation in forming S = B − ECE itself (SURVEY.md §7.2 #1).
        lm_pt_b = lm_pt.reshape(M, 3)
        shapes = _static_shapes()
        for _ in range(options.refinement_steps):
            if cplan is not None:
                Hx_cam, Hx_pt = flatcols.hessian_apply_cols(ev, cplan,
                                                            dxc, dxp)
            else:
                Hx_cam, Hx_pt = gn_hessian_apply_planned(
                    ev, problem, shapes, plans, dxc, dxp)
            res_cam = -g_cam - (Hx_cam + lm_cam * dxc)
            res_pt = -g_pt - (Hx_pt + lm_pt_b * dxp)
            cc, cp = schur_solve(res_cam, res_pt)
            dxc = dxc + cc
            dxp = dxp + cp

        # Predicted decrease via the cancellation-free LM identity: with
        # (H + λD²)δ = −g exactly, −gᵀδ − ½δᵀHδ = ½(δᵀλD²δ − gᵀδ) — a sum
        # of two nonnegative terms, robust in f32 near convergence
        # (SURVEY.md §7.2 item 1).
        gTdx = g_cam @ dxc + jnp.sum(g_pt * dxp)
        dDd = jnp.sum(lm_cam * dxc * dxc) + jnp.sum(
            lm_pt.reshape(M, 3) * dxp * dxp)
        predicted = 0.5 * (dDd - gTdx)

        # Unscale and pack the full tangent step.
        dx_cam_u = aux["s_cam"] * dxc
        dx_pt_u = aux["s_pt"].reshape(M, 3) * dxp
        dx = jnp.concatenate([dx_cam_u, dx_pt_u.reshape(-1)])
        return dx, predicted, jnp.asarray(0, jnp.int32)

    def _h_apply(ev, dxc, dxp):
        if cplan is not None:
            return flatcols.hessian_apply_cols(ev, cplan, dxc, dxp)
        return gn_hessian_apply_planned(ev, problem, _static_shapes(),
                                        plans, dxc, dxp)

    prepare.hessian_apply = _h_apply
    if cplan is not None:
        prepare.extras = flatcols.make_extras(problem, cplan)
    return prepare, solve_step


def scale_evaluation(ev: Evaluation, problem: Problem,
                     shapes: assembly.TangentShapes, s_cam: jax.Array,
                     s_pt: jax.Array) -> Evaluation:
    """Apply Jacobi column scaling to all Jacobian blocks.

    s_cam: (Dc,) per camera-tangent dim; s_pt: (M·3,) per point dim.
    """
    obs = problem.obs
    sa = s_cam[(obs.pose_a * POSE_DOF)[:, None]
               + jnp.arange(POSE_DOF)[None, :]]
    sb = s_cam[(obs.pose_b * POSE_DOF)[:, None]
               + jnp.arange(POSE_DOF)[None, :]]
    J_pose = ev.J_pose * jnp.stack([sa, sb], axis=1)[:, None, :, :]
    if shapes.ni > 0:
        p6 = shapes.n_poses * POSE_DOF
        si = s_cam[(p6 + obs.intr_idx * shapes.ni)[:, None]
                   + jnp.arange(shapes.ni)[None, :]]
        J_intr = ev.J_intr * si[:, None, :]
    else:
        J_intr = ev.J_intr
    sp = s_pt.reshape(shapes.n_points, 3)[obs.point]
    J_pt = ev.J_pt * sp[:, None, :]
    return Evaluation(r=ev.r, cost=ev.cost, J_pose=J_pose, J_intr=J_intr,
                      J_pt=J_pt)
