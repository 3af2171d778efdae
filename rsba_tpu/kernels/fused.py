"""Fused Pallas evaluator + assembler — SURVEY.md §7.1 M4, hot loops #1+#2.

One kernel pass per window-row tile computes, entirely in VMEM:

    residuals → tangent Jacobians (via ``jax.linearize`` of the projection
    chain) → Triggs robust correction → masked local reductions:
    cost, g_cam windows, B-band windows, g_pt, C blocks, F blocks.

**Jacobian values never reach HBM** — only the O(points + poses)-sized
normal-equation blocks are written, which is what makes the evaluator's
cost approach the residual-evaluation roofline instead of the XLA
layout-padded einsum path (rsba_tpu/solver/banded.py assemble ≈ 230 ms at
config-4 scale vs ≈ 10 ms here).

Layout: the kernel works on **component planes** — every scalar quantity
(a quaternion component, a residual row, one Jacobian entry) is an
(RT, L, G) array with points-per-row G on the 128-wide lane axis.  The
geometry chain below mirrors ``rsba_tpu.geometry`` (quaternion.py,
interpolate.py, distortion.py, camera.py) exactly, in plane form; the
equivalence is asserted by tests/test_fused_kernel.py against the XLA
window evaluator, which is itself tested against the flat oracle.

Mosaic constraints honored throughout: every intermediate is either a
traced scalar (0-D) or ≥2-D — 1-D vectors do not lower on TPU.  Loads
slice to (RT, 1, 1)/(RT, 1, G) shapes; reductions go axis-by-axis with
``keepdims``; outputs are written per static sub-slice of the block.

Outputs (planes layout, consumed by solver/banded_tpu.py):
    cost   (NR, 8)         per-row robustified cost (column 0)
    gw     (NR, W, 6)      g_cam window contributions (fold → (P, 6))
    b0, b1 (NR, W, 36)     B-band d=0 / d=1 window contributions
    g_pt   (NR, 3, G)      point gradients
    c6     (NR, 6, G)      per-point 3×3 JᵀJ, packed symmetric
                           [00, 01, 02, 11, 12, 22]
    F      (NR, W, 18, G)  camera-point coupling blocks, comp = 3a + p
    rho    (NR, L, G)      per-slot robustified costs (masked) — lets the
                           step attempt's pairwise-differenced cost
                           decrease reuse the prepare-time pass (one
                           residual evaluation per attempt, not two)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.camera import CameraModel
from ..geometry.losses import Loss

# Small-angle threshold — matches geometry.quaternion._EPS.
_EPS = 1e-8

#: symmetric 3×3 component order in c6 packing
C6_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
#: diagonal component positions within the c6 packing
C6_DIAG = (0, 3, 5)


# --- geometry on component planes -------------------------------------------
# Quaternions are tuples (w, x, y, z) of planes (or traced scalars);
# vectors are tuples (x, y, z).  Mirrors rsba_tpu.geometry semantics.

def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _qconj(q):
    w, x, y, z = q
    return (w, -x, -y, -z)


def _qnormalize(q):
    w, x, y, z = q
    inv = jax.lax.rsqrt(w * w + x * x + y * y + z * z)
    return (w * inv, x * inv, y * inv, z * inv)


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _qrotate(q, v):
    """R(q)·v, two-cross-product form (quaternion.rotate)."""
    w = q[0]
    u = (q[1], q[2], q[3])
    uv = _cross(u, v)
    uuv = _cross(u, uv)
    return tuple(v[i] + 2.0 * (w * uv[i] + uuv[i]) for i in range(3))


def _from_aa(aa):
    """Angle-axis planes (3,) → quaternion planes (quaternion.from_axis_angle)."""
    ax, ay, az = aa
    theta_sq = ax * ax + ay * ay + az * az
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    half = 0.5 * theta
    small = theta_sq < _EPS
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return (w, k * ax, k * ay, k * az)


def _atan_pos(x):
    """atan(x) for x ≥ 0, Cephes single-precision scheme (~3 ulp f32).

    Pallas TPU has no atan/atan2 lowering, so the kernel carries its own.
    Branches are guarded so forward-mode tangents never see 1/0.
    """
    t3 = 2.414213562373095          # tan(3π/8)
    t1 = 0.4142135623730950         # tan(π/8)
    big = x > t3
    mid = jnp.logical_and(x > t1, jnp.logical_not(big))
    xs_big = jnp.where(big, x, 1.0)
    xs_mid = jnp.where(mid, x, 0.0)
    xr = jnp.where(big, -1.0 / xs_big,
                   jnp.where(mid, (xs_mid - 1.0) / (xs_mid + 1.0), x))
    off = jnp.where(big, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    z = xr * xr
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr
    return off + poly


def _atan2_pos(s, w, exact: bool):
    """atan2(s, w) on the first quadrant (s ≥ 0, w ≥ 0)."""
    if exact:
        return jnp.arctan2(s, w)
    return _atan_pos(s / jnp.maximum(w, 1e-30))


def _to_aa(q, exact: bool):
    """Quaternion planes → angle-axis planes (quaternion.to_axis_angle)."""
    w, x, y, z = q
    sin_half = jnp.sqrt(x * x + y * y + z * z)
    sign = jnp.where(w < 0, -1.0, 1.0)
    w, x, y, z = sign * w, sign * x, sign * y, sign * z
    half = _atan2_pos(sin_half, w, exact)
    small = sin_half < _EPS
    k = jnp.where(small, 2.0, 2.0 * half / jnp.where(small, 1.0, sin_half))
    return (k * x, k * y, k * z)


def _slerp(qa, qb, t, exact: bool):
    """qa ⊗ exp(t·log(qa⁻¹ ⊗ qb)) — quaternion.slerp."""
    d = _to_aa(_qmul(_qconj(qa), qb), exact)
    return _qmul(qa, _from_aa(tuple(t * di for di in d)))


def _nlerp(qa, qb, t):
    """Normalized lerp on qa's hemisphere — quaternion.nlerp."""
    dot = sum(a * b for a, b in zip(qa, qb))
    s = jnp.where(dot < 0, -1.0, 1.0)
    return _qnormalize(tuple((1.0 - t) * a + t * (s * b)
                             for a, b in zip(qa, qb)))


def _lerp_aa(qa, qb, t, exact: bool):
    """Lerp of global angle-axis vectors — quaternion.lerp_axis_angle."""
    aa = _to_aa(qa, exact)
    ab = _to_aa(qb, exact)
    return _from_aa(tuple((1.0 - t) * a + t * b for a, b in zip(aa, ab)))


def _interp_rotation(qa, qb, t, mode: str, exact: bool):
    if mode == "slerp":
        return _slerp(qa, qb, t, exact)
    if mode == "nlerp":
        return _nlerp(qa, qb, t)
    if mode == "lerp_aa":
        return _lerp_aa(qa, qb, t, exact)
    raise ValueError(mode)


def _project(q, c, X, intr, model: CameraModel):
    """Camera-frame projection planes — camera.project_global.

    ``intr`` is a tuple of 9 traced scalars (fx, fy, cx, cy, k1, k2, p1,
    p2, k3).
    """
    Xc = _qrotate(q, tuple(X[i] - c[i] for i in range(3)))
    inv_z = 1.0 / Xc[2]
    x = model.projection_sign * Xc[0] * inv_z
    y = model.projection_sign * Xc[1] * inv_z
    if model.use_distortion:
        _, _, _, _, k1, k2, p1, p2, k3 = intr
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x, y = xd, yd
    return (intr[0] * x + intr[2], intr[1] * y + intr[3])


# --- the kernel ---------------------------------------------------------------

def _kernel(pose_ref, pts_ref, ptf_ref, uv_ref, tt_ref,
            mask_ref, offs_ref, rsf_ref, intr_ref,
            cost_ref, gw_ref, b0_ref, b1_ref, gpt_ref, c6_ref, ff_ref,
            rho_ref,
            *, model: CameraModel, loss: Loss, W: int, dtype,
            exact: bool):
    RT, L, G = tt_ref.shape
    zero3 = jnp.zeros((RT, L, G), dtype)

    offs = offs_ref[:]
    rsf = rsf_ref[:]
    offs_b = offs + rsf.astype(jnp.int32)
    mask = mask_ref[:]
    tt = tt_ref[:]
    pp = pose_ref[:]                  # (RT, 16, L, G) per-slot pose planes
    pts = pts_ref[:]                  # (RT, 3, G)
    uv = uv_ref[:]                    # (RT, 2, L, G)

    # Per-slot pose data is pre-selected outside the kernel (XLA
    # compare-select over the W-window — ≤2 ms at config-4 scale, see
    # window.py) because Mosaic cannot broadcast a (RT,1,1) window value
    # over both sublanes and lanes.  Plane order matches _POSE_PLANES.
    qa = tuple(pp[:, c] for c in range(4))
    ca = tuple(pp[:, 4 + c] for c in range(3))
    qb = tuple(pp[:, 7 + c] for c in range(4))
    cb = tuple(pp[:, 11 + c] for c in range(3))
    pf_a = pp[:, 14]
    pf_b = pp[:, 15]
    ptf = jnp.broadcast_to(ptf_ref[:], (RT, L, G))   # in as (RT, 1, G)
    X = tuple(jnp.broadcast_to(pts[:, i:i + 1, :], (RT, L, G))
              for i in range(3))
    uv0 = uv[:, 0]                    # (RT, L, G)
    uv1 = uv[:, 1]
    intr = tuple(intr_ref[0, i] for i in range(9))

    def f(*d):
        """Residual planes as a function of 15 scalar tangents."""
        eqa = _from_aa((d[0], d[1], d[2]))
        qa2 = _qnormalize(_qmul(qa, eqa))
        ca2 = tuple(ca[i] + d[3 + i] for i in range(3))
        if model.rolling_shutter:
            eqb = _from_aa((d[6], d[7], d[8]))
            qb2 = _qnormalize(_qmul(qb, eqb))
            cb2 = tuple(cb[i] + d[9 + i] for i in range(3))
            q_t = _interp_rotation(qa2, qb2, tt, model.rotation_interp,
                                   exact)
            c_t = tuple((1.0 - tt) * ca2[i] + tt * cb2[i] for i in range(3))
        else:
            q_t, c_t = qa2, ca2
        X2 = tuple(X[i] + d[12 + i] for i in range(3))
        u, v = _project(q_t, c_t, X2, intr, model)
        return (u - uv0, v - uv1)

    zt = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    r, lin = jax.linearize(f, *([zt] * 15))
    J = [lin(*(one if j == k else zt for j in range(15)))
         for k in range(15)]          # J[k] = (dr0, dr1) planes

    # Triggs robust correction (geometry.losses.Loss.correct, plane form).
    r0, r1 = r
    s = r0 * r0 + r1 * r1
    rho, rho1, rho2 = loss.evaluate(s)
    if loss.kind == "trivial":
        rt0, rt1 = r0, r1
        Jt = J
    else:
        sqrt_rho1 = jnp.sqrt(jnp.maximum(rho1, 1e-30))
        dd = jnp.maximum(1.0 + 2.0 * s * rho2 / rho1, 0.0)
        alpha = jnp.where(rho2 > 0.0, 1.0 - jnp.sqrt(dd), 0.0)
        res_scale = sqrt_rho1 / (1.0 - alpha)
        rt0, rt1 = res_scale * r0, res_scale * r1
        aos = jnp.where(s > 0, alpha / jnp.maximum(s, 1e-30), 0.0)
        Jt = []
        for (j0, j1) in J:
            rTJ = r0 * j0 + r1 * j1
            Jt.append((sqrt_rho1 * (j0 - aos * r0 * rTJ),
                       sqrt_rho1 * (j1 - aos * r1 * rTJ)))

    # Padding + constant-block masks.  Selection, not multiplication:
    # padded slots can project degenerately (0/0 → NaN) and mask·NaN
    # would poison every reduction below.
    valid = mask > 0
    rt0 = jnp.where(valid, rt0, 0.0)
    rt1 = jnp.where(valid, rt1, 0.0)
    col_mask = [pf_a] * 6 + [pf_b] * 6 + [ptf] * 3
    Jm = [(jnp.where(jnp.logical_and(valid, cm > 0), j0, 0.0),
           jnp.where(jnp.logical_and(valid, cm > 0), j1, 0.0))
          for (j0, j1), cm in zip(Jt, col_mask)]

    # --- reductions -----------------------------------------------------
    def rsum(x):
        """(RT, L, G) → (RT, 1), summed over L then G (keepdims, ≥2-D)."""
        return jnp.sum(jnp.sum(x, axis=1), axis=1, keepdims=True)

    rho_m = jnp.where(valid, rho, 0.0)
    rho_ref[:] = rho_m
    row_cost = 0.5 * rsum(rho_m)                       # (RT, 1)
    cost_ref[:] = jnp.broadcast_to(row_cost[:, None, :], cost_ref.shape)

    # Point-side: g_pt (RT, 3, G), C6 (RT, 6, G) — sum over L.
    for p in range(3):
        gpt_ref[:, p, :] = jnp.sum(
            Jm[12 + p][0] * rt0 + Jm[12 + p][1] * rt1, axis=1)
    for i, (p, q) in enumerate(C6_PAIRS):
        c6_ref[:, i, :] = jnp.sum(
            Jm[12 + p][0] * Jm[12 + q][0] + Jm[12 + p][1] * Jm[12 + q][1],
            axis=1)

    # Pairwise products reused across windows.
    AP = [[Jm[a][0] * Jm[12 + p][0] + Jm[a][1] * Jm[12 + p][1]
           for p in range(3)] for a in range(6)]
    BP = [[Jm[6 + a][0] * Jm[12 + p][0] + Jm[6 + a][1] * Jm[12 + p][1]
           for p in range(3)] for a in range(6)]
    ga = [Jm[a][0] * rt0 + Jm[a][1] * rt1 for a in range(6)]
    gb = [Jm[6 + a][0] * rt0 + Jm[6 + a][1] * rt1 for a in range(6)]

    adj = rsf                              # 1 where pose_b == pose_a + 1
    same = 1.0 - rsf
    mwa = [jnp.where(offs == w, mask, zero3) for w in range(W)]
    mwb = [jnp.where(offs_b == w, mask, zero3) for w in range(W)]

    # F blocks and g_cam windows (per point / per window, sum over L).
    for w in range(W):
        for a in range(6):
            for p in range(3):
                ff_ref[:, w, 3 * a + p, :] = jnp.sum(
                    mwa[w] * AP[a][p] + mwb[w] * BP[a][p], axis=1)
        gw_ref[:, w, :] = jnp.concatenate(
            [rsum(mwa[w] * ga[a] + mwb[w] * gb[a]) for a in range(6)],
            axis=1)

    # B band windows: pair products hoisted out of the window loop.
    b0c = [[None] * 36 for _ in range(W)]
    b1c = [[None] * 36 for _ in range(W)]
    for a in range(6):
        for b in range(6):
            aa = Jm[a][0] * Jm[b][0] + Jm[a][1] * Jm[b][1]
            bb = Jm[6 + a][0] * Jm[6 + b][0] + Jm[6 + a][1] * Jm[6 + b][1]
            ab = Jm[a][0] * Jm[6 + b][0] + Jm[a][1] * Jm[6 + b][1]
            ba = Jm[b][0] * Jm[6 + a][0] + Jm[b][1] * Jm[6 + a][1]
            sab = aa + same * (ab + ba)
            dab = adj * ab
            for w in range(W):
                b0c[w][a * 6 + b] = rsum(mwa[w] * sab + mwb[w] * bb)
                b1c[w][a * 6 + b] = rsum(mwa[w] * dab)
    for w in range(W):
        b0_ref[:, w, :] = jnp.concatenate(b0c[w], axis=1)
        b1_ref[:, w, :] = jnp.concatenate(b1c[w], axis=1)


#: per-slot pose plane order on the kernel's packed pose input
_POSE_PLANES = ("qa_w qa_x qa_y qa_z ca_x ca_y ca_z "
                "qb_w qb_x qb_y qb_z cb_x cb_y cb_z pf_a pf_b").split()

#: scoped-VMEM budget the row-tile picker aims under (the hardware limit
#: is 16 MiB; leave headroom for Mosaic's own scratch)
VMEM_BUDGET_BYTES = 14 << 20


def estimate_vmem_bytes(row_tile: int, W: int, L: int, G: int,
                        itemsize: int = 4) -> int:
    """Rough upper bound on the kernel's scoped-VMEM live set.

    The live set is dominated by (row_tile, L, G) component planes —
    inputs, residual/Jacobian planes, pair products, and per-window masks
    — whose count grows linearly in the window span W.  The coefficients
    are calibrated against the Mosaic scoped-allocation report at the
    config-4 shape (RT=8, W=11, L=10, G=112 → 16.74 MB).
    """
    lp = -(-L // 8) * 8          # sublane padding
    gp = -(-G // 128) * 128      # lane padding
    plane = row_tile * lp * gp * itemsize
    return plane * (100 + 14 * W)


def pick_row_tile(NR: int, W: int, L: int, G: int, itemsize: int = 4) -> int:
    """Largest row tile in {8, 4, 2, 1} that divides NR and fits the
    VMEM budget (the final fallback 1 is returned even if the estimate
    exceeds budget — the caller's trial compile decides)."""
    for rt in (8, 4, 2, 1):
        if NR % rt == 0 and estimate_vmem_bytes(rt, W, L, G,
                                                itemsize) <= VMEM_BUDGET_BYTES:
            return rt
    return 1


def fused_evaluate_assemble(pose, pts, ptf, uv, tt, mask, offs,
                            rsf, intr, W: int, *, model: CameraModel,
                            loss: Loss, row_tile: int = 0,
                            interpret: bool = False,
                            exact: bool | None = None):
    """Run the fused kernel over all window rows.

    ``row_tile=0`` picks the largest VMEM-fitting tile (pick_row_tile).
    ``exact`` selects the atan path inside SLERP/lerp_aa: True uses
    jnp.arctan2 (only lowerable in interpret mode — Pallas TPU has no
    atan), False the Cephes polynomial the compiled kernel always runs.
    Default (None): exact in interpret mode, polynomial on hardware.
    Tests pass ``interpret=True, exact=False`` to validate the production
    atan path against the XLA oracle (ADVICE r2).

    Shapes (NR divisible by ``row_tile``; pad rows with mask=0 first):
      pose (NR, 16, L, G) per-slot planes in _POSE_PLANES order,
      pts (NR, 3, G), ptf (NR, G), uv (NR, 2, L, G),
      tt/mask/rsf (NR, L, G), offs (NR, L, G) int32, intr (1, 9).

    Returns dict: cost (scalar), gw (NR, W, 6), b0/b1 (NR, W, 36),
    g_pt (NR, 3, G), c6 (NR, 6, G), F (NR, W, 18, G).
    """
    NR = pose.shape[0]
    _, L, G = tt.shape
    RT = row_tile or pick_row_tile(NR, W, L, G, pts.dtype.itemsize)
    assert NR % RT == 0, (NR, RT)
    tiles = NR // RT
    dtype = pts.dtype

    # Blocks whose trailing two dims are smaller than (8, 128) must equal
    # the full array dims (Mosaic tiling rule) — give ptf and the cost
    # output a unit middle axis so that holds for any row_tile.
    ptf3 = ptf[:, None, :]                                # (NR, 1, G)

    grid = (tiles,)
    row_block = lambda *s: pl.BlockSpec(  # noqa: E731
        (RT,) + s, lambda i: (i,) + (0,) * len(s),
        memory_space=pltpu.VMEM)
    smem_block = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((NR, 1, 8), dtype),          # cost per row
        jax.ShapeDtypeStruct((NR, W, 6), dtype),          # gw
        jax.ShapeDtypeStruct((NR, W, 36), dtype),         # b0
        jax.ShapeDtypeStruct((NR, W, 36), dtype),         # b1
        jax.ShapeDtypeStruct((NR, 3, G), dtype),          # g_pt
        jax.ShapeDtypeStruct((NR, 6, G), dtype),          # c6
        jax.ShapeDtypeStruct((NR, W, 18, G), dtype),      # F
        jax.ShapeDtypeStruct((NR, L, G), dtype),          # rho per slot
    )
    out_specs = (
        row_block(1, 8),
        row_block(W, 6),
        row_block(W, 36),
        row_block(W, 36),
        row_block(3, G),
        row_block(6, G),
        row_block(W, 18, G),
        row_block(L, G),
    )
    in_specs = [
        row_block(16, L, G),  # pose planes
        row_block(3, G),      # pts
        row_block(1, G),      # ptf
        row_block(2, L, G),   # uv
        row_block(L, G),      # tt
        row_block(L, G),      # mask
        row_block(L, G),      # offs
        row_block(L, G),      # rsf
        smem_block,           # intr
    ]

    kernel = functools.partial(_kernel, model=model, loss=loss, W=W,
                               dtype=dtype,
                               exact=interpret if exact is None else exact)
    cost_t, gw, b0, b1, gpt, c6, F, rho = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(pose, pts, ptf3, uv, tt, mask, offs, rsf, intr)
    return {"cost": jnp.sum(cost_t[:, 0, 0]), "gw": gw, "b0": b0, "b1": b1,
            "g_pt": gpt, "c6": c6, "F": F, "rho": rho}
