"""Sharded solver phases: shard_map-wrapped prepare / solve / apply / cost.

The distributed execution model (SURVEY.md §2.9, §3.4, §5.8):

* Each shard owns a contiguous chunk of ``m_local`` landmarks and ALL
  observations of those landmarks (dist.partition layout).  Landmark
  elimination — C blocks, C⁻¹, back-substitution — is therefore entirely
  shard-local: landmarks never cross the interconnect.
* Poses/intrinsics are replicated; their gradient, JᵀJ-diagonal and
  Schur-complement contributions are partial sums psum'd over the mesh
  axis.  The PCG matvec costs exactly **one psum of a (Dc,) vector per
  iteration**; the dense-Schur path psums the (Dc, Dc) reduced system once
  per outer iteration.
* Trust-region state (radius, cost, ρ) is replicated — every shard takes
  the identical accept/reject decision (BASELINE.json: "trust-region
  updates are replicated").

The returned fns dict is plug-compatible with ``lm.solve``: the same
host-side LM driver runs single-chip and multi-host unchanged.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..problem.types import POSE_DOF, Params, Problem
from ..solver import assembly, residuals
from ..solver.lm import inlier_threshold
from ..solver.options import SolverOptions
from ..solver.pcg import (SchurFreeOperator, add_lm_diag,
                          make_block_preconditioner, pcg,
                          schur_jacobi_partial, _jacobi_apply)
from ..solver.schur import (_lm_scaled_damp, assemble_B_dense,
                            assemble_E_dense, camera_entries,
                            camera_gradient, camera_jtj_diag,
                            gn_hessian_apply, invert_3x3_psd,
                            scale_evaluation)
from . import mesh as mesh_mod


def _psum(x, axis):
    return jax.lax.psum(x, axis)


def _scale_factor(d):
    return jnp.where(d > 0, 1.0 / (1.0 + jnp.sqrt(jnp.maximum(d, 0.0))), 1.0)


def make_sharded_solver_fns(problem: Problem, options: SolverOptions,
                            mesh: Mesh, axis: str = mesh_mod.AXIS):
    """Build lm.solve-compatible phase fns running under shard_map.

    ``problem`` must be in the dist.partition layout (points chunked by
    shard, observations grouped by owning shard, both padded); use
    ``repartition_by_point`` + ``shard_ba`` first.
    """
    n_shards = mesh.devices.size
    M_pad = problem.point_free.shape[0]
    if M_pad % n_shards:
        raise ValueError(f"points ({M_pad}) not divisible by mesh size "
                         f"({n_shards}); repartition first")
    if problem.obs.n_obs % n_shards:
        raise ValueError("observations not divisible by mesh size; "
                         "repartition first")
    m_local = M_pad // n_shards
    n_poses = problem.pose_free.shape[0]
    n_intr = problem.intr_free.shape[0]
    ni = problem.intr_tangent_dim
    shapes_l = assembly.TangentShapes(n_poses, n_intr, ni, m_local)
    p6 = n_poses * POSE_DOF

    prob_spec = mesh_mod.problem_specs(problem, axis)
    par_spec = mesh_mod.params_specs(axis)
    use_pcg = options.linear_solver == "iterative_schur"

    def localize(problem_blk: Problem) -> Problem:
        """Global→shard-local point indices inside the shard_map block."""
        d = jax.lax.axis_index(axis)
        pt = problem_blk.obs.point - d * m_local
        return problem_blk.replace(obs=problem_blk.obs.replace(point=pt))

    # --- prepare: evaluate + assemble ---------------------------------------

    def prepare_blk(problem_blk: Problem, params_blk: Params):
        prob_l = localize(problem_blk)
        ev = residuals.evaluate(params_blk, prob_l, with_jacobians=True)
        cost = _psum(ev.cost, axis)
        ev = ev.replace(cost=cost)

        d_cam = _psum(camera_jtj_diag(ev, prob_l, shapes_l), axis)
        C_diag = assembly.jtj_diagonal_blocks(ev, prob_l, shapes_l)[2]
        if options.jacobi_scaling:
            s_cam = _scale_factor(d_cam)
            s_pt = _scale_factor(C_diag)
        else:
            s_cam = jnp.ones_like(d_cam)
            s_pt = jnp.ones_like(C_diag)
        ev = scale_evaluation(ev, prob_l, shapes_l, s_cam, s_pt)

        g_cam = _psum(camera_gradient(ev, prob_l, shapes_l), axis)
        g_pt = jax.ops.segment_sum(
            jnp.einsum("nrd,nr->nd", ev.J_pt, ev.r), prob_l.obs.point,
            num_segments=m_local)
        C = assembly.point_hessian_blocks(ev, prob_l, shapes_l)
        d_cam_s = _psum(camera_jtj_diag(ev, prob_l, shapes_l), axis)
        gmax = jnp.maximum(
            jnp.max(jnp.abs(g_cam / jnp.where(s_cam == 0, 1.0, s_cam))),
            jax.lax.pmax(
                jnp.max(jnp.abs(g_pt / jnp.where(s_pt == 0, 1.0, s_pt))),
                axis))
        aux = {"cost": cost, "ev": ev, "g_cam": g_cam, "g_pt": g_pt,
               "C": C, "d_cam": d_cam_s, "s_cam": s_cam, "s_pt": s_pt,
               "gradient_max_norm": gmax}
        if not use_pcg:
            aux["B"] = _psum(assemble_B_dense(ev, prob_l, shapes_l), axis)
            aux["A"] = assemble_E_dense(ev, prob_l, shapes_l)
        return aux

    def aux_specs():
        ev_spec = residuals.Evaluation(
            r=P(axis), cost=P(), J_pose=P(axis), J_intr=P(axis),
            J_pt=P(axis))
        s = {"cost": P(), "ev": ev_spec, "g_cam": P(), "g_pt": P(axis),
             "C": P(axis), "d_cam": P(), "s_cam": P(), "s_pt": P(axis),
             "gradient_max_norm": P()}
        if not use_pcg:
            s["B"] = P()
            s["A"] = P(axis)
        return s

    # --- solve_step: damped Schur solve --------------------------------------

    def damped_point_blocks(C, radius):
        c_diag = jnp.diagonal(C, axis1=-2, axis2=-1).reshape(-1)
        lm_pt, _ = _lm_scaled_damp(c_diag, radius, options)
        lm_pt_b = lm_pt.reshape(m_local, 3)
        C_l = C + jax.vmap(jnp.diag)(lm_pt_b)
        return invert_3x3_psd(C_l), lm_pt_b

    def step_outputs(dc, dp, s_cam, s_pt):
        """Unscale and split the step into (d_pose, d_intr, d_pt)."""
        dx_cam = s_cam * dc
        d_pose = dx_cam[:p6].reshape(n_poses, POSE_DOF)
        d_intr = dx_cam[p6:].reshape(n_intr, ni)
        d_pt = s_pt * dp
        return d_pose, d_intr, d_pt

    def solve_step_pcg_blk(problem_blk, aux, radius):
        prob_l = localize(problem_blk)
        ev = aux["ev"]
        g_cam, g_pt, C = aux["g_cam"], aux["g_pt"], aux["C"]

        lm_cam, _ = _lm_scaled_damp(aux["d_cam"], radius, options)
        C_inv, lm_pt_b = damped_point_blocks(C, radius)
        op = SchurFreeOperator(ev=ev, problem=prob_l, shapes=shapes_l,
                               lm_cam=jnp.zeros_like(lm_cam), C_inv=C_inv)

        y0 = jnp.einsum("mab,mb->ma", C_inv, -g_pt)
        b = -g_cam - _psum(op.e_apply(y0), axis)

        def matvec(p):
            u = op._jcam_apply(p)
            Bp = op._jcam_transpose_apply(u)
            w = jax.ops.segment_sum(
                jnp.einsum("nrd,nr->nd", ev.J_pt, u), prob_l.obs.point,
                num_segments=m_local)
            y = jnp.einsum("mab,mb->ma", C_inv, w)
            ECy = op.e_apply(y)
            return _psum(Bp - ECy, axis) + lm_cam * p

        D_pose, D_intr = schur_jacobi_partial(ev, prob_l, shapes_l, C_inv)
        D_pose = _psum(D_pose, axis)
        D_intr = _psum(D_intr, axis) if ni > 0 else D_intr
        D_pose, D_intr = add_lm_diag(D_pose, D_intr, lm_cam, shapes_l)
        precond = (make_block_preconditioner(D_pose, D_intr, shapes_l)
                   if options.preconditioner == "schur_jacobi"
                   else partial(_jacobi_apply, D_pose, D_intr, shapes_l))

        dc, r_cg, iters = pcg(matvec, precond, b, options.max_cg_iterations,
                              options.cg_eta)
        dp = op.back_substitute(dc, g_pt)

        gTdx = g_cam @ dc + _psum(jnp.sum(g_pt * dp), axis)
        dDd = jnp.sum(lm_cam * dc * dc) + _psum(
            jnp.sum(lm_pt_b * dp * dp), axis)
        predicted = 0.5 * (dDd - gTdx) - 0.5 * jnp.dot(r_cg, dc)
        d_pose, d_intr, d_pt = step_outputs(dc, dp, aux["s_cam"],
                                            aux["s_pt"])
        return (d_pose, d_intr, d_pt), predicted, iters

    def solve_step_dense_blk(problem_blk, aux, radius):
        prob_l = localize(problem_blk)
        ev = aux["ev"]
        g_cam, g_pt, C = aux["g_cam"], aux["g_pt"], aux["C"]
        B, A = aux["B"], aux["A"]

        lm_cam, _ = _lm_scaled_damp(aux["d_cam"], radius, options)
        B_l = B + jnp.diag(lm_cam)
        C_inv, lm_pt_b = damped_point_blocks(C, radius)

        # Reduced system: psum the local elimination contributions, then a
        # replicated Cholesky on every shard (Dc is small vs M).
        Y = jnp.einsum("mab,mbd->mad", C_inv, A)
        S = B_l - _psum(jnp.einsum("mad,mae->de", A, Y), axis)
        L = jnp.linalg.cholesky(S)

        def schur_solve(rc, rp):
            w = jnp.einsum("mab,mb->ma", C_inv, rp)
            rhs = rc - _psum(jnp.einsum("mad,ma->d", A, w), axis)
            y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
            dc = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
            dp = jnp.einsum("mab,mb->ma", C_inv,
                            rp - jnp.einsum("mad,d->ma", A, dc))
            return dc, dp

        dc, dp = schur_solve(-g_cam, -g_pt)
        for _ in range(options.refinement_steps):
            Hx_cam, Hx_pt = gn_hessian_apply(ev, prob_l, shapes_l, dc, dp)
            res_cam = -g_cam - (_psum(Hx_cam, axis) + lm_cam * dc)
            res_pt = -g_pt - (Hx_pt + lm_pt_b * dp)
            cc, cp = schur_solve(res_cam, res_pt)
            dc = dc + cc
            dp = dp + cp

        gTdx = g_cam @ dc + _psum(jnp.sum(g_pt * dp), axis)
        dDd = jnp.sum(lm_cam * dc * dc) + _psum(
            jnp.sum(lm_pt_b * dp * dp), axis)
        predicted = 0.5 * (dDd - gTdx)
        d_pose, d_intr, d_pt = step_outputs(dc, dp, aux["s_cam"],
                                            aux["s_pt"])
        return (d_pose, d_intr, d_pt), predicted, jnp.asarray(0, jnp.int32)

    # --- apply / cost / stats -------------------------------------------------

    def apply_step_blk(problem_blk, params_blk, step):
        prob_l = localize(problem_blk)
        d_pose, d_intr, d_pt = step
        new_params = residuals.apply_tangent(params_blk, prob_l, d_pose,
                                             d_intr, d_pt)
        sn2 = (jnp.sum(d_pose ** 2) + jnp.sum(d_intr ** 2)
               + _psum(jnp.sum(d_pt ** 2), axis))
        xn2 = (jnp.sum(params_blk.q ** 2) + jnp.sum(params_blk.c ** 2)
               + jnp.sum(params_blk.intr ** 2)
               + _psum(jnp.sum(params_blk.points ** 2), axis))
        return new_params, jnp.sqrt(sn2), jnp.sqrt(xn2)

    def cost_blk(problem_blk, params_blk):
        return _psum(residuals.cost_only(params_blk, localize(problem_blk)),
                     axis)

    def cost_decrease_blk(problem_blk, p_old, p_new):
        return _psum(
            residuals.cost_decrease(p_old, p_new, localize(problem_blk)),
            axis)

    def error_stats_blk(problem_blk, params_blk):
        prob_l = localize(problem_blk)
        stats = residuals.error_stats(params_blk, prob_l,
                                      inlier_threshold(prob_l))
        return tuple(_psum(s, axis) for s in stats)

    # --- shard_map + jit wrappers ----------------------------------------------

    step_spec = (P(), P(), P(axis))

    def smap(f, in_specs, out_specs):
        g = jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
        jf = jax.jit(g)

        def call(*args):
            with jax.default_matmul_precision(options.matmul_precision):
                return jf(*args)

        return call

    _prepare = smap(prepare_blk, (prob_spec, par_spec), aux_specs())
    _solve = smap(solve_step_pcg_blk if use_pcg else solve_step_dense_blk,
                  (prob_spec, aux_specs(), P()),
                  (step_spec, P(), P()))
    _apply = smap(apply_step_blk, (prob_spec, par_spec, step_spec),
                  (par_spec, P(), P()))
    _cost = smap(cost_blk, (prob_spec, par_spec), P())
    _cost_dec = smap(cost_decrease_blk, (prob_spec, par_spec, par_spec),
                     P())
    _stats = smap(error_stats_blk, (prob_spec, par_spec),
                  (P(), P(), P(), P()))

    from ..solver.lm import attach_try_step
    return attach_try_step({
        "prepare": lambda params: _prepare(problem, params),
        "solve_step": lambda aux, radius: _solve(
            problem, aux, jnp.asarray(radius, problem.obs.uv.dtype)),
        "apply_step": lambda params, step: _apply(problem, params, step),
        "cost": lambda params: _cost(problem, params),
        "cost_decrease": lambda p_old, p_new: _cost_dec(problem, p_old,
                                                        p_new),
        "error_stats": lambda params: _stats(problem, params),
        "engine": (options.linear_solver, "xla-flat-sharded"),
    }, options)
