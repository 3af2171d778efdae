"""Visibility-clustered preconditioner for the flat PCG path
(solver/cluster.py — Ceres CLUSTER_JACOBI parity for unordered
problems; SURVEY.md §2 C16, VERDICT r4 missing #3)."""
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from rsba_tpu.io import bal
from rsba_tpu.solver import cluster, flatplan, lm
from rsba_tpu.solver.options import SolverOptions

BAL_SAMPLE = (pathlib.Path(__file__).parent.parent / "benchmarks" / "data"
              / "bal_ring12.txt.gz")


@pytest.fixture(scope="module")
def bal_problem():
    return bal.load_bal(str(BAL_SAMPLE), dtype=jnp.float64)


def test_clustering_partitions_cameras(bal_problem):
    problem, _ = bal_problem
    plans = flatplan.build_flat_plans(problem, problem.intr_tangent_dim)
    ids = cluster.cluster_cameras(problem, plans.point, max_size=4)
    P = int(problem.pose_free.shape[0])
    assert ids.shape == (P,)
    # Every pose assigned; clusters respect the size cap; co-visible
    # cameras (a ring: neighbours share points) actually got merged.
    _, counts = np.unique(ids, return_counts=True)
    assert counts.max() <= 4
    assert len(counts) < P          # at least one real merge happened


def test_cluster_blocks_are_principal_submatrices_of_S(bal_problem):
    """The strong oracle: each cluster block must EQUAL the
    corresponding principal submatrix of the true reduced camera system
    S = B − E C⁻¹ Eᵀ (assembled densely for this small problem)."""
    from rsba_tpu.solver import assembly, residuals, schur
    problem, params = bal_problem
    shapes = assembly.TangentShapes(
        problem.pose_free.shape[0], problem.intr_free.shape[0],
        problem.intr_tangent_dim, problem.point_free.shape[0])
    plans = flatplan.build_flat_plans(problem, problem.intr_tangent_dim)
    ev = residuals.evaluate(params, problem, True)
    C = schur.point_hessian_planned(ev, plans)
    C_inv = schur.invert_3x3_psd(C + 1e-9 * jnp.eye(3)[None])
    B = schur.assemble_B_planned(ev, problem, shapes, plans)
    A = schur.assemble_E_planned(ev, problem, shapes, plans)
    Y = jnp.einsum("mab,mbd->mad", C_inv, A)
    S = B - jnp.einsum("mad,mae->de", A, Y)
    cp = cluster.build_cluster_plan(problem, plans.point, max_size=4)
    P = shapes.n_poses
    D_pose = jnp.stack([S[p * 6:(p + 1) * 6, p * 6:(p + 1) * 6]
                        for p in range(P)])
    blocks = cluster.cluster_blocks(cp, D_pose, ev, problem, C_inv)
    ids = np.asarray(cp.cluster_of)
    loc = np.asarray(cp.local_of)
    for c in range(cp.n_clusters):
        for p in np.nonzero(ids == c)[0]:
            for q in np.nonzero(ids == c)[0]:
                S_true = np.asarray(S[p * 6:(p + 1) * 6,
                                      q * 6:(q + 1) * 6])
                blk = np.asarray(
                    blocks[c, loc[p] * 6:(loc[p] + 1) * 6,
                           loc[q] * 6:(loc[q] + 1) * 6])
                np.testing.assert_allclose(blk, S_true, rtol=1e-9,
                                           atol=1e-9 * abs(S_true).max())


def _one_step(problem, params, precond):
    opts = SolverOptions(linear_solver="iterative_schur",
                         preconditioner=precond, max_cg_iterations=300,
                         cg_eta=1e-4, device_loop="off")
    fns = lm.make_solver_fns(problem, opts)
    aux = fns["prepare"](params)
    _, predicted, li = fns["solve_step"](aux, jnp.asarray(1e4, jnp.float64))
    return int(li), float(predicted)


def test_cluster_jacobi_reduces_cg_iterations():
    """On a problem with real cluster structure (trajectory windows —
    nearby cameras co-observe), the clustered blocks beat Schur-Jacobi's
    iteration count at the same forcing tolerance.  (On adversarial
    topologies — e.g. a small ring where greedy cuts sever the strongest
    couplings — block enlargement need not help; the guarantee tested
    here is the capability on its intended problem class.)"""
    from rsba_tpu.problem import synthetic
    ba = synthetic.config1_gs_small(scale=0.5, seed=1)
    li_sj, pred_sj = _one_step(ba.problem, ba.params0, "schur_jacobi")
    li_cl, pred_cl = _one_step(ba.problem, ba.params0, "cluster_jacobi")
    np.testing.assert_allclose(pred_cl, pred_sj, rtol=1e-2)
    assert li_cl < li_sj, (li_cl, li_sj)


def test_cluster_jacobi_full_solve_converges(bal_problem):
    problem, params = bal_problem
    opts = SolverOptions(linear_solver="iterative_schur",
                         preconditioner="cluster_jacobi",
                         max_cg_iterations=200, cg_eta=1e-2,
                         max_iterations=30)
    _, summary = lm.solve(problem, params, opts)
    assert summary.termination == "CONVERGENCE"
