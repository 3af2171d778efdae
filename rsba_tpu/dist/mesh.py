"""Mesh construction and problem sharding specs.

One 1-D mesh axis ``"dp"`` spans all chips (ICI within a slice, DCN across
slices — XLA routes the psums; SURVEY.md §5.8).  Multi-host entry is
`jax.distributed.initialize()` + the same code: `Mesh` over
`jax.devices()` is global across processes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..problem.types import Observations, Params, Problem

AXIS = "dp"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def problem_specs(problem: Problem, axis: str = AXIS) -> Problem:
    """PartitionSpec pytree matching Problem: obs + points sharded, rest
    replicated.  Static fields (model/loss) are copied so the treedef
    matches the source problem's."""
    obs = Observations(uv=P(axis), t=P(axis), pose_a=P(axis), pose_b=P(axis),
                       intr_idx=P(axis), point=P(axis), mask=P(axis))
    return Problem(obs=obs, pose_free=P(), point_free=P(axis),
                   intr_free=P(), intr_basis=P(), model=problem.model,
                   loss=problem.loss)


def params_specs(axis: str = AXIS) -> Params:
    return Params(q=P(), c=P(), intr=P(), points=P(axis))


def shard_ba(problem: Problem, params: Params, mesh: Mesh,
             axis: str = AXIS) -> tuple[Problem, Params]:
    """device_put the (repartitioned) problem/params onto the mesh."""
    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree,
            specs)

    problem = problem.replace(
        obs=put(problem.obs, problem_specs(problem, axis).obs),
        pose_free=put(problem.pose_free, P()),
        point_free=put(problem.point_free, P(axis)),
        intr_free=put(problem.intr_free, P()),
        intr_basis=put(problem.intr_basis, P()))
    params = put(params, params_specs(axis))
    return problem, params
