"""Solver-state checkpointing for restartable long solves.

Parity/scope (SURVEY.md §5.3-5.4): the reference has no fault tolerance
(single-process Ceres; a crash kills the solve — its closest feature is
user snapshots via ``IterationCallback``).  Here every accepted LM step
can persist (params, trust-region radius, iteration) via orbax, so a
multi-host job restarts from the last accepted step with the ``--resume``
CLI flag.  Elastic resharding is out of scope (documented).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

from ..problem.types import Params

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:                # pragma: no cover
    _HAVE_ORBAX = False


class SolverCheckpointer:
    """Persist/restore (iteration, params, radius) per accepted LM step.

    Usage::

        ckpt = SolverCheckpointer(path)
        start = ckpt.restore()          # None or (it, params, radius)
        lm.solve(problem, params, opts, callback=ckpt.callback)
    """

    def __init__(self, directory: str, keep: int = 2,
                 every_n: int = 1):
        self.directory = os.path.abspath(directory)
        self.every_n = every_n
        if not _HAVE_ORBAX:        # pragma: no cover
            raise RuntimeError("orbax-checkpoint is not installed")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep))

    def save(self, iteration: int, params: Params, radius: float) -> None:
        state = {
            "params": jax.tree.map(np.asarray, params),
            "radius": np.asarray(radius, np.float64),
        }
        self._mgr.save(iteration, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def callback(self, iteration: int, params: Params, it_summary) -> None:
        """lm.solve callback: checkpoint each accepted step."""
        if iteration % self.every_n == 0:
            self.save(iteration, params, it_summary.trust_region_radius)

    def restore(self) -> Optional[Tuple[int, Params, float]]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        state = self._mgr.restore(step)
        params = state["params"]
        if not isinstance(params, Params):
            params = Params(**params)
        return step, params, float(state["radius"])
