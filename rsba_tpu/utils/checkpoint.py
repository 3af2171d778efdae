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
    """Persist/restore solver state per accepted LM step.

    Checkpointed: (iteration, params, trust-region radius) via orbax,
    PLUS a JSON sidecar carrying (a) the accepted-step iteration history
    (so a resumed run's Summary/JSONL continues instead of restarting
    from zero — SURVEY.md §5.5 observability) and (b) a fingerprint of
    the SolverOptions the run was launched with (mismatched resume
    options are surfaced, not silently mixed).

    Usage::

        ckpt = SolverCheckpointer(path, options=opts)
        start = ckpt.restore()          # None or (it, params, radius)
        history = ckpt.restore_history()  # [] or list[IterationSummary]
        lm.solve(problem, params, opts, callback=ckpt.callback,
                 summary=Summary(iterations=history))

    Under the on-device loop the callback fires once per dispatched
    block with the latest accepted record, so the persisted history has
    block granularity there (one record per block).
    """

    def __init__(self, directory: str, keep: int = 2,
                 every_n: int = 1, options=None):
        self.directory = os.path.abspath(directory)
        self.every_n = every_n
        self.options = options
        self._history: list = []
        if not _HAVE_ORBAX:        # pragma: no cover
            raise RuntimeError("orbax-checkpoint is not installed")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep))

    @property
    def _history_path(self) -> str:
        return os.path.join(self.directory, "history.json")

    def save(self, iteration: int, params: Params, radius: float) -> None:
        state = {
            "params": jax.tree.map(np.asarray, params),
            "radius": np.asarray(radius, np.float64),
        }
        self._mgr.save(iteration, args=ocp.args.StandardSave(state))
        import dataclasses
        import json
        rec = {
            "iterations": self._history,
            "options": (dataclasses.asdict(self.options)
                        if self.options is not None else None),
        }
        with open(self._history_path, "w") as f:
            json.dump(rec, f)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def callback(self, iteration: int, params: Params, it_summary) -> None:
        """lm.solve callback: checkpoint each accepted step."""
        import dataclasses
        self._history.append(dataclasses.asdict(it_summary))
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

    def restore_history(self):
        """Persisted accepted-step history → list[IterationSummary].

        Also seeds the in-memory history so subsequent saves append
        rather than truncate, and warns when the stored SolverOptions
        fingerprint differs from this run's.
        """
        import json
        import warnings
        from ..solver.summary import IterationSummary
        if not os.path.exists(self._history_path):
            return []
        with open(self._history_path) as f:
            rec = json.load(f)
        self._history = list(rec.get("iterations", []))
        stored = rec.get("options")
        if stored is not None and self.options is not None:
            import dataclasses
            cur = dataclasses.asdict(self.options)
            diff = {k: (stored[k], cur[k]) for k in cur
                    if k in stored and stored[k] != cur[k]
                    and k not in ("initial_radius", "verbose")}
            if diff:
                warnings.warn(
                    f"resuming with different solver options than the "
                    f"checkpointed run: {diff}")
        return [IterationSummary(**d) for d in self._history]
