"""Roofline / MFU accounting for the solver's hot phases.

BASELINE.json:5 requires "Jacobian+Schur-solve per iteration at
speed-of-light per chip" with efficiency reported.  This module measures
each jitted phase (prepare = evaluate+assemble, solve_step = damped Schur
solve) and combines wall time with XLA's own cost model
(``compiled.cost_analysis()`` — flops and bytes accessed) into:

* achieved FLOP/s and HBM bytes/s,
* MFU           = achieved FLOP/s / peak FLOP/s,
* bandwidth util = achieved bytes/s / peak HBM bytes/s,
* arithmetic intensity and the roofline bound (compute- vs memory-bound
  classification with the bound's utilization — on a memory-bound phase
  the honest "speed of light" is the bandwidth roofline, not the MXU
  peak).

Peaks default to TPU v5e (v5 lite) public specs: 197 TFLOP/s bf16 MXU
peak and 819 GB/s HBM; override with RSBA_PEAK_FLOPS / RSBA_PEAK_BYTES_S
for other chips.  With ``matmul_precision="highest"`` f32 matmuls run
multi-pass on the MXU, so MFU against the bf16 peak is a conservative
(lower-bound) utilization figure; the bandwidth roofline is
precision-independent.

Caveat: XLA's cost model does not see inside Pallas custom calls, so a
phase built around the fused kernel reports the kernel's HBM operand
traffic but NOT its internal FLOPs — its ``mfu`` is a lower bound and
``bound`` may read "memory" even if the kernel were compute-dense.
Since the evaluator is in fact bandwidth-bound by design (Jacobians
never leave VMEM; traffic = observations in, normal-equation blocks
out), the bandwidth_util number is the meaningful speed-of-light figure
for it.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax

V5E_PEAK_FLOPS = 197e12      # bf16 MXU peak, TPU v5e
V5E_PEAK_BYTES_S = 819e9     # HBM bandwidth, TPU v5e


def _peaks():
    return (float(os.environ.get("RSBA_PEAK_FLOPS", V5E_PEAK_FLOPS)),
            float(os.environ.get("RSBA_PEAK_BYTES_S", V5E_PEAK_BYTES_S)))


def _cost_analysis(call: Callable, args) -> Optional[dict]:
    """flops / bytes from XLA's cost model for a phase-fn wrapper.

    Phase wrappers built by the solver factories carry their underlying
    ``jax.jit`` function and bound leading arguments as ``_jitted`` /
    ``_bound`` attributes; lowering with identical avals hits the jit
    cache, so this does not recompile.
    """
    jf = getattr(call, "_jitted", None)
    if jf is None:
        return None
    bound = getattr(call, "_bound", ())
    # Lower under the SAME matmul precision the timed wrapper traces with
    # — precision is part of the trace context, so a different one would
    # both recompile and cost-model a different executable.
    precision = getattr(call, "_precision", None) or "default"
    try:
        with jax.default_matmul_precision(precision):
            ca = jf.lower(*bound, *args).compile().cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if not ca:
        return None
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def _time_call(call: Callable, args, repeats: int = 5,
               pipeline: int = 20) -> float:
    """Per-execution device time with dispatch latency amortized.

    Dispatches ``pipeline`` async calls back-to-back and blocks once:
    jax dispatch is asynchronous, so the per-call host→device latency
    (tens of ms over the axon tunnel) overlaps device execution instead
    of serializing with it.  Synchronous one-at-a-time timing was
    measured to inflate a 9.5 ms prepare to 33 ms at config-4 scale —
    which is dispatch overhead, not the phase's speed, and the device
    LM loop (lm_device.py) pays it zero times.  ``repeats`` best-of
    rounds guard against background noise.
    """
    jax.block_until_ready(call(*args))
    best = float("inf")
    while True:
        try:
            for _ in range(repeats):
                t0 = time.perf_counter()
                outs = [call(*args) for _ in range(pipeline)]
                jax.block_until_ready(outs)
                best = min(best, (time.perf_counter() - t0) / pipeline)
                del outs
            return best
        except Exception as e:
            # Deep pipelines hold `pipeline` copies of the phase output
            # alive at once — a memory-fat phase (e.g. dense_schur's aux)
            # can exhaust HBM (surfaces as JaxRuntimeError from
            # block_until_ready or ValueError at dispatch).  Halve the
            # depth and retry; latency amortization degrades gracefully.
            if "RESOURCE_EXHAUSTED" not in str(e) or pipeline <= 2:
                raise
            # Drain the queue first: the failed attempt's in-flight
            # executions still hold their output buffers, so an
            # immediate retry OOMs again regardless of depth.
            try:
                jax.block_until_ready(call(*args))
            except Exception:
                pass
            pipeline //= 2
            best = float("inf")


def phase_report(call: Callable, args, repeats: int = 5) -> dict:
    """Measure one phase: wall time + roofline placement."""
    peak_flops, peak_bw = _peaks()
    t = _time_call(call, args, repeats)
    rec = {"time_s": t}
    ca = _cost_analysis(call, args)
    if ca and ca["flops"] > 0:
        ai = ca["flops"] / max(ca["bytes"], 1.0)
        ridge = peak_flops / peak_bw
        rec.update({
            "flops": ca["flops"],
            "bytes": ca["bytes"],
            "achieved_flops_s": ca["flops"] / t,
            "achieved_bytes_s": ca["bytes"] / t,
            "mfu": ca["flops"] / t / peak_flops,
            "bandwidth_util": ca["bytes"] / t / peak_bw,
            "arithmetic_intensity": ai,
            "bound": "compute" if ai >= ridge else "memory",
            # utilization against the binding roofline — the honest
            # "fraction of speed-of-light" figure
            "roofline_util": (ca["flops"] / t / peak_flops if ai >= ridge
                              else ca["bytes"] / t / peak_bw),
        })
    return rec


def solver_report(fns: dict, params, radius, repeats: int = 5) -> dict:
    """prepare + solve_step rooflines for an lm.make_solver_fns dict.

    ``params`` in external layout; converted when the engine is
    window-native.  Returns {"prepare": {...}, "solve_step": {...},
    "iteration": {...}} where "iteration" sums the phases (the
    per-LM-iteration cost BASELINE.json:5 asks to place on the roofline).
    """
    to_internal = fns.get("to_internal")
    p = to_internal(params) if to_internal is not None else params
    prep = phase_report(fns["prepare"], (p,), repeats)
    aux = fns["prepare"](p)
    import jax.numpy as jnp
    r = jnp.asarray(radius, aux["cost"].dtype)
    step = phase_report(fns["solve_step"], (aux, r), repeats)
    it = {"time_s": prep["time_s"] + step["time_s"]}
    if "flops" in prep and "flops" in step:
        peak_flops, peak_bw = _peaks()
        f = prep["flops"] + step["flops"]
        b = prep["bytes"] + step["bytes"]
        it.update({"flops": f, "bytes": b,
                   "mfu": f / it["time_s"] / peak_flops,
                   "bandwidth_util": b / it["time_s"] / peak_bw})
    return {"prepare": prep, "solve_step": step, "iteration": it}
