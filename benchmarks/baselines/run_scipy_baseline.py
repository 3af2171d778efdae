"""Record the external CPU baseline: scipy sparse-LM on config 4.

Run with:  JAX_PLATFORMS=cpu JAX_ENABLE_X64=1 python \
    benchmarks/baselines/run_scipy_baseline.py [scale]

Stores the result in benchmarks/baselines/scipy_config4.json, keyed by
``config@scale`` — bench.py reports the speedup against this alongside
the self-baseline (VERDICT round 1, "record an honest external CPU
baseline"; SURVEY.md §3.5/§6: Ceres is not installable here, so scipy's
trust-region reflective with analytic sparse Jacobians is the labeled
stand-in).
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from rsba_tpu.problem import synthetic  # noqa: E402

from benchmarks.baselines import scipy_lm  # noqa: E402

OUT = pathlib.Path(__file__).parent / "scipy_config4.json"


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    max_nfev = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    config = "rs_slerp_robust"
    ba = synthetic.CONFIGS[config](scale=scale, dtype=jnp.float64)
    n_obs = int(jnp.sum(ba.problem.obs.mask))
    print(f"{config}@{scale}: poses={ba.params0.q.shape[0]} "
          f"points={ba.params0.points.shape[0]} obs={n_obs}", flush=True)
    _, info = scipy_lm.solve_scipy(ba.problem, ba.params0, verbose=2,
                                   max_nfev=max_nfev)
    rec = {
        "solver": "scipy.optimize.least_squares(method=trf, "
                  "tr_solver=lsmr, analytic sparse J) on CPU f64 — "
                  "external baseline (Ceres not installed, SURVEY.md §6)",
        "n_poses": int(ba.params0.q.shape[0]),
        "n_points": int(ba.params0.points.shape[0]),
        "n_obs": n_obs,
        **info,
    }
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[f"{config}@{scale}"] = rec
    OUT.write_text(json.dumps(data, indent=1) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
