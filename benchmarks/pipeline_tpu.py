"""Chip-side SfM pipeline benchmark (VERDICT r4 missing #4).

Runs the f32 incremental-SfM session (pipeline.SfmSession) END TO END on
the real TPU chip: bootstrap → per-frame RS registration → triangulation
→ windowed BA through the banded/Pallas path, on a synthetic 50-frame
rolling-shutter sequence.  Reports ingest rate (frames/s, excluding the
one-time compile-dominated first frames) and pose accuracy vs GT.

    JAX_PLATFORMS=axon,cpu PYTHONPATH=/root/repo python benchmarks/pipeline_tpu.py

Writes benchmarks/PIPELINE_TPU.json.
"""
import json
import os
import pathlib
import sys
import time

if os.environ.get("JAX_PLATFORMS") == "axon":
    import jax
    jax.config.update("jax_platforms", "axon,cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from rsba_tpu.geometry import quaternion as quat
    from rsba_tpu.pipeline import SfmSession
    from rsba_tpu.problem import synthetic
    from rsba_tpu.solver.options import SolverOptions

    n_frames = int(os.environ.get("RSBA_PIPE_FRAMES", "50"))
    ba = synthetic.make_ba_problem(
        n_poses=n_frames + 1, n_points=1200, track_len=8,
        rolling_shutter=True, rotation_interp="nlerp",
        use_distortion=False, pixel_noise=0.5, seed=11,
        name="pipeline_tpu")
    obs = ba.problem.obs
    m = np.asarray(obs.mask) > 0
    pa = np.asarray(obs.pose_a)[m]
    pid = np.asarray(obs.point)[m]
    uv = np.asarray(obs.uv)[m]
    intr = np.asarray(ba.params_gt.intr[0])

    sess = SfmSession(
        intr, ba.problem.model, ba.image_size, window=8, ba_interval=4,
        dtype=jnp.float32, shape_buckets=True,
        options=SolverOptions(linear_solver="auto", max_iterations=25))
    t_first = time.perf_counter()
    frame_walls = []
    for f in range(n_frames):
        sel = pa == f
        t0 = time.perf_counter()
        sess.add_frame(pid[sel], uv[sel], rows=uv[sel, 1])
        frame_walls.append(time.perf_counter() - t0)
        print(f"frame {f:3d}  {frame_walls[-1]*1e3:8.1f} ms  "
              f"{sess.log[-1].get('event')}", flush=True)
    total = time.perf_counter() - t_first

    s = sess.bundle_adjust(window=None)
    # Accuracy: relative-rotation angles vs GT (similarity-invariant).
    q_est, c_est, _ = sess.reconstruction()
    q_gt = np.asarray(ba.params_gt.q)[:n_frames]
    rel_est = quat.relative(jnp.asarray(q_est[:-1]), jnp.asarray(q_est[1:]))
    rel_gt = quat.relative(jnp.asarray(q_gt[:-1]), jnp.asarray(q_gt[1:]))
    ang_err = np.abs(
        np.linalg.norm(np.asarray(quat.to_axis_angle(rel_est)), axis=-1)
        - np.linalg.norm(np.asarray(quat.to_axis_angle(rel_gt)), axis=-1))

    # Steady-state ingest: drop the compile-dominated first half (each
    # new shape bucket's first hit compiles; later frames reuse).
    steady = frame_walls[len(frame_walls) // 2:]
    out = {
        "backend": jax.default_backend(),
        "frames": n_frames,
        "n_points_map": len(sess.points),
        "total_ingest_s": round(total, 2),
        "steady_frames_per_s": round(len(steady) / max(sum(steady), 1e-9),
                                     2),
        "steady_ms_per_frame": round(
            sum(steady) / len(steady) * 1e3, 1),
        "final_ba_rmse_inlier_px": round(float(s.final_rmse_inlier), 4),
        "final_ba_termination": s.termination,
        "max_rel_rotation_err_rad": round(float(ang_err.max()), 5),
        "dtype": "float32",
        "engine": f"{s.linear_solver}/{s.evaluator}",
        "note": "f32 SfmSession on the real chip: bootstrap + RS "
                "registration + triangulation + windowed BA; "
                "shape_buckets=True reuses jit across frames",
    }
    path = pathlib.Path(__file__).parent / "PIPELINE_TPU.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
