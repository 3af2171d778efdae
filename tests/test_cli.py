"""CLI runner tests (SURVEY.md §2 C20/C23 — service-frontend parity)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "rsba_tpu.cli.run", *argv],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)


def last_json(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in output:\n{stdout}")


def test_cli_gs_small(tmp_path):
    jsonl = tmp_path / "iters.jsonl"
    ply = tmp_path / "cloud.ply"
    r = run_cli("--config=gs_small", "--scale=0.05", "--max-iterations=15",
                f"--jsonl={jsonl}", f"--ply={ply}", "--full-report")
    assert r.returncode == 0, r.stderr[-2000:]
    rec = last_json(r.stdout)
    assert rec["termination"] == "CONVERGENCE"
    assert rec["final_rmse_px"] < 0.8
    assert "Solver Report" in r.stdout
    assert jsonl.exists() and len(jsonl.read_text().splitlines()) >= 1
    assert ply.read_text().startswith("ply")


def test_cli_sharded_rs(tmp_path):
    env_flags = {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_flags)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "rsba_tpu.cli.run",
         "--config=rs_video_linear", "--scale=0.02", "--shard",
         "--max-iterations=25"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = last_json(r.stdout)
    assert rec["termination"] == "CONVERGENCE"
    assert "[sharded]" in r.stdout


def test_cli_rejects_unknown_config():
    r = run_cli("--config=nonsense", timeout=120)
    assert r.returncode == 2
    assert "invalid choice" in r.stderr
