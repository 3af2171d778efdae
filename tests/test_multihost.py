"""Multi-host execution test: 2 REAL processes over a localhost
coordinator (SURVEY.md §4.2 item 5, §5.8; VERDICT r4 missing #2).

Each subprocess gets 4 virtual CPU devices; `initialize_multihost` makes
`jax.devices()` span 8 across both, the banded window solver shards over
the GLOBAL mesh, and each process checks the sharded step against its
own single-process solve (tolerance equality — the same oracle the
in-process 8-device tests use, now with the coordinator + gloo
collectives actually exercised end to end).
"""
import os
import pathlib
import socket
import subprocess
import sys

import pytest

_RUNNER = pathlib.Path(__file__).parent / "_multihost_runner.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_multihost_banded_step():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    repo = str(pathlib.Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(_RUNNER), str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost subprocesses timed out:\n"
                    + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {i} failed (rc={p.returncode}):\n{out[-4000:]}")
        assert "MULTIHOST_OK" in out, out[-4000:]
    # Replicated trust-region contract: both processes computed the same
    # post-step cost from psum'd quantities.
    costs = [line.split()[1] for out in outs for line in out.splitlines()
             if line.startswith("MULTIHOST_OK")]
    assert len(costs) == 2 and costs[0] == costs[1], costs
