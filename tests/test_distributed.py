"""Two-process jax.distributed CPU harness: the multi-host (DCN) scaling
path that replaces the reference's RayVectorEnv cluster envs
(reference env/venvs.py:449-473; see tianshou_tpu/parallel/distributed.py).

Spawns two fresh Python processes, each with 4 virtual CPU devices, joined
into one 8-device cluster via jax.distributed; asserts cross-host
collectives and host<->global array plumbing work end to end."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if not k.startswith(("XLA_", "JAX_"))}
    env["PYTHONPATH"] = str(ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "distributed_worker.py"), str(port), "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"distributed worker {i}: OK" in out
