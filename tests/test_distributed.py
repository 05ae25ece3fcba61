"""True multi-process data parallelism (jax.distributed + gloo).

The rest of the suite exercises sharding on a single-process virtual
mesh; this test launches two OS processes, each owning two virtual CPU
devices, rendezvousing through jax.distributed — the same runtime a
multi-host TPU pod uses (SURVEY.md §4: "multi-host tests using jax's
multi-process runtime").  The worker asserts that a batch sharded over
the 4-device global mesh basecalls identically to a single-device run.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_basecall():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "distributed basecall matches local" in out
