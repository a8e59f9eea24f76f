"""Two-process jax.distributed smoke test (SURVEY.md §7 step 7): the
multi-host bring-up path (parallel/mesh.py initialize_distributed) is
executed for real — 2 processes x 4 virtual CPU devices = one global
8-device mesh — instead of only the single-process virtual mesh."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_agrees_with_single():
    port = _free_port()
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "two_process_worker.py"),
             str(i), str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2700)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i}: OK" in out, out
