"""Cross-process distributed solve: 2 localhost processes via
jax.distributed.initialize (SURVEY.md §4 item 4 "cross-host = 2-process
jax.distributed.initialize on localhost").

Spawned as subprocesses so the test session's own jax runtime is not
disturbed.  Slow (two cold jax inits + compiles on 2 vCPUs), so marked
for the nightly path; skipped when sockets are unavailable.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_smoke.py")


def _free_port():
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
    finally:
        s.close()


@pytest.mark.slow
def test_two_process_distributed_solve():
    try:
        port = _free_port()
    except OSError:
        pytest.skip("no sockets available")

    procs = []
    for pid in (0, 1):
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
        }
        env.update({
            "_SMOKE_NPROC": "2",
            "_SMOKE_PROC": str(pid),
            "_SMOKE_PORT": str(port),
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, SCRIPT], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost smoke timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "SMOKE_OK" in out, out[-3000:]
