"""Multi-host bring-up smoke: 2 jax.distributed processes on one machine
(VERDICT round-1 item #6/#9 — init_distributed was untested dead code).

Runs tools/multihost_smoke.py as two subprocesses that form a 4-device
global mesh over the CPU backend and all-reduce a global array.
"""

import os
import socket
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "tools",
                      "multihost_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_distributed_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # script sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"multihost_smoke process {pid}/2: OK" in out
