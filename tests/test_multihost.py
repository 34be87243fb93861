"""Multi-host (DCN) parity: two REAL processes, each with 4 virtual CPU
devices, form one 8-device global mesh via jax.distributed; a frame
sharded over that mesh must match the unsharded single-process render.

This exercises the cross-process half of SURVEY §2.7 (the reference has
no distribution at all, main.cpp:205 requests one queue; here the mesh
axis spanning all processes is a first-class component). Collectives ride
Gloo on CPU — the same Mesh/psum code rides ICI/DCN on a pod.
"""

import os
import socket
import subprocess
import sys

import pytest

DRIVER = os.path.join(os.path.dirname(__file__), "multihost_driver.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_two_process_parity():
    # in the default gate (not slow-marked): the ONLY multi-host DCN test —
    # VERDICT r3 item 8 requires it to run routinely (~80 s)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")}
    procs = [
        subprocess.Popen(
            [sys.executable, DRIVER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, f"pid {pid} no OK line:\n{out[-4000:]}"
