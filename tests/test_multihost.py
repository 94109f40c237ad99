"""Two-process ``jax.distributed`` smoke test on the CPU backend.

The reference has no distributed runtime at all (SURVEY.md §2.4 — its only
parallelism is a joblib pool); this framework's multi-host story is
``parallel.mesh.init_multihost`` + a global mesh over all processes' devices.
Single-process virtual-mesh tests cover the sharding semantics; this test is
the missing cross-process artifact: it launches two real OS processes, each
with 4 virtual CPU devices, initializes the distributed runtime through the
library helper, and checks a global-array reduction and a cross-process
``shard_map`` psum over the 8-device global mesh.
"""

import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_smoke():
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="",  # child steers to cpu via the config API
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(port), str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "MULTIHOST_OK" in out, out
    # Both processes must agree on the global reductions.
    lines = [
        ln for out in outs for ln in out.splitlines() if ln.startswith("MULTIHOST_OK")
    ]
    assert len(lines) == 2 and lines[0] == lines[1], lines
