"""True multi-process distributed test (VERDICT round-2 #3 / BASELINE.json
≥2-hosts axis): two OS processes, each with 4 virtual CPU devices, joined
via jax.distributed.initialize + gloo collectives into one 8-device mesh;
the row-sharded EKF update and the distributed Schur BA must reproduce the
dense single-process math across the process (DCN-analog) boundary.

Reference role: the multi-node deployment story of SURVEY.md §2.9/§5.8 —
the reference scales across machines with ROS networking; the TPU-native
equivalent is a jax.distributed process group over pod slices.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "MULTIPROCESS_OK" in out, f"proc {pid} incomplete:\n{out}"


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-m", ""])
