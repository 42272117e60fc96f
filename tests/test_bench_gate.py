"""Bench honesty gate (VERDICT round-2 #8): the published throughput must
be zeroed when accuracy regresses.  Runs bench.py --quick twice on CPU —
nominal noise must publish a healthy fps + an RMSE/NEES metric line, and a
deliberate 10x pixel-noise injection must flip the headline to 0.0."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra):
    env = dict(os.environ)
    env.pop("OVT_JAX_CACHE", None)  # never share a cache dir with TPU runs
    env["OVT_JAX_CACHE"] = ""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['bench.py'] + %r;"
        "sys.path.insert(0, %r);"
        "import bench; bench.main(%r)"
    ) % (extra, REPO, extra)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, f"bench failed:\n{r.stdout}\n{r.stderr}"
    metrics = {}
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            metrics[d["metric"]] = d
    return metrics


@pytest.mark.slow
def test_bench_health_gate_flips_on_noise():
    nominal = _run_bench(["--quick"])
    assert "sim_vio_rmse_m" in nominal, f"no RMSE metric line: {nominal}"
    assert "sim_vio_pose_nees" in nominal
    assert nominal["sim_vio_rmse_m"]["value"] < 0.05
    assert nominal["sim_vio_frames_per_sec_1chip"]["value"] > 0.0

    noisy = _run_bench(["--quick", "--noise-mult", "10"])
    assert noisy["sim_vio_frames_per_sec_1chip"]["value"] == 0.0, \
        f"10x noise did not flip the gate: {noisy}"
    assert "health_gate" in noisy, f"no unhealthy marker: {noisy}"


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-m", ""])
