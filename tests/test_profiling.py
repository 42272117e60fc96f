"""jax.profiler tracing hook: capture must produce an xplane artifact."""

import glob
import pytest
import os

import jax
import jax.numpy as jnp

from open_vins_tpu.utils.profiling import annotate, trace


def test_trace_produces_xplane(tmp_path):
    logdir = str(tmp_path / "trace")

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64))
    jax.block_until_ready(f(x))  # compile outside the capture
    with trace(logdir):
        with annotate("steady_step"):
            jax.block_until_ready(f(x))
    hits = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)
    assert hits, f"no xplane trace written under {logdir}"


def test_xplane_report_cli(tmp_path):
    """The device-profile report CLI runs on a fresh capture."""
    import subprocess
    import sys

    pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
    logdir = str(tmp_path / "trace")

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64))
    jax.block_until_ready(f(x))
    with trace(logdir):
        jax.block_until_ready(f(x))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "xplane_report.py"),
         logdir, "--top", "5"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "total" in out.stdout


def test_trace_degrades_to_noop_on_error(tmp_path, monkeypatch):
    """A backend that rejects start_trace must not break the caller."""
    import jax.profiler as prof

    def boom(*a, **k):
        raise RuntimeError("no profiler on this backend")

    monkeypatch.setattr(prof, "start_trace", boom)
    with trace(str(tmp_path / "t")) as t:
        assert t is None
