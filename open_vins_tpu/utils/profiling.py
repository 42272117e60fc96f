"""Device-level tracing via jax.profiler (xplane/perfetto traces).

The reference's observability story is a per-frame timing CSV plus offline
timing tools (ov_msckf/src/core/VioManager.cpp:104-122 CSV +
ov_eval timing_* binaries); `utils/timing.py` reproduces that channel.
This module adds the TPU-native layer the reference cannot have: an XLA
profiler capture of the actual device program (per-fusion timings, HBM
traffic), viewable in TensorBoard / Perfetto.

Usage:
    with trace("/tmp/ovt_trace"):
        state, outs = jitted_run(inputs)
        jax.block_until_ready(state.cov)

Notes:
- Traces capture whatever executes inside the context; wrap a steady-state
  (already-compiled) call, not the first compile, or the trace is all
  compilation.
- On the remote-compile `axon` tunnel backend, device-side events may be
  unavailable; the capture then degrades to host-side events. CPU/TPU local
  backends produce full xplane device timelines.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Context manager: capture a jax.profiler trace into `logdir`.

    Degrades to a no-op (with a warning) if the backend rejects profiling
    (e.g. a remote tunnel without profiler support) so callers can leave
    `--profile` flags wired unconditionally.
    """
    import logging

    import jax

    try:
        jax.profiler.start_trace(logdir,
                                 create_perfetto_link=create_perfetto_link)
    except Exception as e:  # pragma: no cover - backend-dependent
        logging.getLogger(__name__).warning(
            "jax.profiler.start_trace failed (%s); profiling disabled", e)
        yield None
        return
    try:
        yield logdir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception as e:  # pragma: no cover - backend-dependent
            logging.getLogger(__name__).warning(
                "jax.profiler.stop_trace failed: %s", e)


def annotate(name: str):
    """TraceAnnotation for host-side stage labels inside a capture."""
    import jax

    return jax.profiler.TraceAnnotation(name)
