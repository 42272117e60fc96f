"""Per-frame stage timing: the reference's timing-CSV observability channel.

Capability parity with the reference's opt-in timing records
(VioManager.cpp:104-122,631-644: per-frame CSV of
{tracking, propagation, msckf update, slam update+init, re-tri/marg, total})
consumed by the ov_eval timing tools.  The same schema is written here so
downstream analysis carries over; `examples/timing_report.py` provides the
histogram/percentages reports (timing_histogram / timing_percentages
parity).

For device work under jit, a stage boundary requires a block_until_ready —
the step-by-step drivers (run_euroc) use FrameTimer; the fused-scan driver
records only totals (one device program has no host-visible stages).
"""

from __future__ import annotations

import time

COLUMNS = ["timestamp", "tracking", "propagation", "msckf", "slam",
           "retri_marg", "total"]


class FrameTimer:
    """Accumulates stage durations for one frame; writes CSV rows."""

    def __init__(self, path=None):
        self.path = path
        self._f = open(path, "w") if path else None
        if self._f:
            self._f.write("#" + ",".join(COLUMNS) + "\n")
        self._t0 = None
        self._stages = {}
        self._mark = None

    def start_frame(self):
        self._t0 = time.perf_counter()
        self._mark = self._t0
        self._stages = {c: 0.0 for c in COLUMNS[1:-1]}

    def stage(self, name):
        now = time.perf_counter()
        if self._mark is not None and name in self._stages:
            self._stages[name] += now - self._mark
        self._mark = now

    def end_frame(self, timestamp):
        total = time.perf_counter() - self._t0
        row = [timestamp] + [self._stages[c] for c in COLUMNS[1:-1]] + [total]
        if self._f:
            self._f.write(",".join(f"{v:.9f}" for v in row) + "\n")
        return total

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


def load_timing_csv(path):
    """-> dict column -> list[float] (Loader::load_timing parity)."""
    import numpy as np

    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(x) for x in line.split(",")])
    arr = np.asarray(rows)
    return {c: arr[:, i] for i, c in enumerate(COLUMNS)}
