#!/usr/bin/env python
"""Timing CSV reports: summary stats + per-stage percentages + histogram.

ov_eval timing_histogram / timing_percentages / timing_comparison parity
over the per-frame timing CSV written by utils/timing.FrameTimer.

Usage: python examples/timing_report.py <timing.csv> [more.csv ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from open_vins_tpu.utils.timing import COLUMNS, load_timing_csv


def report(path):
    d = load_timing_csv(path)
    total = d["total"]
    print(f"== {path}  ({len(total)} frames)")
    print(f"   total: mean {total.mean()*1e3:.2f} ms  "
          f"p50 {np.percentile(total,50)*1e3:.2f}  "
          f"p95 {np.percentile(total,95)*1e3:.2f}  "
          f"max {total.max()*1e3:.2f}")
    for c in COLUMNS[1:-1]:
        v = d[c]
        if v.sum() == 0:
            continue
        print(f"   {c:12s}: mean {v.mean()*1e3:6.2f} ms  "
              f"({100*v.sum()/max(total.sum(),1e-12):5.1f}% of total)")
    # ascii histogram of totals
    ms = total * 1e3
    lo, hi = ms.min(), np.percentile(ms, 99)
    bins = np.linspace(lo, max(hi, lo + 1e-3), 13)
    hist, _ = np.histogram(ms, bins)
    peak = max(hist.max(), 1)
    print("   histogram (ms):")
    for i in range(len(hist)):
        bar = "#" * int(40 * hist[i] / peak)
        print(f"   {bins[i]:7.2f}-{bins[i+1]:7.2f} |{bar}")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    for p in sys.argv[1:]:
        report(p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
