#!/usr/bin/env python
"""Compare per-stage timing across multiple runs' timing CSVs.

ov_eval timing_comparison parity
(/root/reference/ov_eval/src/timing_comparison.cpp): for each CSV, per-stage
mean/std/max plus a side-by-side total-time table so config/algorithm
variants can be compared.

Usage: python examples/timing_comparison.py <a.csv> <b.csv> [...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from open_vins_tpu.utils.timing import COLUMNS, load_timing_csv


def compare(paths):
    data = {p: load_timing_csv(p) for p in paths}
    names = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    width = max(12, max(len(n) for n in names) + 2)

    header = f"{'stage':14s}" + "".join(f"{n:>{width}s}" for n in names)
    print(header)
    print("-" * len(header))
    rows = []
    for c in COLUMNS[1:]:
        cells = []
        for p in paths:
            v = data[p][c]
            cells.append(f"{v.mean()*1e3:7.2f}±{v.std()*1e3:<5.2f}"
                         if v.size else "      --")
        print(f"{c:14s}" + "".join(f"{s:>{width}s}" for s in cells))
        rows.append((c, cells))
    print("\n(total ms, p50/p95/max)")
    for p, n in zip(paths, names):
        t = data[p]["total"] * 1e3
        print(f"  {n:20s}: {np.percentile(t,50):7.2f} / "
              f"{np.percentile(t,95):7.2f} / {t.max():7.2f}  "
              f"({len(t)} frames)")
    return rows


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    compare(sys.argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
