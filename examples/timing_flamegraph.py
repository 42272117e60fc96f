#!/usr/bin/env python
"""Per-stage time composition over the run — the timing "flamegraph".

ov_eval timing_flamegraph parity
(/root/reference/ov_eval/src/timing_flamegraph.cpp): the reference plots a
stacked per-component time series; here the same stacked view renders to a
PNG when matplotlib is available and always prints an ASCII stacked strip
(each frame column shows which stage dominated) plus the cumulative stack.

Usage: python examples/timing_flamegraph.py <timing.csv> [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from open_vins_tpu.utils.timing import COLUMNS, load_timing_csv

STAGES = COLUMNS[1:-1]
GLYPH = {"tracking": "t", "propagation": "p", "msckf": "m", "slam": "s",
         "retri_marg": "r"}


def flamegraph(path, out_png=None, strip_width=100):
    d = load_timing_csv(path)
    n = len(d["total"])
    stack = np.stack([d[c] for c in STAGES])  # [S, n]

    print(f"== {path} ({n} frames)")
    tot = stack.sum(axis=1)
    order = np.argsort(tot)[::-1]
    gtotal = max(d["total"].sum(), 1e-12)
    for i in order:
        bar = "#" * int(50 * tot[i] / max(tot.max(), 1e-12))
        print(f"  {STAGES[i]:12s} {tot[i]*1e3:9.2f} ms "
              f"({100*tot[i]/gtotal:5.1f}%) |{bar}")

    # ASCII strip: dominant stage per frame bucket
    if n > 0:
        buckets = np.array_split(np.arange(n), min(strip_width, n))
        strip = "".join(
            GLYPH.get(STAGES[int(np.argmax(stack[:, b].sum(axis=1)))], "?")
            for b in buckets
        )
        print("  dominant stage per frame bucket "
              "(t=track p=prop m=msckf s=slam r=retri):")
        print("  " + strip)

    if out_png:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            print("  (matplotlib unavailable — skipped PNG)")
            return
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.stackplot(np.arange(n), stack * 1e3, labels=STAGES)
        ax.set_xlabel("frame")
        ax.set_ylabel("time (ms)")
        ax.legend(loc="upper right", fontsize=8)
        ax.set_title(os.path.basename(path))
        fig.tight_layout()
        fig.savefig(out_png, dpi=120)
        print(f"  wrote {out_png}")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    flamegraph(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
