#!/usr/bin/env python
"""ATE/RPE comparison tables over algorithms × datasets.

ov_eval error_comparison parity (error_comparison.cpp; docs/eval-error.dox
§structure): folder convention

    <base>/truths/<dataset>.txt
    <base>/algorithms/<algo>/<dataset>/run*.txt

Prints a Markdown table (deg / m, ATE averaged over runs) and a LaTeX table
(the reference emits LaTeX).

Usage: python examples/error_comparison.py <base> [--align se3] [--latex]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from open_vins_tpu.eval import metrics, traj_io


def evaluate_run(est_path, gt_path, align):
    t_e, p_e, q_e = traj_io.load_tum(est_path)
    t_g, p_g, q_g = traj_io.load_tum(gt_path)
    ie, ig = metrics.intersect_times(t_e, t_g)
    if len(ie) < 10:
        return None
    R_e = traj_io.quat_xyzw_to_rot(q_e[ie])
    R_g = traj_io.quat_xyzw_to_rot(q_g[ig])
    o, p = metrics.ate(p_e[ie], R_e, p_g[ig], R_g, method=align)
    return o.rmse, p.rmse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("--align", default="se3")
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args()

    truths = sorted(glob.glob(os.path.join(args.base, "truths", "*.txt")))
    datasets = [os.path.splitext(os.path.basename(t))[0] for t in truths]
    algos = sorted(os.listdir(os.path.join(args.base, "algorithms")))
    if not datasets or not algos:
        print("no truths/ or algorithms/ found under", args.base)
        return 1

    table = {}
    for algo in algos:
        row = []
        for ds, gt in zip(datasets, truths):
            runs = sorted(glob.glob(
                os.path.join(args.base, "algorithms", algo, ds, "run*.txt")))
            vals = [evaluate_run(r, gt, args.align) for r in runs]
            vals = [v for v in vals if v is not None]
            if vals:
                o = np.mean([v[0] for v in vals])
                p = np.mean([v[1] for v in vals])
                row.append((o, p))
            else:
                row.append(None)
        table[algo] = row

    # markdown
    hdr = "| algorithm | " + " | ".join(datasets) + " | average |"
    print(hdr)
    print("|" + "---|" * (len(datasets) + 2))
    for algo, row in table.items():
        cells, avg = [], []
        for v in row:
            if v is None:
                cells.append("—")
            else:
                cells.append(f"{v[0]:.3f} / {v[1]:.3f}")
                avg.append(v)
        if avg:
            cells.append(f"{np.mean([a[0] for a in avg]):.3f} / "
                         f"{np.mean([a[1] for a in avg]):.3f}")
        else:
            cells.append("—")
        print(f"| {algo} | " + " | ".join(cells) + " |")

    if args.latex:
        print("\n% LaTeX")
        print(r"\begin{tabular}{l" + "c" * (len(datasets) + 1) + "}")
        print("algorithm & " + " & ".join(d.replace("_", r"\_") for d in datasets)
              + r" & average \\ \hline")
        for algo, row in table.items():
            cells, avg = [], []
            for v in row:
                cells.append("—" if v is None else f"{v[0]:.3f} / {v[1]:.3f}")
                if v is not None:
                    avg.append(v)
            a = (f"{np.mean([x[0] for x in avg]):.3f} / "
                 f"{np.mean([x[1] for x in avg]):.3f}") if avg else "—"
            print(algo.replace("_", r"\_") + " & " + " & ".join(cells)
                  + f" & {a} " + r"\\")
        print(r"\end{tabular}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
