#!/usr/bin/env python
"""Multi-algorithm, multi-run error evaluation over ONE dataset.

ov_eval error_dataset parity (/root/reference/ov_eval/src/error_dataset.cpp):
given a groundtruth file and a folder whose subdirectories are algorithms
(each holding one or more run trajectory .txt files), print per-algorithm
ATE (and ATE-2D) statistics over runs plus the RPE table pooled across runs.

Usage:
  python examples/error_dataset.py <align_mode> <file_gt.txt> <folder_algorithms>

align_mode: none | posyaw | se3 | sim3
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from open_vins_tpu.eval import metrics, traj_io


def _load(path):
    t, p, q = traj_io.load_tum(path)
    return t, p, traj_io.quat_xyzw_to_rot(q)


def evaluate(align_mode, gt_path, algo_dir,
             segments=(8.0, 16.0, 24.0, 32.0, 40.0, 48.0)):
    t_gt, p_gt, R_gt = _load(gt_path)
    length = float(np.sum(np.linalg.norm(np.diff(p_gt, axis=0), axis=1)))
    print(f"[COMP]: {len(t_gt)} gt poses in "
          f"{os.path.splitext(os.path.basename(gt_path))[0]} "
          f"=> length of {length:.2f} meters")

    algos = sorted(
        d for d in os.listdir(algo_dir)
        if os.path.isdir(os.path.join(algo_dir, d))
    )
    results = {}
    for algo in algos:
        runs = sorted(
            f for f in os.listdir(os.path.join(algo_dir, algo))
            if f.endswith(".txt")
        )
        ate_ori, ate_pos, ate2_yaw, ate2_pos = [], [], [], []
        rpe_pool = {L: ([], []) for L in segments}
        for run in runs:
            t_e, p_e, R_e = _load(os.path.join(algo_dir, algo, run))
            ie, ig = metrics.intersect_times(t_e, t_gt)
            if len(ie) < 2:
                print(f"[COMP]:   skipping {algo}/{run} (no time overlap)")
                continue
            pe, Re = p_e[ie], R_e[ie]
            pg, Rg = p_gt[ig], R_gt[ig]
            so, sp = metrics.ate(pe, Re, pg, Rg, method=align_mode)
            ate_ori.append(so.rmse)
            ate_pos.append(sp.rmse)
            s2o, s2p = metrics.ate_2d(pe, Re, pg, Rg)
            ate2_yaw.append(s2o.rmse)
            ate2_pos.append(s2p.rmse)
            for L, (so_r, sp_r) in metrics.rpe(pe, Re, pg, Rg, segments).items():
                if np.isfinite(so_r.rmse):
                    rpe_pool[L][0].append(so_r.rmse)
                    rpe_pool[L][1].append(sp_r.rmse)
        results[algo] = (ate_ori, ate_pos, ate2_yaw, ate2_pos, rpe_pool)

    print("\n============ ATE over runs (deg / m) ============")
    for algo, (ao, ap, a2y, a2p, _) in results.items():
        if not ao:
            print(f"{algo:24s}: no valid runs")
            continue
        print(f"{algo:24s}: {np.mean(ao):.3f} +- {np.std(ao):.3f} deg / "
              f"{np.mean(ap):.3f} +- {np.std(ap):.3f} m   ({len(ao)} runs)"
              f"   [2d: {np.mean(a2y):.3f} deg yaw / {np.mean(a2p):.3f} m]")

    print("\n============ RPE (median deg / m per segment) ============")
    for algo, (_, _, _, _, pool) in results.items():
        cells = []
        for L in segments:
            o, p = pool[L]
            if o:
                cells.append(f"{L:.0f}m {np.median(o):.3f}/{np.median(p):.3f}")
        print(f"{algo:24s}: " + "  ".join(cells))
    return results


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 1
    evaluate(sys.argv[1], sys.argv[2], sys.argv[3])
    return 0


if __name__ == "__main__":
    sys.exit(main())
