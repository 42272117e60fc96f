#!/usr/bin/env python
"""Align an estimated trajectory onto groundtruth and write the aligned file.

ov_eval live_align_trajectory parity
(/root/reference/ov_eval/src/live_align_trajectory.cpp): the reference node
periodically re-aligns the live estimate to groundtruth and republishes the
aligned path for visualization.  The non-ROS equivalent reads the (possibly
still-growing) estimate file, aligns it to groundtruth with the chosen
method, and writes the aligned TUM trajectory — run it repeatedly (or with
--watch N to loop every N seconds) against a file a live run is appending
to (see examples/pose_to_file.py).

Usage:
  python examples/live_align_trajectory.py <align_mode> <gt.txt> <est.txt> <out.txt> [--watch N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from open_vins_tpu.eval import metrics, traj_io
from open_vins_tpu.eval.alignment import align_trajectory, apply_alignment


def align_once(align_mode, gt_path, est_path, out_path):
    t_gt, p_gt, q_gt = traj_io.load_tum(gt_path)
    t_e, p_e, q_e = traj_io.load_tum(est_path)
    if len(t_e) < 3:
        print(f"[align]: only {len(t_e)} poses yet — skipping")
        return False
    R_e = traj_io.quat_xyzw_to_rot(q_e)
    R_gt = traj_io.quat_xyzw_to_rot(q_gt)
    ie, ig = metrics.intersect_times(t_e, t_gt)
    if len(ie) < 3:
        print("[align]: no time overlap with groundtruth")
        return False
    s, R, t = align_trajectory(p_e[ie], p_gt[ig], align_mode)
    p_a, R_a = apply_alignment(p_e, R_e, s, R, t)
    traj_io.save_tum(out_path, t_e, p_a, traj_io.rot_to_quat_xyzw(R_a))
    err = np.linalg.norm(p_gt[ig] - p_a[ie], axis=1)
    print(f"[align]: {len(t_e)} poses aligned ({align_mode}), "
          f"rmse {np.sqrt((err**2).mean()):.3f} m -> {out_path}")
    return True


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) < 4:
        print(__doc__)
        return 1
    watch = 0.0
    if "--watch" in sys.argv:
        watch = float(sys.argv[sys.argv.index("--watch") + 1])
    align_mode, gt, est, out = args[:4]
    while True:
        align_once(align_mode, gt, est, out)
        if watch <= 0:
            break
        time.sleep(watch)
    return 0


if __name__ == "__main__":
    sys.exit(main())
