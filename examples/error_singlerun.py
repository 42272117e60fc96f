#!/usr/bin/env python
"""ATE/RPE/NEES evaluation of one run vs groundtruth (error_singlerun parity,
ov_eval/src/error_singlerun.cpp).

Usage: python examples/error_singlerun.py <align: none|posyaw|se3|sim3>
       <est.txt> <gt.txt>   (TUM format files)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from open_vins_tpu.eval import metrics, traj_io


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        return 1
    method, est_path, gt_path = sys.argv[1:4]
    t_e, p_e, q_e = traj_io.load_tum(est_path)
    t_g, p_g, q_g = traj_io.load_tum(gt_path)
    ie, ig = metrics.intersect_times(t_e, t_g)
    p_e, q_e = p_e[ie], q_e[ie]
    p_g, q_g = p_g[ig], q_g[ig]
    R_e = traj_io.quat_xyzw_to_rot(q_e)
    R_g = traj_io.quat_xyzw_to_rot(q_g)
    print(f"matched {len(ie)} poses")

    o, p = metrics.ate(p_e, R_e, p_g, R_g, method=method)
    print(f"ATE: {o.rmse:.3f} deg / {p.rmse:.3f} m  "
          f"(median {o.median:.3f} deg / {p.median:.3f} m)")
    seg = metrics.rpe(p_e, R_e, p_g, R_g)
    for L, (so, sp) in seg.items():
        print(f"RPE {L:>4.0f} m: {so.median:.3f} deg / {sp.median:.3f} m "
              f"({so.mean:.3f} / {sp.mean:.3f} mean)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
