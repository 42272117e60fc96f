#!/usr/bin/env python
"""Offline simulation-consistency evaluation: RMSE + NEES over time from a
recorded run (error_simulation parity, ov_eval/src/error_simulation.cpp +
ResultSimulation.h:59-110).

Input: the npz written by `run_sim.py --save-full` (est + gt + pose cov).
Usage: python examples/error_simulation.py run.npz [--plot out.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--plot", default="")
    ap.add_argument("--skip", type=float, default=2.0,
                    help="seconds of convergence transient to skip")
    args = ap.parse_args()

    import jax.numpy as jnp

    from open_vins_tpu.eval import metrics
    from open_vins_tpu.ops import lie

    d = np.load(args.npz)
    t = d["t"]
    R_est = np.array(
        [np.array(lie.quat_2_rot(jnp.asarray(q))) for q in d["q_est"]])
    R_gt = np.array(
        [np.array(lie.quat_2_rot(jnp.asarray(q))) for q in d["q_gt"]])

    o_stats, p_stats, f_stats = metrics.nees(
        d["p_est"], np.swapaxes(R_est, -1, -2),
        d["p_gt"], np.swapaxes(R_gt, -1, -2), d["cov6"],
    )
    sel = t - t[0] >= args.skip
    perr = np.linalg.norm(d["p_gt"] - d["p_est"], axis=1)
    rel = np.einsum("nij,nkj->nik", R_gt, R_est)
    therr = np.array([np.linalg.norm(np.array(lie.log_so3(jnp.asarray(r))))
                      for r in rel])
    print(f"frames: {len(t)} (skipping first {args.skip}s for NEES)")
    print(f"RMSE: {np.sqrt((perr[sel]**2).mean())*100:.2f} cm / "
          f"{np.degrees(np.sqrt((therr[sel]**2).mean())):.3f} deg")
    nees_t = []
    for k in range(len(t)):
        dth = -np.array(lie.log_so3(jnp.asarray(rel[k])))
        dp = d["p_gt"][k] - d["p_est"][k]
        e = np.concatenate([dth, dp])
        P = d["cov6"][k] + 1e-12 * np.eye(6)
        nees_t.append(e @ np.linalg.solve(P, e))
    nees_t = np.asarray(nees_t)
    print(f"pose NEES (dof 6): mean {nees_t[sel].mean():.2f}  "
          f"median {np.median(nees_t[sel]):.2f}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(14, 4))
        axes[0].plot(t - t[0], perr * 100)
        axes[0].set_title("position error [cm]")
        axes[1].plot(t - t[0], np.degrees(therr))
        axes[1].set_title("orientation error [deg]")
        axes[2].plot(t - t[0], nees_t)
        axes[2].axhline(6.0, color="r", ls="--", label="dof")
        axes[2].set_title("pose NEES")
        axes[2].legend()
        for ax in axes:
            ax.set_xlabel("t [s]")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=110)
        print(f"wrote {args.plot}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
