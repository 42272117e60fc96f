#!/usr/bin/env python
"""Closed-loop simulation run: synthetic IMU+camera -> MSCKF VIO -> metrics.

The run_simulation entry-point equivalent (ov_msckf/src/run_simulation.cpp):
builds the seeded simulator, runs the full filter as one device program, and
reports RMSE / NEES — the reference's error_simulation quality bar.

Usage:
  python examples/run_sim.py [--duration 20] [--cpu] [--seed 0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--num-pts", type=int, default=45)
    ap.add_argument("--clones", type=int, default=11)
    ap.add_argument("--max-slam", type=int, default=0)
    ap.add_argument("--msckf", type=int, default=30,
                    help="max MSCKF features per update")
    ap.add_argument("--integration", default="rk4",
                    choices=["discrete", "rk4", "analytical"])
    ap.add_argument("--max-tracks", type=int, default=256)
    ap.add_argument("--plot", default="", help="write state-error/3σ plot PNG")
    ap.add_argument("--save-est", default="", help="write TUM estimate file")
    ap.add_argument("--save-gt", default="", help="write TUM groundtruth file")
    ap.add_argument("--save-full", default="",
                    help="write npz with est+gt+pose covariance "
                         "(save_total_state parity; input to "
                         "examples/error_simulation.py)")
    ap.add_argument("--profile", default="",
                    help="capture a jax.profiler (xplane) trace of the "
                         "steady-state run into this directory")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import open_vins_tpu  # noqa: F401  (sets matmul precision)
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.models import runner
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.ops import lie
    from open_vins_tpu.sim import simulator

    params = simulator.SimParams(
        imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=args.num_pts,
        map_size=2048, duration=args.duration, sigma_pix=1.0,
    )
    cfg = FilterConfig(max_clones=args.clones, max_slam=args.max_slam,
                       num_cams=1, max_msckf_in_update=args.msckf,
                       integration=args.integration)
    tri_opts = tri.TriangulationOptions()

    print(f"devices: {jax.devices()}")
    t0 = time.time()
    sim = simulator.build(params, seed=args.seed)
    run = runner.stage_run(sim, params)
    jax.block_until_ready(run.frames.uv)
    print(f"staged {simulator.n_cam_frames(params)} frames in {time.time()-t0:.1f}s")

    fil = jax.jit(lambda r: runner.run_filter(cfg, tri_opts, sim, params, r,
                                              max_tracks=args.max_tracks))
    t0 = time.time()
    state, outs = fil(run)
    jax.block_until_ready(state.cov)
    t_first = time.time() - t0
    t0 = time.time()
    if args.profile:
        from open_vins_tpu.utils.profiling import trace
        with trace(args.profile):
            state, outs = fil(run)
            jax.block_until_ready(state.cov)
        print(f"profiler trace in {args.profile}")
    else:
        state, outs = fil(run)
        jax.block_until_ready(state.cov)
    t_steady = time.time() - t0
    n_frames = simulator.n_cam_frames(params) - 1
    print(f"filter: first {t_first:.1f}s, steady {t_steady:.3f}s "
          f"({n_frames/t_steady:.0f} frames/s)")

    qs, ps, vs, covs, diag = outs
    gt_q = np.array(run.gt_q)[1:]
    gt_p = np.array(run.gt_p)[1:]
    # δp = gt − est matches δθ = −log(R_gt R_estᵀ); mixed signs corrupt the
    # joint-NEES cross term (RMSE is sign-invariant)
    perr = gt_p - np.array(ps)
    R_est = np.array(jax.vmap(lie.quat_2_rot)(qs))
    R_gt = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(gt_q)))
    rel = jnp.asarray(R_gt @ np.swapaxes(R_est, -1, -2))
    therr = -np.array(jax.vmap(lie.log_so3)(rel))

    rmse_p = np.sqrt((perr**2).sum(1).mean())
    rmse_th = np.degrees(np.sqrt((therr**2).sum(1).mean()))
    nees = []
    covs = np.array(covs)
    for k in range(40, len(therr)):
        e = np.concatenate([therr[k], perr[k]])
        nees.append(e @ np.linalg.solve(covs[k] + 1e-12 * np.eye(6), e))
    print(f"ATE-style RMSE: {rmse_p*100:.2f} cm / {rmse_th:.3f} deg")
    print(f"pose NEES (dof 6): {np.mean(nees):.2f}")
    print(f"msckf feats/frame: {np.array(diag.n_msckf)[20:].mean():.1f}")

    ts = (np.arange(len(gt_p)) + 1) / params.cam_rate
    if args.save_est or args.save_gt:
        from open_vins_tpu.eval import traj_io
        if args.save_est:
            R_e = np.swapaxes(R_est, -1, -2)  # ItoG for TUM convention
            traj_io.save_tum(args.save_est, ts, np.array(ps),
                             traj_io.rot_to_quat_xyzw(R_e))
            print(f"wrote {args.save_est}")
        if args.save_gt:
            traj_io.save_tum(args.save_gt, ts, gt_p,
                             traj_io.rot_to_quat_xyzw(np.swapaxes(R_gt, -1, -2)))
            print(f"wrote {args.save_gt}")

    if args.save_full:
        # ROSVisualizerHelper::sim_save_total_state_to_file parity: est, gt,
        # and recorded covariance for offline consistency evaluation
        np.savez(
            args.save_full,
            t=ts, p_est=np.array(ps), q_est=np.array(qs),
            p_gt=gt_p, q_gt=gt_q, cov6=np.array(covs),
        )
        print(f"wrote {args.save_full}")

    if args.plot:
        # ResultSimulation::plot_state parity: per-axis error with 3σ bounds
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 3, figsize=(14, 6), sharex=True)
        labels = ["θx", "θy", "θz", "px", "py", "pz"]
        for i in range(6):
            ax = axes[i // 3][i % 3]
            err = (therr if i < 3 else perr)[:, i % 3]
            sig = 3.0 * np.sqrt(np.maximum(covs[:, i, i], 0.0))
            ax.plot(ts, err, "b-", lw=0.8, label="error")
            ax.plot(ts, sig, "r--", lw=0.8, label="3σ")
            ax.plot(ts, -sig, "r--", lw=0.8)
            ax.set_title(labels[i])
            if i == 0:
                ax.legend()
        for ax in axes[1]:
            ax.set_xlabel("t [s]")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=110)
        print(f"wrote {args.plot}")

    ok = rmse_p < 0.15 and np.isfinite(np.array(state.cov)).all()
    print("STATUS:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
