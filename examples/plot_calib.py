#!/usr/bin/env python
"""Calibration-convergence report: run online self-calibration on seeded
perturbed calib and plot every calib block's error vs truth with 3σ bounds.

ResultSimulation::plot_calib_* parity (ov_eval ResultSimulation.h:59-110):
the reference plots time offset, camera extrinsic, and camera intrinsic
state errors against the recorded 3σ envelope from a save_total_state run.
Here the whole experiment is self-contained: seeded simulator + reference-
scale calib perturbation (Simulator::perturb_parameters scales,
sim/simulator.perturb_calib) + the estimator with the calib blocks enabled,
one device program, then the per-block error/3σ report.

Usage:
  python examples/plot_calib.py [--duration 25] [--seed 0] [--cpu]
      [--out calib_report.png] [--save calib_run.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=25.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--num-pts", type=int, default=60)
    ap.add_argument("--out", default="calib_report.png")
    ap.add_argument("--save", default="", help="also save the raw npz")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import open_vins_tpu  # noqa: F401
    from open_vins_tpu.core import ekf
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.models import feature_table as ft
    from open_vins_tpu.models import manager, runner
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.ops import lie
    from open_vins_tpu.sim import simulator

    params = simulator.SimParams(
        imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=args.num_pts,
        map_size=1024, duration=args.duration, sigma_pix=1.0,
    )
    cfg = FilterConfig(
        max_clones=11, max_slam=0, num_cams=1, max_msckf_in_update=30,
        calib_cam_timeoffset=True, calib_cam_extrinsics=True,
        calib_cam_intrinsics=True,
    )
    tri_opts = tri.TriangulationOptions()
    sim = simulator.build(params, seed=args.seed)
    run = runner.stage_run(sim, params)

    # reference-scale seeded perturbation of the ESTIMATOR's starting calib
    calib_true = (sim.cam_intr, sim.cam_R_ItoC, sim.cam_p_IinC)
    pert = simulator.perturb_calib(args.seed + 1, calib_true, calib_dt=0.0)

    state = manager.initialize_from_gt(
        cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
        sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
        jax.vmap(lie.rot_2_quat)(pert.cam_R_ItoC), pert.cam_p_IinC,
        pert.cam_intr,
    )
    state = state._replace(calib_dt=pert.calib_dt)

    # prior sigmas sized to the perturbation scales (perturb_parameters:
    # dt 0.01 s, rot 0.001 rad, pos 0.01 m, focal/center 1 px, dist 0.005)
    D = cfg.state_dim
    diag = jnp.diagonal(state.cov)
    diag = diag.at[cfg.calib_dt_off].set(0.015**2)
    diag = diag.at[cfg.calib_ext_off:cfg.calib_ext_off + 3].set(0.003**2)
    diag = diag.at[cfg.calib_ext_off + 3:cfg.calib_ext_off + 6].set(0.02**2)
    i0 = cfg.calib_intr_off
    diag = diag.at[i0:i0 + 4].set(2.0**2)
    diag = diag.at[i0 + 4:i0 + 8].set(0.01**2)
    state = ekf.set_initial_covariance(state, cfg, diag)
    table = ft.init_table(cfg, 256)

    c0, c1 = cfg.calib_dt_off, cfg.calib_intr_off + 8 * cfg.num_cams

    def body(carry, frame):
        st, tb = carry
        st, tb, _ = manager.step_frame(st, tb, cfg, tri_opts, frame)
        out = (st.calib_dt, st.calib_ext_q[0], st.calib_ext_p[0],
               st.calib_intr[0], jnp.diagonal(st.cov)[c0:c1], st.p)
        return (st, tb), out

    print(f"devices: {jax.devices()}")
    (state, table), outs = jax.jit(
        lambda s, t, f: jax.lax.scan(body, (s, t), f)
    )(state, table, run.frames)
    jax.block_until_ready(state.cov)
    dts, eqs, eps, intrs, cds, ps = (np.array(o) for o in outs)

    # ---- errors vs truth (convention: err = true ⊖ est)
    n = dts.shape[0]
    ts = (np.arange(n) + 1) / params.cam_rate
    R_true = np.array(sim.cam_R_ItoC[0])
    R_est = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(eqs)))
    # extrinsic rotation error vector: log(R_true R_estᵀ) per frame
    rel = jnp.asarray(np.array([R_true @ R_est[k].T for k in range(n)]))
    eth = np.array(jax.vmap(lie.log_so3)(rel))
    ep_err = np.array(sim.cam_p_IinC[0])[None] - eps
    dt_err = float(np.array(sim.calib_dt)) - dts
    intr_err = np.array(sim.cam_intr[0])[None] - intrs

    sig = 3.0 * np.sqrt(np.maximum(cds, 0.0))
    # columns of cds: [dt | ext θ(3) ext p(3) | intr(8)]
    groups = [
        ("dt [s]", dt_err[:, None], sig[:, 0:1], ["dt"]),
        ("extrinsic θ [rad]", eth, sig[:, 1:4], ["θx", "θy", "θz"]),
        ("extrinsic p [m]", ep_err, sig[:, 4:7], ["px", "py", "pz"]),
        ("intrinsics f/c [px]", intr_err[:, :4], sig[:, 7:11],
         ["fx", "fy", "cx", "cy"]),
        ("distortion", intr_err[:, 4:], sig[:, 11:15],
         ["k1", "k2", "p1", "p2"]),
    ]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ncols = max(g[1].shape[1] for g in groups)
    fig, axes = plt.subplots(len(groups), ncols,
                             figsize=(3.2 * ncols, 2.1 * len(groups)),
                             sharex=True, squeeze=False)
    ok_all = True
    for gi, (title, err, s3, labels) in enumerate(groups):
        for ci in range(ncols):
            ax = axes[gi][ci]
            if ci >= err.shape[1]:
                ax.axis("off")
                continue
            ax.plot(ts, err[:, ci], "b-", lw=0.8)
            ax.plot(ts, s3[:, ci], "r--", lw=0.7)
            ax.plot(ts, -s3[:, ci], "r--", lw=0.7)
            ax.set_title(f"{title.split(' [')[0]} {labels[ci]}", fontsize=8)
            end_ok = abs(err[-1, ci]) <= max(s3[-1, ci], 1e-9)
            ok_all &= bool(end_ok)
    for ax in axes[-1]:
        ax.set_xlabel("t [s]")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")

    if args.save:
        np.savez(args.save, t=ts, dt_err=dt_err, eth=eth, ep_err=ep_err,
                 intr_err=intr_err, sigma3=sig)
        print(f"wrote {args.save}")

    # convergence summary (final |error| vs final 3σ, per block)
    print("final |error| (3σ):")
    for title, err, s3, labels in groups:
        for ci, lab in enumerate(labels):
            print(f"  {title:22s} {lab:3s}: {abs(err[-1, ci]):.5f} "
                  f"({s3[-1, ci]:.5f})")
    gt = np.array(run.gt_p)[1:]
    rmse = float(np.sqrt(((ps - gt) ** 2).sum(1).mean()))
    print(f"trajectory RMSE: {rmse * 100:.2f} cm")
    print("STATUS:", "OK" if ok_all and rmse < 0.2 else "FAIL")
    return 0 if (ok_all and rmse < 0.2) else 1


if __name__ == "__main__":
    raise SystemExit(main())
