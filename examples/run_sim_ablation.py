#!/usr/bin/env python
"""Sim ablation sweep producer — run_sim_featrep/cams/calib.sh parity.

The reference ships three scripted simulation sweeps
(/root/reference/ov_msckf/scripts/run_sim_featrep.sh, run_sim_cams.sh,
run_sim_calib.sh) that loop the simulator over feature representations ×
scene depths, camera counts, and calibration on/off × perturbation on/off,
writing run files into the error_comparison folder convention.  This is
the producer side for this build: same sweep dimensions, same folder
layout, consumed by `examples/error_comparison.py` (ov_eval
error_comparison parity).

    <out>/truths/<dataset>.txt
    <out>/algorithms/<algo>/<dataset>/run<seed>.txt

Modes (matching the reference scripts):
  featrep  representations × feature scene depth (03m/06m/10m —
           feat_dist 2-4 / 5-7 / 9-11 m, run_sim_featrep.sh:36-44)
  cams     1-4 cameras (run_sim_cams.sh:19-24)
  calib    do_calibration × do_perturbation (run_sim_calib.sh:12-22)

Usage:
  python examples/run_sim_ablation.py --mode featrep [--out results/ablation]
      [--cpu] [--duration 30] [--seeds 3] [--traj tum_corridor1_512_16_okvis]
  python examples/error_comparison.py results/ablation/featrep --align posyaw
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# NOTE: compile cache is set per-platform in main() — never share a cache
# dir between CPU and the remote tunnel backend (CLAUDE.md: remote-compiled
# AOT artifacts SIGILL-poison local CPU runs)

FEATREPS = [
    "GLOBAL_3D",
    "ANCHORED_3D",
    "ANCHORED_FULL_INVERSE_DEPTH",
    "ANCHORED_MSCKF_INVERSE_DEPTH",
]
DEPTHS = {"03m": (2.0, 4.0), "06m": (5.0, 7.0), "10m": (9.0, 11.0)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["featrep", "cams", "calib"])
    ap.add_argument("--out", default="results/ablation")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--traj", default="tum_corridor1_512_16_okvis")
    ap.add_argument("--all-reps", action="store_true",
                    help="featrep: include GLOBAL_FULL_INVERSE_DEPTH and "
                         "ANCHORED_INVERSE_DEPTH_SINGLE too")
    ap.add_argument("--depths", default=",".join(DEPTHS),
                    help="featrep: comma subset of 03m,06m,10m")
    ap.add_argument("--reps", default="",
                    help="featrep: comma subset of representations")
    args = ap.parse_args()

    os.environ.setdefault(
        "OVT_JAX_CACHE",
        os.path.expanduser("~/.cache/ovt_cpu_test_cache" if args.cpu
                           else "~/.cache/ovt_tpu_cache"))
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import open_vins_tpu  # noqa: F401
    from open_vins_tpu.core import ekf
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.eval import traj_io
    from open_vins_tpu.models import feature_table as ft
    from open_vins_tpu.models import manager, runner
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.ops import lie
    from open_vins_tpu.sim import simulator, trajectories

    tpath = os.path.join(trajectories.REFERENCE_SIM_DIR, args.traj + ".txt")
    traj = (trajectories.load_trajectory_file(tpath)
            if os.path.exists(tpath) else None)
    tri_opts = tri.TriangulationOptions()
    base = os.path.join(args.out, args.mode)
    os.makedirs(os.path.join(base, "truths"), exist_ok=True)

    def save_run(algo, ds, seed, ts, ps, Rs_b2g, gt=None):
        d = os.path.join(base, "algorithms", algo, ds)
        os.makedirs(d, exist_ok=True)
        traj_io.save_tum(os.path.join(d, f"run{seed}.txt"), ts, ps,
                         traj_io.rot_to_quat_xyzw(Rs_b2g))
        if gt is not None:
            traj_io.save_tum(os.path.join(base, "truths", ds + ".txt"),
                             ts, gt[0], traj_io.rot_to_quat_xyzw(gt[1]))

    def run_once(params, cfg, seed, perturb=False, calib_priors=False):
        """One sim run; returns (ts, est_p, est_R_b2g, gt_p, gt_R_b2g,
        rmse)."""
        sim = simulator.build(params, seed=seed, traj=traj)
        run = runner.stage_run(sim, params)
        if not (perturb or calib_priors):
            fil = jax.jit(lambda s, r: runner.run_filter(
                cfg, tri_opts, s, params, r, max_tracks=384))
            state, outs = fil(sim, run)
        else:
            calib_true = (sim.cam_intr, sim.cam_R_ItoC, sim.cam_p_IinC)
            pert = (simulator.perturb_calib(seed + 1, calib_true,
                                            calib_dt=0.0)
                    if perturb else None)
            intr = pert.cam_intr if perturb else sim.cam_intr
            R_ItoC = pert.cam_R_ItoC if perturb else sim.cam_R_ItoC
            p_IinC = pert.cam_p_IinC if perturb else sim.cam_p_IinC

            def run_pert(sim, run):
                state = manager.initialize_from_gt(
                    cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
                    sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
                    jax.vmap(lie.rot_2_quat)(R_ItoC), p_IinC, intr)
                if perturb:
                    state = state._replace(calib_dt=pert.calib_dt)
                if calib_priors:
                    # prior sigmas at the perturbation scales
                    # (Simulator::perturb_parameters, plot_calib.py:78-88)
                    diag = jnp.diagonal(state.cov)
                    diag = diag.at[cfg.calib_dt_off].set(0.015**2)
                    for c in range(cfg.num_cams):
                        e0 = cfg.calib_ext_off + 6 * c
                        i0 = cfg.calib_intr_off + 8 * c
                        diag = diag.at[e0:e0 + 3].set(0.003**2)
                        diag = diag.at[e0 + 3:e0 + 6].set(0.02**2)
                        diag = diag.at[i0:i0 + 4].set(2.0**2)
                        diag = diag.at[i0 + 4:i0 + 8].set(0.01**2)
                    state = ekf.set_initial_covariance(state, cfg, diag)
                table = ft.init_table(cfg, 384)

                def body(carry, frame):
                    st, tb = carry
                    st, tb, _ = manager.step_frame(st, tb, cfg, tri_opts,
                                                   frame)
                    return (st, tb), (st.q, st.p)

                (state, table), outs = jax.lax.scan(
                    body, (state, table), run.frames)
                return state, outs

            state, outs = jax.jit(run_pert)(sim, run)
        jax.block_until_ready(state.cov)
        qs = np.array(outs[0])
        ps = np.array(outs[1])
        gt_p = np.array(run.gt_p)[1:]
        gt_q = np.array(run.gt_q)[1:]
        R_est = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(qs)))
        R_gt = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(gt_q)))
        ts = (np.arange(len(ps)) + 1) / params.cam_rate
        rmse = float(np.sqrt(((gt_p - ps) ** 2).sum(1).mean()))
        return (ts, ps, np.swapaxes(R_est, -1, -2),
                gt_p, np.swapaxes(R_gt, -1, -2), rmse)

    t_all = time.time()
    if args.mode == "featrep":
        reps = FEATREPS + (["GLOBAL_FULL_INVERSE_DEPTH",
                            "ANCHORED_INVERSE_DEPTH_SINGLE"]
                           if args.all_reps else [])
        if args.reps:
            reps = [r for r in args.reps.split(",") if r]
        depths = {k: DEPTHS[k] for k in args.depths.split(",") if k}
        for dname, (dmin, dmax) in depths.items():
            ds = f"{dname}_{args.traj}"
            params = simulator.SimParams(
                imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=100,
                map_size=1024, duration=args.duration, sigma_pix=1.0,
                min_depth=dmin, max_depth=dmax, min_view_depth=1.0)
            for rep in reps:
                cfg = FilterConfig(max_clones=11, max_slam=25, num_cams=1,
                                   max_msckf_in_update=40,
                                   integration="analytical",
                                   feat_rep_slam=rep)
                for seed in range(args.seeds):
                    ts, ps, Rs, gp, gR, rmse = run_once(params, cfg, seed)
                    save_run(rep, ds, seed, ts, ps, Rs,
                             gt=(gp, gR) if seed == 0 else None)
                    print(f"[featrep] {rep} {ds} seed{seed}: "
                          f"rmse {rmse:.3f} m", flush=True)

    elif args.mode == "cams":
        ds = args.traj
        for n_cams in (1, 2, 3, 4):
            params = simulator.SimParams(
                imu_rate=200.0, cam_rate=20.0, num_cams=n_cams,
                num_pts=100, map_size=1024, duration=args.duration,
                sigma_pix=1.0)
            cfg = FilterConfig(max_clones=11, max_slam=25, num_cams=n_cams,
                               max_msckf_in_update=40,
                               integration="analytical")
            for seed in range(args.seeds):
                ts, ps, Rs, gp, gR, rmse = run_once(params, cfg, seed)
                save_run(f"cams_{n_cams}", ds, seed, ts, ps, Rs,
                         gt=(gp, gR) if seed == 0 else None)
                print(f"[cams] {n_cams} cams seed{seed}: rmse {rmse:.3f} m",
                      flush=True)

    else:  # calib
        ds = args.traj
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=100,
            map_size=1024, duration=args.duration, sigma_pix=1.0)
        for do_calib in (False, True):
            for do_pert in (False, True):
                cfg = FilterConfig(max_clones=11, max_slam=25, num_cams=1,
                                   max_msckf_in_update=40,
                                   integration="analytical",
                                   calib_cam_timeoffset=do_calib,
                                   calib_cam_extrinsics=do_calib,
                                   calib_cam_intrinsics=do_calib)
                algo = (f"calib_{'on' if do_calib else 'off'}_"
                        f"pert_{'on' if do_pert else 'off'}")
                for seed in range(args.seeds):
                    ts, ps, Rs, gp, gR, rmse = run_once(
                        params, cfg, seed, perturb=do_pert,
                        calib_priors=do_calib)
                    save_run(algo, ds, seed, ts, ps, Rs,
                             gt=(gp, gR) if seed == 0 else None)
                    print(f"[calib] {algo} seed{seed}: rmse {rmse:.3f} m",
                          flush=True)

    print(f"[ablation] {args.mode} sweep done in {time.time()-t_all:.0f}s; "
          f"consume with: python examples/error_comparison.py {base}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
