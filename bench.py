#!/usr/bin/env python
"""Headline benchmark at the REFERENCE OPERATING POINT (BASELINE.md:19):
200 pts/cam, 11 clones, 50 SLAM features, <=40 MSCKF features/update.

Prints one JSON line per metric {"metric", "value", "unit", "vs_baseline"}:
  1. ekf_update_p50_latency_us — p50 latency of one jitted dense EKF update
     at the operating-point state dimension (BASELINE.json north-star
     "EKF update p50 latency at speed-of-light per chip").  vs_baseline is
     the 20 Hz frame budget (50 ms) divided by the p50 — how many full-state
     updates fit in one real-time frame period.
  2. sim_vio_rmse_m / sim_vio_pose_nees — accuracy/consistency of the SAME
     run the throughput metrics time (bench honesty: a fast-but-wrong run
     cannot publish silently).  vs_baseline for the RMSE is the reference's
     best published EuRoC ATE (0.058 m, BASELINE.md) divided by the value.
  3. sim_vio_ensemble8_agg_frames_per_sec_1chip — aggregate frames/s of 8
     vmapped filter streams on one chip, each a DIFFERENT seed (the batch
     axis doubles as the Monte-Carlo consistency axis; the companion
     sim_vio_pose_nees_seed8_mean is the seed-averaged NEES — single-seed
     NEES scatters ±2.5 1σ at this operating point).  vs_baseline =
     aggregate / 20.
  4. sim_vio_frames_per_sec_1chip — closed-loop sim VIO frames/s on one
     chip (LAST line = the headline metric).  The reference runs real-time
     on a desktop CPU with 20 Hz cameras — i.e. ~20 frames/s sustained —
     so vs_baseline = frames_per_sec / 20.

Health gate: RMSE must stay under 0.05 m (the run's actual accuracy is
~2 cm; a silent 2.5x regression zeroes every throughput metric).  A
deliberate 10x pixel-noise injection (--noise-mult 10) flips the bench
unhealthy — pinned by tests/test_bench_gate.py.
"""

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# TPU-scoped persistent compile cache (first driver run pays the compile,
# reruns start in seconds); safe because bench always runs on the same
# platform.
os.environ.setdefault("OVT_JAX_CACHE", os.path.expanduser("~/.cache/ovt_tpu_cache"))

RMSE_GATE_M = 0.05


def _sync(x):
    """Unfakeable warmup/stage sync: a tiny forced host transfer.

    `jax.block_until_ready` through the remote tunnel has been observed to
    return WITHOUT waiting (CLAUDE.md measurement rule); reading one element
    back on the host cannot be faked and costs one RTT.
    """
    import numpy as _np
    _np.asarray(x.ravel()[0] if hasattr(x, "ravel") else x)



def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="5 s sim, headline+accuracy metrics only (CI use)")
    ap.add_argument("--noise-mult", type=float, default=1.0,
                    help="pixel-noise multiplier (health-gate self test)")
    args = ap.parse_args(argv)
    import jax
    import numpy as np

    import open_vins_tpu  # noqa: F401  (forces f32 matmul precision)
    from open_vins_tpu.core import ekf
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.models import runner
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.sim import simulator, trajectories

    # reference real-time operating point: 200 pts/cam, 11 clones, 50 SLAM
    # features, <=40 MSCKF features per update, 20 Hz cam / 200 Hz IMU, on
    # the reference's own flagship sim trajectory when available
    # (config/euroc_mav/estimator_config.yaml:25-28,84).
    params = simulator.SimParams(
        imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=200,
        map_size=2048, duration=8.0 if args.quick else 20.0,
        sigma_pix=1.0 * args.noise_mult, start_offset=3.0,
    )
    # integration="analytical": the ACI² closed-form integrator (a first-
    # class reference option, Propagator.cpp:588-829) whose per-interval
    # matrix work batches across the IMU window on TPU — measured 998 vs
    # 653 fps against rk4 at identical closed-loop accuracy (2.16 vs
    # 2.18 cm RMSE), so it is the operating-point configuration.
    # newton_iters=14 covers sigma <= 2^14/16 = 1024 before polish; at this
    # operating point the solve residual stays ~1e-4 (same closed-loop RMSE
    # as iters=22, measured 2115 vs 2033 fps on v5e) and the while-loop
    # polish + StepDiag.newton_resid no-op gate catch any excursion.
    cfg = FilterConfig(max_clones=11, max_slam=50, num_cams=1,
                       max_msckf_in_update=40, integration="analytical",
                       newton_iters=14)
    tri_opts = tri.TriangulationOptions()

    traj = None
    gore = os.path.join(trajectories.REFERENCE_SIM_DIR, "udel_gore.txt")
    if os.path.exists(gore):
        traj = trajectories.load_trajectory_file(gore)
    sim = simulator.build(params, seed=0, traj=traj)
    run = runner.stage_run(sim, params)
    _sync(run.frames.uv)

    fil = jax.jit(lambda r: runner.run_filter(cfg, tri_opts, sim, params, r,
                                              max_tracks=384))
    state, outs = fil(run)
    _sync(state.cov)  # compile + warmup

    # --- accuracy + consistency of the benched run (health gate inputs).
    # Error convention (CLAUDE.md): δp = gt − est, δθ = −log(R_gt R_estᵀ).
    from open_vins_tpu.ops import lie
    import jax.numpy as _jnp

    ps = np.array(outs[1])
    qs = np.array(outs[0])
    covs6 = np.array(outs[3])
    gt_p = np.array(run.gt_p)[1:]
    gt_q = np.array(run.gt_q)[1:]
    rmse = float(np.sqrt(((gt_p - ps) ** 2).sum(1).mean()))
    R_est = np.array(jax.vmap(lie.quat_2_rot)(_jnp.asarray(qs)))
    R_gt = np.array(jax.vmap(lie.quat_2_rot)(_jnp.asarray(gt_q)))
    nees_vals = []
    nf = len(gt_p)
    for k in range(nf // 4, nf):
        dth = -np.array(lie.log_so3(_jnp.asarray(R_gt[k] @ R_est[k].T)))
        e = np.concatenate([dth, gt_p[k] - ps[k]])
        P6 = covs6[k] + 1e-12 * np.eye(6)
        nees_vals.append(e @ np.linalg.solve(P6, e))
    nees_mean = float(np.mean(nees_vals))
    finite = bool(np.isfinite(np.array(state.cov)).all())
    # NEES must be NEAR dof from both sides: >>6 = overconfident covariance,
    # <<6 = the vision updates are not engaging (e.g. everything
    # chi2-rejected and the filter coasting open-loop on the IMU — exactly
    # what a 10x measurement-noise injection produces on a short run)
    healthy = finite and rmse < RMSE_GATE_M and 0.2 < nees_mean < 30.0
    print(json.dumps({
        "metric": "sim_vio_rmse_m",
        "value": round(rmse, 4) if finite else float("nan"),
        "unit": "m",
        "vs_baseline": round(0.058 / max(rmse, 1e-9), 2) if finite else 0.0,
    }))
    print(json.dumps({
        "metric": "sim_vio_pose_nees",
        "value": round(nees_mean, 2) if finite else float("nan"),
        "unit": "dimensionless (dof 6)",
        "vs_baseline": round(6.0 / max(nees_mean, 1e-9), 2) if finite else 0.0,
    }))
    if not healthy:
        print(json.dumps({
            "metric": "health_gate",
            "value": 0.0,
            "unit": f"UNHEALTHY: rmse={rmse:.3f}m (gate {RMSE_GATE_M}) "
                    f"nees={nees_mean:.1f} finite={finite}",
            "vs_baseline": 0.0,
        }))

    # --- metric 1: EKF-update p50 latency at the operating-point state dim.
    # K data-dependent updates are chained inside ONE jit (a lax.scan) so the
    # measurement is device step latency, not host/tunnel dispatch overhead.
    import jax.numpy as jnp

    D = cfg.state_dim
    K = 64
    rng = np.random.default_rng(0)
    Hs = jnp.asarray(rng.normal(size=(K, D, D)) * 0.3, jnp.float32)
    ress = jnp.asarray(rng.normal(size=(K, D)) * 0.01, jnp.float32)
    r_diag = jnp.ones(D, jnp.float32)

    n_frames = simulator.n_cam_frames(params) - 1
    if not args.quick:
        # The K-update scan runs M times inside ONE jit (genuine data
        # dependence through the carried state).  r05 re-attribution: the
        # old p50 ≈ 530 µs was dominated by the flat ~25 ms per-invocation
        # tunnel overhead / K=64 — the xplane device span of the same
        # chain is ~142 µs/update (leaf 120 µs).  Differencing two M
        # values cancels the invocation overhead exactly and yields the
        # true device per-update latency; the amortized wall at M=8 is
        # the honest end-to-end p50.
        @jax.jit
        def chain(st, Hs, ress, m):
            def outer(i, s):
                def body(s, hr):
                    H, res = hr
                    return ekf.ekf_update(s, cfg, H, res, r_diag), s.p[0]
                s, _ = jax.lax.scan(body, s, (Hs, ress))
                return s
            return jax.lax.fori_loop(0, m, outer, st)

        out = chain(state, Hs, ress, jnp.int32(1))
        _sync(out.cov)
        lat = {1: [], 8: []}
        for _ in range(20):
            for m in (1, 8):
                t0 = time.perf_counter()
                out = chain(state, Hs, ress, jnp.int32(m))
                # forced tiny host transfer (unfakeable sync)
                _ = np.asarray(out.p).ravel()[0]
                lat[m].append(time.perf_counter() - t0)
        t1 = float(np.percentile(lat[1], 50))
        t8 = float(np.percentile(lat[8], 50))
        p50_us = t8 / (8 * K) * 1e6
        dev_us = max(t8 - t1, 0.0) / (7 * K) * 1e6
        print(json.dumps({
            "metric": "ekf_update_p50_latency_us",
            "value": round(p50_us, 1),
            "unit": f"us (wall, {8 * K}-update in-jit chain; "
                    f"K=64 legacy number was invocation-overhead-bound)",
            "vs_baseline": round(50_000.0 / p50_us, 1),  # per 50 ms frame
        }))
        print(json.dumps({
            "metric": "ekf_update_device_us",
            "value": round(dev_us, 1),
            "unit": "us (in-jit rep differencing — pure device time; "
                    "xplane span 142 us / leaf 120 us at r05)",
            "vs_baseline": round(50_000.0 / max(dev_us, 1e-9), 1),
        }))

        # --- aggregate throughput of an 8-stream vmapped ensemble — 8
        # DIFFERENT seeds, so the batch axis is simultaneously the
        # Monte-Carlo consistency axis (docs/parallelism.md): per-stream
        # accuracy gates the metric, and the seed-averaged NEES is the
        # statistically meaningful consistency number (single-seed NEES
        # scatters ±2.5 1σ at this operating point — r05 5-seed sweep).
        B = 8
        sims_b = [sim] + [simulator.build(params, seed=s, traj=traj)
                          for s in range(1, B)]
        runs_b = [run] + [runner.stage_run(s, params) for s in sims_b[1:]]
        bsim = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *sims_b)
        brun = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *runs_b)
        fil_ens = jax.jit(jax.vmap(
            lambda s, r: runner.run_filter(cfg, tri_opts, s, params, r,
                                           max_tracks=384)))
        bstate, bouts = fil_ens(bsim, brun)
        _sync(bstate.cov)  # compile + warmup
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            bstate, bouts = fil_ens(bsim, brun)
            _ = np.asarray(bouts[1]).ravel()[-1]  # forced per-rep host sync
            # (one whole-array transfer ~38 KB: device-side __getitem__
            # slicing dispatches EXTRA tunnel programs per rep and was the
            # r04 ensemble-inversion artifact — see docs/tpu-design.md)
        agg_fps = B * n_frames / ((time.time() - t0) / reps)
        bps = np.array(bouts[1])                      # [B, nf, 3]
        bqs = np.array(bouts[0])
        bcov6 = np.array(bouts[3])
        bgt_p = np.stack([np.array(r.gt_p)[1:] for r in runs_b])
        bgt_q = np.stack([np.array(r.gt_q)[1:] for r in runs_b])
        rmses = np.sqrt(((bps - bgt_p) ** 2).sum(-1).mean(-1))
        nees_b = []
        for b in range(B):
            R_e = np.array(jax.vmap(lie.quat_2_rot)(_jnp.asarray(bqs[b])))
            R_g = np.array(jax.vmap(lie.quat_2_rot)(_jnp.asarray(bgt_q[b])))
            vals = []
            for k in range(nf // 4, nf):
                dth = -np.array(lie.log_so3(
                    _jnp.asarray(R_g[k] @ R_e[k].T)))
                e = np.concatenate([dth, bgt_p[b, k] - bps[b, k]])
                vals.append(e @ np.linalg.solve(
                    bcov6[b, k] + 1e-12 * np.eye(6), e))
            nees_b.append(float(np.mean(vals)))
        nees_b = np.asarray(nees_b)
        ens_healthy = (np.isfinite(np.array(bstate.cov)).all()
                       and float(np.median(rmses)) < RMSE_GATE_M)
        print(json.dumps({
            "metric": "sim_vio_ensemble8_agg_frames_per_sec_1chip",
            "value": round(agg_fps, 1) if ens_healthy else 0.0,
            "unit": f"frames/s (8 seeds, rmse med "
                    f"{float(np.median(rmses)):.4f} m max "
                    f"{float(rmses.max()):.4f})",
            "vs_baseline": round(agg_fps / 20.0, 2) if ens_healthy else 0.0,
        }))
        print(json.dumps({
            "metric": "sim_vio_pose_nees_seed8_mean",
            "value": round(float(nees_b.mean()), 2),
            "unit": f"dimensionless (dof 6; 8-seed std "
                    f"{float(nees_b.std()):.2f}, max {float(nees_b.max()):.1f})",
            "vs_baseline": round(6.0 / max(float(nees_b.mean()), 1e-9), 2),
        }))

    # --- image front-end metrics (VERDICT r03 #2): rendered 752×480 STEREO
    # at the reference rig scale, real KLT+RANSAC on device.  Two numbers:
    # the front-end alone (the reference's CPU-hot half, TrackKLT.cpp:829-
    # 886), and the full images→pose pipeline with the same health gating.
    if not args.quick:
        from open_vins_tpu.frontend import klt as klt_mod
        from open_vins_tpu.ops import lie as lie_mod

        stereo_R = lie_mod.exp_so3(jnp.asarray([-1.2, 1.2, -1.2]))
        stereo_calib = (
            jnp.tile(jnp.asarray([458.0, 458.0, 376.0, 240.0,
                                  0.0, 0.0, 0.0, 0.0]), (2, 1)),
            jnp.tile(stereo_R, (2, 1, 1)),
            jnp.stack([jnp.asarray([0.0, -0.01, 0.02]),
                       jnp.asarray([0.11, -0.01, 0.02])]),
        )
        rparams = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=2, num_pts=200,
            map_size=2048, duration=8.0, sigma_pix=0.0, start_offset=3.0,
            width=752, height=480, min_depth=4.0, max_depth=9.0,
        )
        rsim = simulator.build(rparams, seed=0, traj=traj,
                               calib=stereo_calib)
        kparams = klt_mod.KltParams(num_features=200, num_pyr=4,
                                    grid_x=20, grid_y=15)
        n_track = 120
        # front-end cost breakdown (VERDICT r04 #4): render staged OUTSIDE
        # the timed tracker loop — the tracker-only number is what real
        # image ingestion would pay; render ms/frame is reported beside it
        rend_fn = jax.jit(lambda s: runner.render_frames(s, rparams,
                                                         n_track))
        imgs = rend_fn(rsim)
        _sync(imgs)  # compile + stage
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            imgs = rend_fn(rsim)
            _ = np.asarray(jnp.sum(imgs[-1]))  # forced per-rep host sync
        render_ms = 1e3 * (time.time() - t0) / reps / n_track
        print(json.dumps({
            "metric": "frontend_render_ms_per_frame",
            "value": round(render_ms, 3),
            "unit": "ms/frame (752x480 stereo sprite render, 2048 pts)",
            "vs_baseline": 0.0,
        }))
        trk_fn = jax.jit(lambda im, s: runner.run_tracker_staged(
            im, s, rparams, kparams))
        tstate, counts = trk_fn(imgs, rsim)
        _sync(counts)
        t0 = time.time()
        for _ in range(reps):
            tstate, counts = trk_fn(imgs, rsim)
            _ = np.asarray(counts).ravel()[-1]  # forced per-rep host sync
        klt_fps = n_track / ((time.time() - t0) / reps)
        mean_tracks = float(np.array(counts).mean())
        # tracker must actually hold a real feature load (gate at half the
        # stereo budget: 200 master + joined right-eye matches)
        klt_ok = mean_tracks > 150.0
        print(json.dumps({
            "metric": "klt_track_frames_per_sec_1chip",
            "value": round(klt_fps, 1) if klt_ok else 0.0,
            "unit": f"frames/s (752x480 stereo tracker-only, "
                    f"{mean_tracks:.0f} tracks/frame)",
            "vs_baseline": round(klt_fps / 20.0, 2) if klt_ok else 0.0,
        }))

        rrun = runner.stage_run(rsim, rparams)
        _sync(rrun.frames.uv)
        rcfg = FilterConfig(max_clones=11, max_slam=25, num_cams=2,
                            max_msckf_in_update=40, integration="analytical")
        pipe_fn = jax.jit(lambda s, r: runner.run_filter_rendered(
            rcfg, tri_opts, s, rparams, r, kparams, max_tracks=384))
        (rstate, _, _), routs = pipe_fn(rsim, rrun)
        _sync(rstate.cov)
        rn_frames = simulator.n_cam_frames(rparams) - 1
        t0 = time.time()
        for _ in range(reps):
            (rstate, _, _), routs = pipe_fn(rsim, rrun)
            _ = np.asarray(routs[1]).ravel()[-1]  # forced per-rep host sync
        pipe_fps = rn_frames / ((time.time() - t0) / reps)
        rps = np.array(routs[1])
        rgt = np.array(rrun.gt_p)[1:]
        r_rmse = float(np.sqrt(((rps - rgt) ** 2).sum(1).mean()))
        # rendered gate is its own band: the KLT front-end carries the whole
        # error budget here (no TrackSIM shortcut), measured 0.047-0.074 m
        # on this 8 s stereo loop across front-end variants (the 30 s
        # reference-rig gate is the calibrated accuracy check, se3 ATE
        # 0.029 m) — gate above the observed band so a seed wobble cannot
        # zero the metric while a real divergence (>>0.1 m) still trips it
        r_ok = (np.isfinite(np.array(rstate.cov)).all()
                and r_rmse < 0.09)
        print(json.dumps({
            "metric": "rendered_pipeline_frames_per_sec_1chip",
            "value": round(pipe_fps, 1) if r_ok else 0.0,
            "unit": f"frames/s (images->pose, rmse {r_rmse:.3f} m)",
            "vs_baseline": round(pipe_fps / 20.0, 2) if r_ok else 0.0,
        }))

    # --- LARGE-MAP operating point (VERDICT r03 #3): 30 clones / 400 SLAM
    # landmarks / 400 pts per cam — D ≈ 1400, the long-window dense-map
    # regime where covariance row-sharding stops being overhead
    # (tests/test_sharded_ekf.py pins sharded == dense at these shapes;
    # docs/tpu-design.md carries the crossover analysis).  Form: "qr" —
    # at k ≈ 1400 the factorization custom calls are panel-efficient while
    # newton's ~44 k×k matmuls would dominate the frame.
    if not args.quick:
        lparams = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=400,
            map_size=4096, duration=8.0, sigma_pix=1.0 * args.noise_mult,
            start_offset=3.0,
        )
        lcfg = FilterConfig(max_clones=30, max_slam=400, num_cams=1,
                            max_msckf_in_update=40, max_obs_per_feature=30,
                            integration="analytical", joint_update_form="qr")
        lsim = simulator.build(lparams, seed=0, traj=traj)
        lrun = runner.stage_run(lsim, lparams)
        _sync(lrun.frames.uv)
        lfil = jax.jit(lambda s, r: runner.run_filter(
            lcfg, tri_opts, s, lparams, r, max_tracks=768))
        lstate, louts = lfil(lsim, lrun)
        _sync(lstate.cov)
        ln = simulator.n_cam_frames(lparams) - 1
        t0 = time.time()
        for _ in range(reps):
            lstate, louts = lfil(lsim, lrun)
            _ = np.asarray(louts[1]).ravel()[-1]  # forced per-rep host sync
        l_fps = ln / ((time.time() - t0) / reps)
        lps = np.array(louts[1])
        lgt = np.array(lrun.gt_p)[1:]
        l_rmse = float(np.sqrt(((lps - lgt) ** 2).sum(1).mean()))
        l_ok = (np.isfinite(np.array(lstate.cov)).all()
                and l_rmse < RMSE_GATE_M)
        print(json.dumps({
            "metric": "sim_vio_largemap_frames_per_sec_1chip",
            "value": round(l_fps, 1) if l_ok else 0.0,
            "unit": f"frames/s (D={lcfg.state_dim}, 400 slam, "
                    f"rmse {l_rmse:.3f} m)",
            "vs_baseline": round(l_fps / 20.0, 2) if l_ok else 0.0,
        }))

    # --- headline, LAST line: closed-loop frames/s at full load
    reps = 1 if args.quick else 3
    t0 = time.time()
    for _ in range(reps):
        state, outs = fil(run)
        _ = np.asarray(outs[1]).ravel()[-1]  # forced per-rep host sync
    dt = (time.time() - t0) / reps
    fps = n_frames / dt

    print(json.dumps({
        "metric": "sim_vio_frames_per_sec_1chip",
        "value": round(fps, 1) if healthy else 0.0,
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 2) if healthy else 0.0,
    }))


if __name__ == "__main__":
    main()
