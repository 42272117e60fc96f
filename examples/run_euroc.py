#!/usr/bin/env python
"""EuRoC MAV dataset VIO: native loader + KLT front-end + MSCKF filter.

The serial-replay entry point (ros1_serial_msckf.cpp parity): processes the
dataset in time order through the full pipeline and writes a TUM trajectory
for evaluation with examples/error_singlerun.py.

Initialization is routed (InertialInitializer.cpp:55-159 parity): feature
disparity over two half-windows picks static (still platform, jerk-gated)
vs dynamic (CPI preintegration + closed-form + MLE) initialization — the
dynamic path seeds the filter mean AND its 15x15 covariance.

Usage:
  python examples/run_euroc.py <dataset_root> \
      [--config /root/reference/config/euroc_mav/estimator_config.yaml] \
      [--out est.txt] [--max-frames N] [--cpu] [--stereo]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--config",
                    default="/root/reference/config/euroc_mav/estimator_config.yaml")
    ap.add_argument("--out", default="est.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stereo", action="store_true",
                    help="track both eyes (left-master KLT join)")
    ap.add_argument("--num-pts", type=int, default=150)
    ap.add_argument("--timing", default="", help="write per-frame timing CSV")
    ap.add_argument("--viz-dir", default="", help="write tracked-feature "
                    "debug images (TrackBase::display_history parity)")
    ap.add_argument("--viz-every", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import open_vins_tpu  # noqa: F401
    from open_vins_tpu.frontend import klt, tracker
    from open_vins_tpu.init import background, router
    from open_vins_tpu.models import feature_table as ft
    from open_vins_tpu.models import manager
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.models.propagator import ImuWindow
    from open_vins_tpu.ops import lie
    from open_vins_tpu.utils import config as cfgmod
    from open_vins_tpu.utils import native
    from open_vins_tpu.eval import traj_io

    num_cams = 2 if args.stereo else 1
    vc = cfgmod.load(args.config)
    cfg = vc.filter._replace(num_cams=num_cams)
    cams = vc.cams[:num_cams]
    # downsample_cameras (TrackBase.h:106): track at half resolution with
    # halved fx/fy/cx/cy — image and camera model stay consistent
    downsample = bool(vc.downsample_cameras)
    if downsample:
        cams = [c._replace(
            intrinsics=np.concatenate(
                [np.asarray(c.intrinsics[:4]) * 0.5, c.intrinsics[4:]]
            ).astype(np.float32),
            resolution=(c.resolution[0] // 2, c.resolution[1] // 2),
        ) for c in cams]
    tri_opts = vc.tri  # fi_* yaml keys (FeatureInitializerOptions parity)
    kparams = klt.KltParams(num_features=args.num_pts)
    hist_method = vc.tracker.histogram_method
    # per-camera masks (VioManagerOptions.h:281-299; >127 = masked out)
    det_mask0 = None
    if vc.tracker.use_mask and vc.tracker.mask_paths:
        import cv2

        m = cv2.imread(vc.tracker.mask_paths[0], cv2.IMREAD_GRAYSCALE)
        if m is None:
            raise FileNotFoundError(
                f"mask0 not readable: {vc.tracker.mask_paths[0]}")
        if downsample:
            m = m[::2, ::2]
        det_mask0 = jnp.asarray(m < 128)  # True = usable

    native.build()
    ds = native.EurocDataset(args.root, num_cams=num_cams)
    # decode-ahead worker: PNG decode overlaps device compute (the analog
    # of the reference's threaded camera subscription + sorted queue,
    # ROS1Visualizer.cpp:451-487 / ros1_serial_msckf.cpp:210-278)
    ds.prefetch_start(num_cams=num_cams, start=0, depth=6)
    imu_t, imu_w, imu_a = ds.imu()
    cam_t = ds.cam_times(0)
    t0 = imu_t[0]
    print(f"dataset: {len(imu_t)} imu, {len(cam_t)} frames, "
          f"{num_cams} cam(s)")

    hub = native.SensorHub()
    for i in range(len(imu_t)):
        hub.feed_imu(imu_t[i] - t0, imu_w[i], imu_a[i])

    calib_q = jnp.stack([lie.rot_2_quat(jnp.asarray(c.R_ItoC)) for c in cams])
    calib_p = jnp.stack([jnp.asarray(c.p_IinC) for c in cams])
    calib_i = jnp.stack([jnp.asarray(c.intrinsics) for c in cams])
    zetas = [jnp.asarray(c.intrinsics) for c in cams]
    cam_model = cams[0].model if hasattr(cams[0], "model") else "radtan"

    table = ft.init_table(cfg, args.num_pts * 3)
    tstate = tracker.init_tracker(cams[0].resolution[1],
                                  cams[0].resolution[0], args.num_pts,
                                  num_aruco_tags=cfg.num_aruco_tags)
    step = jax.jit(lambda s, t, f: manager.step_frame(s, t, cfg, tri_opts, f))
    # IMU window capacity: one processed-frame interval of samples.  With a
    # track_frequency throttle the interval stretches to 1/track_frequency
    # (plus one dropped frame of slack for timestamp jitter).
    frame_dt = 0.1
    if vc.tracker.track_frequency > 0:
        frame_dt = max(frame_dt, 1.0 / vc.tracker.track_frequency + 0.1)
    K_win = int(vc.imu.rate * frame_dt) + 8

    from open_vins_tpu.utils.timing import FrameTimer

    timer = FrameTimer(args.timing or None)

    viz = None
    if args.viz_dir:
        from open_vins_tpu.frontend.visualization import TrackVisualizer

        viz = TrackVisualizer(args.viz_dir, every=args.viz_every)

    def prep(img):
        img = jnp.asarray(img)
        return klt.downsample2(img) if downsample else img

    def track(tstate, k, first):
        img = ds.prefetch_get(0, k)
        if img is None:
            return tstate, None
        if num_cams == 2:
            img_r = ds.prefetch_get(1, k)
            if img_r is None:
                return tstate, None
            tstate, ids, uv, uvn, mask = tracker.track_frame_stereo(
                tstate, prep(img), prep(img_r),
                zetas[0], zetas[1], kparams, cam_model=cam_model,
                first_frame=first, hist_method=hist_method,
                det_mask=det_mask0)
        else:
            tstate, ids1, uv1, uvn1, mask1 = tracker.track_frame(
                tstate, prep(img), zetas[0], kparams,
                cam_model=cam_model, first_frame=first,
                hist_method=hist_method, det_mask=det_mask0)
            ids, uv, uvn, mask = (ids1[None], uv1[None], uvn1[None],
                                  mask1[None])
        if viz is not None:
            viz.feed(np.asarray(prep(img)), np.asarray(ids[0]),
                     np.asarray(uv[0]), np.asarray(mask[0]))
        return tstate, (ids, uv, uvn, mask)

    # ------------------------------------------------------------------
    # routed initialization: track from the start, buffer cam0 tracks,
    # attempt static-or-dynamic init on a sliding window
    # ------------------------------------------------------------------
    ropts = router.RouterOptions(
        window_time=vc.init_window_time / 2.0, imu_thresh=vc.init_imu_thresh,
    )
    bg = background.BackgroundInitializer()
    track_hist = {}  # id -> ([t], [uv px], [uvn])
    state = None
    init_k = None
    n_frames = len(cam_t)
    first = True
    imu_t_rel = jnp.asarray(imu_t - t0, jnp.float32)
    imu_w_j = jnp.asarray(imu_w, jnp.float32)
    imu_a_j = jnp.asarray(imu_a, jnp.float32)

    def make_attempt(tk):
        """Snapshot the current history into a worker-thread closure."""
        w = ropts.window_time
        hist_px = {fid: (list(ts), list(uvs))
                   for fid, (ts, uvs, _) in track_hist.items()}
        d1 = router.average_disparity(
            [v[1] for v in hist_px.values()], [v[0] for v in hist_px.values()],
            tk - 2 * w, tk - w)
        d2 = router.average_disparity(
            [v[1] for v in hist_px.values()], [v[0] for v in hist_px.values()],
            tk - w, tk)
        dyn_input = None
        use_static, use_dynamic = router.decide(ropts, d1, d2)
        if use_dynamic:
            P = 6
            cam_rate = 1.0 / max(float(np.median(np.diff(cam_t))), 1e-3)
            stride = max(1, int(round(2 * w * cam_rate / (P - 1))))
            k_now = int(np.searchsorted(cam_t - t0, tk))
            # anchor the pose grid at the NEWEST frame: the dynamic-init
            # state is reported at the LAST pose time, which the handoff
            # treats as t_init — a start-clipped range(lo, k+1, stride)
            # can omit k_now itself, making the state ~stride/cam_rate
            # seconds stale at handoff (same bug measured at 3.5 deg
            # gravity error in the suite's replay path)
            pose_ks = [k_now - stride * (P - 1 - j) for j in range(P)]
            pose_ks = [j for j in pose_ks if 0 <= j < len(cam_t)]
            t_poses = [cam_t[j] - t0 for j in pose_ks]
            hist_n = {fid: (list(ts), list(uvns))
                      for fid, (ts, _, uvns) in track_hist.items()}
            dyn_input = router.build_dyn_input(
                hist_n, t_poses, hub.make_window,
                np.asarray(cams[0].R_ItoC), np.asarray(cams[0].p_IinC),
                K=int(vc.imu.rate * 2 * w / max(len(t_poses) - 1, 1)) + 4,
            )

        def attempt():
            return router.try_initialize(
                ropts, imu_t_rel, imu_w_j, imu_a_j, float(tk), d1, d2,
                dyn_input=dyn_input)

        return attempt, d1, d2

    for k in range(n_frames):
        tk = cam_t[k] - t0
        tstate, meas = track(tstate, k, first)
        if meas is None:
            continue
        first = False
        ids, uv, uvn, mask = meas
        ids0 = np.array(ids[0]); uv0 = np.array(uv[0])
        uvn0 = np.array(uvn[0]); m0 = np.array(mask[0])
        for i in np.where(m0)[0]:
            h = track_hist.setdefault(int(ids0[i]), ([], [], []))
            h[0].append(tk); h[1].append(uv0[i]); h[2].append(uvn0[i])

        if k < 8:
            continue
        if bg.busy or bg.result is not None:
            done = bg.try_to_initialize(tk, None)
        else:
            attempt, d1, d2 = make_attempt(tk)
            done = bg.try_to_initialize(tk, attempt)
        if not done:
            continue
        kind, res, t_init = bg.result
        if kind == "static":
            state = manager.initialize_from_gt(
                cfg, res.q_GtoI, jnp.zeros(3), jnp.zeros(3), res.bg, res.ba,
                t_init, calib_q, calib_p, calib_i)
        else:
            state = manager.initialize_from_dynamic(
                cfg, res, t_init, calib_q, calib_p, calib_i)
        # catch up over the camera frames that arrived during the attempt
        queued = bg.queued_times(t_init)
        state = background.catch_up(state, cfg, queued, hub.make_window,
                                    vc.imu.rate)
        init_k = k
        print(f"{kind} init at t={t_init:.2f}s; caught up over "
              f"{len(queued)} queued frames to frame {k}")
        break

    if state is None:
        init_k = min(40, max(1, n_frames // 4))
        print(f"initialization failed — defaulting to frame {init_k} "
              "with loose prior")
        state = manager.initialize_from_gt(
            cfg, jnp.asarray([0.0, 0.0, 0.0, 1.0]), jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
            float(cam_t[init_k] - t0), calib_q, calib_p, calib_i)

    # yaml-seeded IMU intrinsics (kalibr_imu_chain Tw/Ta/Tg + sensor-frame
    # rotations, StateOptions.h:141-146)
    state = manager.seed_imu_intrinsics(state, vc.imu)

    # ------------------------------------------------------------------
    # filtering from init_k
    # ------------------------------------------------------------------
    if args.max_frames:
        n_frames = min(n_frames, init_k + 1 + args.max_frames)
    # Without --timing the loop never blocks on the device: JAX's async
    # dispatch queues each frame's fused step while the native prefetch
    # thread decodes the next PNGs — host IO and device compute overlap
    # (with --timing, stage boundaries force per-frame syncs).
    sync = bool(args.timing)
    out_t, out_p, out_q = [], [], []
    t_prev = float(state.t)  # last initialized/caught-up state time
    # track_frequency (TrackBase.h:109 / VioManager feed throttle): drop
    # camera frames arriving faster than the configured processing rate
    # (5% tolerance absorbs timestamp jitter); the skipped frames' IMU
    # accumulates into the next processed window.
    min_track_dt = (0.95 / vc.tracker.track_frequency
                    if vc.tracker.track_frequency > 0 else 0.0)
    n_skipped = 0
    t_start = time.time()
    for k in range(init_k + 1, n_frames):
        tk = cam_t[k] - t0
        if tk - t_prev < min_track_dt:
            # consume the decoded images so the sequential prefetcher
            # keeps advancing past the dropped frame
            ds.prefetch_get(0, k)
            if num_cams == 2:
                ds.prefetch_get(1, k)
            n_skipped += 1
            continue
        timer.start_frame()
        tstate, meas = track(tstate, k, False)
        if meas is None:
            continue
        ids, uv, uvn, mask = meas
        if sync:
            mask.block_until_ready()
        timer.stage("tracking")
        n, wt, ww, wa = hub.make_window(t_prev, tk, K_win)
        if n <= 0:
            continue
        timer.stage("propagation")  # native window packing
        frame = manager.FrameInput(
            win=ImuWindow(t=jnp.asarray(wt, jnp.float32),
                          w=jnp.asarray(ww, jnp.float32),
                          a=jnp.asarray(wa, jnp.float32)),
            t_new=jnp.asarray(tk, jnp.float32),
            ids=ids, uv=uv, uvn=uvn, mask=mask,
        )
        state, table, diag = step(state, table, frame)
        if sync:
            state.cov.block_until_ready()
        timer.stage("msckf")  # fused propagate+update device step
        timer.end_frame(tk + t0)
        t_prev = tk
        out_t.append(tk + t0)
        out_p.append(state.p)  # device arrays; converted after the loop
        out_q.append(state.q)
        if k % 100 == 0:
            print(f"frame {k}: p={np.array(state.p).round(2)} "
                  f"msckf={int(diag.n_msckf)} slam={int(diag.n_slam)}")

    state.cov.block_until_ready()  # drain the async queue before timing
    dt_total = time.time() - t_start
    if n_skipped:
        print(f"track_frequency {vc.tracker.track_frequency:.1f} Hz: "
              f"skipped {n_skipped} frames")
    print(f"processed {len(out_t)} frames in {dt_total:.1f}s "
          f"({len(out_t)/max(dt_total,1e-9):.1f} fps)")
    ds.prefetch_stop()
    if out_t:
        ps = np.stack([np.array(p) for p in out_p])
        qs = jnp.stack(out_q)
        Rs = np.array(jax.vmap(lie.quat_2_rot)(qs))  # [N,3,3] global-to-IMU
        out_q = traj_io.rot_to_quat_xyzw(np.transpose(Rs, (0, 2, 1)))
        out_p = ps
    traj_io.save_tum(args.out, np.asarray(out_t), np.asarray(out_p),
                     np.asarray(out_q))
    print(f"wrote {args.out}; evaluate with examples/error_singlerun.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
