#!/usr/bin/env python
"""EuRoC MAV dataset VIO: native loader + KLT front-end + MSCKF filter.

The serial-replay entry point (ros1_serial_msckf.cpp parity): processes the
dataset in time order through the full pipeline and writes a TUM trajectory
for evaluation with examples/error_singlerun.py.

Usage:
  python examples/run_euroc.py <dataset_root> \
      [--config /root/reference/config/euroc_mav/estimator_config.yaml] \
      [--out est.txt] [--max-frames N] [--cpu]
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
    ap.add_argument("--num-pts", type=int, default=150)
    ap.add_argument("--timing", default="", help="write per-frame timing CSV")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import open_vins_tpu  # noqa: F401
    from open_vins_tpu.core import ekf
    from open_vins_tpu.frontend import klt, tracker
    from open_vins_tpu.init import static_init
    from open_vins_tpu.models import feature_table as ft
    from open_vins_tpu.models import manager
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.models.propagator import ImuWindow
    from open_vins_tpu.ops import lie
    from open_vins_tpu.utils import config as cfgmod
    from open_vins_tpu.utils import native
    from open_vins_tpu.eval import traj_io

    vc = cfgmod.load(args.config)
    cfg = vc.filter._replace(num_cams=1)  # mono pipeline this round
    cam = vc.cams[0]
    tri_opts = tri.TriangulationOptions()
    kparams = klt.KltParams(num_features=args.num_pts)

    native.build()
    ds = native.EurocDataset(args.root, num_cams=1)
    imu_t, imu_w, imu_a = ds.imu()
    cam_t = ds.cam_times(0)
    t0 = imu_t[0]
    print(f"dataset: {len(imu_t)} imu, {len(cam_t)} frames")

    hub = native.SensorHub()
    for i in range(len(imu_t)):
        hub.feed_imu(imu_t[i] - t0, imu_w[i], imu_a[i])

    # --- static initialization at the first still->jerk transition
    opts = static_init.StaticInitOptions(
        window_time=vc.init_window_time / 2.0, imu_thresh=vc.init_imu_thresh
    )
    init_res = None
    init_k = None
    for k in range(10, len(cam_t), 4):
        tn = cam_t[k] - t0
        m = (imu_t - t0) <= tn
        res = static_init.try_static_init(
            opts, jnp.asarray(imu_t - t0, jnp.float32),
            jnp.asarray(imu_w, jnp.float32), jnp.asarray(imu_a, jnp.float32),
            jnp.asarray(m), float(tn),
        )
        if bool(res.success):
            init_res, init_k = res, k
            break
    if init_res is None:
        init_k = min(40, max(1, len(cam_t) // 4))
        print(f"static init failed — defaulting to frame {init_k} "
              "with loose prior")
        q0 = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        bg0 = ba0 = jnp.zeros(3)
        prior = None
    else:
        q0, bg0, ba0 = init_res.q_GtoI, init_res.bg, init_res.ba
        prior = None
        print(f"static init at frame {init_k}")

    state = manager.initialize_from_gt(
        cfg, q0, jnp.zeros(3), jnp.zeros(3), bg0, ba0,
        float(cam_t[init_k] - t0),
        jnp.asarray(lie.rot_2_quat(jnp.asarray(cam.R_ItoC)))[None],
        jnp.asarray(cam.p_IinC)[None], jnp.asarray(cam.intrinsics)[None],
    )
    table = ft.init_table(cfg, args.num_pts * 3)
    tstate = tracker.init_tracker(cam.resolution[1], cam.resolution[0],
                                  args.num_pts)
    zeta = jnp.asarray(cam.intrinsics)

    step = jax.jit(lambda s, t, f: manager.step_frame(s, t, cfg, tri_opts, f))
    K_win = int(vc.imu.rate / 10) + 8

    from open_vins_tpu.utils.timing import FrameTimer

    timer = FrameTimer(args.timing or None)
    n_frames = len(cam_t) if args.max_frames == 0 else min(
        len(cam_t), init_k + 1 + args.max_frames)
    out_t, out_p, out_q = [], [], []
    t_prev = cam_t[init_k] - t0
    t_start = time.time()
    for k in range(init_k, n_frames):
        tk = cam_t[k] - t0
        timer.start_frame()
        img = ds.load_image(0, k)
        if img is None:
            continue
        tstate, ids, uv, uvn, mask = tracker.track_frame(
            tstate, jnp.asarray(img), zeta, kparams,
            first_frame=(k == init_k))
        mask.block_until_ready()
        timer.stage("tracking")
        if k == init_k:
            t_prev = tk
            continue
        n, wt, ww, wa = hub.make_window(t_prev, tk, K_win)
        if n <= 0:
            continue
        timer.stage("propagation")  # native window packing
        frame = manager.FrameInput(
            win=ImuWindow(t=jnp.asarray(wt, jnp.float32),
                          w=jnp.asarray(ww, jnp.float32),
                          a=jnp.asarray(wa, jnp.float32)),
            t_new=jnp.asarray(tk, jnp.float32),
            ids=ids[None], uv=uv[None], uvn=uvn[None], mask=mask[None],
        )
        state, table, diag = step(state, table, frame)
        state.cov.block_until_ready()
        timer.stage("msckf")  # fused propagate+update device step
        timer.end_frame(tk + t0)
        t_prev = tk
        q_ItoG_h = traj_io.rot_to_quat_xyzw(
            np.array(lie.quat_2_rot(state.q)).T[None])[0]
        out_t.append(tk + t0)
        out_p.append(np.array(state.p))
        out_q.append(q_ItoG_h)
        if k % 100 == 0:
            print(f"frame {k}: p={np.array(state.p).round(2)} "
                  f"msckf={int(diag.n_msckf)} slam={int(diag.n_slam)}")

    dt_total = time.time() - t_start
    print(f"processed {len(out_t)} frames in {dt_total:.1f}s "
          f"({len(out_t)/max(dt_total,1e-9):.1f} fps)")
    traj_io.save_tum(args.out, np.asarray(out_t), np.asarray(out_p),
                     np.asarray(out_q))
    print(f"wrote {args.out}; evaluate with examples/error_singlerun.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
