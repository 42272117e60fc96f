"""Initialization router: static vs dynamic selection.

Capability parity with ov_init::InertialInitializer
(InertialInitializer.cpp:55-159): buffer IMU, compute feature disparity
over two half-windows, and route — if the platform is still (low disparity)
wait for a jerk and run the static initializer; if it is moving (high
disparity) run the dynamic initializer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from open_vins_tpu.init import dynamic_init, static_init


class RouterOptions(NamedTuple):
    window_time: float = 1.0  # half-window seconds (init_window_time/2)
    imu_thresh: float = 1.0
    max_disparity: float = 10.0  # px over the window => moving
    wait_for_jerk: bool = True
    gravity_mag: float = 9.81


def average_disparity(tracks_uv, tracks_t, t_lo, t_hi):
    """Mean track displacement (px) between the oldest and newest obs of
    each track inside [t_lo, t_hi].  tracks_uv: list of [K_i, 2] arrays with
    matching times tracks_t: list of [K_i].  Host-side (numpy)."""
    disps = []
    for uv, ts in zip(tracks_uv, tracks_t):
        ts = np.asarray(ts)
        sel = (ts >= t_lo) & (ts <= t_hi)
        if sel.sum() < 2:
            continue
        u = np.asarray(uv)[sel]
        disps.append(np.linalg.norm(u[-1] - u[0]))
    return float(np.mean(disps)) if disps else 0.0


def decide(opts: RouterOptions, disparity_w1, disparity_w2):
    """(use_static, use_dynamic) from the two half-window disparities.

    Mirrors InertialInitializer.cpp:104-158: both windows quiet -> static
    path (with jerk-waiting semantics handled by the static initializer);
    significant motion in either -> dynamic.
    """
    moving = (disparity_w1 > opts.max_disparity) or (
        disparity_w2 > opts.max_disparity
    )
    return (not moving), moving


def try_initialize(opts: RouterOptions, imu_t, imu_w, imu_a, t_newest,
                   disparity_w1, disparity_w2, dyn_input=None,
                   dyn_opts=None):
    """One routed initialization attempt.

    Returns (kind, result) where kind ∈ {"none", "static", "dynamic"}.
    `dyn_input` (dynamic_init.DynInitInput) must be provided by the caller
    when motion is detected (it owns the feature tracks).
    """
    use_static, use_dynamic = decide(opts, disparity_w1, disparity_w2)
    if use_static:
        sopts = static_init.StaticInitOptions(
            window_time=opts.window_time, imu_thresh=opts.imu_thresh,
            wait_for_jerk=opts.wait_for_jerk, gravity_mag=opts.gravity_mag,
        )
        mask = jnp.asarray(np.asarray(imu_t) <= t_newest)
        res = static_init.try_static_init(
            sopts, jnp.asarray(imu_t), jnp.asarray(imu_w),
            jnp.asarray(imu_a), mask, float(t_newest),
        )
        if bool(res.success):
            return "static", res
        return "none", None
    if use_dynamic and dyn_input is not None:
        dopts = dyn_opts or dynamic_init.DynamicInitOptions(
            gravity_mag=opts.gravity_mag
        )
        res = dynamic_init.initialize(dyn_input, dopts)
        if bool(res.success):
            return "dynamic", res
    return "none", None


def build_dyn_input(track_hist, t_poses, make_window, R_ItoC, p_IinC,
                    max_feats=50, K=32, min_obs=3):
    """Host-side assembly of a DynInitInput from live tracker history.

    The role of DynamicInitializer's feature/IMU gathering
    (DynamicInitializer.cpp:90-180) for the streaming entry point:

    - track_hist: dict id -> (list[t], list[uvn 2-vec]) accumulated from the
      KLT tracker (cam 0).
    - t_poses: the P ascending pose times to anchor the problem at (camera
      frame times inside the init window).
    - make_window: callable (t0, t1, K) -> (n, t[K+1], w[K+1,3], a[K+1,3])
      — the native SensorHub window packer (padded by repeating the last
      row, which the preintegration scan treats as dt=0 no-ops).

    Returns a DynInitInput or None if too few multi-pose features exist.
    """
    t_poses = np.asarray(t_poses, dtype=np.float64)
    P = len(t_poses)
    feats = []
    for fid, (ts, uvns) in track_hist.items():
        ts = np.asarray(ts)
        row = np.zeros((P, 2), dtype=np.float32)
        mask = np.zeros((P,), dtype=bool)
        for j, tp in enumerate(t_poses):
            k = np.argmin(np.abs(ts - tp))
            if abs(ts[k] - tp) < 1e-4:
                row[j] = uvns[k]
                mask[j] = True
        if mask.sum() >= min_obs:
            feats.append((mask.sum(), row, mask))
    if len(feats) < 8:
        return None
    feats.sort(key=lambda x: -x[0])
    feats = feats[:max_feats]
    F = max_feats
    uvn = np.zeros((F, P, 2), dtype=np.float32)
    obs_mask = np.zeros((F, P), dtype=bool)
    for i, (_, row, mask) in enumerate(feats):
        uvn[i], obs_mask[i] = row, mask

    imu_t = np.zeros((P - 1, K + 1), dtype=np.float32)
    imu_w = np.zeros((P - 1, K + 1, 3), dtype=np.float32)
    imu_a = np.zeros((P - 1, K + 1, 3), dtype=np.float32)
    for i in range(P - 1):
        n, wt, ww, wa = make_window(float(t_poses[i]), float(t_poses[i + 1]), K)
        if n <= 0:
            return None
        imu_t[i], imu_w[i], imu_a[i] = wt, ww, wa

    return dynamic_init.DynInitInput(
        t_pose=jnp.asarray(t_poses, jnp.float32),
        imu_t=jnp.asarray(imu_t), imu_w=jnp.asarray(imu_w),
        imu_a=jnp.asarray(imu_a),
        uvn=jnp.asarray(uvn), obs_mask=jnp.asarray(obs_mask),
        R_ItoC=jnp.asarray(R_ItoC, jnp.float32),
        p_IinC=jnp.asarray(p_IinC, jnp.float32),
    )
