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
