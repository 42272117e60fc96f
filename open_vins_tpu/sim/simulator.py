"""Seeded, jit-pure visual-inertial simulator.

Capability parity with the reference simulator (ov_msckf/src/sim/Simulator.{h,cpp}):
SE(3)-B-spline trajectory, synthetic IMU at `imu_rate` with white noise + bias
random walks, per-camera projected feature measurements with pixel noise, a
persistent 3D feature map with stable feature ids (the TrackSIM contract,
ov_core/src/track/TrackSIM.cpp:30-79), optional calibration perturbation, and a
groundtruth oracle (Simulator::get_state, Simulator.cpp:267-310).

TPU-first redesign:
  * instead of densifying the map on demand (Simulator.cpp:162-203), the map is
    pre-generated from camera poses sampled along the whole trajectory so every
    frame sees >= num_pts points; per-frame selection is a masked top-k with
    static shapes,
  * bias random walks are pre-computed as cumulative sums at build time, and
    white noise is drawn with `jax.random.fold_in(key, step)` — every sample is
    a pure function of (seed, step), giving bitwise reproducibility (the
    test_sim_repeat contract, ov_msckf/src/test_sim_repeat.cpp:134-154) and
    order-independent parallel generation,
  * every step function is jit/vmap/scan friendly: fixed shapes, validity masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.ops import cameras, lie
from open_vins_tpu.sim import bspline


class SimParams(NamedTuple):
    """Static simulator configuration (python scalars; hashable for jit)."""

    imu_rate: float = 200.0
    cam_rate: float = 20.0
    num_cams: int = 1
    num_pts: int = 100  # features returned per camera per frame
    map_size: int = 4096  # persistent map size (static)
    sigma_w: float = 1.6968e-4  # gyro white noise density (rad/s/sqrt(Hz))
    sigma_wb: float = 1.9393e-5  # gyro bias random walk
    sigma_a: float = 2.0e-3  # accel white noise density
    sigma_ab: float = 3.0e-3  # accel bias random walk
    sigma_pix: float = 1.0  # pixel noise std
    gravity_mag: float = 9.81
    min_depth: float = 5.0
    max_depth: float = 10.0
    width: int = 752
    height: int = 480
    cam_model: str = cameras.RADTAN
    duration: float = 60.0  # simulated seconds after start offset
    start_offset: float = 2.0  # skip the first spline seconds (edge effects)
    distance_threshold: float = 0.0  # >0: additionally skip forward until
    # the platform has MOVED this many meters of accumulated path — the
    # reference's skip-until-motion start logic (Simulator.cpp:80-109,
    # sim_distance_threshold); 0 keeps the fixed start_offset behavior
    map_duration: float = 0.0  # >0: sample the persistent feature map only
    # over the first map_duration seconds of the run.  Used by padded
    # trajectory replays (run_benchmark_suite): the tail of a padded run is
    # a frozen end pose, and sampling map rays there would concentrate half
    # the map at one viewpoint.  0 keeps map sampling over the full duration
    min_view_depth: float = 0.1  # per-frame in-view gate: a map point is
    # only measurable while its camera depth exceeds this.  The replay
    # suite raises it to ~1.5 m: on wide trajectories a map point generated
    # min_depth away from ONE pose can transiently pass almost through the
    # camera elsewhere, and its 1/z² Jacobian stiffness diverges the filter
    # — physically, such features blur/leave FOV and no real tracker holds
    # them (TrackSIM would).  The reference sim gates at 0.1 m
    # (Simulator.cpp project_pointcloud) — kept as the default.


class SimData(NamedTuple):
    """Immutable simulator state (pytree)."""

    spline: bspline.Bspline
    map_pts: jax.Array  # [M, 3] global feature positions
    cam_intr: jax.Array  # [num_cams, 8]
    cam_R_ItoC: jax.Array  # [num_cams, 3, 3]
    cam_p_IinC: jax.Array  # [num_cams, 3]
    calib_dt: jax.Array  # scalar true camera-imu time offset
    bias_g_traj: jax.Array  # [n_imu+1, 3] true gyro bias at each imu step
    bias_a_traj: jax.Array  # [n_imu+1, 3]
    gravity: jax.Array  # [3]
    t_start: jax.Array  # scalar sim start time
    key_w: jax.Array  # PRNG keys for each noise channel
    key_a: jax.Array
    key_pix: jax.Array


class ImuSample(NamedTuple):
    t: jax.Array  # scalar time (relative seconds)
    wm: jax.Array  # [3] measured angular velocity
    am: jax.Array  # [3] measured specific force


class CamFrame(NamedTuple):
    t: jax.Array  # scalar frame time (in imu clock: t_cam + calib_dt)
    ids: jax.Array  # [num_cams, num_pts] persistent feature ids (-1 invalid)
    uvs: jax.Array  # [num_cams, num_pts, 2] raw pixel measurements
    uvs_norm: jax.Array  # [num_cams, num_pts, 2] noisy normalized coords
    mask: jax.Array  # [num_cams, num_pts] validity


def n_imu_steps(params: SimParams) -> int:
    return int(round(params.duration * params.imu_rate))


def n_cam_frames(params: SimParams) -> int:
    return int(round(params.duration * params.cam_rate))


def imu_per_cam(params: SimParams) -> int:
    r = params.imu_rate / params.cam_rate
    assert abs(r - round(r)) < 1e-9, "imu_rate must be a multiple of cam_rate"
    return int(round(r))


def default_calib(params: SimParams):
    """EuRoC-like default calibration for num_cams cameras."""
    intr = jnp.tile(
        jnp.asarray([458.654, 457.296, 367.215, 248.375, -0.2834, 0.0739, 2e-4, 1.76e-5]),
        (params.num_cams, 1),
    )
    Rs = []
    ps = []
    for i in range(params.num_cams):
        # cam looking forward-ish with a small per-camera offset
        w = jnp.asarray([-1.2, 1.2, -1.2]) * (1.0 + 0.02 * i)
        Rs.append(lie.exp_so3(w))
        ps.append(jnp.asarray([0.05 * i, -0.01, 0.02]))
    return intr, jnp.stack(Rs), jnp.stack(ps)


def sine_trajectory(duration: float, dt: float = 0.1):
    """A smooth default trajectory (3D sinusoid, like the rpng sim paths)."""
    n = int(duration / dt) + 8
    t = jnp.arange(n) * dt
    p = jnp.stack(
        [
            2.0 * jnp.sin(0.6 * t),
            2.0 * jnp.cos(0.6 * t),
            1.0 + 0.5 * jnp.sin(0.9 * t),
        ],
        axis=-1,
    )
    yaw = 0.6 * t + 0.3 * jnp.sin(0.5 * t)
    pitch = 0.2 * jnp.sin(0.7 * t)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    zero = jnp.zeros_like(t)
    one = jnp.ones_like(t)
    Rz = jnp.stack(
        [
            jnp.stack([cy, -sy, zero], -1),
            jnp.stack([sy, cy, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cp, zero, sp], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sp, zero, cp], -1),
        ],
        -2,
    )
    R = Rz @ Ry  # body-to-global
    return t, R, p


def build(
    params: SimParams,
    seed: int = 0,
    traj=None,
    calib=None,
    calib_dt: float = 0.0,
) -> SimData:
    """Construct the simulator: spline, map, bias walks, noise keys."""
    if traj is None:
        traj = sine_trajectory(params.duration + 2.0 * params.start_offset + 2.0)
    times, Rs, ps = traj
    spline = bspline.fit(times, Rs, ps)

    if calib is None:
        calib = default_calib(params)
    cam_intr, cam_R_ItoC, cam_p_IinC = calib

    key = jax.random.PRNGKey(seed)
    k_map, k_bg, k_ba, k_w, k_a, k_pix = jax.random.split(key, 6)

    gravity = jnp.asarray([0.0, 0.0, params.gravity_mag])
    t_start = spline.t0 + params.start_offset
    if params.distance_threshold > 0.0:
        # skip-until-motion (Simulator.cpp:80-109): advance the start in
        # camera-period steps until the accumulated path length crosses the
        # threshold.  Host-side scan over the spline (build() runs once).
        cam_dt = 1.0 / params.cam_rate
        t_max = spline.t0 + float(times[-1] - times[0]) - params.duration - 1.0
        t = t_start
        _, p_prev = bspline.pose(spline, jnp.asarray(t))
        dist = 0.0
        while dist <= params.distance_threshold and t < t_max:
            t += cam_dt
            _, p_now = bspline.pose(spline, jnp.asarray(t))
            dist += float(jnp.linalg.norm(p_now - p_prev))
            p_prev = p_now
        t_start = t

    # --- persistent feature map: sample camera poses along the run, cast rays
    M = params.map_size
    k1, k2, k3, k4 = jax.random.split(k_map, 4)
    map_dur = params.map_duration if params.map_duration > 0.0 else params.duration
    ts = jax.random.uniform(
        k1, (M,), minval=t_start, maxval=t_start + map_dur
    )
    cam_idx = jax.random.randint(k2, (M,), 0, params.num_cams)
    u = jax.random.uniform(k3, (M, 2)) * jnp.asarray(
        [params.width - 40.0, params.height - 40.0]
    ) + 20.0
    depth = jax.random.uniform(
        k4, (M,), minval=params.min_depth, maxval=params.max_depth
    )

    def backproject(t, ci, uv, d):
        R_ItoG, p_IinG = bspline.pose(spline, t)
        intr = cam_intr[ci]
        uvn = cameras.undistort(params.cam_model, intr, uv)
        ray_C = jnp.concatenate([uvn, jnp.ones((1,))]) * d
        R_CtoI = jnp.swapaxes(cam_R_ItoC[ci], -1, -2)
        p_in_I = R_CtoI @ (ray_C - cam_p_IinC[ci])
        return p_IinG + R_ItoG @ p_in_I

    map_pts = jax.vmap(backproject)(ts, cam_idx, u, depth)

    # --- true bias random walks (cumsum of discrete increments)
    n_imu = n_imu_steps(params)
    dt_imu = 1.0 / params.imu_rate
    inc_g = params.sigma_wb * jnp.sqrt(dt_imu) * jax.random.normal(k_bg, (n_imu + 1, 3))
    inc_a = params.sigma_ab * jnp.sqrt(dt_imu) * jax.random.normal(k_ba, (n_imu + 1, 3))
    bias_g_traj = jnp.cumsum(inc_g.at[0].set(0.0), axis=0)
    bias_a_traj = jnp.cumsum(inc_a.at[0].set(0.0), axis=0)

    return SimData(
        spline=spline,
        map_pts=map_pts,
        cam_intr=cam_intr,
        cam_R_ItoC=cam_R_ItoC,
        cam_p_IinC=cam_p_IinC,
        calib_dt=jnp.asarray(calib_dt),
        bias_g_traj=bias_g_traj,
        bias_a_traj=bias_a_traj,
        gravity=gravity,
        t_start=t_start,
        key_w=k_w,
        key_a=k_a,
        key_pix=k_pix,
    )


def get_imu(sim: SimData, params: SimParams, step) -> ImuSample:
    """Measured IMU sample at integer imu step (pure in (sim, step)).

    Mirrors Simulator::get_next_imu (Simulator.cpp:311-390): spline-exact
    ω/a + bias + white noise with discrete std σ/√dt.
    """
    dt = 1.0 / params.imu_rate
    t = sim.t_start + step * dt
    w_true, a_true = bspline.imu_measurement(sim.spline, t, sim.gravity)
    kw = jax.random.fold_in(sim.key_w, step)
    ka = jax.random.fold_in(sim.key_a, step)
    nw = params.sigma_w / jnp.sqrt(dt) * jax.random.normal(kw, (3,))
    na = params.sigma_a / jnp.sqrt(dt) * jax.random.normal(ka, (3,))
    wm = w_true + sim.bias_g_traj[step] + nw
    am = a_true + sim.bias_a_traj[step] + na
    return ImuSample(t=t - sim.t_start, wm=wm, am=am)


def get_cam(sim: SimData, params: SimParams, frame) -> CamFrame:
    """Project the persistent map into each camera at integer frame index.

    Mirrors Simulator::get_next_cam + project_pointcloud (Simulator.cpp:391-500):
    in-view test against image bounds, first `num_pts` valid points selected
    with stable (index-ordered) priority so ids persist across frames, pixel
    noise added to the raw uv.
    """
    t_cam = sim.t_start + frame / params.cam_rate
    # measurements are stamped in the camera clock; the true imu-time is
    # t_cam + calib_dt (the estimator estimates calib_dt)
    R_ItoG, p_IinG = bspline.pose(sim.spline, t_cam + sim.calib_dt)
    R_GtoI = jnp.swapaxes(R_ItoG, -1, -2)

    def one_cam(ci):
        R_ItoC = sim.cam_R_ItoC[ci]
        p_IinC = sim.cam_p_IinC[ci]
        intr = sim.cam_intr[ci]
        p_C = (R_ItoC @ (R_GtoI @ (sim.map_pts - p_IinG)[..., None]))[..., 0] + p_IinC
        z = p_C[..., 2]
        zmin = params.min_view_depth
        safe_z = jnp.where(z > zmin, z, 1.0)
        uvn = p_C[..., :2] / safe_z[..., None]
        uv = cameras.distort(params.cam_model, intr, uvn)
        valid = (
            (z > zmin)
            & (uv[..., 0] > 0.0)
            & (uv[..., 0] < params.width)
            & (uv[..., 1] > 0.0)
            & (uv[..., 1] < params.height)
        )
        # deterministic selection: first num_pts valid map indices
        M = sim.map_pts.shape[0]
        score = jnp.where(valid, -jnp.arange(M, dtype=jnp.float32), -jnp.inf)
        _, idx = jax.lax.top_k(score, params.num_pts)
        sel_valid = valid[idx]
        ids = jnp.where(sel_valid, idx, -1)
        kp = jax.random.fold_in(jax.random.fold_in(sim.key_pix, frame), ci)
        noise = params.sigma_pix * jax.random.normal(kp, (params.num_pts, 2))
        uv_meas = uv[idx] + noise
        uvn_meas = cameras.undistort(params.cam_model, intr, uv_meas)
        return ids, uv_meas, uvn_meas, sel_valid

    ids, uvs, uvs_norm, mask = jax.vmap(one_cam)(jnp.arange(params.num_cams))
    return CamFrame(
        t=t_cam - sim.t_start, ids=ids, uvs=uvs, uvs_norm=uvs_norm, mask=mask
    )


def get_state(sim: SimData, params: SimParams, t_rel):
    """Groundtruth oracle at relative time t (Simulator::get_state parity,
    Simulator.cpp:267-310).

    Returns (q_GtoI (JPL), p_IinG, v_IinG, bg, ba); biases are looked up at
    the nearest imu step.
    """
    t = sim.t_start + t_rel
    R_ItoG, p = bspline.pose(sim.spline, t)
    _, v = bspline.velocity(sim.spline, t)
    q_GtoI = lie.rot_2_quat(jnp.swapaxes(R_ItoG, -1, -2))
    bg, ba = get_true_bias(sim, params, t_rel)
    return q_GtoI, p, v, bg, ba


def get_true_bias(sim: SimData, params: SimParams, t_rel):
    step = jnp.clip(
        jnp.round(t_rel * params.imu_rate).astype(jnp.int32),
        0,
        sim.bias_g_traj.shape[0] - 1,
    )
    return sim.bias_g_traj[step], sim.bias_a_traj[step]


class PerturbedCalib(NamedTuple):
    """Estimator-side starting calibration (truth stays inside SimData)."""

    cam_intr: jax.Array  # [N, 8]
    cam_R_ItoC: jax.Array  # [N, 3, 3]
    cam_p_IinC: jax.Array  # [N, 3]
    calib_dt: jax.Array  # scalar
    imu_dw: jax.Array  # [6]
    imu_da: jax.Array  # [6]
    imu_tg: jax.Array  # [9]
    imu_q_gyro: jax.Array  # [4] JPL gyro-frame rotation
    imu_q_acc: jax.Array  # [4] JPL accel-frame rotation (rpng model)


def perturb_calib(seed: int, calib, calib_dt=0.0,
                  imu_intrinsics=False, g_sensitivity=False,
                  imu_model="kalibr") -> PerturbedCalib:
    """Seeded gaussian perturbation of the calibration the ESTIMATOR starts
    from (Simulator::perturb_parameters parity, Simulator.cpp:209-265, with
    the reference's per-field scales): dt 0.01 s, focal/center 1.0 px,
    distortion 0.005, extrinsic rotation 0.001 rad, extrinsic position
    0.01 m, Dw/Da 0.004, Tg 0.004, gyro-frame rotation 0.002 rad.

    The simulator keeps the true values — run the filter with this as its
    initial calibration (and the matching calib_* switches on) to exercise
    online self-calibration exactly like the reference sim does.
    """
    cam_intr, cam_R_ItoC, cam_p_IinC = calib
    N = cam_intr.shape[0]
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    dt = jnp.asarray(calib_dt) + 0.01 * jax.random.normal(ks[0], ())
    intr = cam_intr + jnp.concatenate(
        [1.0 * jnp.ones((N, 4)), 0.005 * jnp.ones((N, 4))], axis=1
    ) * jax.random.normal(ks[1], (N, 8))
    w_vec = 0.001 * jax.random.normal(ks[2], (N, 3))
    R = jax.vmap(lambda w, Rot: lie.exp_so3(w) @ Rot)(w_vec, cam_R_ItoC)
    p = cam_p_IinC + 0.01 * jax.random.normal(ks[3], (N, 3))

    ident6 = ([1.0, 0.0, 1.0, 0.0, 0.0, 1.0] if imu_model == "rpng"
              else [1.0, 0.0, 0.0, 1.0, 0.0, 1.0])
    dw = jnp.asarray(ident6)
    da = jnp.asarray(ident6)
    tg = jnp.zeros(9)
    q_gyro = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    q_acc = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    if imu_intrinsics:
        dw = dw + 0.004 * jax.random.normal(ks[4], (6,))
        da = da + 0.004 * jax.random.normal(ks[5], (6,))
        w_g = 0.002 * jax.random.normal(ks[6], (3,))
        q_gyro = lie.rot_2_quat(lie.exp_so3(w_g))
        w_a = 0.002 * jax.random.normal(
            jax.random.fold_in(ks[6], 1), (3,))
        q_acc = lie.rot_2_quat(lie.exp_so3(w_a))
    if g_sensitivity:
        tg = tg + 0.004 * jax.random.normal(ks[7], (9,))
    return PerturbedCalib(
        cam_intr=intr, cam_R_ItoC=R, cam_p_IinC=p, calib_dt=dt,
        imu_dw=dw, imu_da=da, imu_tg=tg, imu_q_gyro=q_gyro, imu_q_acc=q_acc,
    )
