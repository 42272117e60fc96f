"""Groundtruth trajectory file loading for the simulator.

Capability parity with the reference's DatasetReader::load_simulated_trajectory
(ov_core/src/utils/dataset_reader.h:177-247) + BsplineSE3::feed_trajectory
re-gridding (BsplineSE3.cpp:27-100): rows are
``timestamp p_IinG(3) q_GtoI(4, JPL xyzw)``; control points are sampled on a
UNIFORM grid over the file's true timeline at dt = max(mean Δt, 0.05) s, with
each control pose linearly interpolated from its bounding rows (the
reference's find_bounding_poses + interpolation walk) — so a 200 Hz
groundtruth file (EuRoC MH/V*, TUM-VI, UZH-FPV) keeps its true speed while
the spline stays at a tractable control density.

The reference repo ships these files in ov_data/ (udel_gore, the full EuRoC
euroc_mav/ set, tum_vi/ rooms, uzhfpv_*); pass any of them here to simulate
realistic motion.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from open_vins_tpu.ops import lie

REFERENCE_SIM_DIR = "/root/reference/ov_data/sim"
REFERENCE_DATA_DIR = "/root/reference/ov_data"


def _read_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            if len(parts) < 8:
                continue
            rows.append([float(x) for x in parts[:8]])
    arr = np.asarray(rows, dtype=np.float64)
    if len(arr) < 8:
        raise ValueError(f"trajectory too short: {path}")
    return arr[:, 0], arr[:, 1:4], arr[:, 4:8]  # t, p, q_GtoI (JPL xyzw)


def _interp_poses(t, p, q, grid):
    """Linearly interpolate positions + (sign-aligned, normalized) quaternions
    at the grid times; clamps outside [t[0], t[-1]] (frozen end poses)."""
    idx = np.clip(np.searchsorted(t, grid, side="right") - 1, 0, len(t) - 2)
    t0, t1 = t[idx], t[idx + 1]
    lam = np.clip((grid - t0) / np.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    p_out = (1.0 - lam)[:, None] * p[idx] + lam[:, None] * p[idx + 1]
    q0, q1 = q[idx], q[idx + 1]
    q1 = q1 * np.where(np.sum(q0 * q1, axis=1) < 0.0, -1.0, 1.0)[:, None]
    q_out = (1.0 - lam)[:, None] * q0 + lam[:, None] * q1
    q_out /= np.maximum(np.linalg.norm(q_out, axis=1, keepdims=True), 1e-12)
    return p_out, q_out


def _to_traj(times_rel, p, q_GtoI):
    R_GtoI = lie.quat_2_rot(jnp.asarray(q_GtoI, dtype=jnp.float32))
    R_ItoG = jnp.swapaxes(R_GtoI, -1, -2)
    return (jnp.asarray(times_rel, dtype=jnp.float32), R_ItoG,
            jnp.asarray(p, dtype=jnp.float32))


def load_trajectory_file(path):
    """Parse a trajectory file -> (times [K], R_ItoG [K,3,3], p [K,3]).

    Times are shifted to start at 0; control poses sit on a uniform grid
    over the TRUE timeline at dt = max(mean Δt, 0.05) s (reference
    BsplineSE3 control density), interpolated from the bounding rows.
    """
    t, p, q = _read_rows(path)
    dt = max(float(np.mean(np.diff(t))), 0.05)
    n = int(np.floor((t[-1] - t[0]) / dt)) + 1
    grid = t[0] + np.arange(n) * dt
    p_g, q_g = _interp_poses(t, p, q, grid)
    return _to_traj(np.arange(n) * dt, p_g, q_g)


def load_trajectory_padded(path, n_ctrl, dt=0.05, t_skip=0.0):
    """Like `load_trajectory_file`, but with EXACTLY `n_ctrl` control points
    at fixed spacing `dt` — grid times beyond the file's end freeze at the
    final pose (zero velocity, consistent IMU = pure gravity).

    This gives every trajectory file identical spline shapes, so one jitted
    filter program (and ONE TPU compile) replays the entire ov_data corpus.
    `t_skip` drops the first seconds of the file before gridding — the
    reference's per-sequence bag start offsets (run_ros_eth.sh:34-47 skips
    the EuRoC MH ground-stationary periods by 5-40 s).
    Returns (traj, valid_duration_s) where valid_duration_s is the span of
    real (un-frozen) motion after the skip.
    """
    t, p, q = _read_rows(path)
    grid = t[0] + t_skip + np.arange(n_ctrl) * dt
    p_g, q_g = _interp_poses(t, p, q, grid)
    valid = float(min(max(t[-1] - t[0] - t_skip, 0.0), (n_ctrl - 1) * dt))
    return _to_traj(np.arange(n_ctrl) * dt, p_g, q_g), valid


# per-sequence start skips for the EuRoC MH ground-stationary periods —
# the reference's bag start offsets (ov_msckf/scripts/run_ros_eth.sh:34-47)
EUROC_START_SKIP = {
    "MH_01_easy": 40.0, "MH_02_easy": 35.0, "MH_03_medium": 5.0,
    "MH_04_difficult": 10.0, "MH_05_difficult": 5.0,
}


def motion_skip(path, t_skip, start_offset, thresh=0.8):
    """Extra seconds (beyond t_skip) until SUSTAINED motion: earliest τ with
    net displacement |p(τ+3 s) − p(τ)| ≥ 1.2·thresh meters (capped 30 s).

    The reference's skip-until-motion start role (Simulator.cpp:80-109 /
    sim_distance_threshold) at the corpus level: an estimator idled through
    a stationary start accumulates an honest-but-unrecoverable covariance
    (orientation-prior × g × t velocity growth) and diverges at takeoff.
    Net displacement, not accumulated path — mocap noise alone racks up
    ~0.2 m/s of fake path length while stationary — and a 3 s window so a
    single pre-takeoff hop does not count (MH_05 hops 0.75 m then hovers)."""
    t, p, _ = _read_rows(path)
    t = t - t[0]
    i0 = int(np.searchsorted(t, t_skip + start_offset))
    if i0 >= len(t) - 2:
        return 0.0
    tt = t[i0:]
    pp = p[i0:]
    j3 = np.clip(np.searchsorted(tt, tt + 3.0), 0, len(tt) - 1)
    disp3 = np.linalg.norm(pp[j3] - pp, axis=1)
    idx = np.where(disp3 >= 1.2 * thresh)[0]
    if len(idx) == 0:
        return 0.0
    return float(min(tt[idx[0]] - tt[0], 30.0))
