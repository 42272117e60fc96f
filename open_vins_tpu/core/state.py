"""The filter state pytree: fixed-shape value storage + dense covariance.

Capability parity with ov_msckf::State (State.h:49-193): current IMU state,
a sliding window of clone poses, SLAM landmarks, camera-IMU calibration
(time offset, extrinsics, intrinsics), dense covariance, and First-Estimate
Jacobian (FEJ) storage for every pose-like variable
(ov_core/src/types/Type.h fej slots).

TPU-first redesign: the clone window is a ring buffer of `max_clones` slots
with a validity mask (no dynamic resizing — State::margtimestep's oldest-clone
marginalization becomes "zero the slot's covariance rows and reuse it"), and
SLAM landmarks live in `max_slam` fixed slots keyed by feature id.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.core.layout import FilterConfig


class VioState(NamedTuple):
    """All filter values + covariance.  Every leaf has a static shape."""

    # current IMU state (JPL q is GtoI)
    q: jax.Array  # [4]
    p: jax.Array  # [3]
    v: jax.Array  # [3]
    bg: jax.Array  # [3]
    ba: jax.Array  # [3]
    # FEJ linearization points (value at first estimate)
    q_fej: jax.Array
    p_fej: jax.Array
    v_fej: jax.Array
    # clone window (ring buffer)
    clones_q: jax.Array  # [C, 4]
    clones_p: jax.Array  # [C, 3]
    clones_q_fej: jax.Array
    clones_p_fej: jax.Array
    clone_t: jax.Array  # [C] relative time of each clone
    clone_valid: jax.Array  # [C] bool
    head: jax.Array  # int32 slot of newest clone (-1 when empty)
    n_clones: jax.Array  # int32 number of valid clones
    # SLAM landmarks (λ vectors under cfg.feat_rep_slam; anchored reps use
    # the anchor slot/cam columns below)
    slam_p: jax.Array  # [L, 3]
    slam_p_fej: jax.Array  # [L, 3]
    slam_id: jax.Array  # [L] int32 feature id, -1 = free slot
    slam_valid: jax.Array  # [L] bool
    slam_fail: jax.Array  # [L] int32 accumulated chi2 failures (Landmark
    # update_fail_count parity, Landmark.h:49-64)
    slam_anchor_slot: jax.Array  # [L] int32 anchor clone ring slot
    slam_anchor_cam: jax.Array  # [L] int32 anchor camera index
    # calibration
    calib_dt: jax.Array  # scalar
    calib_ext_q: jax.Array  # [N, 4] R_ItoC as JPL quat
    calib_ext_p: jax.Array  # [N, 3] p_IinC
    calib_intr: jax.Array  # [N, 8]
    # IMU intrinsics (State::Dm/Tg parity, State.h:91-116; kalibr = lower-tri
    # vectors + estimated gyro frame, rpng = upper-tri + estimated accel frame)
    imu_dw: jax.Array  # [6] gyro scale/skew (identity=[1,0,0,1,0,1])
    imu_da: jax.Array  # [6] accel scale/skew
    imu_tg: jax.Array  # [9] gravity sensitivity (column-major)
    imu_q_gyro: jax.Array  # [4] JPL R_GYROtoIMU (estimated under kalibr)
    imu_q_acc: jax.Array  # [4] JPL R_ACCtoIMU (estimated under rpng)
    # dense covariance over the static layout
    cov: jax.Array  # [D, D]
    # bookkeeping
    t: jax.Array  # scalar current state time (relative seconds, imu clock)
    t_init: jax.Array  # scalar time the filter was initialized at
    # (VioManager startup_time parity — gates dt_slam_delay)
    moved: jax.Array  # bool — platform has moved since init (a ZUPT attempt
    # was rejected once; gates zupt_only_at_beginning)


def init_state(cfg: FilterConfig, dtype=jnp.float32) -> VioState:
    """Zero-initialized state (identity orientation, empty window)."""
    C, L, N, D = cfg.max_clones, cfg.max_slam, cfg.num_cams, cfg.state_dim
    qid = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=dtype)
    z3 = jnp.zeros(3, dtype=dtype)
    return VioState(
        q=qid, p=z3, v=z3, bg=z3, ba=z3,
        q_fej=qid, p_fej=z3, v_fej=z3,
        clones_q=jnp.tile(qid, (C, 1)),
        clones_p=jnp.zeros((C, 3), dtype=dtype),
        clones_q_fej=jnp.tile(qid, (C, 1)),
        clones_p_fej=jnp.zeros((C, 3), dtype=dtype),
        clone_t=jnp.full((C,), -1.0, dtype=dtype),
        clone_valid=jnp.zeros((C,), dtype=bool),
        head=jnp.asarray(-1, dtype=jnp.int32),
        n_clones=jnp.asarray(0, dtype=jnp.int32),
        slam_p=jnp.zeros((L, 3), dtype=dtype),
        slam_p_fej=jnp.zeros((L, 3), dtype=dtype),
        slam_id=jnp.full((L,), -1, dtype=jnp.int32),
        slam_valid=jnp.zeros((L,), dtype=bool),
        slam_fail=jnp.zeros((L,), dtype=jnp.int32),
        slam_anchor_slot=jnp.zeros((L,), dtype=jnp.int32),
        slam_anchor_cam=jnp.zeros((L,), dtype=jnp.int32),
        calib_dt=jnp.zeros((), dtype=dtype),
        calib_ext_q=jnp.tile(qid, (N, 1)),
        calib_ext_p=jnp.zeros((N, 3), dtype=dtype),
        calib_intr=jnp.zeros((N, 8), dtype=dtype),
        # identity packing depends on the triangular layout (State::Dm):
        # kalibr lower-tri [D00,D10,D20,D11,D21,D22], rpng upper-tri
        # [D00,D01,D11,D02,D12,D22]
        imu_dw=jnp.asarray([1.0, 0.0, 1.0, 0.0, 0.0, 1.0]
                           if cfg.imu_model == "rpng"
                           else [1.0, 0.0, 0.0, 1.0, 0.0, 1.0], dtype=dtype),
        imu_da=jnp.asarray([1.0, 0.0, 1.0, 0.0, 0.0, 1.0]
                           if cfg.imu_model == "rpng"
                           else [1.0, 0.0, 0.0, 1.0, 0.0, 1.0], dtype=dtype),
        imu_tg=jnp.zeros((9,), dtype=dtype),
        imu_q_gyro=qid,
        imu_q_acc=qid,
        cov=jnp.zeros((D, D), dtype=dtype),
        t=jnp.asarray(0.0, dtype=dtype),
        t_init=jnp.asarray(0.0, dtype=dtype),
        moved=jnp.asarray(False),
    )


def oldest_slot(state: VioState, cfg: FilterConfig):
    """Ring-buffer slot of the oldest clone (the marginalization target).

    Equivalent to State::margtimestep (State.h:66-75) under the ring layout:
    slots are filled head+1 mod C, so when the window is full the oldest is
    the slot after head.
    """
    C = cfg.max_clones
    return jnp.where(
        state.n_clones < C,
        # not full: slot 0 holds the oldest (we fill 0,1,2,... initially)
        (state.head - state.n_clones + 1) % C,
        (state.head + 1) % C,
    )


def next_slot(state: VioState, cfg: FilterConfig):
    """Slot the next clone will occupy."""
    return (state.head + 1) % cfg.max_clones


def clone_age_order(state: VioState, cfg: FilterConfig):
    """Slots ordered newest-first: [head, head-1, ...] mod C."""
    C = cfg.max_clones
    return (state.head - jnp.arange(C, dtype=jnp.int32)) % C


# ---------------------------------------------------------------------------
# boxplus: apply an error-state correction dx [D] to the value state.
# Mirrors Type::update for each block (JPLQuat.h:28-192 left-quat boxplus,
# Vec += , PoseJPL combined, IMU.h:78-95).
# ---------------------------------------------------------------------------


def _quat_boxplus(q, dth):
    """JPL left-multiplicative update: q_new = [0.5 dθ, 1] ⊗ q (normalized)."""
    dq = jnp.concatenate([0.5 * dth, jnp.ones_like(dth[..., :1])], axis=-1)
    dq = dq / jnp.linalg.norm(dq, axis=-1, keepdims=True)
    # quat_multiply for batched
    qv, q4 = dq[..., :3], dq[..., 3:4]
    pv, p4 = q[..., :3], q[..., 3:4]
    vec = q4 * pv + p4 * qv - jnp.cross(qv, pv)
    sca = q4 * p4 - jnp.sum(qv * pv, axis=-1, keepdims=True)
    out = jnp.concatenate([vec, sca], axis=-1)
    out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
    return jnp.where(out[..., 3:4] < 0, -out, out)


def boxplus(state: VioState, cfg: FilterConfig, dx: jax.Array) -> VioState:
    """Apply error update dx (shape [D]) to all value blocks."""
    C, L, N = cfg.max_clones, cfg.max_slam, cfg.num_cams
    q = _quat_boxplus(state.q, dx[cfg.th_off : cfg.th_off + 3])
    p = state.p + dx[cfg.p_off : cfg.p_off + 3]
    v = state.v + dx[cfg.v_off : cfg.v_off + 3]
    bg = state.bg + dx[cfg.bg_off : cfg.bg_off + 3]
    ba = state.ba + dx[cfg.ba_off : cfg.ba_off + 3]

    dclone = dx[cfg.clones_off : cfg.clones_off + 6 * C].reshape(C, 6)
    live = state.clone_valid[:, None]
    clones_q = jnp.where(
        live, _quat_boxplus(state.clones_q, dclone[:, :3]), state.clones_q
    )
    clones_p = jnp.where(live, state.clones_p + dclone[:, 3:], state.clones_p)

    dslam = dx[cfg.slam_off : cfg.slam_off + 3 * L].reshape(L, 3)
    slam_p = jnp.where(state.slam_valid[:, None], state.slam_p + dslam, state.slam_p)

    calib_dt = state.calib_dt + dx[cfg.calib_dt_off]
    dext = dx[cfg.calib_ext_off : cfg.calib_ext_off + 6 * N].reshape(N, 6)
    calib_ext_q = _quat_boxplus(state.calib_ext_q, dext[:, :3])
    calib_ext_p = state.calib_ext_p + dext[:, 3:]
    dintr = dx[cfg.calib_intr_off : cfg.calib_intr_off + 8 * N].reshape(N, 8)
    calib_intr = state.calib_intr + dintr

    imu_dw = state.imu_dw + dx[cfg.imu_dw_off : cfg.imu_dw_off + 6]
    imu_da = state.imu_da + dx[cfg.imu_da_off : cfg.imu_da_off + 6]
    imu_tg = state.imu_tg + dx[cfg.imu_tg_off : cfg.imu_tg_off + 9]
    # the thw slot corrects whichever sensor-frame rotation the model
    # estimates (kalibr: R_GYROtoIMU; rpng: R_ACCtoIMU — StateOptions.h:62-65)
    dthw = dx[cfg.imu_thw_off : cfg.imu_thw_off + 3]
    if cfg.imu_model == "rpng":
        imu_q_gyro = state.imu_q_gyro
        imu_q_acc = _quat_boxplus(state.imu_q_acc, dthw)
    else:
        imu_q_gyro = _quat_boxplus(state.imu_q_gyro, dthw)
        imu_q_acc = state.imu_q_acc

    return state._replace(
        q=q, p=p, v=v, bg=bg, ba=ba,
        clones_q=clones_q, clones_p=clones_p,
        slam_p=slam_p,
        calib_dt=calib_dt,
        calib_ext_q=calib_ext_q, calib_ext_p=calib_ext_p, calib_intr=calib_intr,
        imu_dw=imu_dw, imu_da=imu_da, imu_tg=imu_tg, imu_q_gyro=imu_q_gyro,
        imu_q_acc=imu_q_acc,
    )
