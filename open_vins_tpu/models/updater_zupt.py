"""Zero-velocity update (ZUPT).

Capability parity with ov_msckf::UpdaterZeroVelocity
(UpdaterZeroVelocity.cpp:58-329): a 6-rows-per-IMU-sample residual
[ŵ ; â − R_GtoI g] whitened by √dt/σ, bias random-walk covariance inflation
over the frame gap, chi-squared + velocity-magnitude + image-disparity
gating, and a direct EKF update with no cloning when the platform is
detected stationary.

TPU-first notes: the per-sample loop is a vmap over the fixed IMU window;
the accept/reject decision drives a `lax.cond` in the manager so the whole
frame step remains one jit program.  On an accepted ZUPT the camera frame's
measurements are dropped (the reference keeps them keyed by timestamp; our
clone-slot-indexed table has no clone for a skipped frame — stationary
frames carry ~zero parallax, so the information loss is negligible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_vins_tpu.core import ekf
from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import VioState
from open_vins_tpu.models import feature_table as _ft
from open_vins_tpu.models.propagator import ImuWindow
from open_vins_tpu.ops import lie

# Thresholds live on FilterConfig (zupt_* fields, parsed from the same yaml
# keys the reference exposes per dataset: zupt_noise_multiplier,
# zupt_max_velocity, zupt_max_disparity, zupt_chi2_multipler).


def build_system(state: VioState, cfg: FilterConfig, win: ImuWindow):
    """Stacked whitened ZUPT system (H [6K, D], res [6K], mask).

    Mirrors UpdaterZeroVelocity.cpp:136-180 (direct accel constraint).
    """
    D = cfg.state_dim
    dtype = state.cov.dtype
    gravity = jnp.asarray([0.0, 0.0, cfg.gravity_mag], dtype=dtype)
    R_fej = lie.quat_2_rot(state.q_fej if cfg.use_fej else state.q)
    K = win.t.shape[0] - 1

    def per_sample(i):
        dt = jnp.maximum(win.t[i + 1] - win.t[i], 0.0)
        valid = dt > 0
        sdt = jnp.sqrt(jnp.maximum(dt, 1e-12))
        w_omega = sdt / cfg.sigma_w
        w_accel = sdt / cfg.sigma_a
        # bias + IMU-intrinsic corrected (the reference leaves the intrinsic
        # Jacobian columns as a TODO in the ZUPT, UpdaterZeroVelocity.cpp:136)
        from open_vins_tpu.models.propagator import correct_imu

        w_hat, a_hat, _, _ = correct_imu(state, win.w[i], win.a[i],
                                         model=cfg.imu_model)
        res_w = -w_omega * w_hat
        res_a = -w_accel * (a_hat - lie.quat_2_rot(state.q) @ gravity)
        Hrow = jnp.zeros((6, D), dtype=dtype)
        Hrow = Hrow.at[0:3, cfg.bg_off : cfg.bg_off + 3].set(
            -w_omega * jnp.eye(3, dtype=dtype)
        )
        Hrow = Hrow.at[3:6, cfg.th_off : cfg.th_off + 3].set(
            -w_accel * lie.skew(R_fej @ gravity)
        )
        Hrow = Hrow.at[3:6, cfg.ba_off : cfg.ba_off + 3].set(
            -w_accel * jnp.eye(3, dtype=dtype)
        )
        w = valid.astype(dtype)
        return Hrow * w, jnp.concatenate([res_w, res_a]) * w, jnp.repeat(valid, 6)

    H, res, mask = jax.vmap(per_sample)(jnp.arange(K))
    return H.reshape(6 * K, D), res.reshape(6 * K), mask.reshape(6 * K)


def try_zupt(state: VioState, cfg: FilterConfig, win: ImuWindow, t_new,
             disparity):
    """Attempt a zero-velocity update.  Returns (new_state, accepted).

    Gates (UpdaterZeroVelocity.cpp:198-247): chi2 on the ZUPT system,
    velocity magnitude, and average image disparity.  On accept: inflate
    bias covariance by the random walk over the gap and update — no clone.
    """
    D = cfg.state_dim
    dtype = state.cov.dtype
    H, res, mask = build_system(state, cfg, win)

    dt_summed = jnp.maximum(win.t[-1] - win.t[0], 0.0)
    # bias random-walk inflation Q_bias (…:192-204)
    q_diag = jnp.zeros((D,), dtype=dtype)
    q_diag = q_diag.at[cfg.bg_off : cfg.bg_off + 3].set(dt_summed * cfg.sigma_wb**2)
    q_diag = q_diag.at[cfg.ba_off : cfg.ba_off + 3].set(dt_summed * cfg.sigma_ab**2)
    cov_inflated = state.cov + jnp.diag(q_diag)
    st_infl = state._replace(cov=cov_inflated)

    # chi2 + update share ONE push-through solve on the static {θ, bg, ba}
    # support (k=9 instead of the 6K-row S): whiten by the noise
    # multiplier, then γ and (dx, P⁺) come out of the same k×k LU
    # (invalid-sample rows are exact zeros from build_system — no-ops).
    r_mult = jnp.asarray(cfg.zupt_noise_multiplier, dtype=dtype)
    inv_sq = jax.lax.rsqrt(r_mult)
    sup = ((cfg.th_off, cfg.th_off + 3), (cfg.bg_off, cfg.ba_off + 3))
    dx, cov_up, gamma = ekf.kalman_update_math_info(
        cov_inflated, H * inv_sq, jnp.where(mask, res, 0.0) * inv_sq, sup,
        return_gamma=True)
    dof = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    if cfg.zupt_chi2_multiplier > 0:
        chi2_ok = jnp.isfinite(gamma) & (
            gamma < ekf.chi2_gate(dof) * cfg.zupt_chi2_multiplier
        )
    else:  # reference: multiplier 0 skips the chi2 gate (disparity decides)
        chi2_ok = jnp.asarray(True)
    vel_ok = jnp.linalg.norm(state.v) < cfg.zupt_max_velocity
    disp_ok = disparity < cfg.zupt_max_disparity
    accepted = chi2_ok & vel_ok & disp_ok
    if cfg.zupt_only_at_beginning:
        accepted = accepted & (~state.moved)

    new_state = ekf.boxplus(st_infl, cfg, dx)._replace(cov=cov_up)
    new_state = new_state._replace(t=jnp.asarray(t_new, dtype=dtype))
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accepted, a, b), new_state, state
    )
    # a rejected attempt means the platform moved (reference sets
    # last_zupt_state_timestamp tracking; gates zupt_only_at_beginning)
    out = out._replace(moved=out.moved | (~accepted))
    return out, accepted


def try_zupt_explicit(state: VioState, cfg: FilterConfig, win: ImuWindow,
                      t_new, disparity):
    """Two-clone explicit zero-motion variant
    (UpdaterZeroVelocity.cpp:279-324, explicitly_enforce_zero_motion=true):
    instead of constraining the raw IMU measurements, propagate to the frame
    time and constrain the new pose to equal the previous clone (orientation
    and position) with zero velocity, using the reference's fixed noise
    (sigma_ori 1e-2 rad, sigma_pos 1e-1 m, sigma_vel 1e-1 m/s).

    The reference clones at t_new, updates [q0 p0 | q1 p1 v], then
    marginalizes the fresh clone.  A just-created clone is a perfect copy of
    (and perfectly correlated with) the IMU pose, so updating the clone and
    marginalizing it is algebraically identical to updating the IMU pose
    columns directly — which is what we do: no ring-slot churn, one dense
    update.  Gates are shared with the direct variant.
    """
    from open_vins_tpu.models.propagator import propagate
    from open_vins_tpu.ops.indexing import take1

    D = cfg.state_dim
    dtype = state.cov.dtype

    # shared gating on the direct whitened system (…:198-247) — push-through
    # form on the k=9 static support instead of the 6K-row S solve
    H_g, res_g, mask_g = build_system(state, cfg, win)
    r_mult = jnp.asarray(cfg.zupt_noise_multiplier, dtype=dtype)
    inv_sq = jax.lax.rsqrt(r_mult)
    sup_g = ((cfg.th_off, cfg.th_off + 3), (cfg.bg_off, cfg.ba_off + 3))
    gamma = ekf.chi2_gamma_info(state.cov, H_g * inv_sq, res_g * inv_sq,
                                sup_g)
    dof = jnp.maximum(jnp.sum(mask_g.astype(jnp.int32)), 1)
    if cfg.zupt_chi2_multiplier > 0:
        chi2_ok = jnp.isfinite(gamma) & (
            gamma < ekf.chi2_gate(dof) * cfg.zupt_chi2_multiplier
        )
    else:
        chi2_ok = jnp.asarray(True)
    vel_ok = jnp.linalg.norm(state.v) < cfg.zupt_max_velocity
    disp_ok = disparity < cfg.zupt_max_disparity
    accepted = chi2_ok & vel_ok & disp_ok & (state.n_clones > 0)
    if cfg.zupt_only_at_beginning:
        accepted = accepted & (~state.moved)

    # propagate mean+covariance to the frame time, then zero-motion update
    st_p = propagate(state, cfg, win, t_new)
    q0 = take1(state.clones_q, state.head)
    q0_fej = take1(state.clones_q_fej, state.head)
    p0 = take1(state.clones_p, state.head)
    R0 = lie.quat_2_rot(q0)
    R0_fej = lie.quat_2_rot(q0_fej if cfg.use_fej else q0)
    R1 = lie.quat_2_rot(st_p.q)

    res = jnp.concatenate([
        lie.log_so3(R0 @ R1.T),
        p0 - st_p.p,
        -st_p.v,
    ]).astype(dtype)

    eye3 = jnp.eye(3, dtype=dtype)
    H = jnp.zeros((9, D), dtype=dtype)
    H = H.at[0:3, cfg.th_off:cfg.th_off + 3].set(-R0_fej)
    H = H.at[3:6, cfg.p_off:cfg.p_off + 3].set(eye3)
    H = H.at[6:9, cfg.v_off:cfg.v_off + 3].set(eye3)
    # previous-clone columns at a traced slot: unrolled static placement
    for s in range(cfg.max_clones):
        off = cfg.clone_off(s)
        Hs = (H.at[0:3, off:off + 3].set(eye3)
               .at[3:6, off + 3:off + 6].set(-eye3))
        H = jnp.where(state.head == s, Hs, H)

    r_diag = jnp.concatenate([
        jnp.full((3,), 1e-2**2, dtype=dtype),
        jnp.full((6,), 1e-1**2, dtype=dtype),
    ])
    new_state = ekf.ekf_update(st_p, cfg, H, res, r_diag)
    new_state = new_state._replace(t=jnp.asarray(t_new, dtype=dtype))
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(accepted, a, b), new_state, state
    )
    out = out._replace(moved=out.moved | (~accepted))
    return out, accepted


def frame_disparity(table, cfg: FilterConfig, head_slot, ids, uv, meas_mask):
    """Average pixel disparity between the incoming frame and the previous
    frame's observations (FeatureHelper::compute_disparity parity,
    FeatureHelper.h:60-123)."""
    from open_vins_tpu.ops.indexing import take1

    total = jnp.zeros(())
    count = jnp.zeros(())
    for cam in range(cfg.num_cams):
        cam_ids = ids[cam]
        eq = table.ids[:, None] == cam_ids[None, :]  # [T, P]
        row = jnp.argmax(eq, axis=0)
        has = jnp.any(eq, axis=0) & meas_mask[cam] & (cam_ids >= 0)
        # row gather on the big table dim, then a gather-free head lookup
        prev_uv = take1(jnp.swapaxes(table.uv[row, :, cam], 0, 1), head_slot)
        prev_ok = _ft.obs_bit(table, row, head_slot, cam)
        d = jnp.linalg.norm(uv[cam] - prev_uv, axis=-1)
        ok = has & prev_ok
        total = total + jnp.sum(jnp.where(ok, d, 0.0))
        count = count + jnp.sum(ok.astype(d.dtype))
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 1e9)
