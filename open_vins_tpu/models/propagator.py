"""IMU state-mean + covariance propagation as a `lax.scan` kernel.

Capability parity with ov_msckf::Propagator (Propagator.{h,cpp}): per-sample
mean integration, error-state transition Φ and discrete noise Qd composed
across the whole camera interval and applied to the covariance once
(Propagator::propagate_and_clone:71-130, predict_and_compute:395-480,
compute_F_and_G_discrete:830-963).

TPU-first design: the host (or simulator driver) hands a fixed-size window of
IMU samples [K,7] whose unused tail repeats the last sample (dt=0 ⇒ Φ=I,
Qd=0, so padding needs no masks), including boundary-interpolated first/last
samples (select_imu_readings/interpolate_data parity, Propagator.cpp:269-393
done host-side).  The scan composes (mean, Φ, Qd) in registers; the single
covariance touch afterwards is the only O(D²) work.

State error convention (JPL left error, [δθ δp δv δbg δba]):
    q = [δθ/2, 1] ⊗ q̂ ,  R_GtoI = (I - ⌊δθ⌋) R̂_GtoI
Discrete model for one interval dt with bias-corrected (ŵ, â):
    δθ' = Rw δθ - Rw Jl(ŵdt) dt (δbg + n_g)       Rw = exp_so3(-ŵ dt)
    δp' = δp + δv dt - 0.5 dt² R̂_ItoG ⌊â⌋ δθ - 0.5 dt² R̂_ItoG (δba + n_a)
    δv' = δv - dt R̂_ItoG ⌊â⌋ δθ - dt R̂_ItoG (δba + n_a)
    δb'  = δb + n_w
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.core.ekf import propagate_covariance
from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import VioState
from open_vins_tpu.ops import lie


class ImuWindow(NamedTuple):
    """Fixed-size per-frame IMU packet (padded by repeating the last row)."""

    t: jax.Array  # [K] relative times, non-decreasing
    w: jax.Array  # [K, 3] gyro
    a: jax.Array  # [K, 3] accel


def _lower_tri(d6):
    """6-vector -> lower-triangular 3x3 (State::Dm KALIBR layout)."""
    return jnp.asarray(
        [
            [d6[0], 0.0, 0.0],
            [d6[1], d6[3], 0.0],
            [d6[2], d6[4], d6[5]],
        ],
        dtype=d6.dtype,
    )


def _upper_tri(d6):
    """6-vector -> upper-triangular 3x3 (State::Dm RPNG layout,
    State.h:91-102: D = [[d0,d1,d3],[0,d2,d4],[0,0,d5]])."""
    return jnp.asarray(
        [
            [d6[0], d6[1], d6[3]],
            [0.0, d6[2], d6[4]],
            [0.0, 0.0, d6[5]],
        ],
        dtype=d6.dtype,
    )


def imu_intrinsic_mats(state: VioState, model="kalibr", R_w=None, R_a=None):
    """(Dw, Da, Tg, R_w, R_a): the IMU-intrinsic correction matrices
    (State::Dm / State::Tg parity, State.h:91-116).  `model` selects the
    triangular layout of Dw/Da ("kalibr" lower, "rpng" upper); both sensor
    rotations are always applied — the model decides which one the thw
    error slot estimates (the other stays at its yaml-seeded value).

    `R_w`/`R_a` may be passed in when the caller already converted the
    quaternions — `propagate` batches its scalar quat→rot conversions
    (q, q_fej, imu_q_gyro, imu_q_acc) into ONE call: each scalar
    conversion lowers to a 9-element scalar dependency chain that stalls
    the TPU vector units (~7 us of attributed idle per site on the v5e
    gap profile)."""
    tri = _upper_tri if model == "rpng" else _lower_tri
    Dw = tri(state.imu_dw)
    Da = tri(state.imu_da)
    Tg = state.imu_tg.reshape(3, 3).T  # column-major storage
    if R_w is None:
        R_w = lie.quat_2_rot(state.imu_q_gyro)  # GYROtoIMU
    if R_a is None:
        R_a = lie.quat_2_rot(state.imu_q_acc)  # ACCtoIMU
    return Dw, Da, Tg, R_w, R_a


def correct_imu(state: VioState, w_m, a_m, mats=None, model="kalibr"):
    """Apply biases + IMU intrinsics to raw measurements.

    Reference model (Propagator.cpp:184-190):
        â = R_a Da (a_m − ba),   ŵ = R_w Dw (w_m − bg − Tg â)
    Returns (ŵ, â, u_w, u_a) where u_w/u_a are the pre-scale vectors needed
    by the intrinsic Jacobians H_Dw/H_Da.  `mats`: precomputed
    imu_intrinsic_mats (hoists the quat→rot conversions out of per-sample
    vmaps)."""
    Dw, Da, Tg, R_w, R_a = (imu_intrinsic_mats(state, model)
                            if mats is None else mats)
    u_a = a_m - state.ba
    a_hat = R_a @ (Da @ u_a)
    u_w = w_m - state.bg - Tg @ a_hat
    w_hat = R_w @ (Dw @ u_w)
    return w_hat, a_hat, u_w, u_a


def _H_scale6(u, model="kalibr"):
    """∂(tri(d) u)/∂d : [3,6] (compute_H_Dw/H_Da parity,
    Propagator.cpp:964-1002 — kalibr lower-tri / rpng upper-tri layouts)."""
    z = jnp.zeros((), dtype=u.dtype)
    if model == "rpng":
        return jnp.asarray(
            [
                [u[0], u[1], z, u[2], z, z],
                [z, z, u[1], z, u[2], z],
                [z, z, z, z, z, u[2]],
            ],
            dtype=u.dtype,
        )
    return jnp.asarray(
        [
            [u[0], z, z, z, z, z],
            [z, u[0], z, u[1], z, z],
            [z, z, u[0], z, u[1], u[2]],
        ],
        dtype=u.dtype,
    )


def _H_tg(a):
    """∂(Tg a)/∂tg (column-major tg): [3,9] (compute_H_Tg parity)."""
    z = jnp.zeros((), dtype=a.dtype)
    return jnp.asarray(
        [
            [a[0], z, z, a[1], z, z, a[2], z, z],
            [z, a[0], z, z, a[1], z, z, a[2], z],
            [z, z, a[0], z, z, a[1], z, z, a[2]],
        ],
        dtype=a.dtype,
    )


def _step_mean_midpoint(q, p, v, bg, ba, w1, a1, w2, a2, dt, gravity):
    """Midpoint/trapezoid mean integration (the 'discrete' option)."""
    w_hat = 0.5 * (w1 + w2) - bg
    a1h = a1 - ba
    a2h = a2 - ba
    dq = lie.axis_angle_2_quat(-w_hat * dt)
    q_new = lie.quat_multiply(dq, q)
    R_ItoG_1 = lie.quat_2_rot(q).T
    R_ItoG_2 = lie.quat_2_rot(q_new).T
    acc1 = R_ItoG_1 @ a1h - gravity
    acc2 = R_ItoG_2 @ a2h - gravity
    v_new = v + 0.5 * (acc1 + acc2) * dt
    p_new = p + v * dt + 0.5 * acc1 * dt * dt
    return q_new, p_new, v_new, w_hat, 0.5 * (a1h + a2h)


def _step_mean_rk4(q, p, v, bg, ba, w1, a1, w2, a2, dt, gravity):
    """Classic RK4 mean integration with linearly-interpolated IMU inputs
    (Propagator::predict_mean_rk4 parity, Propagator.cpp:507-587).

    The quaternion is integrated in R⁴ via q̇ = ½ Ω(ω) q and renormalized
    (the reference does the same)."""
    w1h, w2h = w1 - bg, w2 - bg
    a1h, a2h = a1 - ba, a2 - ba
    wm = 0.5 * (w1h + w2h)
    am = 0.5 * (a1h + a2h)

    def deriv(qk, pk, vk, w, a):
        qd = 0.5 * (lie.Omega(w) @ qk)
        Rt = lie.quat_2_rot(qk / jnp.linalg.norm(qk)).T
        vd = Rt @ a - gravity
        return qd, vk, vd

    k1q, k1p, k1v = deriv(q, p, v, w1h, a1h)
    k2q, k2p, k2v = deriv(q + 0.5 * dt * k1q, p + 0.5 * dt * k1p,
                          v + 0.5 * dt * k1v, wm, am)
    k3q, k3p, k3v = deriv(q + 0.5 * dt * k2q, p + 0.5 * dt * k2p,
                          v + 0.5 * dt * k2v, wm, am)
    k4q, k4p, k4v = deriv(q + dt * k3q, p + dt * k3p, v + dt * k3v, w2h, a2h)

    q_new = q + dt / 6.0 * (k1q + 2 * k2q + 2 * k3q + k4q)
    q_new = lie.quat_norm(q_new)
    p_new = p + dt / 6.0 * (k1p + 2 * k2p + 2 * k3p + k4p)
    v_new = v + dt / 6.0 * (k1v + 2 * k2v + 2 * k3v + k4v)
    return q_new, p_new, v_new, wm, am


def _step_mean(q, p, v, bg, ba, w1, a1, w2, a2, dt, gravity,
               integration="rk4"):
    if integration == "rk4":
        return _step_mean_rk4(q, p, v, bg, ba, w1, a1, w2, a2, dt, gravity)
    return _step_mean_midpoint(q, p, v, bg, ba, w1, a1, w2, a2, dt, gravity)


# ---------------------------------------------------------------------------
# ACI² analytic integration (Propagator::compute_Xi_sum /
# predict_mean_analytic / compute_F_and_G_analytic, Propagator.cpp:588-829):
# closed-form integrals of the constant-(ω, a) motion over one interval.
# ---------------------------------------------------------------------------


def _xi_sum(w_hat, a_hat, dt, dtype):
    """(R_ktok1, Ξ₁, Ξ₂, Jr_ktok1, Ξ₃, Ξ₄) — the analytic integration
    components (compute_Xi_sum parity, Propagator.cpp:588-668).

    Ξ₁ = ∫ exp(ωτ)ᵀ dτ,  Ξ₂ = ∬ exp(ωτ)ᵀ,  Ξ₃/Ξ₄ their ∂/∂ω contractions.
    Both the constant-ω series and the small-ω limit are evaluated and
    selected with jnp.where (denominators clamped so the unselected branch
    never produces NaN under jit).
    """
    I3 = jnp.eye(3, dtype=dtype)
    w_norm = jnp.linalg.norm(w_hat)
    small = w_norm < (jnp.pi / 360.0)  # 1.0/180*pi/2 (reference threshold)
    wn = jnp.maximum(w_norm, 1e-12)
    k_hat = w_hat / wn
    d_th = w_norm * dt
    d_t2, d_t3 = dt * dt, dt * dt * dt
    wn2, wn3 = wn * wn, wn * wn * wn
    cos_dth, sin_dth = jnp.cos(d_th), jnp.sin(d_th)
    d_th2, d_th3 = d_th * d_th, d_th * d_th * d_th
    sK = lie.skew(k_hat)
    sK2 = sK @ sK
    sA = lie.skew(a_hat)
    ka = jnp.dot(k_hat, a_hat)

    R_ktok1 = lie.exp_so3(-w_hat * dt)
    Jr_ktok1 = lie.Jr_so3(-w_hat * dt)

    # constant-omega closed forms (Propagator.cpp:620-640)
    Xi1_big = I3 * dt + (1.0 - cos_dth) / wn * sK + (dt - sin_dth / wn) * sK2
    Xi2_big = (0.5 * d_t2 * I3 + (d_th - sin_dth) / wn2 * sK
               + (0.5 * d_t2 - (1.0 - cos_dth) / wn2) * sK2)
    Xi3_big = (0.5 * d_t2 * sA
               + (sin_dth - d_th) / wn2 * (sA @ sK)
               + (sin_dth - d_th * cos_dth) / wn2 * (sK @ sA)
               + (0.5 * d_t2 - (1.0 - cos_dth) / wn2) * (sA @ sK2)
               + (0.5 * d_t2 + (1.0 - cos_dth - d_th * sin_dth) / wn2)
               * (sK2 @ sA + ka * sK)
               - (3.0 * sin_dth - 2.0 * d_th - d_th * cos_dth) / wn2
               * ka * sK2)
    Xi4_big = (d_t3 / 6.0 * sA
               + (2.0 * (1.0 - cos_dth) - d_th2) / (2.0 * wn3) * (sA @ sK)
               + (2.0 * (1.0 - cos_dth) - d_th * sin_dth) / wn3 * (sK @ sA)
               + ((sin_dth - d_th) / wn3 + d_t3 / 6.0) * (sA @ sK2)
               + (d_th - 2.0 * sin_dth + d_th3 / 6.0 + d_th * cos_dth) / wn3
               * (sK2 @ sA + ka * sK)
               + (4.0 * cos_dth - 4.0 + d_th2 + d_th * sin_dth) / wn3
               * ka * sK2)

    # small-omega limits (Propagator.cpp:642-656)
    Xi1_small = dt * (I3 + sin_dth * sK + (1.0 - cos_dth) * sK2)
    Xi2_small = 0.5 * dt * Xi1_small
    Xi3_small = 0.5 * d_t2 * (
        sA + sin_dth * (-(sA @ sK) + sK @ sA + ka * sK2)
        + (1.0 - cos_dth) * (sA @ sK2 + sK2 @ sA + ka * sK))
    Xi4_small = dt / 3.0 * Xi3_small

    Xi1 = jnp.where(small, Xi1_small, Xi1_big)
    Xi2 = jnp.where(small, Xi2_small, Xi2_big)
    Xi3 = jnp.where(small, Xi3_small, Xi3_big)
    Xi4 = jnp.where(small, Xi4_small, Xi4_big)
    return R_ktok1, Xi1, Xi2, Jr_ktok1, Xi3, Xi4


def _step_mean_analytic(q, p, v, xi, a_hat, dt, gravity):
    """Analytic mean (predict_mean_analytic parity, Propagator.cpp:670-687)."""
    R_ktok1, Xi1, Xi2, *_ = xi
    R_GtoI_T = lie.quat_2_rot(q).T
    q_new = lie.quat_multiply(lie.rot_2_quat(R_ktok1), q)
    v_new = v + R_GtoI_T @ (Xi1 @ a_hat) - gravity * dt
    p_new = p + v * dt + R_GtoI_T @ (Xi2 @ a_hat) - 0.5 * gravity * dt * dt
    return q_new, p_new, v_new


def _analytic_precompute(state: VioState, cfg: FilterConfig, win: ImuWindow,
                         dtype, mats=None):
    """Batched carry-independent prologue of the analytic propagation.

    Everything in the ACI² per-interval math that does not depend on the
    integrated state — bias/intrinsic sample correction, the Ξ-series
    (skews, exp/Jr, the full closed-form matrix soup of `_xi_sum`), the
    interval quaternion — is a function of (ω̂, â, dt) only, so it is
    computed for ALL window samples in one vmapped batch BEFORE the
    sequential scan.  Inside the unrolled scan these were ~30 scalar-
    assembled 3×3 builds per frame forming a serial dependency chain; the
    TPU gap profile attributed ~0.2 ms/frame of device idle to them.
    Returns per-interval (dts, w_hat, a_hat, u_wm, u_am, xis).
    """
    dts = jnp.maximum(win.t[1:] - win.t[:-1], 0.0)
    wc, ac, u_w, u_a = jax.vmap(lambda w, a: correct_imu(state, w, a, mats))(
        win.w, win.a)
    w_hat = 0.5 * (wc[:-1] + wc[1:])
    a_hat = 0.5 * (ac[:-1] + ac[1:])
    u_wm = 0.5 * (u_w[:-1] + u_w[1:])
    u_am = 0.5 * (u_a[:-1] + u_a[1:])
    xis = jax.vmap(lambda w, a, dt: _xi_sum(w, a, dt, dtype))(
        w_hat, a_hat, dts)
    return dts, w_hat, a_hat, u_wm, u_am, xis


def _phi_qd_analytic(lin, new, gravity, dt, cfg: FilterConfig, dtype, aux, xi):
    """Analytic Φ/B/Qd (compute_F_and_G_analytic parity,
    Propagator.cpp:694-829, both IMU models — kalibr estimates the gyro
    frame, rpng the accel frame; the non-estimated rotation rides along as
    a constant factor).

    Shares the FEJ integrated-displacement θ-columns with the discrete form;
    the bias/noise columns use the closed-form Ξ integrals instead of the
    first-order dt/dt² factors.
    """
    R_k, p_lin, v_lin = lin    # rotations passed directly (carried through
    R_new, p_new, v_new = new  # the scan; see _analytic_precompute)
    Dw, Da, Tg, R_w, R_a, w_hat, a_hat, u_w, u_a = aux
    _, Xi1, Xi2, Jr_ktok1, Xi3, Xi4 = xi
    RwDw = R_w @ Dw
    RwDwTg = RwDw @ Tg
    RaDa = R_a @ Da

    R_kT = R_k.T
    dR = R_new @ R_kT
    dRJr = dR @ Jr_ktok1 * dt  # dR_ktok1 · Jr(−ω dt) · dt

    I3 = jnp.eye(3, dtype=dtype)
    Z = jnp.zeros((3, 3), dtype=dtype)
    Fp_th = -lie.skew(p_new - p_lin - v_lin * dt + 0.5 * gravity * dt * dt) @ R_kT
    Fv_th = -lie.skew(v_new - v_lin + gravity * dt) @ R_kT

    Fth_bg = -dRJr @ RwDw
    Fp_bg = R_kT @ Xi4 @ RwDw
    Fv_bg = R_kT @ Xi3 @ RwDw
    Fth_ba = dRJr @ RwDwTg @ RaDa
    Fp_ba = -R_kT @ (Xi2 + Xi4 @ RwDwTg) @ RaDa
    Fv_ba = -R_kT @ (Xi1 + Xi3 @ RwDwTg) @ RaDa

    F_th = [dR, Z, Z, Fth_bg, Fth_ba]
    F_p = [Fp_th, I3, I3 * dt, Fp_bg, Fp_ba]
    F_v = [Fv_th, Z, I3, Fv_bg, Fv_ba]
    F_bg = [Z, Z, Z, I3, Z]
    F_ba = [Z, Z, Z, Z, I3]
    Phi = jnp.block([F_th, F_p, F_v, F_bg, F_ba])

    # intrinsic columns B [15, 24] over [dw(6) da(6) tg(9) thw(3)] — the
    # thw columns are ∂/∂R_GYROtoIMU (kalibr, Propagator.cpp:803-808) or
    # ∂/∂R_ACCtoIMU (rpng, Propagator.cpp:794-800)
    B = jnp.zeros((15, 24), dtype=dtype)
    model = cfg.imu_model
    if cfg.calib_imu_intrinsics:
        H_Dw = R_w @ _H_scale6(u_w, model)
        H_Da = R_a @ _H_scale6(u_a, model)
        B = B.at[0:3, 0:6].set(dRJr @ H_Dw)
        B = B.at[3:6, 0:6].set(-R_kT @ Xi4 @ H_Dw)
        B = B.at[6:9, 0:6].set(-R_kT @ Xi3 @ H_Dw)
        B = B.at[0:3, 6:12].set(-dRJr @ RwDwTg @ H_Da)
        B = B.at[3:6, 6:12].set(R_kT @ (Xi2 + Xi4 @ RwDwTg) @ H_Da)
        B = B.at[6:9, 6:12].set(R_kT @ (Xi1 + Xi3 @ RwDwTg) @ H_Da)
        if model == "rpng":
            sA = lie.skew(a_hat)
            B = B.at[0:3, 21:24].set(-dRJr @ RwDwTg @ sA)
            B = B.at[3:6, 21:24].set(R_kT @ (Xi2 + Xi4 @ RwDwTg) @ sA)
            B = B.at[6:9, 21:24].set(R_kT @ (Xi1 + Xi3 @ RwDwTg) @ sA)
        else:
            sW = lie.skew(w_hat)
            B = B.at[0:3, 21:24].set(dRJr @ sW)
            B = B.at[3:6, 21:24].set(-R_kT @ Xi4 @ sW)
            B = B.at[6:9, 21:24].set(-R_kT @ Xi3 @ sW)
    if cfg.calib_imu_g_sensitivity:
        H_Tg = RwDw @ _H_tg(a_hat)
        B = B.at[0:3, 12:21].set(-dRJr @ H_Tg)
        B = B.at[3:6, 12:21].set(R_kT @ Xi4 @ H_Tg)
        B = B.at[6:9, 12:21].set(R_kT @ Xi3 @ H_Tg)

    # G [15,12] over [n_g n_a n_wg n_wa] (Propagator.cpp:816-827)
    G = jnp.zeros((15, 12), dtype=dtype)
    G = G.at[0:3, 0:3].set(Fth_bg)
    G = G.at[3:6, 0:3].set(Fp_bg)
    G = G.at[6:9, 0:3].set(Fv_bg)
    G = G.at[0:3, 3:6].set(Fth_ba)
    G = G.at[3:6, 3:6].set(Fp_ba)
    G = G.at[6:9, 3:6].set(Fv_ba)
    G = G.at[9:12, 6:9].set(I3 * dt)
    G = G.at[12:15, 9:12].set(I3 * dt)
    inv_dt = jnp.where(dt > 0, 1.0 / jnp.maximum(dt, 1e-12), 0.0)
    qc = jnp.concatenate(
        [
            jnp.full((3,), cfg.sigma_w**2, dtype=dtype),
            jnp.full((3,), cfg.sigma_a**2, dtype=dtype),
            jnp.full((3,), cfg.sigma_wb**2, dtype=dtype),
            jnp.full((3,), cfg.sigma_ab**2, dtype=dtype),
        ]
    ) * inv_dt
    Qd = (G * qc[None, :]) @ G.T
    return Phi, B, Qd


def _phi_qd(lin, new, gravity, dt, cfg: FilterConfig, dtype, aux):
    """Error-state Φ [15,15] and Qd [15,15] for one interval.

    Mirrors compute_F_and_G_discrete (Propagator.cpp:830-963) including the
    FEJ-consistent *integrated-displacement* rotation Jacobians
    (Propagator.cpp:899-910):
        F_pθ = -⌊ p_new - p_k - v_k dt + ½ g dt² ⌋ R_kᵀ
        F_vθ = -⌊ v_new - v_k + g dt ⌋ R_kᵀ
    with (R_k, p_k, v_k) taken at the linearization (first-estimate) values
    and (p_new, v_new, q_new) the freshly propagated mean — this form keeps
    the state-transition consistent with the unobservable subspace (yaw +
    global position), which the naive -½dt²R⌊â⌋ linearization destroys.
    """
    q_lin, p_lin, v_lin = lin
    q_new, p_new, v_new = new
    # intrinsic-corrected quantities for this interval (identity intrinsics
    # reduce every factor below to the plain model)
    Dw, Da, Tg, R_w, R_a, w_hat, a_hat, u_w, u_a = aux
    RwDw = R_w @ Dw
    RaDa = R_a @ Da

    R_k = lie.quat_2_rot(q_lin)  # GtoI at linearization point
    R_kT = R_k.T
    dR = lie.quat_2_rot(q_new) @ R_kT  # k -> k+1 rotation change
    Jr_dR = lie.Jr_so3(lie.log_so3(dR))
    dRJr = dR @ Jr_dR * dt

    I3 = jnp.eye(3, dtype=dtype)
    Z = jnp.zeros((3, 3), dtype=dtype)
    Fth_bg = -dRJr @ RwDw
    Fth_ba = dRJr @ (RwDw @ Tg @ RaDa)
    Fp_th = -lie.skew(p_new - p_lin - v_lin * dt + 0.5 * gravity * dt * dt) @ R_kT
    Fv_th = -lie.skew(v_new - v_lin + gravity * dt) @ R_kT
    RtDa = R_kT @ RaDa

    F_th = [dR, Z, Z, Fth_bg, Fth_ba]
    F_p = [Fp_th, I3, I3 * dt, Z, -0.5 * dt * dt * RtDa]
    F_v = [Fv_th, Z, I3, Z, -dt * RtDa]
    F_bg = [Z, Z, Z, I3, Z]
    F_ba = [Z, Z, Z, Z, I3]
    Phi = jnp.block([F_th, F_p, F_v, F_bg, F_ba])

    # intrinsic columns B [15, 24] over [dw(6) da(6) tg(9) thw(3)] — the thw
    # columns hold ∂/∂R_GYROtoIMU (kalibr) or ∂/∂R_ACCtoIMU (rpng)
    # (compute_F_and_G_discrete intrinsic blocks, Propagator.cpp:920-961);
    # built only when the blocks are estimated (static flags -> specialized)
    B = jnp.zeros((15, 24), dtype=dtype)
    model = cfg.imu_model
    if cfg.calib_imu_intrinsics:
        H_Da = _H_scale6(u_a, model)
        B = B.at[0:3, 0:6].set(dRJr @ R_w @ _H_scale6(u_w, model))
        B = B.at[0:3, 6:12].set(-dRJr @ (RwDw @ Tg @ R_a) @ H_Da)
        B = B.at[3:6, 6:12].set(0.5 * dt * dt * R_kT @ R_a @ H_Da)
        B = B.at[6:9, 6:12].set(dt * R_kT @ R_a @ H_Da)
        if model == "rpng":
            sA = lie.skew(a_hat)
            B = B.at[0:3, 21:24].set(-dRJr @ (RwDw @ Tg) @ sA)
            B = B.at[3:6, 21:24].set(0.5 * dt * dt * R_kT @ sA)
            B = B.at[6:9, 21:24].set(dt * R_kT @ sA)
        else:
            B = B.at[0:3, 21:24].set(dRJr @ lie.skew(w_hat))
    if cfg.calib_imu_g_sensitivity:
        B = B.at[0:3, 12:21].set(-dRJr @ RwDw @ _H_tg(a_hat))

    # G [15,12] over noise [n_g n_a n_wg n_wa]; Qc scaled for discrete time
    G = jnp.zeros((15, 12), dtype=dtype)
    G = G.at[0:3, 0:3].set(Fth_bg)
    G = G.at[0:3, 3:6].set(Fth_ba)
    G = G.at[3:6, 3:6].set(-0.5 * dt * dt * RtDa)
    G = G.at[6:9, 3:6].set(-dt * RtDa)
    G = G.at[9:12, 6:9].set(I3 * dt)
    G = G.at[12:15, 9:12].set(I3 * dt)
    inv_dt = jnp.where(dt > 0, 1.0 / jnp.maximum(dt, 1e-12), 0.0)
    qc = jnp.concatenate(
        [
            jnp.full((3,), cfg.sigma_w**2, dtype=dtype),
            jnp.full((3,), cfg.sigma_a**2, dtype=dtype),
            jnp.full((3,), cfg.sigma_wb**2, dtype=dtype),
            jnp.full((3,), cfg.sigma_ab**2, dtype=dtype),
        ]
    ) * inv_dt
    Qd = (G * qc[None, :]) @ G.T
    return Phi, B, Qd


def _compose_transitions(Phis, Bs, Qds):
    """Tree-reduce the interval transitions into the whole-window (Φ, B, Qd).

    The per-interval composition
        Φ' = Φ_k Φ,  B' = Φ_k B + B_k,  Qd' = Φ_k Qd Φ_kᵀ + Qd_k
    is ASSOCIATIVE (affine maps on the (mean, covariance) pair compose), so
    the K−1-step sequential chain — ~4 dependent 15×15 matmuls per interval
    on the jit critical path — becomes ⌈log₂(K−1)⌉ levels of *batched*
    matmuls.  Identity padding (Φ=I, B=0, Qd=0) is the same no-op convention
    the dt=0 rows already carry, so padding to a power of two is exact.

    Inputs [n,15,15] / [n,15,24] / [n,15,15] ordered oldest interval first.
    """
    n = Phis.shape[0]
    N = 1 << max(n - 1, 0).bit_length() if n > 1 else 1
    if N != n:
        pad = N - n
        I = jnp.broadcast_to(jnp.eye(15, dtype=Phis.dtype), (pad, 15, 15))
        Phis = jnp.concatenate([Phis, I])
        Bs = jnp.concatenate([Bs, jnp.zeros((pad,) + Bs.shape[1:], Bs.dtype)])
        Qds = jnp.concatenate([Qds, jnp.zeros((pad, 15, 15), Qds.dtype)])
    while N > 1:
        N //= 2
        Pe = Phis.reshape(N, 2, 15, 15)
        Be = Bs.reshape(N, 2, 15, Bs.shape[-1])
        Qe = Qds.reshape(N, 2, 15, 15)
        P0, P1 = Pe[:, 0], Pe[:, 1]  # 0 = earlier, 1 = later (applied after)
        B0, B1 = Be[:, 0], Be[:, 1]
        Q0, Q1 = Qe[:, 0], Qe[:, 1]
        Phis = P1 @ P0
        Bs = P1 @ B0 + B1
        Qds = P1 @ Q0 @ jnp.swapaxes(P1, -1, -2) + Q1
    return Phis[0], Bs[0], Qds[0]


def _rotation_prefixes(R_steps):
    """Inclusive prefix products pref[k] = R_steps[k] @ … @ R_steps[0].

    `fn(x, y) = y @ x` (x the earlier-accumulated product) is associative,
    so `lax.associative_scan` evaluates the chain in ⌈log₂ n⌉ levels of
    batched 3×3 matmuls instead of n dependent ones.
    """
    return jax.lax.associative_scan(
        lambda x, y: jnp.matmul(y, x), R_steps)


def _mask_padded(Phis, Bs, Qds, dts, dtype):
    """Padded (dt=0) intervals must be exact no-ops even when the
    linearization point differs from the estimate."""
    ok = (dts > 0)[:, None, None]
    I = jnp.broadcast_to(jnp.eye(15, dtype=dtype), Phis.shape)
    return (jnp.where(ok, Phis, I), jnp.where(ok, Bs, 0.0),
            jnp.where(ok, Qds, 0.0))


def propagate(state: VioState, cfg: FilterConfig, win: ImuWindow, t_new) -> VioState:
    """Propagate mean + covariance to t_new using the IMU window.

    Equivalent to Propagator::propagate_and_clone's propagation half
    (Propagator.cpp:71-130): per-interval (Φ, Qd) composed across the window,
    then one block-sparse covariance application; FEJ values of the IMU state
    are reset to the propagated estimate (no update happened in between).

    TPU-first structure (the round-2 gap profile attributed ~0.2 ms/frame of
    idle to the old unrolled per-interval chain): only the *mean* recursion
    is sequential — and for the analytic integrator not even that — while the
    Φ/B/Qd "matrix soup" of every interval is built in ONE vmapped batch from
    the stacked per-interval means, then composed by `_compose_transitions`'
    log-depth tree.  Per-frame device work drops from ~K·40 dependent small
    ops to: [batched prologue] → [short mean chain or prefix scan] →
    [one batched soup] → [log₂K batched 15×15 levels].
    """
    dtype = state.cov.dtype
    gravity = jnp.asarray([0.0, 0.0, cfg.gravity_mag], dtype=dtype)
    K = win.t.shape[0]
    # unroll the (now mean-only) scan: a per-frame window is ~10 samples and
    # a TPU while-loop pays per-iteration sync overhead comparable to the
    # tiny body itself.  TPU-only and only for small windows — on CPU (the
    # test platform) the rolled scan compiles ~2x faster at identical
    # numerics, and a long catch-up propagate must not inline its body.
    on_tpu = jax.default_backend() in ("tpu", "axon")
    unroll = on_tpu and K <= 20
    # ONE batched quat->rot conversion for the four scalar quaternions the
    # prologue needs (q, q_fej, gyro frame, accel frame): each scalar
    # conversion is a 9-element scalar chain that stalls the vector units
    # (~7 us idle per site in the v5e gap profile); batched they vectorize
    # across lanes.
    R3 = lie.quat_2_rot(jnp.stack([state.q, state.q_fej, state.imu_q_gyro,
                                   state.imu_q_acc]))
    mats = imu_intrinsic_mats(state, cfg.imu_model, R_w=R3[2], R_a=R3[3])
    Dw, Da, Tg, R_w, R_a = mats

    if cfg.integration == "analytical":
        # ACI² with interval-averaged corrected samples
        # (predict_and_compute's w_hat_avg/a_hat_avg, Propagator.cpp:404-431).
        # The mean trajectory is CLOSED FORM given the interval rotations:
        # rotation prefixes by associative scan, then v/p by two cumsums —
        # no sequential scan at all.
        dts, w_hats, a_hats, u_wm, u_am, xis = _analytic_precompute(
            state, cfg, win, dtype, mats=mats)
        R0 = R3[0]
        pref = _rotation_prefixes(xis[0])  # pref[k] = R_{0→k+1}
        R_end = pref @ R0                  # R_GtoI at interval ends
        R_start = jnp.concatenate([R0[None], R_end[:-1]], axis=0)
        # (plain batched matmuls, not einsum — see the axon rotation-
        # corruption note in manager.gather_feature_obs)
        R_startT = jnp.swapaxes(R_start, -1, -2)
        a_col = a_hats[..., None]
        # v_{k+1} = v_k + R_startᵀ(Ξ₁ a) − g dt   (prefix-summable)
        acc_v = ((R_startT @ (xis[1] @ a_col))[..., 0]
                 - gravity[None] * dts[:, None])
        v_end = state.v[None] + jnp.cumsum(acc_v, axis=0)
        v_start = jnp.concatenate([state.v[None], v_end[:-1]], axis=0)
        # p_{k+1} = p_k + v_k dt + R_startᵀ(Ξ₂ a) − ½ g dt²
        acc_p = (v_start * dts[:, None]
                 + (R_startT @ (xis[2] @ a_col))[..., 0]
                 - 0.5 * gravity[None] * (dts * dts)[:, None])
        p_end = state.p[None] + jnp.cumsum(acc_p, axis=0)
        p_start = jnp.concatenate([state.p[None], p_end[:-1]], axis=0)
        # quaternion mean: one conversion of the composed window rotation
        # (the old per-step quat chain, re-associated; same rotation to f32)
        q = lie.quat_multiply(lie.rot_2_quat(pref[-1]), state.q)
        p, v = p_end[-1], v_end[-1]

        # FEJ bookkeeping (Propagator.cpp:473-479): only the first interval
        # linearizes at the pre-update first estimate; afterwards the
        # linearization point tracks the propagated mean.
        R_lin = R_start.at[0].set(R3[1])
        p_lin = p_start.at[0].set(state.p_fej)
        v_lin = v_start.at[0].set(state.v_fej)

        Phis, Bs, Qds = jax.vmap(
            lambda Rl, pl, vl, Re, pe, ve, dt, wk, ak, uw, ua, xi:
            _phi_qd_analytic((Rl, pl, vl), (Re, pe, ve), gravity, dt, cfg,
                             dtype, (Dw, Da, Tg, R_w, R_a, wk, ak, uw, ua),
                             xi)
        )(R_lin, p_lin, v_lin, R_end, p_end, v_end, dts, w_hats, a_hats,
          u_wm, u_am, xis)
    else:
        # discrete/RK4: the mean recursion is genuinely sequential, but the
        # scan now carries ONLY (q, p, v) — the Φ/B/Qd soup moves to one
        # vmapped batch over the stacked means below.
        dts = jnp.maximum(win.t[1:] - win.t[:-1], 0.0)
        wc, ac, u_w, u_a = jax.vmap(
            lambda w, a: correct_imu(state, w, a, mats))(win.w, win.a)
        zero3 = jnp.zeros(3, dtype)

        def body(carry, k):
            q, p, v = carry
            q2, p2, v2, w_hat, a_hat = _step_mean(
                q, p, v, zero3, zero3, wc[k], ac[k], wc[k + 1], ac[k + 1],
                dts[k], gravity, cfg.integration
            )
            return (q2, p2, v2), (q2, p2, v2, w_hat, a_hat)

        _, (q_end, p_end, v_end, w_hats, a_hats) = jax.lax.scan(
            body, (state.q, state.p, state.v), jnp.arange(K - 1),
            unroll=unroll)
        q, p, v = q_end[-1], p_end[-1], v_end[-1]

        q_lin = jnp.concatenate([state.q_fej[None], q_end[:-1]], axis=0)
        p_lin = jnp.concatenate([state.p_fej[None], p_end[:-1]], axis=0)
        v_lin = jnp.concatenate([state.v_fej[None], v_end[:-1]], axis=0)

        Phis, Bs, Qds = jax.vmap(
            lambda ql, pl, vl, qe, pe, ve, dt, wk, ak, uw, ua:
            _phi_qd((ql, pl, vl), (qe, pe, ve), gravity, dt, cfg, dtype,
                    (Dw, Da, Tg, R_w, R_a, wk, ak, uw, ua))
        )(q_lin, p_lin, v_lin, q_end, p_end, v_end, dts, w_hats, a_hats,
          u_w[:-1], u_a[:-1])

    Phis, Bs, Qds = _mask_padded(Phis, Bs, Qds, dts, dtype)
    Phi, B, Qd = _compose_transitions(Phis, Bs, Qds)
    Qd = 0.5 * (Qd + Qd.T)

    use_B = cfg.calib_imu_intrinsics or cfg.calib_imu_g_sensitivity
    cov = propagate_covariance(state.cov, Phi, Qd, cfg,
                               B=B if use_B else None)
    return state._replace(
        q=q, p=p, v=v, cov=cov,
        q_fej=q, p_fej=p, v_fej=v,
        t=jnp.asarray(t_new, dtype=dtype),
    )


def fast_state_propagate(state: VioState, cfg: FilterConfig, win: ImuWindow):
    """Mean-only propagation for IMU-rate odometry output.

    Parity with Propagator::fast_state_propagate (Propagator.cpp:140-267):
    publishes a high-rate pose between camera updates without touching the
    covariance (the reference caches and invalidates; here the function is
    pure, so no cache coherence is needed — just call it with the latest
    window).  Returns (q, p, v) at win.t[-1].
    """
    dtype = state.cov.dtype
    gravity = jnp.asarray([0.0, 0.0, cfg.gravity_mag], dtype=dtype)
    K = win.t.shape[0]

    def body(carry, k):
        q, p, v = carry
        dt = jnp.maximum(win.t[k + 1] - win.t[k], 0.0)
        w1c, a1c, _, _ = correct_imu(state, win.w[k], win.a[k],
                                     model=cfg.imu_model)
        w2c, a2c, _, _ = correct_imu(state, win.w[k + 1], win.a[k + 1],
                                     model=cfg.imu_model)
        zero3 = jnp.zeros(3, dtype)
        if cfg.integration == "analytical":
            w_hat = 0.5 * (w1c + w2c)
            a_hat = 0.5 * (a1c + a2c)
            xi = _xi_sum(w_hat, a_hat, dt, dtype)
            q2, p2, v2 = _step_mean_analytic(q, p, v, xi, a_hat, dt, gravity)
        else:
            q2, p2, v2, _, _ = _step_mean(
                q, p, v, zero3, zero3, w1c, a1c, w2c, a2c, dt, gravity,
                cfg.integration
            )
        return (q2, p2, v2), None

    (q, p, v), _ = jax.lax.scan(body, (state.q, state.p, state.v),
                                jnp.arange(K - 1))
    return q, p, v


def make_window(imu_t, imu_w, imu_a, t0, t1, K):
    """Host-side helper: slice + boundary-interpolate samples covering [t0,t1].

    numpy implementation of select_imu_readings + interpolate_data
    (Propagator.cpp:269-393, Propagator.h:154-164).  Returns an ImuWindow of
    static size K (padded by repeating the final sample).
    """
    import numpy as np

    imu_t = np.asarray(imu_t)
    sel = (imu_t > t0) & (imu_t < t1)
    idx = np.where(sel)[0]
    ts, ws, as_ = [], [], []

    def interp(ta):
        i1 = np.searchsorted(imu_t, ta, side="right") - 1
        i1 = np.clip(i1, 0, len(imu_t) - 2)
        i2 = i1 + 1
        lam = (ta - imu_t[i1]) / max(imu_t[i2] - imu_t[i1], 1e-12)
        lam = np.clip(lam, 0.0, 1.0)
        return (
            (1 - lam) * np.asarray(imu_w)[i1] + lam * np.asarray(imu_w)[i2],
            (1 - lam) * np.asarray(imu_a)[i1] + lam * np.asarray(imu_a)[i2],
        )

    w0, a0 = interp(t0)
    ts.append(t0), ws.append(w0), as_.append(a0)
    for i in idx:
        ts.append(imu_t[i]), ws.append(np.asarray(imu_w)[i]), as_.append(np.asarray(imu_a)[i])
    w1, a1 = interp(t1)
    ts.append(t1), ws.append(w1), as_.append(a1)

    ts, ws, as_ = np.asarray(ts), np.asarray(ws), np.asarray(as_)
    if len(ts) > K:
        raise ValueError(f"IMU window {len(ts)} exceeds static capacity {K}")
    pad = K - len(ts)
    ts = np.concatenate([ts, np.repeat(ts[-1:], pad)])
    ws = np.concatenate([ws, np.repeat(ws[-1:], pad, axis=0)])
    as_ = np.concatenate([as_, np.repeat(as_[-1:], pad, axis=0)])
    return ImuWindow(
        t=jnp.asarray(ts, dtype=jnp.float32),
        w=jnp.asarray(ws, dtype=jnp.float32),
        a=jnp.asarray(as_, dtype=jnp.float32),
    )
