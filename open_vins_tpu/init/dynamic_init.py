"""Dynamic (in-motion) visual-inertial initialization.

Capability parity with ov_init::DynamicInitializer (DynamicInitializer.cpp:44-1107):
  1. select ~`num_pose` camera times across the init window,
  2. preintegrate IMU between them (the CPI role, ov_core/src/cpi/ — here a
     differentiable `lax.scan` preintegration whose bias Jacobians come from
     autodiff instead of hand-derived CPI bias-correction terms),
  3. closed-form linear system over [features, v0, gravity] from
     preintegrated reprojection constraints (…:310-385) with the |g| = 9.81
     constraint enforced by alternating projection (replacing the Dongsi
     quartic companion-matrix solve, helper.h:183),
  4. full MLE refinement — Levenberg-Marquardt over poses/velocities/biases/
     features with reprojection + preintegration residuals (replacing the
     Ceres DENSE_SCHUR solve, …:622-894); Jacobians via jax.jacfwd,
  5. covariance recovery from the Gauss-Newton information at the optimum
     (…:978-1080) with inflation factors.

All stages are jit-pure over fixed-size arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.ops import lie


class DynamicInitOptions(NamedTuple):
    gravity_mag: float = 9.81
    sigma_pix_norm: float = 1.0 / 460.0  # reprojection noise, normalized
    sigma_w: float = 1.6968e-4
    sigma_a: float = 2.0e-3
    sigma_wb: float = 1.9393e-5
    sigma_ab: float = 3.0e-3
    mle_iters: int = 30
    # bias priors: over a ~2 s window a constant accel bias is nearly
    # indistinguishable from a trajectory scale change, so the MLE needs
    # priors to stay identifiable (the reference adds Factor_GenericPrior
    # terms on the biases, DynamicInitializer.cpp:714-894)
    sigma_bg_prior: float = 0.01
    sigma_ba_prior: float = 0.05
    lin_iters: int = 3  # |g|-constraint alternations
    inflation_ori: float = 10.0  # covariance inflation (…:1076-1080)
    inflation_vel: float = 100.0
    inflation_bg: float = 100.0
    inflation_ba: float = 100.0
    # excitation gate: under NEAR-CONSTANT specific force + rotation the
    # monocular scale/velocity family is unobservable (constant-acceleration
    # degeneracy) and the stiff gauge/|g| priors pin the MLE at one member
    # with falsely small curvature — a confidently-wrong velocity (measured
    # 1.05 m/s error at reported sigma 0.22 on a constant-accel stress
    # trajectory).  Refuse instead: the reference requires IMU excitation
    # before dynamic init runs (init_imu_thresh jerk gating,
    # VioManagerOptions init section).  Thresholds sit well above the
    # sensor-noise floor (accel noise std ~0.03 m/s², gyro ~0.003 rad/s).
    # thresholds are on the per-axis RANGE (max − min) of the measured
    # signal, which is invariant to the repeat-last-sample padding of the
    # DynInitInput segments (a std would be deflated by the padding ratio
    # and falsely refuse excited short segments).  Noise-only floors:
    # accel sample noise std ~0.028 m/s² ⇒ range ≈ 0.15 over ~200 samples;
    # gyro ~0.0024 rad/s ⇒ range ≈ 0.013.
    min_excite_a: float = 0.35  # m/s² range of measured accel over window
    min_excite_w: float = 0.15  # rad/s range of measured gyro


class DynInitInput(NamedTuple):
    """Fixed-shape problem data.

    P pose times; per segment i (i=0..P-2) an IMU window of K samples padded
    by repeating the last row; F features observed at pose times (cam 0).
    """

    t_pose: jax.Array  # [P]
    imu_t: jax.Array  # [P-1, K]
    imu_w: jax.Array  # [P-1, K, 3]
    imu_a: jax.Array  # [P-1, K, 3]
    uvn: jax.Array  # [F, P, 2] normalized observations
    obs_mask: jax.Array  # [F, P]
    R_ItoC: jax.Array  # [3, 3]
    p_IinC: jax.Array  # [3]


class DynInitResult(NamedTuple):
    success: jax.Array
    # state at the NEWEST pose time, world = gravity-aligned (z up)
    q_GtoI: jax.Array  # [4] JPL
    p: jax.Array  # [3]
    v: jax.Array  # [3]
    bg: jax.Array
    ba: jax.Array
    cov15: jax.Array  # [15,15] covariance of [θ p v bg ba]
    # full window solution (for seeding clones; I0-frame)
    R_I0toIk: jax.Array  # [P,3,3]
    p_k_in0: jax.Array  # [P,3]


def _preintegrate(imu_t, imu_w, imu_a, bg, ba):
    """One segment: (ΔR [3,3], α [3], β [3]) in the segment-start frame.

    ΔR = R_{Ii -> Ii+1-ish}: rotation from start body frame to end body
    frame accumulated from gyro; α = ∬ R_{0→τ}ᵀ a; β = ∫ R_{0→τ}ᵀ a.
    Differentiable in (bg, ba) — autodiff supplies the CPI bias Jacobians.
    """
    K = imu_t.shape[0]

    def body(carry, k):
        R, alpha, beta = carry  # R: start -> current
        dt = jnp.maximum(imu_t[k + 1] - imu_t[k], 0.0)
        w_hat = 0.5 * (imu_w[k] + imu_w[k + 1]) - bg
        a_hat = imu_a[k] - ba
        a_in0 = R.T @ a_hat  # accel rotated into the segment-start frame
        alpha = alpha + beta * dt + 0.5 * a_in0 * dt * dt
        beta = beta + a_in0 * dt
        R = lie.exp_so3(-w_hat * dt) @ R  # R_GtoI-style composition
        return (R, alpha, beta), None

    init = (jnp.eye(3, dtype=imu_a.dtype), jnp.zeros(3, imu_a.dtype),
            jnp.zeros(3, imu_a.dtype))
    (R, alpha, beta), _ = jax.lax.scan(body, init, jnp.arange(K - 1))
    return R, alpha, beta


def _preintegrate_cov(imu_t, imu_w, imu_a, bg, ba, sigma_w, sigma_a,
                      sigma_wb=0.0, sigma_ab=0.0, full15=False):
    """Covariance of the preintegrated measurement error.

    The CpiBase P_meas role (ov_core/src/cpi/CpiBase.h:49-150): the
    reference propagates the FULL 15×15 [δθ δβ δα δbg δba] covariance,
    including the bias random-walk rows, so that bias drift *within* the
    segment inflates the preintegration uncertainty.  This matches that:
    the 15-state linearized recursion (left error R_true = exp(-δθ) R̂,
    δθ in the running segment frame) is
        δθ'  = A δθ + Gg (δbg + n_g),                A = exp(-ŵ dt),
                                                     Gg = A Jr(-ŵ dt) dt
        δβ'  = δβ - dt R̂ᵀ⌊â⌋ δθ + dt R̂ᵀ (δba + n_a)
        δα'  = δα + dt δβ - ½dt² R̂ᵀ⌊â⌋ δθ + ½dt² R̂ᵀ (δba + n_a)
        δbg' = δbg + √dt n_wg
        δba' = δba + √dt n_wa
    (ŵ = w_meas − b̂g so a bias error enters exactly like gyro noise).
    Returns the marginal top-left 9×9 [δθ δβ δα] block by default — that is
    what whitens the MLE residuals (the biases start the segment at their
    estimated value, so the initial bias-error blocks are zero and only the
    in-segment walk contributes) — or the full 15×15 when ``full15``.

    Note on CpiV1 vs CpiV2 (ov_core/src/cpi/CpiV1.h / CpiV2.h): the two
    reference variants differ only in the *analytic bias-Jacobian
    approximation* used to correct the preintegrated means when the bias
    estimate moves.  Here `_preintegrate` is differentiable and the MLE
    gets exact autodiff bias Jacobians, so there is nothing to approximate
    — one implementation dominates both variants.
    """
    K = imu_t.shape[0]
    dtype = imu_a.dtype
    I3 = jnp.eye(3, dtype=dtype)
    Z = jnp.zeros((3, 3), dtype)

    def body(carry, k):
        R, P = carry
        dt = jnp.maximum(imu_t[k + 1] - imu_t[k], 0.0)
        w_hat = 0.5 * (imu_w[k] + imu_w[k + 1]) - bg
        a_hat = imu_a[k] - ba
        A = lie.exp_so3(-w_hat * dt)
        Rt = R.T
        Ra = Rt @ lie.skew(a_hat)
        Gg = (A @ lie.Jr_so3(-w_hat * dt)) * dt
        F = jnp.block([
            [A, Z, Z, Gg, Z],
            [-dt * Ra, I3, Z, Z, dt * Rt],
            [-0.5 * dt * dt * Ra, dt * I3, I3, Z, 0.5 * dt * dt * Rt],
            [Z, Z, Z, I3, Z],
            [Z, Z, Z, Z, I3],
        ])
        G = jnp.block([
            [Gg, Z, Z, Z],
            [Z, dt * Rt, Z, Z],
            [Z, 0.5 * dt * dt * Rt, Z, Z],
            [Z, Z, I3, Z],
            [Z, Z, Z, I3],
        ])
        inv_dt = jnp.where(dt > 0, 1.0 / jnp.maximum(dt, 1e-12), 0.0)
        qc = jnp.concatenate([
            jnp.full((3,), sigma_w**2, dtype) * inv_dt,
            jnp.full((3,), sigma_a**2, dtype) * inv_dt,
            # random-walk increments over dt: Var = σ_b² dt
            jnp.full((3,), sigma_wb**2, dtype) * dt,
            jnp.full((3,), sigma_ab**2, dtype) * dt,
        ])
        P = F @ P @ F.T + (G * qc[None, :]) @ G.T
        R = A @ R
        return (R, 0.5 * (P + P.T)), None

    (_, P), _ = jax.lax.scan(body, (I3, jnp.zeros((15, 15), dtype)),
                             jnp.arange(K - 1))
    return P if full15 else P[:9, :9]


def _preintegrate_all(inp: DynInitInput, bg, ba):
    """Segment preintegrations + accumulated start-frame quantities.

    Returns (R_0k [P,3,3] rotation I0->Ik, alpha_0k [P,3], beta_0k [P,3])
    where p_k^{I0} = v0 Δt_k - ½ g Δt_k² + alpha_0k (all in I0 coords).
    """
    P = inp.t_pose.shape[0]
    dR, dalpha, dbeta = jax.vmap(
        lambda t, w, a: _preintegrate(t, w, a, bg, ba)
    )(inp.imu_t, inp.imu_w, inp.imu_a)

    def body(carry, i):
        R_0k, a_0k, b_0k, t_k = carry
        dt = inp.t_pose[i + 1] - inp.t_pose[i]
        # accumulate: alpha_{0,k+1} = alpha_0k + beta_0k dt + R_0kᵀ dalpha_k
        a_new = a_0k + b_0k * dt + R_0k.T @ dalpha[i]
        b_new = b_0k + R_0k.T @ dbeta[i]
        R_new = dR[i] @ R_0k
        return (R_new, a_new, b_new, t_k + dt), (R_new, a_new, b_new)

    init = (jnp.eye(3, dtype=dalpha.dtype), jnp.zeros(3, dalpha.dtype),
            jnp.zeros(3, dalpha.dtype), inp.t_pose[0])
    _, (R_seq, a_seq, b_seq) = jax.lax.scan(body, init, jnp.arange(P - 1))
    R_0k = jnp.concatenate([jnp.eye(3, dtype=dalpha.dtype)[None], R_seq])
    alpha_0k = jnp.concatenate([jnp.zeros((1, 3), dalpha.dtype), a_seq])
    beta_0k = jnp.concatenate([jnp.zeros((1, 3), dalpha.dtype), b_seq])
    return R_0k, alpha_0k, beta_0k, dR, dalpha, dbeta


def _linear_solve(inp: DynInitInput, opts: DynamicInitOptions, R_0k, alpha_0k):
    """Closed-form [p_f (3F), v0 (3), g^{I0} (3)] with |g| constraint.

    DynamicInitializer.cpp:310-420 capability; the norm constraint is
    enforced by alternating projection instead of the quartic eigen solve.
    """
    F, P = inp.obs_mask.shape
    dt_k = inp.t_pose - inp.t_pose[0]
    dtype = inp.uvn.dtype

    # rows: for each (f, k): ⌊b⌋ R_ItoC R_0k (p_f - v0 dt + ½ g dt² - α) - ⌊b⌋ p_IinC... signs below
    def rows(f, k):
        b = jnp.concatenate([inp.uvn[f, k], jnp.ones((1,), dtype)])
        b = b / jnp.linalg.norm(b)
        Bx = lie.skew(b)
        M = Bx @ inp.R_ItoC @ R_0k[k]  # [3,3]
        A_f = M
        A_v = -dt_k[k] * M
        A_g = 0.5 * dt_k[k] ** 2 * M
        rhs = M @ alpha_0k[k] - Bx @ inp.p_IinC
        w = inp.obs_mask[f, k].astype(dtype)
        return A_f * w, A_v * w, A_g * w, rhs * w

    fk_f = jnp.repeat(jnp.arange(F), P)
    fk_k = jnp.tile(jnp.arange(P), F)
    A_f, A_v, A_g, rhs = jax.vmap(rows)(fk_f, fk_k)  # [F*P, 3, 3] each

    n = 3 * F + 6
    rows_n = 3 * F * P

    # scatter A_f into block-diagonal positions
    A = jnp.zeros((F * P, 3, n), dtype)
    idx = jnp.arange(F * P)
    col_f = 3 * fk_f

    def place(a, cf, af, av, ag):
        a = jax.lax.dynamic_update_slice(a, af, (0, cf))
        a = jax.lax.dynamic_update_slice(a, av, (0, 3 * F))
        a = jax.lax.dynamic_update_slice(a, ag, (0, 3 * F + 3))
        return a

    A = jax.vmap(place)(A, col_f, A_f, A_v, A_g)
    A = A.reshape(rows_n, n)
    b_vec = rhs.reshape(rows_n)

    AtA = A.T @ A + 1e-9 * jnp.eye(n, dtype=dtype)
    Atb = A.T @ b_vec

    x = jnp.linalg.solve(AtA, Atb)

    def project(x, _):
        g = x[3 * F + 3 :]
        g_fixed = g / jnp.maximum(jnp.linalg.norm(g), 1e-9) * opts.gravity_mag
        # re-solve the remaining unknowns with g fixed:
        # A_rest x_rest = b - A_g g
        A_rest = A[:, : 3 * F + 3]
        b_rest = b_vec - A[:, 3 * F + 3 :] @ g_fixed
        x_rest = jnp.linalg.solve(
            A_rest.T @ A_rest + 1e-9 * jnp.eye(3 * F + 3, dtype=dtype),
            A_rest.T @ b_rest,
        )
        return jnp.concatenate([x_rest, g_fixed]), None

    x, _ = jax.lax.scan(project, x, None, length=opts.lin_iters)
    p_f = x[: 3 * F].reshape(F, 3)
    v0 = x[3 * F : 3 * F + 3]
    g0 = x[3 * F + 3 :]
    return p_f, v0, g0


def _residuals(theta, inp: DynInitInput, opts: DynamicInitOptions,
               R0_lin, p0_lin, P, F, L9=None):
    """All residuals, whitened.  theta packs
    [δθ (3P), δp (3P), v (3P), bg (3), ba (3), g_I0 (3), p_f (3F)] with
    rotations as local perturbations around the linearization R0_lin
    (I0 -> Ik).  Gravity in the I0 frame is optimized with a strong norm
    prior (the |g| = 9.81 constraint of the reference's constrained solve);
    pose 0 is gauge-pinned (position + full orientation), so the gravity
    direction must stay free to absorb the linear stage's tilt error.

    Residuals (Forster-style preintegration factors + reprojection — the
    Factor_ImuCPIv1 / Factor_ImageReprojCalib roles):
      r_ΔR = log( ΔR(bg)ᵀ R_{k+1} R_kᵀ )
      r_Δβ = R_k (v_{k+1} - v_k + g Δt)   - Δβ(bg, ba)      [in Ik frame]
      r_Δα = R_k (p_{k+1} - p_k - v_k Δt + ½ g Δt²) - Δα(bg, ba)
      r_uv = proj(R_ItoC (R_k (p_f - p_k)) + p_IinC) - uvn
    """
    dtype = theta.dtype
    i = 0
    dth = theta[i : i + 3 * P].reshape(P, 3); i += 3 * P
    dp = theta[i : i + 3 * P].reshape(P, 3); i += 3 * P
    v = theta[i : i + 3 * P].reshape(P, 3); i += 3 * P
    bg = theta[i : i + 3]; i += 3
    ba = theta[i : i + 3]; i += 3
    g_I0 = theta[i : i + 3]; i += 3
    p_f = theta[i:].reshape(F, 3)

    # poses in I0 frame: R_k = exp(-dθ) R0_lin[k] (I0 -> Ik), p_k = p0_lin+dp
    R_k = jax.vmap(lambda d, R0: lie.exp_so3(-d) @ R0)(dth, R0_lin)
    p_k = p0_lin + dp

    # --- IMU preintegration residuals per segment
    dR, dalpha, dbeta = jax.vmap(
        lambda t, w, a: _preintegrate(t, w, a, bg, ba)
    )(inp.imu_t, inp.imu_w, inp.imu_a)
    dts = inp.t_pose[1:] - inp.t_pose[:-1]

    def imu_res(k):
        dt = dts[k]
        rR = lie.log_so3(dR[k].T @ (R_k[k + 1] @ R_k[k].T))
        rB = R_k[k] @ (v[k + 1] - v[k] + g_I0 * dt) - dbeta[k]
        rA = R_k[k] @ (p_k[k + 1] - p_k[k] - v[k] * dt + 0.5 * g_I0 * dt * dt) \
            - dalpha[k]
        r9 = jnp.concatenate([rR, rB, rA])
        if L9 is not None:
            # whiten with the CPI-propagated 9×9 measurement covariance
            # (Cholesky factors precomputed at the linearization bias):
            # r_white = L⁻¹ r so r_whiteᵀ r_white = rᵀ P⁻¹ r
            return jax.scipy.linalg.solve_triangular(L9[k], r9, lower=True)
        # fallback: per-block scalar stds over a gap dt:
        #   δΔR ~ σ_w √dt, δΔβ ~ σ_a √dt, δΔα ~ σ_a dt^{3/2}/√3
        sdt = jnp.sqrt(jnp.maximum(dt, 1e-6))
        scale = jnp.concatenate([
            jnp.full((3,), opts.sigma_w * sdt),
            jnp.full((3,), opts.sigma_a * sdt),
            jnp.full((3,), opts.sigma_a * sdt * dt / jnp.sqrt(3.0)),
        ])
        return r9 / scale

    r_imu = jax.vmap(imu_res)(jnp.arange(P - 1)).reshape(-1)

    # --- reprojection residuals
    def reproj(f, k):
        pC = inp.R_ItoC @ (R_k[k] @ (p_f[f] - p_k[k])) + inp.p_IinC
        z = jnp.where(jnp.abs(pC[2]) > 1e-6, pC[2], 1e-6)
        pred = pC[:2] / z
        w = inp.obs_mask[f, k].astype(dtype)
        return (pred - inp.uvn[f, k]) * w / opts.sigma_pix_norm

    ff = jnp.repeat(jnp.arange(F), P)
    kk = jnp.tile(jnp.arange(P), F)
    r_uv = jax.vmap(reproj)(ff, kk).reshape(-1)

    # gauge fixing: pin pose 0 (position + orientation) strongly; the
    # gravity-norm prior enforces |g| = 9.81 softly-but-stiffly
    r_gauge = jnp.concatenate([dth[0], dp[0]]) * 1e4
    r_gnorm = (jnp.linalg.norm(g_I0) - opts.gravity_mag)[None] * 1e4
    r_bias = jnp.concatenate([
        bg / opts.sigma_bg_prior, ba / opts.sigma_ba_prior
    ])
    return jnp.concatenate([r_imu, r_uv, r_gauge, r_gnorm, r_bias])


def _levenberg_marquardt(res_fn, theta0, iters):
    """Dense LM with jacfwd (the Ceres DENSE_SCHUR+DOGLEG role for this
    small problem size)."""

    def step(carry, _):
        theta, lam, cost = carry
        J = jax.jacfwd(res_fn)(theta)
        r = res_fn(theta)
        JtJ = J.T @ J
        Jtr = J.T @ r
        n = theta.shape[0]
        A = JtJ + lam * jnp.diag(jnp.clip(jnp.diag(JtJ), 1e-8, None))
        dx = jnp.linalg.solve(A + 1e-10 * jnp.eye(n, dtype=theta.dtype), Jtr)
        theta_new = theta - dx
        cost_new = jnp.sum(res_fn(theta_new) ** 2)
        accept = cost_new < cost
        theta = jnp.where(accept, theta_new, theta)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 8.0), 1e-9, 1e8)
        cost = jnp.where(accept, cost_new, cost)
        return (theta, lam, cost), cost

    cost0 = jnp.sum(res_fn(theta0) ** 2)
    (theta, _, cost), _ = jax.lax.scan(
        step, (theta0, jnp.asarray(1e-3, theta0.dtype), cost0), None,
        length=iters,
    )
    return theta, cost0, cost


def initialize(inp: DynInitInput, opts: DynamicInitOptions) -> DynInitResult:
    """Full dynamic initialization (DynamicInitializer::initialize parity)."""
    P = inp.t_pose.shape[0]
    F = inp.obs_mask.shape[0]
    dtype = inp.uvn.dtype

    # 1-2. gyro/accel preintegration with zero biases
    zero3 = jnp.zeros(3, dtype)
    R_0k, alpha_0k, beta_0k, *_ = _preintegrate_all(inp, zero3, zero3)

    # 3. closed-form linear [features, v0, g]
    p_f0, v0, g_I0 = _linear_solve(inp, opts, R_0k, alpha_0k)
    dt_k = inp.t_pose - inp.t_pose[0]
    p_k0 = v0[None, :] * dt_k[:, None] - 0.5 * g_I0[None, :] * (dt_k**2)[:, None] \
        + alpha_0k
    v_k0 = v0[None, :] - g_I0[None, :] * dt_k[:, None] + beta_0k

    # 4. MLE refinement — residuals whitened by the CPI-propagated
    # preintegration measurement covariance per segment: the [δθ δβ δα]
    # marginal of the reference's full 15×15 propagation (bias random-walk
    # rows included, CpiBase.h:49-150), computed once at the zero-bias
    # linearization like the reference's fixed CPI factor covariances; a
    # jitter floor keeps the Cholesky well-posed in f32.
    P9 = jax.vmap(
        lambda t, w, a: _preintegrate_cov(t, w, a, zero3, zero3,
                                          opts.sigma_w, opts.sigma_a,
                                          opts.sigma_wb, opts.sigma_ab)
    )(inp.imu_t, inp.imu_w, inp.imu_a)
    P9 = P9 + 1e-12 * jnp.eye(9, dtype=dtype)
    L9 = jax.lax.stop_gradient(jnp.linalg.cholesky(P9))
    theta0 = jnp.concatenate([
        jnp.zeros(3 * P, dtype), jnp.zeros(3 * P, dtype), v_k0.reshape(-1),
        zero3, zero3, g_I0, p_f0.reshape(-1),
    ])
    res_fn = lambda th: _residuals(th, inp, opts, R_0k, p_k0, P, F, L9=L9)
    theta, cost0, cost = _levenberg_marquardt(res_fn, theta0, opts.mle_iters)

    i = 0
    dth = theta[i : i + 3 * P].reshape(P, 3); i += 3 * P
    dp = theta[i : i + 3 * P].reshape(P, 3); i += 3 * P
    v = theta[i : i + 3 * P].reshape(P, 3); i += 3 * P
    bg = theta[i : i + 3]; i += 3
    ba = theta[i : i + 3]; i += 3
    g_I0 = theta[i : i + 3]; i += 3
    R_k = jax.vmap(lambda d, R0: lie.exp_so3(-d) @ R0)(dth, R_0k)
    p_k = p_k0 + dp

    # 5. gravity-aligned world: R_GtoI0 maps world (z up) to I0
    from open_vins_tpu.init.static_init import gram_schmidt_gravity
    R_GtoI0 = gram_schmidt_gravity(g_I0)
    R_GtoIk = R_k[-1] @ R_GtoI0
    p_last_G = R_GtoI0.T @ p_k[-1]
    v_last_G = R_GtoI0.T @ v[-1]

    # covariance from the GN information at the optimum, newest-pose block.
    # RELATIVE jitter: degenerate geometries (constant acceleration, short
    # windows) leave the information matrix near-singular, and a fixed
    # absolute 1e-6 is dwarfed by the ~1e8-scale gauge rows — the f32
    # inverse then came back indefinite on exactly the cases the |g|
    # constraint exists for.
    J = jax.jacfwd(res_fn)(theta)
    info = J.T @ J
    jit_rel = 1e-7 * jnp.trace(info) / info.shape[0]
    info = info + jnp.maximum(jit_rel, 1e-9) * jnp.eye(theta.shape[0],
                                                       dtype=dtype)
    cov_full = jnp.linalg.inv(info)
    kq = 3 * (P - 1)
    kp = 3 * P + 3 * (P - 1)
    kv = 6 * P + 3 * (P - 1)
    kbg = 9 * P
    kba = 9 * P + 3  # g block sits at 9P+6; features at 9P+9
    sel = jnp.concatenate([
        jnp.arange(kq, kq + 3), jnp.arange(kp, kp + 3),
        jnp.arange(kv, kv + 3), jnp.arange(kbg, kbg + 3),
        jnp.arange(kba, kba + 3),
    ])
    cov15 = cov_full[sel][:, sel]
    # the MLE perturbations δp/δv live in the I0 body frame; the filter's
    # error state is world-frame (gravity-aligned), so rotate those blocks by
    # R_GtoI0ᵀ (δx_G = R_GtoI0ᵀ δx_I0).  δθ is a left perturbation on the Ik
    # frame and δbg/δba are body quantities — both frame-invariant here.
    eye3 = jnp.eye(3, dtype=dtype)
    Rt = R_GtoI0.T
    T_frame = jax.scipy.linalg.block_diag(eye3, Rt, Rt, eye3, eye3)
    cov15 = T_frame @ cov15 @ T_frame.T
    infl = jnp.concatenate([
        jnp.full(3, opts.inflation_ori, dtype), jnp.ones(3, dtype),
        jnp.full(3, opts.inflation_vel, dtype),
        jnp.full(3, opts.inflation_bg, dtype),
        jnp.full(3, opts.inflation_ba, dtype),
    ])
    cov15 = cov15 * jnp.sqrt(infl[:, None] * infl[None, :])
    cov15 = 0.5 * (cov15 + cov15.T)
    # PSD repair + observability gate: eigen-clamp the f32 roundoff floor,
    # and REFUSE when the geometry is genuinely degenerate — either the
    # recovered covariance is meaningfully indefinite (information matrix
    # singular beyond roundoff) or an eigenvalue is absurdly large
    # (unobservable direction: the init must not hand the filter a
    # confidently-structured but meaningless prior).
    w_ev, V_ev = jnp.linalg.eigh(cov15)
    w_max = jnp.maximum(w_ev[-1], 1e-12)
    cov_ok = (w_ev[0] > -1e-3 * w_max) & (w_max < 1e4)
    cov15 = (V_ev * jnp.clip(w_ev, 1e-10, None)) @ V_ev.T

    n_obs = jnp.sum(inp.obs_mask)
    # excitation gate (see DynamicInitOptions.min_excite_*): either the
    # specific force or the body rate must actually vary over the window.
    # Per-axis RANGE, not std — segment padding repeats the last sample
    # and would deflate a std by the padding ratio.
    a_flat = inp.imu_a.reshape(-1, 3)
    w_flat = inp.imu_w.reshape(-1, 3)
    a_rng = jnp.max(a_flat, axis=0) - jnp.min(a_flat, axis=0)
    w_rng = jnp.max(w_flat, axis=0) - jnp.min(w_flat, axis=0)
    excited = ((jnp.linalg.norm(a_rng) > opts.min_excite_a)
               | (jnp.linalg.norm(w_rng) > opts.min_excite_w))
    success = (
        jnp.isfinite(cost)
        & (cost < cost0 + 1.0)
        & jnp.all(jnp.isfinite(theta))
        & (n_obs >= 4 * P)
        & (jnp.linalg.norm(bg) < 0.5)
        & (jnp.linalg.norm(ba) < 1.0)
        & cov_ok
        & excited
    )
    return DynInitResult(
        success=success,
        q_GtoI=lie.rot_2_quat(R_GtoIk),
        p=p_last_G, v=v_last_G, bg=bg, ba=ba, cov15=cov15,
        R_I0toIk=R_k, p_k_in0=p_k,
    )
