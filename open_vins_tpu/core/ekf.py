"""EKF core kernels over the static state layout.

Capability parity with ov_msckf::StateHelper (StateHelper.{h,cpp}): covariance
propagation that touches only the IMU block, clone augmentation with the
time-offset Jacobian, marginalization, the Kalman update with per-variable
gain accumulation, delayed landmark initialization via an orthogonal split of
the feature system, and chi-squared gating tables.

TPU-first notes:
  * all shapes are static; "marginalize" zeroes covariance rows/cols instead
    of shrinking the matrix; "which rows are active" is carried by masks,
  * the update is dense MXU work: P·Hᵀ, a Cholesky solve, and a symmetric
    downdate — padded measurement rows carry H=0, res=0, R=1 so they are
    exact no-ops,
  * the reference's sequential Givens sweeps (UpdaterHelper.cpp:426-487)
    are replaced by batched Householder QR (jnp.linalg.qr) — numerically an
    orthogonal transform of the same system, hence an equivalent filter.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import VioState, boxplus, next_slot
from open_vins_tpu.ops import lie

# ---------------------------------------------------------------------------
# chi2 gating table (0.95 quantile by dof), host-side constant.
# Reference: UpdaterMSCKF.cpp:52-55 precomputes boost chi_squared quantiles.
# ---------------------------------------------------------------------------

_CHI2_MAX_DOF = 1024


def _build_chi2_table(q=0.95, max_dof=_CHI2_MAX_DOF):
    from scipy.stats import chi2 as _chi2

    dof = np.arange(1, max_dof + 1)
    return np.concatenate([[np.inf], _chi2.ppf(q, dof)]).astype(np.float32)


CHI2_95 = jnp.asarray(_build_chi2_table())


def chi2_gate(dof):
    """0.95 chi-square threshold for (possibly traced) integer dof."""
    return CHI2_95[jnp.clip(dof, 0, _CHI2_MAX_DOF)]


# ---------------------------------------------------------------------------
# propagation
# ---------------------------------------------------------------------------


def propagate_covariance(cov, Phi, Qd, cfg: FilterConfig, B=None):
    """P <- Φ_full P Φ_fullᵀ + Q with the block-sparse transition
    Φ_full = [[Φ, B],[0, I]]: Φ on the leading IMU block, optional columns
    B [15,24] into the IMU-intrinsic block (identity dynamics elsewhere).

    Mirrors StateHelper::EKFPropagation's structure (StateHelper.cpp:33-114):
    only the IMU rows/cols change.
    """
    d = cfg.imu_dim
    if B is None:
        Pii = cov[:d, :d]
        Pix = cov[:d, d:]
        new_ii = Phi @ Pii @ Phi.T + Qd
        new_ii = 0.5 * (new_ii + new_ii.T)
        new_ix = Phi @ Pix
        top = jnp.concatenate([new_ii, new_ix], axis=1)
        bot = jnp.concatenate([new_ix.T, cov[d:, d:]], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    gi = cfg.imu_dw_off
    gd = cfg.imu_intr_dim
    J = jnp.concatenate([Phi, B], axis=1)  # [15, 15+24]
    P_sel = jnp.concatenate([cov[:d, :], cov[gi : gi + gd, :]], axis=0)
    rows_new = J @ P_sel  # [15, D]
    corner = rows_new[:, :d] @ Phi.T + rows_new[:, gi : gi + gd] @ B.T + Qd
    corner = 0.5 * (corner + corner.T)
    top = jnp.concatenate([corner, rows_new[:, d:]], axis=1)
    bot = jnp.concatenate([rows_new[:, d:].T, cov[d:, d:]], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def augment_clone(state: VioState, cfg: FilterConfig, w_hat) -> VioState:
    """Stochastic cloning of the current IMU pose into the next ring slot.

    Mirrors StateHelper::augment_clone (StateHelper.cpp:579-616): the clone
    error is [θ_imu; p_imu], plus — when estimating the camera-IMU time
    offset — the Li&Mourikis dt column [ω̂; v].  The ring slot being reused
    must already be marginalized (zero rows/cols).
    """
    D = cfg.state_dim
    slot = next_slot(state, cfg)
    off = cfg.clones_off + 6 * slot

    # J [6, D]: rows of the new clone w.r.t. the existing state
    J = jnp.zeros((6, D), dtype=state.cov.dtype)
    J = J.at[0:3, cfg.th_off : cfg.th_off + 3].set(jnp.eye(3, dtype=state.cov.dtype))
    J = J.at[3:6, cfg.p_off : cfg.p_off + 3].set(jnp.eye(3, dtype=state.cov.dtype))
    if cfg.calib_cam_timeoffset:
        dt_col = jnp.concatenate([w_hat, state.v])
        J = J.at[:, cfg.calib_dt_off].set(dt_col)

    new_rows = J @ state.cov  # [6, D]
    corner = new_rows @ J.T  # [6, 6]

    # Write the clone block by ONE-HOT expansion + selects, not
    # dynamic-update-slice: traced-offset DUS on the [D,D] covariance under
    # a vmapped ensemble compiled into layout-copy-heavy ops (~43 µs/frame
    # each at B=8 in the TPU profile); the select form fuses to elementwise.
    idx = jnp.arange(D)
    rm = (idx >= off) & (idx < off + 6)  # [D] clone-row mask
    E = (idx[:, None] == off + jnp.arange(6)[None, :]).astype(
        state.cov.dtype)  # [D, 6]
    rows_full = E @ new_rows            # [D, D], nonzero only at clone rows
    corner_full = E @ corner @ E.T      # [D, D], nonzero only at the corner
    cov = jnp.where(rm[:, None] & rm[None, :], corner_full,
                    jnp.where(rm[:, None], rows_full,
                              jnp.where(rm[None, :], rows_full.T,
                                        state.cov)))

    C = cfg.max_clones
    # Clone VALUE: the pose at the measurement's IMU-clock time
    # t_cam + dt_est.  The reference re-selects/interpolates the IMU window
    # to the shifted boundary (Propagator::select_imu_readings with
    # t_off_new, Propagator.cpp:71-130); here the IMU state stays on the
    # unshifted camera grid and the CLONE is extended first-order by the
    # current dt estimate — δclone = dt_est·[ω̂; v] — which is exactly the
    # linearization the Li&Mourikis dt column above encodes, so mean and
    # Jacobian stay consistent and the predicted measurements actually
    # respond to dt updates (without this, dt estimation random-walks:
    # the filter believes moving dt shifts the clones, but they never
    # move).  Equivalent to the reference to first order in dt_est.
    clone_q_val, clone_p_val = state.q, state.p
    clone_q_fej_val, clone_p_fej_val = state.q_fej, state.p_fej
    if cfg.calib_cam_timeoffset:
        from open_vins_tpu.core.state import _quat_boxplus

        dtau = state.calib_dt
        clone_q_val = _quat_boxplus(state.q, w_hat * dtau)
        clone_p_val = state.p + state.v * dtau
        clone_q_fej_val = _quat_boxplus(state.q_fej, w_hat * dtau)
        clone_p_fej_val = state.p_fej + state.v * dtau

    return state._replace(
        cov=cov,
        clones_q=state.clones_q.at[slot].set(clone_q_val),
        clones_p=state.clones_p.at[slot].set(clone_p_val),
        clones_q_fej=state.clones_q_fej.at[slot].set(clone_q_fej_val),
        clones_p_fej=state.clones_p_fej.at[slot].set(clone_p_fej_val),
        clone_t=state.clone_t.at[slot].set(state.t),
        clone_valid=state.clone_valid.at[slot].set(True),
        head=slot.astype(jnp.int32),
        n_clones=jnp.minimum(state.n_clones + 1, C),
    )


def marginalize_clone(state: VioState, cfg: FilterConfig, slot) -> VioState:
    """Drop a clone: zero its covariance rows/cols and free the slot.

    Equivalent to StateHelper::marginalize (StateHelper.cpp:271-339) under the
    static layout (dropping rows/cols == zeroing them + masking the slot).
    """
    off = cfg.clones_off + 6 * slot
    D = cfg.state_dim
    idx = jnp.arange(D)
    keep = ~((idx >= off) & (idx < off + 6))  # zero rows/cols by outer mask
    cov = jnp.where(keep[:, None] & keep[None, :], state.cov, 0.0)
    return state._replace(
        cov=cov,
        clone_valid=state.clone_valid.at[slot].set(False),
        clone_t=state.clone_t.at[slot].set(-1.0),
        n_clones=jnp.maximum(state.n_clones - 1, 0),
    )


def marginalize_slam_slot(state: VioState, cfg: FilterConfig, slot) -> VioState:
    """Free a SLAM landmark slot (StateHelper::marginalize_slam parity)."""
    off = cfg.slam_off + 3 * slot
    D = cfg.state_dim
    idx = jnp.arange(D)
    keep = ~((idx >= off) & (idx < off + 3))  # zero rows/cols by outer mask
    cov = jnp.where(keep[:, None] & keep[None, :], state.cov, 0.0)
    return state._replace(
        cov=cov,
        slam_valid=state.slam_valid.at[slot].set(False),
        slam_id=state.slam_id.at[slot].set(-1),
    )


# ---------------------------------------------------------------------------
# update
# ---------------------------------------------------------------------------


def active_mask(state: VioState, cfg: FilterConfig):
    """[D] bool mask of error-state entries that are currently estimated."""
    D = cfg.state_dim
    m = np.zeros(D, dtype=bool)
    m[: cfg.imu_dim] = True
    mask = jnp.asarray(m)
    clone_mask = jnp.repeat(state.clone_valid, 6)
    mask = mask.at[cfg.clones_off : cfg.clones_off + 6 * cfg.max_clones].set(clone_mask)
    slam_mask = jnp.repeat(state.slam_valid, 3)
    mask = mask.at[cfg.slam_off : cfg.slam_off + 3 * cfg.max_slam].set(slam_mask)
    if cfg.calib_cam_timeoffset:
        mask = mask.at[cfg.calib_dt_off].set(True)
    if cfg.calib_cam_extrinsics:
        mask = mask.at[cfg.calib_ext_off : cfg.calib_ext_off + 6 * cfg.num_cams].set(True)
    if cfg.calib_cam_intrinsics:
        mask = mask.at[cfg.calib_intr_off : cfg.calib_intr_off + 8 * cfg.num_cams].set(True)
    if cfg.calib_imu_intrinsics:
        mask = mask.at[cfg.imu_dw_off : cfg.imu_dw_off + 12].set(True)
        mask = mask.at[cfg.imu_thw_off : cfg.imu_thw_off + 3].set(True)
    if cfg.calib_imu_g_sensitivity:
        mask = mask.at[cfg.imu_tg_off : cfg.imu_tg_off + 9].set(True)
    return mask


def kalman_update_math(cov, H, res, r_diag, fuse_downdate=True, ranges=None):
    """The shared dense update math: (dx [D], new_cov [D,D]).

    M = P Hᵀ, S = H M + R solved by Cholesky, symmetric covariance downdate
    (StateHelper::EKFUpdate core, StateHelper.cpp:116-197).  Padded rows
    must carry H=0, res=0, r_diag=1 (exact no-ops).  `fuse_downdate` routes
    the downdate through the tiled Pallas kernel on TPU; the GSPMD-sharded
    caller keeps the plain matmul form so XLA can shard it
    (parallel/sharded_ekf.py).

    `ranges` (static (start, stop) tuples): column support of H — rows must
    be exactly zero outside it (FilterConfig.cam_meas_support_ranges).  The
    P·Hᵀ and S products then contract over k = |support| columns instead of
    D; identical results, ~D/k fewer flops on the latency-bound small side.
    """
    if ranges is not None:
        from open_vins_tpu.models.update_helper import take_cols

        H_s = take_cols(H, ranges)  # [m, k]
        PHt = take_cols(cov, ranges) @ H_s.T  # [D, m]
        S = H_s @ take_cols(PHt.T, ranges).T + jnp.diag(r_diag)
    else:
        PHt = cov @ H.T  # [D, m]
        S = H @ PHt + jnp.diag(r_diag)
    S = 0.5 * (S + S.T)
    # One-sweep form: with L = chol(S) and Y = L⁻¹[PHtᵀ | res],
    #   dx = K res = Y₁ᵀ y,   P⁺ = P − K S Kᵀ = P − Y₁ᵀ Y₁
    # — the explicit gain K = P Hᵀ S⁻¹ (and its second triangular sweep,
    # another blocked custom call on the latency-bound critical path) never
    # needs to be formed, and the downdate term is symmetric by
    # construction instead of by averaging.
    L = jnp.linalg.cholesky(S)
    D = cov.shape[0]
    Yt = jax.scipy.linalg.solve_triangular(
        L, jnp.concatenate([PHt.T, res[:, None]], axis=1), lower=True)
    Y1, y = Yt[:, :D], Yt[:, D]
    dx = Y1.T @ y
    if fuse_downdate:
        from open_vins_tpu.ops.pallas_kernels import symmetric_downdate

        new_cov = symmetric_downdate(cov, Y1.T, Y1.T)
    else:
        new_cov = cov - Y1.T @ Y1
        new_cov = 0.5 * (new_cov + new_cov.T)
    # final NaN-kill (project convention): if the S-Cholesky went
    # indefinite in f32 (e.g. extreme-magnitude rows slipping every
    # upstream gate), the update degrades to an exact NO-OP instead of
    # writing NaN into the state — the same convention every other
    # update form already carries
    ok = jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(new_cov))
    dx = jnp.where(ok, dx, 0.0)
    new_cov = jnp.where(ok, new_cov, cov)
    return dx, new_cov


def ekf_update(state: VioState, cfg: FilterConfig, H, res, r_diag,
               ranges=None) -> VioState:
    """Standard EKF update; padded rows must have H=0, res=0, r_diag=1.

    Mirrors StateHelper::EKFUpdate (StateHelper.cpp:116-197).  The reference
    aborts on negative covariance diagonals; here we clamp-symmetrize (f32
    on TPU) and expose the diagonal for health checks.  `ranges`: static
    column support of H (see kalman_update_math).
    """
    dx, cov = kalman_update_math(state.cov, H, res, r_diag, ranges=ranges)
    new_state = boxplus(state, cfg, dx)
    return new_state._replace(cov=cov)


def kalman_update_math_info(cov, H, res, ranges, return_gamma=False):
    """Push-through (Woodbury) form of the EKF update — the single-solve
    path for a TALL row-whitened stack with static column support.

    For unit-noise rows, K = P Hᵀ(H P Hᵀ + I)⁻¹ = P (HᵀH P + I)⁻¹Hᵀ (the
    push-through identity), which on the k-column support `ranges` reduces
    to ONE k×k LU solve:

        G = H_sᵀ H_s,  g = H_sᵀ res,  M = I + G P_ss
        dx = P_:s M⁻¹ g,   P⁺ = P − P_:s M⁻¹ G P_s:

    Exactly the same update as compress-then-solve (the orthogonal
    compression preserves G and g by construction), but the two CholeskyQR2
    factorizations + the S-Cholesky + their triangular solves — each a
    panel-split custom call with fixed launch latency on TPU — collapse
    into one grammian matmul (MXU, rows are the contraction dim) and one
    getrf.  Unlike `compress_system_cholesky` (the quarantined fast path)
    no jitter is added anywhere: M = I + (PSD·PSD) has eigenvalues ≥ 1 and
    needs none, so there is no spurious-information channel; the f32
    grammian rounding is the same one CholeskyQR2's RᵀR = AᵀA carries.
    Zero rows contribute nothing to G/g — exact update no-ops, same
    padded-row convention as `kalman_update_math`.

    H must already be whitened (rows divided by their noise std).
    Returns (dx [D], new_cov [D,D]); with `return_gamma=True` also the χ²
    statistic γ = resᵀ(H P Hᵀ + I)⁻¹res = resᵀres − gᵀP_ss(M⁻¹g), which
    reuses the SAME LU solve — a free gate (the ZUPT shares it).
    """
    from open_vins_tpu.models.update_helper import take_cols
    from open_vins_tpu.ops.pallas_kernels import symmetric_downdate

    D = cov.shape[0]
    H_s = take_cols(H, ranges)          # [m, k]
    P_cols = take_cols(cov, ranges)     # [D, k] = P_:s
    P_ss = take_cols(P_cols.T, ranges).T  # [k, k]
    k = H_s.shape[1]
    G = H_s.T @ H_s                     # [k, k] one MXU pass over m rows
    g = H_s.T @ res                     # [k]
    M = jnp.eye(k, dtype=cov.dtype) + G @ P_ss
    lu = jax.scipy.linalg.lu_factor(M)
    B = jnp.concatenate([G @ P_cols.T, g[:, None]], axis=1)  # [k, D+1]
    X = jax.scipy.linalg.lu_solve(lu, B)
    W, y = X[:, :D], X[:, D]
    dx = P_cols @ y
    new_cov = symmetric_downdate(cov, P_cols, W.T)
    if return_gamma:
        gamma = res @ res - g @ (P_ss @ y)
        return dx, new_cov, gamma
    return dx, new_cov


def newton_inverse(A, iters=22, refine=0):
    """A⁻¹ by Hotelling–Bodewig (Newton) iteration — matmuls only.

    X_{j+1} = X_j (2I − A X_j) with X_0 = I/‖A‖_F.  The residual operator
    squares each step: I − X_{j+1}A = (I − X_j A)², so from the scalar
    start every eigenvalue λ of A contracts once |1 − λ/σ| < 1 — guaranteed
    here because σ = ‖A‖_F ≥ λmax and the intended A (= I + G·P, a product
    of PSDs plus I) has real spectrum in [1, λmax].  Convergence to f32
    resolution needs 2^iters ≳ 16·σ, i.e. iters = 22 covers σ ≤ 2.6e5.

    Why this exists: on TPU every factorization (getrf/potrf/trsm) is a
    blocked custom call whose panel recursion serializes — and under vmap
    the BATCH serializes too (measured: the k=231 Cholesky/TRSM stack cost
    ~8× at B=8, erasing the ensemble axis).  Newton inversion is ~2·iters
    batched [B,k,k] matmuls: pure MXU work that scales with batch at
    near-zero marginal cost, needs no pivoting, and is self-correcting
    (errors contract quadratically) so f32 accuracy matches the LU solve.
    """
    k = A.shape[-1]
    eye = jnp.eye(k, dtype=A.dtype)
    sigma = jnp.sqrt(jnp.sum(A * A)) + jnp.asarray(1e-30, A.dtype)
    X = eye / sigma
    for _ in range(iters):
        X = X @ (2.0 * eye - A @ X)
    for _ in range(refine):
        X = X + X @ (eye - A @ X)
    return X


def kalman_update_math_newton(cov, H, res, ranges, iters=22,
                              return_gamma=False, return_resid=False,
                              polish_tol=1e-3, max_polish=6,
                              noop_tol=5e-2, null_basis=None,
                              joseph=False):
    """Push-through (Woodbury) update with the k×k inverse from
    `newton_inverse` — the CUSTOM-CALL-FREE joint vision update.

    Identical algebra to `kalman_update_math_info` (exact information form,
    no jitter anywhere: A = I + G·P_ss has eigenvalues ≥ 1), with the
    pivoted LU replaced by batched-matmul Newton inversion, so the whole
    update is MXU work that vmaps efficiently across ensemble streams.
    H must be row-whitened; zero rows are exact no-ops.

    Convergence policy (iters/σ): the fixed ``iters`` sweep of
    `newton_inverse` covers σ = ‖A‖_F ≤ 2^iters/16 (2.6e5 at the default
    22).  The applied solve XB is then POLISHED with iterative refinement
    W ← W + X(B − A·W) inside a `lax.while_loop`: the first sweep always
    runs (it is the accuracy-bearing refinement), and extra sweeps fire
    only while the relative residual ‖B − A·W‖∞/‖B‖∞ exceeds
    ``polish_tol`` (each sweep contracts the error by ρ(I−AX), which is
    < 1 for any σ ≥ λmax, so moderately out-of-regime σ self-corrects at
    a cost only paid when needed; under vmap, converged streams ride
    along).  If after ``max_polish`` sweeps the residual still exceeds
    ``noop_tol`` — or anything is non-finite — the update degrades to an
    exact NO-OP rather than injecting a wrong dx/covariance, and the
    returned residual (see ``return_resid``) makes the event visible in
    `StepDiag.newton_resid`.  A converged call costs exactly the same
    3 large matmuls as the fixed-1-sweep version did.
    """
    from open_vins_tpu.models.update_helper import take_cols
    from open_vins_tpu.ops.pallas_kernels import symmetric_downdate

    D = cov.shape[0]
    H_s = take_cols(H, ranges)            # [m, k]
    P_cols = take_cols(cov, ranges)       # [D, k]
    P_ss = take_cols(P_cols.T, ranges).T  # [k, k]
    G = H_s.T @ H_s
    g = H_s.T @ res
    if null_basis is not None:
        # gauge deflation (see deflate_gauge_info): kill the grammian's
        # rectified f32 information floor along the unobservable
        # directions before it reaches the update
        G, g = deflate_gauge_info(G, g, null_basis)
    A = jnp.eye(G.shape[0], dtype=cov.dtype) + G @ P_ss
    X = newton_inverse(A, iters=iters)
    B = jnp.concatenate([G @ P_cols.T, g[:, None]], axis=1)  # [k, D+1]
    denom = jnp.max(jnp.abs(B)) + jnp.asarray(1e-30, cov.dtype)

    def sweep(c):
        W, _, j = c
        r = B - A @ W
        rr = jnp.max(jnp.abs(r)) / denom
        # NaN-kill inside the loop: a non-finite residual must not spin
        # the loop to max_polish on garbage — report rr=inf and freeze W
        bad = ~jnp.isfinite(rr)
        rr = jnp.where(bad, jnp.inf, rr)
        W_next = jnp.where(bad, W, W + X @ r)
        return (W_next, rr, j + 1)

    carry = sweep((X @ B, jnp.asarray(jnp.inf, cov.dtype), 0))

    def cond(c):
        _, rr, j = c
        return jnp.isfinite(rr) & (rr > polish_tol) & (j < max_polish)

    XB, _, _ = jax.lax.while_loop(cond, sweep, carry)
    # gate + report on the residual of the SOLVE ACTUALLY APPLIED (one
    # extra [k,D+1] matmul, ~3% of the update): the in-loop rr describes
    # the pre-sweep iterate, and when the loop exits at max_polish a final
    # un-measured sweep would otherwise be accepted on a stale bound.
    resid_rel = jnp.max(jnp.abs(B - A @ XB)) / denom
    resid_rel = jnp.where(jnp.isfinite(resid_rel), resid_rel, jnp.inf)
    # NaN-kill convention: a non-finite or non-converged solve must degrade
    # to a no-op update, never escape into the state/covariance.
    ok = jnp.all(jnp.isfinite(XB)) & (resid_rel < noop_tol)
    XB = jnp.where(ok, XB, 0.0)
    W, y = XB[:, :D], XB[:, D]
    dx = P_cols @ y
    if joseph:
        # JOSEPH-FORM covariance: P⁺ = (I−KH)P(I−KH)ᵀ + KKᵀ, evaluated
        # with the support-structured products (no [D,m] K is ever
        # formed; ~6 extra MXU matmuls, still zero custom calls).  Why:
        # Joseph is STATIONARY w.r.t. gain errors (∂P⁺/∂K = 0 at the
        # optimal K), so the first-order f32 error of the solve/products
        # cannot bias the posterior covariance — the r05 long-horizon
        # yaw-leak hypothesis for the plain info-form downdate
        # P − P_cols(A⁻¹G)P_colsᵀ, whose bilinear evaluation is
        # first-order sensitive.  KH P = P_cols·W with the W already
        # solved; the quadratic terms reuse M2 = X·G.
        M2 = X @ G                       # [k, k] = A⁻¹G (+solve error)
        C = P_cols @ M2                  # [D, k]
        PX = P_cols @ X                  # [D, k]
        quad = C @ (P_ss @ C.T)          # KH P KHᵀ
        gram = C @ PX.T                  # K Kᵀ = P_cols X G Xᵀ P_colsᵀ
        # ALL covariance terms share the SAME K (raw X, not the polished
        # solve) — stationarity only holds when linear and quadratic
        # terms use one gain; dx keeps the polished y
        PW = P_cols @ (M2 @ P_cols.T)    # KH P (and its transpose)
        jc = cov - PW - PW.T + quad + gram
        jc = 0.5 * (jc + jc.T)
        # no-op/NaN gate (same convention as the solve path): a
        # non-converged or non-finite gain leaves the covariance alone
        jok = ok & jnp.all(jnp.isfinite(jc))
        new_cov = jnp.where(jok, jc, cov)
    else:
        new_cov = symmetric_downdate(cov, P_cols, W.T)
    out = (dx, new_cov)
    if return_gamma:
        gamma = res @ res - g @ (P_ss @ (X @ g))
        out = out + (gamma,)
    if return_resid:
        out = out + (resid_rel,)
    return out


_GAUGE_DEFLATE_REPS = frozenset((
    "GLOBAL_3D", "ANCHORED_3D", "ANCHORED_FULL_INVERSE_DEPTH",
    "ANCHORED_MSCKF_INVERSE_DEPTH", "ANCHORED_INVERSE_DEPTH_SINGLE"))


def gauge_deflation_supported(cfg: FilterConfig) -> bool:
    """Static check: can the gauge nullspace be built for this config?

    Anchored landmark parameters are invariant under a global gauge
    transform (they live relative to the anchor pose), so their nullspace
    rows are exact zeros; GLOBAL_3D rows are explicit.  The spherical
    GLOBAL_FULL_INVERSE_DEPTH parameterization's gauge rows are not
    implemented — deflation is skipped there (python-level, so the jit
    never traces the unsupported path)."""
    return cfg.feat_rep_slam in _GAUGE_DEFLATE_REPS


def gauge_null_basis_support(state: VioState, cfg: FilterConfig, ranges):
    """Orthonormal basis [k, 4] of the VIO gauge nullspace — 3 global
    translations + global yaw — restricted to the measurement support
    columns, evaluated at FEJ values.

    The observability-constrained-EKF direction set (Hesch/Huang
    consistency analysis): for a world-frame gauge rotation δψ about
    gravity ẑ and translation t, each clone pose perturbs as
    δθ_i = R_i,fej ẑ·δψ (JPL local error of R' = R·R_z) and
    δp_i = ẑ×p_i,fej·δψ − t; GLOBAL_3D landmarks likewise; anchored
    landmark params and calib blocks are invariant (zero rows).  Columns
    are CGS2-orthonormalized; an all-zero column (e.g. no valid state
    yet) stays zero, making the downstream deflation an exact no-op."""
    from open_vins_tpu.models.update_helper import take_cols
    from open_vins_tpu.ops import lie

    dtype = state.cov.dtype
    C, L, D = cfg.max_clones, cfg.max_slam, cfg.state_dim
    zhat = jnp.asarray([0.0, 0.0, 1.0], dtype)
    N = jnp.zeros((D, 4), dtype)
    Rs = jax.vmap(lie.quat_2_rot)(state.clones_q_fej)  # [C,3,3]
    cb = jnp.zeros((C, 6, 4), dtype)
    cb = cb.at[:, 0:3, 3].set(Rs @ zhat)
    cb = cb.at[:, 3:6, 3].set(jnp.cross(
        jnp.broadcast_to(zhat, (C, 3)), state.clones_p_fej))
    cb = cb.at[:, 3:6, 0:3].set(jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                                 (C, 3, 3)))
    cb = cb * state.clone_valid.astype(dtype)[:, None, None]
    N = N.at[cfg.clones_off:cfg.clones_off + 6 * C].set(
        cb.reshape(6 * C, 4))
    if L > 0 and cfg.feat_rep_slam == "GLOBAL_3D":
        lb = jnp.zeros((L, 3, 4), dtype)
        lb = lb.at[:, :, 3].set(jnp.cross(
            jnp.broadcast_to(zhat, (L, 3)), state.slam_p_fej))
        lb = lb.at[:, :, 0:3].set(jnp.broadcast_to(
            jnp.eye(3, dtype=dtype), (L, 3, 3)))
        lb = lb * state.slam_valid.astype(dtype)[:, None, None]
        N = N.at[cfg.slam_off:cfg.slam_off + 3 * L].set(
            lb.reshape(3 * L, 4))
    N_s = take_cols(N.T, ranges).T  # [k, 4]
    # CGS2 orthonormalization; zero columns stay exactly zero
    cols = []
    for j in range(4):
        v = N_s[:, j]
        for _ in range(2):
            for u in cols:
                v = v - (u @ v) * u
        nrm = jnp.sqrt(jnp.sum(v * v))
        v = jnp.where(nrm > 1e-6, v / jnp.maximum(nrm, 1e-30), 0.0)
        cols.append(v)
    return jnp.stack(cols, axis=1)


def deflate_gauge_info(G, g, N):
    """Remove the gauge-direction information from (G = HᵀH, g = Hᵀres):
    G ← (I−NNᵀ)G(I−NNᵀ), g ← (I−NNᵀ)g — the observability-constrained-EKF
    projection realized on the information form.

    STATUS (r05, experimental — FilterConfig.gauge_deflation, default
    off): the basis from gauge_null_basis_support is verified against
    live stacks (‖H·N‖/‖H‖ ≈ 3e-8) and this projection is pinned exact
    on synthetic nullspaces (1e-6 rel), but it does NOT cure the newton
    form's long-horizon yaw-variance leak — the leak is therefore not
    gauge-direction information in G.  See the joint_update_form comment
    in core/layout.py for the measured facts and leading hypothesis."""
    GN = G @ N                       # [k, 4]
    NtGN = N.T @ GN                  # [4, 4]
    G = G - N @ GN.T - GN @ N.T + N @ (NtGN @ N.T)
    g = g - N @ (N.T @ g)
    return G, g


def ekf_update_newton(state: VioState, cfg: FilterConfig, H, res,
                      ranges, return_resid=False):
    """`ekf_update` via the Newton push-through form (see
    kalman_update_math_newton); H row-whitened, zero rows exact no-ops.
    With ``return_resid`` also returns the solve's relative residual for
    diagnostics (`StepDiag.newton_resid`)."""
    nb = (gauge_null_basis_support(state, cfg, ranges)
          if cfg.gauge_deflation and gauge_deflation_supported(cfg)
          else None)
    out = kalman_update_math_newton(state.cov, H, res, ranges,
                                    iters=cfg.newton_iters,
                                    return_resid=return_resid,
                                    null_basis=nb,
                                    joseph=cfg.newton_joseph)
    dx, cov = out[0], out[1]
    new_state = boxplus(state, cfg, dx)._replace(cov=cov)
    if return_resid:
        return new_state, out[2]
    return new_state


def kalman_update_math_spd(cov, H, res, ranges):
    """Push-through update via SYMMETRIC factorizations — the minimum-
    custom-call form of the joint vision update on TPU.

    Same information-form algebra as `kalman_update_math_info` (H row-
    whitened, zero rows exact no-ops, static column support `ranges`), but
    the non-symmetric M = I + G·P_ss and its pivoted LU — whose row
    interchanges serialize on TPU (measured: the "woodbury" form lost 30%
    frame rate to them) — are replaced through the push-through identity
        (I + G P)⁻¹ = I − G L_p (I + L_pᵀ G L_p)⁻¹ L_pᵀ ,   P = L_p L_pᵀ
    so every factorization is a Cholesky of an SPD matrix:

        G = H_sᵀH_s, g = H_sᵀres          (one MXU pass over the m rows —
                                           the compression stage disappears)
        L_p : ANY factor of P̃_ss ≈ P_ss   (the identity is exact for
                                           P̃ = L_pL_pᵀ whatever L_p is, so
                                           only Cholesky *stability* matters
                                           — see below)
        M = I + L_pᵀ G L_p                (SPD, eigenvalues ≥ 1 — needs no
                                           jitter of its own)
        Y = L_m⁻¹ [L_pᵀG | L_pᵀg]         (ONE triangular solve)
        W = G − Y_VᵀY_V  (sym),  w = g − Y_Vᵀy_g
        dx = P_:s w,     P⁺ = P − (P_:s W) P_s:   (fused Pallas downdate)

    Three k×k custom calls total (2 chol + 1 trsm) versus the QR path's
    five (CholeskyQR2's two chol + trsm, then the S-chol + solve); all the
    m-row work is a single grammian matmul.  Exactness: identical to the
    compress-then-solve update in exact arithmetic (same identity as the
    LU form, which the equivalence tests pin against qr); in f32 it shares
    the grammian's squared-condition rounding with CholeskyQR2's first
    pass — the closed-loop NEES/RMSE suites are the guard.

    The covariance-side factorization must survive a genuinely singular
    P_ss: inactive slots carry exact zero rows, and early-window clones are
    near-copies of the IMU pose (rank ≪ k at scale ~Q·dt).  A raw
    chol(P_ss + εI) with scalar ε breaks in f32 (negative pivots → NaN at
    ~frame 9 of every run).  So the factorization is EQUILIBRATED: with
    s = √max(diag P_ss, floor),  P̂ = P_ss/(ssᵀ) has unit active diagonal,
    and L_p = s·chol(P̂ + εI) factors P̃ = P_ss + ε·diag(s²) — a *relative*
    per-dimension jitter (ε = 3e-5: the update behaves as if each prior
    variance were 1.00003× itself — a conservative, non-information-
    injecting perturbation of the gain operator only; P⁺ stays PSD since
    W̃ = (G⁻¹+P̃)⁻¹ decreases as P̃ grows).  Closed-loop agreement with the
    qr form: ≤1 mm trajectory / ≤5e-5 covariance divergence over 8 s sims.

    NaN-safety (the round-2 CPU closed-loop failure): repeated downdates
    leave tiny f32 residue — slightly-negative diagonals and off-diagonal
    leftovers — on dims whose covariance was zeroed (marginalized slots).
    Normalizing by their floored √diag turns that residue into O(1)
    garbage correlations, P̂ goes indefinite beyond the 3e-5 jitter, and
    the Cholesky NaNs (platform-dependent: CPU LAPACK returned NaN where
    the TPU kernel did not).  Defenses, all in the gain operator only
    (P̃ = L_pL_pᵀ is a *valid prior substitute whatever L_p is* — any
    P̃ ⪰ P_ss keeps P⁺ conservative-PSD by operator monotonicity):
      1. dims with diag below a RELATIVE floor (1e-10·max d) are treated
         as dead: their P̂ rows/cols are zeroed (unit diag) and s_eff = 0,
         so P̃ carries exact zero for them — residue never enters,
      2. P̂ entries are clamped to the [-1, 1] correlation range and the
         diagonal pinned to exactly 1 (kills negative-diagonal residue),
      3. the Cholesky is tiered: ε = 3e-5, escalate to 3e-3 under a
         lax.cond if any NaN appears (pays only when triggered), and a
         final diagonal-factor fallback (L̂ = I ⇒ P̃ = diag s²) guarded by
         jnp.where — NaNs can never leave this function.
    """
    from open_vins_tpu.models.update_helper import take_cols
    from open_vins_tpu.ops.pallas_kernels import symmetric_downdate

    H_s = take_cols(H, ranges)           # [m, k]
    P_cols = take_cols(cov, ranges)      # [D, k]
    P_ss = take_cols(P_cols.T, ranges).T  # [k, k]
    k = H_s.shape[1]
    dt = cov.dtype
    eye = jnp.eye(k, dtype=dt)
    G = H_s.T @ H_s                      # [k, k]
    g = H_s.T @ res                      # [k]
    d = jnp.diag(P_ss)
    dmax = jnp.max(jnp.maximum(d, 0.0))
    alive = d > 1e-10 * dmax
    floor = 1e-12 * dmax + jnp.asarray(1e-30, dt)
    s = jnp.sqrt(jnp.maximum(d, floor))
    P_hat = P_ss / (s[:, None] * s[None, :])
    P_hat = 0.5 * (P_hat + P_hat.T)
    P_hat = jnp.clip(P_hat, -1.0, 1.0)
    P_hat = jnp.where(alive[:, None] & alive[None, :], P_hat, 0.0)
    P_hat = P_hat - jnp.diag(jnp.diag(P_hat)) + eye
    L_hat = jnp.linalg.cholesky(P_hat + 3e-5 * eye)
    L_hat = jax.lax.cond(
        jnp.all(jnp.isfinite(L_hat)),
        lambda a, _: a,
        lambda _, Ph: jnp.linalg.cholesky(Ph + 3e-3 * eye),
        L_hat, P_hat)
    L_hat = jnp.where(jnp.all(jnp.isfinite(L_hat)), L_hat, eye)
    s_eff = jnp.where(alive, s, 0.0)
    L_p = s_eff[:, None] * L_hat
    V = L_p.T @ G                        # [k, k]
    vg = L_p.T @ g                       # [k]
    M = eye + V @ L_p                    # = I + L_pᵀ G L_p  (SPD)
    L_m = jnp.linalg.cholesky(0.5 * (M + M.T))
    Y = jax.scipy.linalg.solve_triangular(
        L_m, jnp.concatenate([V, vg[:, None]], axis=1), lower=True)
    Y_V, y_g = Y[:, :k], Y[:, k]
    W = G - Y_V.T @ Y_V
    W = 0.5 * (W + W.T)
    w = g - Y_V.T @ y_g
    dx = P_cols @ w
    new_cov = symmetric_downdate(cov, P_cols @ W, P_cols)
    return dx, new_cov


def ekf_update_spd(state: VioState, cfg: FilterConfig, H, res,
                   ranges) -> VioState:
    """`ekf_update` via the symmetric push-through form (see
    kalman_update_math_spd); H row-whitened, zero rows are exact no-ops."""
    dx, cov = kalman_update_math_spd(state.cov, H, res, ranges)
    new_state = boxplus(state, cfg, dx)
    return new_state._replace(cov=cov)


def chi2_gamma_info(cov, H, res, ranges):
    """γ = resᵀ(H P Hᵀ + I)⁻¹res for a row-whitened H with static column
    support — push-through form, one k×k solve instead of an m×m one
    (m = stacked rows, k = |support|).  Same identity as
    kalman_update_math_info's gate; used where the gate is needed WITHOUT
    the update (e.g. the explicit-motion ZUPT applies a different H)."""
    from open_vins_tpu.models.update_helper import take_cols

    H_s = take_cols(H, ranges)
    P_cols = take_cols(cov, ranges)
    P_ss = take_cols(P_cols.T, ranges).T
    k = H_s.shape[1]
    G = H_s.T @ H_s
    g = H_s.T @ res
    M = jnp.eye(k, dtype=cov.dtype) + G @ P_ss
    y = jnp.linalg.solve(M, g)
    return res @ res - g @ (P_ss @ y)


def ekf_update_info(state: VioState, cfg: FilterConfig, H, res,
                    ranges) -> VioState:
    """`ekf_update` via the push-through form (see kalman_update_math_info);
    H row-whitened, zero rows are exact no-ops."""
    dx, cov = kalman_update_math_info(state.cov, H, res, ranges)
    new_state = boxplus(state, cfg, dx)
    return new_state._replace(cov=cov)


def set_initial_covariance(state: VioState, cfg: FilterConfig, diag) -> VioState:
    """Write a diagonal prior for the IMU block (+ calib if estimated).

    Parity with StateHelper::set_initial_covariance (StateHelper.cpp:199-224).
    `diag` is a [D] vector (entries for inactive blocks are ignored).
    """
    mask = active_mask(state, cfg)
    cov = jnp.diag(jnp.where(mask, diag, 0.0))
    return state._replace(cov=cov)


# ---------------------------------------------------------------------------
# delayed initialization (landmarks)
# ---------------------------------------------------------------------------


def initialize_landmark(
    state: VioState,
    cfg: FilterConfig,
    slot,
    feat_id,
    p_f,
    H_x,
    H_f,
    res,
    sigma_pix_norm,
    row_mask,
):
    """Insert a landmark into `slot` via delayed initialization.

    Equivalent to StateHelper::initialize + initialize_invertible
    (StateHelper.cpp:393-577): rotate the stacked feature system
        res = H_x δx + H_f δf + n,   n ~ N(0, σ² I)
    by the orthogonal basis of H_f (thin QR, replacing the reference's Givens
    sweep).  The top 3 rows give the invertible system that seeds the landmark
    covariance; the remaining rows are returned for a separate MSCKF-style
    update of the rest of the state.

    Args:
      H_x: [m, D] Jacobian w.r.t. existing state (dense rows, zero-padded).
      H_f: [m, 3] Jacobian w.r.t. the new landmark.
      res: [m] residual; row_mask: [m] valid-row mask.
      sigma_pix_norm: measurement noise std (normalized coords).

    Returns (new_state, H_up, res_up, up_row_mask): the leftover system to
    feed to `ekf_update` (rows already orthogonalized, count = m-3).
    """
    m = H_f.shape[0]
    D = cfg.state_dim
    mdtype = state.cov.dtype
    # zero out invalid rows so they do not affect the QR
    H_f = jnp.where(row_mask[:, None], H_f, 0.0)
    H_x = jnp.where(row_mask[:, None], H_x, 0.0)
    res = jnp.where(row_mask, res, 0.0)

    from open_vins_tpu.models.update_helper import householder_rotate

    R_full, B = householder_rotate(H_f, jnp.concatenate([H_x, res[:, None]], 1))
    Hx_rot, res_rot = B[:, :-1], B[:, -1]
    R1 = R_full[:3, :3]  # upper triangular
    Hx1 = Hx_rot[:3]  # [3, D]
    res1 = res_rot[:3]

    # Landmark covariance & cross-covariance (StateHelper.cpp:484-577 math):
    # δf = R1^{-1} (res1 - Hx1 δx - n1)
    # P_ff = R1^{-1} (Hx1 P Hx1ᵀ + σ² I) R1^{-ᵀ};  P_fx = -R1^{-1} Hx1 P
    R1_inv = jax.scipy.linalg.solve_triangular(
        R1 + jnp.eye(3, dtype=mdtype) * 1e-12, jnp.eye(3, dtype=mdtype)
    )
    HxP = Hx1 @ state.cov  # [3, D]
    P_ff = R1_inv @ (HxP @ Hx1.T + sigma_pix_norm**2 * jnp.eye(3, dtype=mdtype)) @ R1_inv.T
    P_fx = -(R1_inv @ HxP)  # [3, D]

    off = cfg.slam_off + 3 * slot
    cov = state.cov
    cov = jax.lax.dynamic_update_slice(cov, P_fx, (off, off * 0))
    cov = jax.lax.dynamic_update_slice(cov, P_fx.T, (off * 0, off))
    cov = jax.lax.dynamic_update_slice(cov, 0.5 * (P_ff + P_ff.T), (off, off))

    # apply the mean correction for the landmark: δf = R1^{-1} res1
    # (the reference folds this into Landmark::update via the combined system;
    # here the triangulated p_f is corrected by the rotated residual).
    # FEJ keeps the *triangulated* value — the reference sets the landmark's
    # fej before StateHelper::initialize and Landmark::update only moves the
    # estimate (UpdaterSLAM.cpp:218-222, StateHelper.cpp:570).
    df = R1_inv @ res1
    p_f_new = p_f + df

    new_state = state._replace(
        cov=cov,
        slam_p=state.slam_p.at[slot].set(p_f_new),
        slam_p_fej=state.slam_p_fej.at[slot].set(p_f),
        slam_id=state.slam_id.at[slot].set(feat_id.astype(jnp.int32)),
        slam_valid=state.slam_valid.at[slot].set(True),
    )

    # leftover rows (4..m) for the nullspace-style update.  NOTE: with
    # interleaved invalid observations the orthogonal rotation spreads the
    # valid information over ALL rows (not just the leading n_valid), and
    # every rotated row remains a legitimate measurement with iid σ noise —
    # rows stemming purely from zeroed inputs are exactly zero and harmless.
    H_up = Hx_rot[3:]
    res_up = res_rot[3:]
    up_mask = jnp.ones((m - 3,), dtype=bool)
    return new_state, H_up, res_up, up_mask


def initialize_landmark_single(
    state: VioState,
    cfg: FilterConfig,
    slot,
    feat_id,
    lam0,
    H_x,
    h_f,
    res,
    sigma_pix_norm,
    row_mask,
):
    """1-dof delayed initialization for ANCHORED_INVERSE_DEPTH_SINGLE.

    Same orthogonal-split construction as `initialize_landmark` but the new
    variable is the scalar inverse depth ρ (UpdaterSLAM.cpp:190-240 with
    landmark_size = 1): only covariance row/col `slam_off + 3*slot` is
    seeded; the two bearing slots stay frozen at zero covariance (they hold
    the fixed init bearing as data).

    Args:
      lam0: [3] = [ρ_triangulated, b_x, b_y]  (bearing already final).
      h_f: [m, 1] Jacobian w.r.t. ρ (bearing columns must already be
        nullspace-projected out of H_x/h_f/res by the caller).
    Returns (new_state, H_up [m-1, D], res_up [m-1], up_mask [m-1]).
    """
    m = h_f.shape[0]
    mdtype = state.cov.dtype
    h_f = jnp.where(row_mask[:, None], h_f, 0.0)
    H_x = jnp.where(row_mask[:, None], H_x, 0.0)
    res = jnp.where(row_mask, res, 0.0)

    from open_vins_tpu.models.update_helper import householder_rotate

    R_full, B = householder_rotate(h_f, jnp.concatenate([H_x, res[:, None]], 1))
    Hx_rot, res_rot = B[:, :-1], B[:, -1]
    r1 = R_full[0, 0]
    r1_inv = jnp.where(jnp.abs(r1) > 1e-9, 1.0 / r1, 0.0)
    Hx1 = Hx_rot[0:1]  # [1, D]
    res1 = res_rot[0]

    HxP = Hx1 @ state.cov  # [1, D]
    P_ff = (r1_inv**2) * (HxP @ Hx1.T + sigma_pix_norm**2)  # [1,1]
    P_fx = -(r1_inv * HxP)  # [1, D]

    off = cfg.slam_off + 3 * slot
    cov = state.cov
    cov = jax.lax.dynamic_update_slice(cov, P_fx, (off, off * 0))
    cov = jax.lax.dynamic_update_slice(cov, P_fx.T, (off * 0, off))
    cov = jax.lax.dynamic_update_slice(cov, P_ff, (off, off))

    drho = r1_inv * res1
    lam_new = lam0.at[0].add(drho)
    new_state = state._replace(
        cov=cov,
        slam_p=state.slam_p.at[slot].set(lam_new),
        slam_p_fej=state.slam_p_fej.at[slot].set(lam0),
        slam_id=state.slam_id.at[slot].set(feat_id.astype(jnp.int32)),
        slam_valid=state.slam_valid.at[slot].set(True),
    )
    H_up = Hx_rot[1:]
    res_up = res_rot[1:]
    up_mask = jnp.ones((m - 1,), dtype=bool)
    return new_state, H_up, res_up, up_mask
