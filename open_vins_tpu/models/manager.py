"""Per-frame VIO orchestration — the VioManager re-designed as one jit step.

Capability parity with ov_msckf::VioManager (VioManager.cpp:256-714):
marginalize-oldest, propagate+clone, ingest tracked features, triage
(lost / full-window), triangulate, per-feature Jacobians, nullspace
projection, chi-squared gating, stacking, QR compression, one EKF update,
and post-update cleanup.

Scheduling note (vs the reference): the reference marginalizes the oldest
clone at the *end* of a frame (VioManager.cpp:596) after using its
measurements; with a fixed ring of `max_clones` slots we marginalize at the
*start* of the next frame instead — the same measurements are available to
the same updates, one frame-boundary later, and the window never exceeds
its static capacity.

The whole step is one jit-compiled function over static shapes; an entire
run is `lax.scan(step_frame, ...)` over pre-staged frame inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.core import ekf
from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import VioState, init_state, oldest_slot
from open_vins_tpu.models import feature_table as ft
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.models import update_helper as uh
from open_vins_tpu.models import updater_slam as slam
from open_vins_tpu.models import updater_zupt as zupt
from open_vins_tpu.models.propagator import ImuWindow, propagate
from open_vins_tpu.ops import lie
from open_vins_tpu.ops.indexing import take1


class FrameInput(NamedTuple):
    """All inputs for one camera frame (static shapes; scan-friendly)."""

    win: ImuWindow  # IMU samples covering (t_prev, t_new]
    t_new: jax.Array  # scalar frame time (imu clock)
    ids: jax.Array  # [N, P] feature ids
    uv: jax.Array  # [N, P, 2] raw pixels
    uvn: jax.Array  # [N, P, 2] normalized
    mask: jax.Array  # [N, P]


class StepDiag(NamedTuple):
    n_msckf: jax.Array  # features used in the MSCKF update
    n_tracks: jax.Array  # live rows in the table
    chi2_mean: jax.Array
    n_slam: jax.Array  # active SLAM landmarks
    n_slam_used: jax.Array  # landmarks updated this frame
    # relative residual ‖B − A·W‖∞/‖B‖∞ of the newton joint-update solve
    # (0 when the frame used another form / no update ran).  Values near
    # the polish tolerance (1e-3) are healthy; values ≥ the no-op gate
    # (5e-2) mean the update degraded to a no-op — a silently
    # under-converged inverse can no longer enter the filter unobserved.
    newton_resid: jax.Array | float = 0.0


def gather_feature_obs(state: VioState, cfg: FilterConfig, table: ft.FeatureTable,
                       rows):
    """Gather per-feature observations + camera poses for selected rows.

    rows: [F] row indices into the table (may include invalid -> masked).
    Returns (tri.FeatureObs batched [F, O=C*N, ...], uh.GatheredObs [F, O]).
    """
    C, N = cfg.max_clones, cfg.num_cams
    O = C * N

    slot_idx = jnp.tile(jnp.arange(C, dtype=jnp.int32)[:, None], (1, N)).reshape(O)
    cam_idx = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None, :], (C, 1)).reshape(O)

    # camera pose for every (slot, cam): R_GtoC = R_ItoC R_GtoI and
    # p_CinG = p_I - R_ItoG R_ItoCᵀ p_IinC
    # (deliberately plain per-obs 3x3 matmuls under vmap: an einsum-based
    # formulation produced corrupted rotations inside large compiled
    # programs on the axon TPU backend — see round-1 debugging notes)
    def cam_pose(slot, cam):
        R_GtoI_s = lie.quat_2_rot(take1(state.clones_q, slot))
        R_ItoC_c = lie.quat_2_rot(take1(state.calib_ext_q, cam))
        R = R_ItoC_c @ R_GtoI_s
        p = take1(state.clones_p, slot) - R_GtoI_s.T @ (
            R_ItoC_c.T @ take1(state.calib_ext_p, cam)
        )
        return R, p

    R_GtoC, p_CinG = jax.vmap(cam_pose)(slot_idx, cam_idx)

    def per_row(r):
        valid_row = r < table.ids.shape[0]
        rr = jnp.minimum(r, table.ids.shape[0] - 1)
        bits_r = table.mbits[rr]  # [N] packed clone bits
        m_cn = ((bits_r[None, :] >> jnp.arange(C, dtype=jnp.int32)[:, None])
                & 1) > 0  # [C, N]
        m = m_cn.reshape(O) & valid_row & state.clone_valid[slot_idx]
        uv = table.uv[rr].reshape(O, 2)
        uvn = table.uvn[rr].reshape(O, 2)
        return m, uv, uvn

    mask, uv, uvn = jax.vmap(per_row)(rows)
    F = rows.shape[0]
    tri_obs = tri.FeatureObs(
        R_GtoC=jnp.broadcast_to(R_GtoC, (F, O, 3, 3)),
        p_CinG=jnp.broadcast_to(p_CinG, (F, O, 3)),
        uvn=uvn,
        mask=mask,
    )
    gobs = uh.GatheredObs(
        clone_slot=jnp.broadcast_to(slot_idx, (F, O)),
        cam=jnp.broadcast_to(cam_idx, (F, O)),
        uv=uv,
        uvn=uvn,
        mask=mask,
    )
    return tri_obs, gobs


def msckf_build(state: VioState, cfg: FilterConfig, table: ft.FeatureTable,
                tri_opts: tri.TriangulationOptions, reserved=None,
                compress=True):
    """Triage + triangulate + project + gate + compress — NO state update.

    Mirrors UpdaterMSCKF::update (UpdaterMSCKF.cpp:58-295) up to (not
    including) the EKFUpdate, plus the triage logic of
    VioManager::do_feature_propagate_update (VioManager.cpp:366-500).
    `reserved` ([T] bool, optional): rows reserved for SLAM promotion this
    frame — excluded here so each feature feeds exactly one updater.
    Returns (H_c, res_c, ranges, table, diag): the compressed system (row
    noise = cfg.sigma_pix, column support `ranges`) and the post-cleanup
    table.  Used directly by the joint per-frame update
    (FilterConfig.joint_vision_update); `msckf_update` applies it alone.
    `compress=False` skips the CholeskyQR2 stage and returns the raw
    stacked rows — the joint update compresses the combined stack once,
    so a pre-compression here would only add a dependent factorization
    chain to the critical path (profiled: two of the frame's QR
    custom-call clusters were this stage).
    """
    F = cfg.max_msckf_in_update
    D = cfg.state_dim
    sigma = cfg.sigma_pix

    lost = ft.lost_rows(table)
    # full-window tracks only become update candidates once the window is
    # actually full (the reference pulls features_containing(margtimestep)
    # only when a clone is about to be marginalized, VioManager.cpp:366-500)
    window_full = state.n_clones >= cfg.max_clones
    fullw = ft.full_window_rows(table, state.n_clones, cfg) & window_full
    # rows owned by in-state SLAM landmarks never feed the MSCKF update
    is_slam = slam.slam_row_mask(state, table)
    # candidates need >= 3 observations to triangulate + have excess rows
    n_obs = ft.row_obs_counts(table)
    cand = (lost | fullw) & (n_obs >= 3) & (~is_slam)
    if reserved is not None:
        cand = cand & (~reserved)
    # prefer long tracks
    score = jnp.where(cand, n_obs.astype(jnp.float32), -1.0)
    _, rows = jax.lax.top_k(score, F)
    sel_valid = score[rows] > 0

    tri_obs, gobs = gather_feature_obs(state, cfg, table, rows)
    p_f, tri_ok = tri.triangulate_batch(tri_obs, tri_opts)
    # sanitize: degenerate geometry can yield inf/nan positions; they are
    # gated out below, but NaNs must never reach the stacked system
    # (NaN * 0 == NaN would poison the QR compression)
    tri_ok = tri_ok & jnp.all(jnp.isfinite(p_f), axis=-1)
    p_f = jnp.where(tri_ok[:, None], p_f, jnp.asarray([0.0, 0.0, 1.0]))

    # per-feature jacobians at FEJ, nullspace projection, chi2.  The gate's
    # H P Hᵀ contracts over the static support columns only (P_ss hoisted
    # out of the vmap) — measurement rows are exact zeros elsewhere.
    sup = cfg.cam_meas_support_ranges
    P_ss = uh.take_cols(uh.take_cols(state.cov, sup).T, sup)

    # per-obs-slot state context hoisted out of the feature vmap (the
    # slot/cam layout is shared by every feature — see uh.ObsContext)
    ctx = uh.obs_context(state, cfg,
                         jax.tree_util.tree_map(lambda a: a[0], gobs).clone_slot,
                         jax.tree_util.tree_map(lambda a: a[0], gobs).cam)

    # SoA batched linearization (lane-major over the F·O obs grid — see
    # uh.feature_jacobian_batch); projection/gating stay vmapped per feature
    H_x_b, H_f_b, res_b, row_mask_b = uh.feature_jacobian_batch(
        state, cfg, gobs, p_f, p_f, ctx)

    def per_feature(H_x, H_f, res, row_mask):
        H_proj, res_proj = uh.nullspace_project(H_x, H_f, res)
        gamma = uh.chi2_statistic(P_ss, uh.take_cols(H_proj, sup),
                                  res_proj, sigma)
        n_rows = jnp.sum(row_mask.astype(jnp.int32))
        return H_proj, res_proj, gamma, n_rows

    H_proj, res_proj, gamma, n_rows = jax.vmap(per_feature)(
        H_x_b, H_f_b, res_b, row_mask_b)

    dof = jnp.maximum(n_rows - 3, 1)
    gate = ekf.chi2_gate(dof) * cfg.chi2_multiplier
    feat_ok = (
        sel_valid & tri_ok & jnp.isfinite(gamma) & (gamma < gate) & (n_rows >= 5)
    )

    keep = feat_ok[:, None, None]
    H_big = jnp.where(keep, H_proj, 0.0).reshape(-1, D)
    res_big = jnp.where(keep[..., 0], res_proj, 0.0).reshape(-1)

    # camera-feature rows are exactly zero outside clones+calib: compress
    # and solve at k = |support| (~D/3) instead of D — same algebra
    ranges = cfg.cam_meas_support_ranges
    if not compress:
        H_c, res_c = H_big, res_big
    elif cfg.fast_compress:
        H_c, res_c = uh.compress_system_cholesky(H_big, res_big, D)
        ranges = None
    else:
        H_c, res_c = uh.compress_system_ranges(H_big, res_big, ranges, D)

    # cleanup: EVERY selected row dies whether or not its update passed —
    # lost or full-window alike (UpdaterMSCKF erases all processed
    # features, pass or fail, UpdaterMSCKF.cpp:108-116).  A full-window
    # row that failed triangulation and survived would keep its tied
    # top-k score and be re-selected every frame, head-of-line-blocking
    # the other candidates (measured on slow-parallax replays).  Lost
    # candidates beyond the top-F cap stay alive so a burst of track loss
    # is amortized over the next frames instead of silently discarded —
    # except rows that can never triangulate (<3 remaining obs).
    # SLAM-owned rows are exempt: they may carry unconsumed measurements
    # for one final slam.update, and evict frees them afterwards.
    selected = jnp.zeros_like(lost).at[rows].set(sel_valid, mode="drop")
    used = selected & ~is_slam
    dead_lost = lost & ~is_slam & (n_obs < 3)
    # zombie reaper: a consume-on-attempt row (measurements cleared, id
    # kept) whose track then ENDS is unreachable by every other cleanup —
    # lost_rows requires n_obs > 0 and ingest allocation requires id < 0 —
    # so without this the table monotonically leaks capacity on long runs
    zombie = (table.ids >= 0) & (~table.seen) & (n_obs == 0) & (~is_slam)
    table = ft.free_rows(table, dead_lost | used | zombie)

    diag = StepDiag(
        n_msckf=jnp.sum(feat_ok.astype(jnp.int32)),
        n_tracks=jnp.sum((table.ids >= 0).astype(jnp.int32)),
        chi2_mean=jnp.sum(jnp.where(feat_ok, gamma, 0.0))
        / jnp.maximum(jnp.sum(feat_ok), 1),
        n_slam=jnp.asarray(0, jnp.int32),
        n_slam_used=jnp.asarray(0, jnp.int32),
        newton_resid=jnp.asarray(0.0, H_c.dtype),
    )
    return H_c, res_c, ranges, table, diag


def msckf_update(state: VioState, cfg: FilterConfig, table: ft.FeatureTable,
                 tri_opts: tri.TriangulationOptions, reserved=None):
    """msckf_build + standalone EKF update (the sequential path).

    Returns (state, table, diag)."""
    H_c, res_c, ranges, table, diag = msckf_build(
        state, cfg, table, tri_opts, reserved)
    r_diag = jnp.full((H_c.shape[0],), cfg.sigma_pix**2, dtype=H_c.dtype)
    # no any_ok select needed: with zero rows the update is an exact no-op
    # (K = P·0 = 0), so an empty frame costs nothing and changes nothing
    state = ekf.ekf_update(state, cfg, H_c, res_c, r_diag, ranges=ranges)
    return state, table, diag


def step_frame(state: VioState, table: ft.FeatureTable, cfg: FilterConfig,
               tri_opts: tri.TriangulationOptions, frame: FrameInput):
    """One full frame: marg-if-full → propagate+clone → ingest → update.

    The jit unit of the whole estimator (track_image_and_update +
    do_feature_propagate_update parity, VioManager.cpp:256-714).
    """
    # 0. zero-velocity update attempt: if the platform is stationary, the
    #    frame is consumed without cloning (VioManager.cpp:294-306)
    if cfg.use_zupt:
        disparity = zupt.frame_disparity(
            table, cfg, state.head, frame.ids, frame.uv, frame.mask
        )
        zupt_fn = (zupt.try_zupt_explicit if cfg.zupt_explicit_motion
                   else zupt.try_zupt)
        zupt_state, accepted = zupt_fn(
            state, cfg, frame.win, frame.t_new, disparity
        )

        def zupt_branch(_):
            d = StepDiag(
                n_msckf=jnp.asarray(0, jnp.int32),
                n_tracks=jnp.sum((table.ids >= 0).astype(jnp.int32)),
                chi2_mean=jnp.asarray(0.0, state.cov.dtype),
                n_slam=jnp.sum(zupt_state.slam_valid.astype(jnp.int32)),
                n_slam_used=jnp.asarray(0, jnp.int32),
                newton_resid=jnp.asarray(0.0, state.cov.dtype),
            )
            return zupt_state, table, d

        def normal_branch(_):
            return _step_frame_core(state, table, cfg, tri_opts, frame)

        return jax.lax.cond(accepted, zupt_branch, normal_branch, None)
    return _step_frame_core(state, table, cfg, tri_opts, frame)


def _step_frame_core(state: VioState, table: ft.FeatureTable,
                     cfg: FilterConfig, tri_opts: tri.TriangulationOptions,
                     frame: FrameInput):
    # 1. marginalize the oldest clone if the ring is full; landmarks
    #    anchored there move to the newest clone first
    full = state.n_clones >= cfg.max_clones
    slot_old = oldest_slot(state, cfg)
    state_pre = slam.change_anchors(state, cfg, slot_old)
    state_m = ekf.marginalize_clone(state_pre, cfg, slot_old)
    table_m = ft.clear_clone_column(table, slot_old)
    state = jax.tree_util.tree_map(lambda a, b: jnp.where(full, a, b), state_m, state)
    table = jax.tree_util.tree_map(lambda a, b: jnp.where(full, a, b), table_m, table)

    # 2. propagate to the frame time and clone
    state = propagate(state, cfg, frame.win, frame.t_new)
    w_hat = frame.win.w[-1] - state.bg
    state = ekf.augment_clone(state, cfg, w_hat)

    # 3. ingest this frame's tracked features at the new head slot
    table = ft.ingest_frame(table, cfg, state.head, frame.ids, frame.uv,
                            frame.uvn, frame.mask)

    # 4. triage: reserve the best full-window tracks for SLAM promotion
    #    (VioManager.cpp:410-453: maxtrack features go to SLAM when capacity
    #    allows, otherwise to the MSCKF update)
    reserved = None
    if cfg.max_slam > 0:
        reserved = slam.promotion_candidates(state, cfg, table)

    # 5+6. vision updates.  Joint mode (default): the MSCKF, SLAM-landmark,
    # and delayed-init-leftover systems all linearize at the pre-update
    # state, are whitened to unit noise, jointly compressed on the SLAM
    # column support, and applied as ONE EKF update — the textbook
    # simultaneous update of independent measurement sets (the reference
    # applies them sequentially, VioManager.cpp:502-548; the difference is
    # the second-order relinearization between sub-updates, and the
    # closed-loop NEES/RMSE tests pin the two modes against each other).
    # One P·Hᵀ/S-solve/downdate chain instead of three.
    joint = (cfg.joint_vision_update and cfg.max_slam > 0
             and not cfg.fast_compress)
    if joint:
        H1, r1, _, table, diag = msckf_build(state, cfg, table, tri_opts,
                                             reserved, compress=False)
        state, table, H2, r2, _, n_used = slam.build_update(state, cfg, table)
        state, table, _, H3, r3 = slam.delayed_init(
            state, cfg, table, tri_opts, gather_feature_obs, collect=True)
        s1, s2 = cfg.sigma_pix, cfg.sigma_pix_slam
        H = jnp.concatenate([H1 / s1, H2 / s2, H3 / s2], axis=0)
        res = jnp.concatenate([r1 / s1, r2 / s2, r3 / s2])
        ranges = cfg.slam_meas_support_ranges
        if cfg.joint_update_form == "woodbury":
            # push-through form: one grammian + one LU on the raw stack
            state = ekf.ekf_update_info(state, cfg, H, res, ranges)
        elif cfg.joint_update_form == "spd":
            # push-through with symmetric factorizations: one grammian +
            # two SPD Choleskys + one triangular solve (no compression
            # stage, no LU) — see core/ekf.kalman_update_math_spd
            state = ekf.ekf_update_spd(state, cfg, H, res, ranges)
        elif cfg.joint_update_form == "newton":
            # push-through with batched-matmul Newton inversion — zero
            # factorization custom calls, scales across vmapped ensemble
            # streams — see core/ekf.kalman_update_math_newton
            state, nres = ekf.ekf_update_newton(state, cfg, H, res, ranges,
                                                return_resid=True)
            diag = diag._replace(newton_resid=nres)
        else:
            D = cfg.state_dim
            H, res = uh.compress_system_ranges(H, res, ranges, D)
            r_diag = jnp.ones((H.shape[0],), H.dtype)
            state = ekf.ekf_update(state, cfg, H, res, r_diag, ranges=ranges)
        state, table = slam.evict(state, cfg, table)
        diag = diag._replace(
            n_slam=jnp.sum(state.slam_valid.astype(jnp.int32)),
            n_slam_used=n_used,
        )
        return state, table, diag

    # sequential (reference-exact ordering): MSCKF update, then SLAM update,
    # then delayed init, each consuming its measurements from the table
    state, table, diag = msckf_update(state, cfg, table, tri_opts, reserved)
    if cfg.max_slam > 0:
        state, table, _, n_used = slam.update(state, cfg, table)
        state, table, _ = slam.delayed_init(state, cfg, table, tri_opts,
                                            gather_feature_obs)
        state, table = slam.evict(state, cfg, table)
        diag = diag._replace(
            n_slam=jnp.sum(state.slam_valid.astype(jnp.int32)),
            n_slam_used=n_used,
        )
    return state, table, diag


def propagate_and_clone(state: VioState, cfg: FilterConfig,
                        win: ImuWindow, t_new) -> VioState:
    """Propagate to t_new and clone, marginalizing the oldest clone if the
    ring is full — no measurement update.

    The catch-up replay primitive: the reference moves the state forward
    over camera times queued during background initialization with
    propagate_and_clone + marginalize_old_clone
    (VioManagerHelper.cpp:156-163)."""
    full = state.n_clones >= cfg.max_clones
    slot_old = oldest_slot(state, cfg)
    state_pre = slam.change_anchors(state, cfg, slot_old)
    state_m = ekf.marginalize_clone(state_pre, cfg, slot_old)
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(full, a, b), state_m, state)
    state = propagate(state, cfg, win, t_new)
    w_hat = win.w[-1] - state.bg
    return ekf.augment_clone(state, cfg, w_hat)


def get_active_features(state: VioState, cfg: FilterConfig,
                        table: ft.FeatureTable,
                        tri_opts: tri.TriangulationOptions, max_feats: int):
    """Triangulate the currently-tracked features for publishing.

    VioManagerHelper::retriangulate_active_tracks parity
    (VioManagerHelper.cpp:190-461): the active (non-SLAM) tracks are
    re-triangulated against the current clone window — the reference feeds
    these to its visualizer/loop-closure consumers.

    Returns (p_G [max_feats,3], ids [max_feats], valid [max_feats]).
    """
    n_obs = ft.row_obs_counts(table)
    score = jnp.where(table.ids >= 0, n_obs.astype(jnp.float32), -1.0)
    _, rows = jax.lax.top_k(score, max_feats)
    tri_obs, _ = gather_feature_obs(state, cfg, table, rows)
    p_f, ok = tri.triangulate_batch(tri_obs, tri_opts)
    ok = ok & jnp.all(jnp.isfinite(p_f), axis=-1) & (score[rows] > 1)
    ids = jnp.where(
        rows < table.ids.shape[0],
        table.ids[jnp.minimum(rows, table.ids.shape[0] - 1)], -1,
    )
    return jnp.where(ok[:, None], p_f, 0.0), ids, ok


def initialize_from_gt(cfg: FilterConfig, q, p, v, bg, ba, t,
                       calib_ext_q, calib_ext_p, calib_intr,
                       prior_std=None) -> VioState:
    """Groundtruth warm start (VioManagerHelper::initialize_with_gt parity,
    VioManagerHelper.cpp:40-76): set the IMU state and a diagonal prior."""
    st = init_state(cfg)
    st = st._replace(
        q=q, q_fej=q, p=p, p_fej=p, v=v, v_fej=v, bg=bg, ba=ba,
        t=jnp.asarray(t, dtype=st.cov.dtype),
        t_init=jnp.asarray(t, dtype=st.cov.dtype),
        calib_ext_q=calib_ext_q, calib_ext_p=calib_ext_p, calib_intr=calib_intr,
    )
    D = cfg.state_dim
    diag = jnp.zeros((D,))
    if prior_std is None:
        # OpenVINS-style: small orientation/bias prior, tight position
        prior_std = {
            "th": 0.02, "p": 0.001, "v": 0.01, "bg": 0.002, "ba": 0.02,
        }
    diag = diag.at[0:3].set(prior_std["th"] ** 2)
    diag = diag.at[3:6].set(prior_std["p"] ** 2)
    diag = diag.at[6:9].set(prior_std["v"] ** 2)
    diag = diag.at[9:12].set(prior_std["bg"] ** 2)
    diag = diag.at[12:15].set(prior_std["ba"] ** 2)
    return ekf.set_initial_covariance(st, cfg, diag)


def seed_imu_intrinsics(st: VioState, imu_calib) -> VioState:
    """Apply yaml-seeded IMU intrinsic initial values to a fresh state.

    Parity with the reference seeding state values from kalibr_imu_chain
    (StateOptions.h:141-146, VioManagerOptions.h:306-353, State.h:91-116):
    the filter starts from the calibrated Dw/Da/Tg and sensor-frame
    rotations rather than identity.  `imu_calib`: utils.config.ImuCalib."""
    dt = st.cov.dtype
    return st._replace(
        imu_dw=jnp.asarray(imu_calib.dw, dt),
        imu_da=jnp.asarray(imu_calib.da, dt),
        imu_tg=jnp.asarray(imu_calib.tg, dt),
        imu_q_gyro=jnp.asarray(imu_calib.q_gyro, dt),
        imu_q_acc=jnp.asarray(imu_calib.q_acc, dt),
    )


def initialize_from_dynamic(cfg: FilterConfig, res, t,
                            calib_ext_q, calib_ext_p, calib_intr) -> VioState:
    """Seed the filter from a DynamicInitializer solution.

    The dynamic-init handoff of VioManagerHelper.cpp:78-146: IMU mean from
    the MLE, top-left 15x15 covariance from the Gauss-Newton information
    (instead of the diagonal gt-init prior)."""
    st = initialize_from_gt(
        cfg, res.q_GtoI, res.p, res.v, res.bg, res.ba, t,
        calib_ext_q, calib_ext_p, calib_intr,
    )
    cov = st.cov.at[:15, :15].set(res.cov15.astype(st.cov.dtype))
    return st._replace(cov=cov)
