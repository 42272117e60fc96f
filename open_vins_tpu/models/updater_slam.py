"""SLAM landmark pipeline: delayed initialization, per-frame updates,
failure-count eviction.

Capability parity with ov_msckf::UpdaterSLAM (UpdaterSLAM.cpp:58-647):
  * delayed_init (…:100-240): triangulate a mature track, split its stacked
    system into an invertible landmark part + a state update part (QR split,
    StateHelper::initialize parity) — here via core.ekf.initialize_landmark,
  * update (…:300-470): every unconsumed measurement of every in-state
    landmark is stacked, chi2-gated with an update_fail_count penalty,
    compressed, and applied as one batched EKF update; consumed
    measurements are cleared from the table (to_delete parity),
  * eviction: landmarks whose track died or that keep failing the gate are
    marginalized (VioManager.cpp:474-481 + StateHelper::marginalize_slam).

Representations (LandmarkRepresentation.h:38-45): GLOBAL_3D,
GLOBAL_FULL_INVERSE_DEPTH, ANCHORED_3D, ANCHORED_FULL_INVERSE_DEPTH,
ANCHORED_MSCKF_INVERSE_DEPTH, ANCHORED_INVERSE_DEPTH_SINGLE — anchored reps
carry anchor (clone, cam) slots and are re-anchored on marginalization
(change_anchors).  The 1-dof single-depth rep stores only ρ in the state
(bearing marginalized by nullspace projection at init and update,
UpdaterSLAM.cpp:163-210, 340-380); its two unused covariance slots stay
frozen at zero and hold the fixed init bearing as data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_vins_tpu.core import ekf
from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import VioState
from open_vins_tpu.models import feature_table as ft
from open_vins_tpu.models import landmark_rep as lrep
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.models import update_helper as uh
from open_vins_tpu.ops.indexing import take1

MAX_FAIL = 2  # eviction on chi2-failure count (reference: fail_count > 1,
# VioManager.cpp:476)
MAX_INIT_PER_FRAME = 6  # landmarks initialized per frame (static bound)
_INIT_VAR_CAP = 1e4  # max inserted landmark variance (units² of the rep):
# the delayed-init observability cap — see the R1inv gate in
# _delayed_init_work.  std 100 (m or 1/m) is already absurd; the poison
# cases measure 1e10+
_DELAYED_INIT_COND = True  # gate the init block behind a lax.cond (A/B knob)


def _add_clone_block(H_x, cfg: FilterConfig, slot, add):
    """H_x[:, clone(slot) cols] += add — by one-hot contraction.

    A dynamic_update_slice with a traced column offset inside a vmap makes
    XLA serialize the whole batch into a while loop (the axon/TPU profile
    showed this dominating frame time); the one-hot product keeps the batch
    fused.  add: [rows, 6]."""
    C = cfg.max_clones
    oh = (jnp.arange(C) == slot).astype(H_x.dtype)  # [C]
    delta = (add[:, None, :] * oh[None, :, None]).reshape(add.shape[0], 6 * C)
    co = cfg.clones_off
    # concatenate instead of .at[].add: the static-offset DUS this lowered
    # to copied the whole [L,rows,D] buffer per frame under the vmap
    return jnp.concatenate([
        H_x[:, :co], H_x[:, co:co + 6 * C] + delta, H_x[:, co + 6 * C:]], 1)


def _set_slam_cols(H_x, cfg: FilterConfig, slot, H_lam):
    """Place a landmark's columns at slam slot `slot` by one-hot contraction.

    H_lam: [rows, k] with k in {1, 3}; k=1 lands at column 3*slot (the ρ
    column of the 1-dof rep).  The slam block of H_x is all-zero here, so
    add == set."""
    L = cfg.max_slam
    rows, k = H_lam.shape
    if k == 3:
        oh = (jnp.arange(L) == slot).astype(H_x.dtype)  # [L]
        delta = (H_lam[:, None, :] * oh[None, :, None]).reshape(rows, 3 * L)
    else:
        oh = (jnp.arange(3 * L) == 3 * slot).astype(H_x.dtype)  # [3L]
        delta = H_lam[:, 0:1] * oh[None, :]
    so = cfg.slam_off
    return jnp.concatenate([
        H_x[:, :so], H_x[:, so:so + 3 * L] + delta, H_x[:, so + 3 * L:]], 1)


def _aruco_landmark_mask(cfg: FilterConfig, ids):
    """ids in [0, 4*num_aruco_tags] are aruco tag corners (TrackAruco's
    featid = 4*tag + corner contract); natural features allocate above."""
    if cfg.num_aruco_tags <= 0:
        return jnp.zeros(jnp.shape(ids), dtype=bool)
    return (ids >= 0) & (ids <= 4 * cfg.num_aruco_tags)


def _anchor_of(state: VioState, slot, fej: bool):
    """Anchor clone + extrinsic values (optionally FEJ) for landmark slot."""
    a_slot = take1(state.slam_anchor_slot, slot)
    a_cam = take1(state.slam_anchor_cam, slot)
    q_c = take1(state.clones_q_fej if fej else state.clones_q, a_slot)
    p_c = take1(state.clones_p_fej if fej else state.clones_p, a_slot)
    q_e = take1(state.calib_ext_q, a_cam)
    p_e = take1(state.calib_ext_p, a_cam)
    return a_slot, q_c, p_c, q_e, p_e


def landmark_global(state: VioState, cfg: FilterConfig, slot, fej: bool):
    """p_FinG of landmark `slot` under cfg.feat_rep_slam.

    For anchored (relative) representations the FEJ global position IS the
    current one — the reference sets p_FinG_fej = p_FinG for relative reps
    (UpdaterHelper.cpp:284-287), since the anchored value's FEJ lives in the
    anchor-frame linearization instead (see _chain_anchored).
    """
    rep = cfg.feat_rep_slam
    if fej and lrep.is_anchored(rep):
        fej = False
    lam = take1(state.slam_p_fej if fej else state.slam_p, slot)
    if not lrep.needs_lam_jacobian(rep):
        return lam
    _, q_c, p_c, q_e, p_e = _anchor_of(state, slot, fej=False)
    return lrep.to_global(rep, lam, q_c, p_c, q_e, p_e)


def _chain_anchored(state: VioState, cfg: FilterConfig, slot, H_x, H_fg,
                    p_G_cur, rep=None):
    """Convert global-landmark rows (H_fg = ∂z/∂p_FinG) to λ-rows and fold
    the anchor-pose columns into H_x.

    FEJ linearization points follow the reference exactly
    (UpdaterHelper.cpp:87-96): for anchored reps the λ/anchor Jacobians are
    evaluated at the *current* global point transformed into the *FEJ*
    anchor frame; for global inverse depth at the stored FEJ λ.

    `rep` overrides cfg.feat_rep_slam — the 1-dof single-depth rep
    linearizes via its MSCKF-inverse-depth equivalent (UpdaterSLAM.cpp:340).

    Returns (H_x', H_lam).
    """
    if rep is None:
        rep = cfg.feat_rep_slam
    if not lrep.needs_lam_jacobian(rep):
        return H_x, H_fg
    fej = cfg.use_fej
    a_slot, q_c, p_c, q_e, p_e = _anchor_of(state, slot, fej)
    if lrep.is_anchored(rep):
        lam_lin = lrep.from_global(rep, p_G_cur, q_c, p_c, q_e, p_e)
    else:
        lam_lin = take1(state.slam_p_fej if fej else state.slam_p, slot)
    dpG_dlam = lrep.d_pFinG_d_lam(rep, lam_lin, q_c, q_e)
    H_lam = H_fg @ dpG_dlam
    if lrep.is_anchored(rep):
        dth, dp = lrep.d_pFinG_d_anchor(rep, lam_lin, q_c, q_e, p_e)
        H_x = _add_clone_block(
            H_x, cfg, a_slot, jnp.concatenate([H_fg @ dth, H_fg @ dp], axis=1))
    return H_x, H_lam


def slam_row_mask(state: VioState, table: ft.FeatureTable):
    """[T] bool — table rows whose id is an active SLAM landmark."""
    eq = table.ids[:, None] == state.slam_id[None, :]  # [T, L]
    return jnp.any(eq & state.slam_valid[None, :] & (table.ids[:, None] >= 0), axis=1)


def promotion_candidates(state: VioState, cfg: FilterConfig,
                         table: ft.FeatureTable):
    """[T] bool — rows reserved for SLAM promotion this frame: the
    longest-tracked full-window rows, bounded by free slot count and the
    per-frame init cap (VioManager.cpp:410-453 triage)."""
    delay_ok = (state.t - state.t_init) >= cfg.dt_slam_delay
    window_full = (state.n_clones >= cfg.max_clones) & delay_ok
    fullw = ft.full_window_rows(table, state.n_clones, cfg) & window_full
    already = slam_row_mask(state, table)
    cand = fullw & (~already)
    n_free = jnp.sum((~state.slam_valid).astype(jnp.int32))
    budget = jnp.minimum(n_free, MAX_INIT_PER_FRAME)
    score = jnp.where(cand, ft.row_obs_counts(table).astype(jnp.float32), -1.0)
    # aruco tags promote first (the reference always makes them SLAM)
    score = jnp.where(cand & _aruco_landmark_mask(cfg, table.ids),
                      score + 1e4, score)
    T = table.ids.shape[0]
    _, rows = jax.lax.top_k(score, min(MAX_INIT_PER_FRAME, T))
    take = (score[rows] > 0) & (jnp.arange(rows.shape[0]) < budget)
    return jnp.any(
        (jnp.arange(T)[:, None] == rows[None, :]) & take[None, :], axis=1)


def _delayed_init_sequential(state: VioState, cfg: FilterConfig,
                             table: ft.FeatureTable,
                             tri_opts: tri.TriangulationOptions, gather_fn):
    """Sequential (one-landmark-at-a-time) delayed init — the literal analog
    of the reference's per-feature StateHelper::initialize loop.

    Kept as the equivalence ORACLE for the joint batched `delayed_init`
    below (tests/test_slam.py::test_joint_init_matches_sequential) and as an
    A/B fallback (_DELAYED_INIT_JOINT=False); the joint path produces the
    same posterior because independent linear-Gaussian updates commute.
    """
    if cfg.max_slam == 0:
        return state, table, jnp.asarray(0, dtype=jnp.int32)
    L = cfg.max_slam
    sigma = cfg.sigma_pix_slam

    # dt_slam_delay: no delayed inits until the startup delay has elapsed
    # (VioManager.cpp:442 `timestamp - startup_time >= params.dt_slam_delay`)
    delay_ok = (state.t - state.t_init) >= cfg.dt_slam_delay
    window_full = (state.n_clones >= cfg.max_clones) & delay_ok
    fullw = ft.full_window_rows(table, state.n_clones, cfg) & window_full
    already = slam_row_mask(state, table)
    cand = fullw & (~already)
    n_free = jnp.sum((~state.slam_valid).astype(jnp.int32))

    score = jnp.where(cand, ft.row_obs_counts(table).astype(jnp.float32), -1.0)
    _, rows = jax.lax.top_k(score, MAX_INIT_PER_FRAME)
    cand_ok = score[rows] > 0

    tri_obs, gobs = gather_fn(state, cfg, table, rows)
    p_f, tri_ok = tri.triangulate_batch(tri_obs, tri_opts)
    tri_ok = tri_ok & jnp.all(jnp.isfinite(p_f), axis=-1)
    p_f = jnp.where(tri_ok[:, None], p_f, jnp.asarray([0.0, 0.0, 1.0]))

    feat_ids = jnp.where(
        rows < table.ids.shape[0], table.ids[jnp.minimum(rows, table.ids.shape[0] - 1)], -1
    )

    # free slot for the i-th init: i-th free slam slot
    free_order = jnp.sort(jnp.where(~state.slam_valid, jnp.arange(L), L))
    # attempt budget: hand over exactly free-capacity-many candidates (the
    # reference sizes feats_slam to the open state slots upstream,
    # VioManager.cpp:410-453); failures among them are consumed below
    attempt_rank = jnp.cumsum(cand_ok.astype(jnp.int32)) - 1
    attempted = cand_ok & (attempt_rank < n_free)

    def body(i, carry):
        st, n_done = carry
        ok = attempted[i] & tri_ok[i]
        slot = free_order[jnp.clip(n_done, 0, L - 1)]
        obs_i = jax.tree_util.tree_map(lambda a: a[i], gobs)
        # NO ctx hoist here: each candidate's leftover-rows EKF update
        # moves the CLONE estimates via boxplus, and the reference
        # sequential ordering re-linearizes candidate i+1 at candidate i's
        # posterior — the context must be rebuilt from `st` per candidate
        # (a frozen pre-loop context diverged the joint-vs-sequential
        # equivalence by 4 cm).
        H_x, H_fg, res, row_mask = uh.feature_jacobian(
            st, cfg, obs_i, p_f[i], p_f[i]
        )
        # non-xyz reps: anchor at the newest clone, cam 0; convert the
        # triangulated global point + global-landmark rows into λ space.
        # Values use the current anchor pose; Jacobians linearize at the
        # triangulated point expressed in the FEJ anchor frame
        # (UpdaterHelper.cpp:87-96 semantics, same as _chain_anchored).
        rep = cfg.feat_rep_slam
        single = lrep.is_single(rep)
        # the 1-dof single-depth rep linearizes via its MSCKF-inverse-depth
        # equivalent (UpdaterSLAM.cpp:163-206), then marginalizes the
        # bearing by nullspace projection below
        rep_lin = lrep.ANCHORED_MSCKF_INVERSE_DEPTH if single else rep
        if lrep.needs_lam_jacobian(rep_lin):
            a_slot = st.head
            q_c = take1(st.clones_q, a_slot)
            p_c = take1(st.clones_p, a_slot)
            q_e = st.calib_ext_q[0]
            p_e = st.calib_ext_p[0]
            lam0 = lrep.from_global(rep_lin, p_f[i], q_c, p_c, q_e, p_e)
            if cfg.use_fej and lrep.is_anchored(rep_lin):
                q_cl = take1(st.clones_q_fej, a_slot)
                p_cl = take1(st.clones_p_fej, a_slot)
                lam_lin = lrep.from_global(rep_lin, p_f[i], q_cl, p_cl,
                                           q_e, p_e)
            else:
                q_cl, p_cl = q_c, p_c
                lam_lin = lam0
            dpG_dlam = lrep.d_pFinG_d_lam(rep_lin, lam_lin, q_cl, q_e)
            H_lam = H_fg @ dpG_dlam
            if lrep.is_anchored(rep_lin):
                dth, dp = lrep.d_pFinG_d_anchor(rep_lin, lam_lin, q_cl, q_e,
                                                p_e)
                H_x = _add_clone_block(
                    H_x, cfg, a_slot,
                    jnp.concatenate([H_fg @ dth, H_fg @ dp], axis=1))
        else:
            lam0 = p_f[i]
            H_lam = H_fg
        if single:
            # split (α,β,ρ): ρ becomes the 1-dof state, the bearing columns
            # are nullspace-projected out of [H_x | h_ρ | res] so the init
            # does NOT treat the stored bearing as true
            # (UpdaterSLAM.cpp:190-206)
            h_rho = H_lam[:, 2:3]
            Dx = H_x.shape[1]
            _, Mr = uh.householder_rotate(
                jnp.where(row_mask[:, None], H_lam[:, :2], 0.0),
                jnp.concatenate([
                    jnp.where(row_mask[:, None], H_x, 0.0),
                    jnp.where(row_mask[:, None], h_rho, 0.0),
                    jnp.where(row_mask, res, 0.0)[:, None]], 1))
            H_x = Mr[:, :Dx].at[:2].set(0.0)
            h_rho = Mr[:, Dx:Dx + 1].at[:2].set(0.0)
            res_s = Mr[:, -1].at[:2].set(0.0)
            rmask = jnp.arange(res.shape[0]) >= 2
            # λ = [ρ, b_x, b_y] — bearing from the current anchor frame
            lam0_s = jnp.stack([lam0[2], lam0[0], lam0[1]])
            ok = ok & (jnp.linalg.norm(h_rho) > 1e-6)
            st2, H_up, res_up, up_mask = ekf.initialize_landmark_single(
                st, cfg, slot, feat_ids[i], lam0_s, H_x, h_rho, res_s,
                sigma, rmask,
            )
        else:
            st2, H_up, res_up, up_mask = ekf.initialize_landmark(
                st, cfg, slot, feat_ids[i], lam0, H_x, H_lam, res, sigma,
                row_mask,
            )
        st2 = st2._replace(
            slam_anchor_slot=st2.slam_anchor_slot.at[slot].set(
                st.head.astype(jnp.int32)),
            slam_anchor_cam=st2.slam_anchor_cam.at[slot].set(0),
        )
        # chi2 gate on the leftover system before accepting
        gamma = uh.chi2_statistic(st.cov, H_up, res_up, sigma)
        # dof = true valid measurement rows minus the 3 landmark dof (the
        # rotated leftover rows are all kept, but only n_valid carry info)
        dof = jnp.maximum(jnp.sum(row_mask.astype(jnp.int32)) - 3, 1)
        ok = ok & jnp.isfinite(gamma) & (gamma < ekf.chi2_gate(dof) * cfg.chi2_multiplier_slam)
        r_diag = jnp.where(up_mask, sigma**2, 1.0)
        st3 = ekf.ekf_update(st2, cfg, H_up, res_up, r_diag)
        st_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), st3, st
        )
        return st_new, n_done + ok.astype(jnp.int32), ok

    def body_wrap(i, carry):
        st, n_done, init_ok = carry
        st, n_done, ok = body(i, (st, n_done))
        return st, n_done, init_ok.at[i].set(ok)

    def run_inits(st):
        # statically unrolled (MAX_INIT_PER_FRAME is tiny): a device while
        # loop would serialize with per-iteration sync overhead on top of
        # the already-sequential EKF updates
        carry = (st, jnp.asarray(0, dtype=jnp.int32),
                 jnp.zeros((MAX_INIT_PER_FRAME,), dtype=bool))
        for i in range(MAX_INIT_PER_FRAME):
            carry = body_wrap(i, carry)
        return carry

    def skip_inits(st):
        return (st, jnp.asarray(0, dtype=jnp.int32),
                jnp.zeros((MAX_INIT_PER_FRAME,), dtype=bool))

    # steady state has zero free slots / zero candidates most frames — the
    # cond skips the whole sequential init block on-device (run_filter's
    # scan is not vmapped, so this is a true branch, not a select)
    if _DELAYED_INIT_COND:
        any_work = jnp.any(cand_ok & tri_ok) & (n_free > 0)
        state, n_init, init_ok = jax.lax.cond(
            any_work, run_inits, skip_inits, state)
    else:
        state, n_init, init_ok = run_inits(state)
    # consume the measurements of EVERY attempted candidate — success or
    # failure (the reference marks processed features to_delete whether the
    # init succeeded, failed triangulation, or failed the chi2 gate,
    # UpdaterSLAM.cpp:139-147,237).  Consuming only successes lets a failed
    # candidate stay a full-window row forever: with tied obs-count scores
    # top_k re-selects the same lowest-index rows every frame and the other
    # candidates never get a turn (measured: a slow-parallax EuRoC V1_01
    # replay starved at 0-7/50 SLAM landmarks from exactly this).
    T = table.ids.shape[0]
    consumed_rows = jnp.any(
        (jnp.arange(T)[:, None] == rows[None, :]) & attempted[None, :],
        axis=1)
    table = ft.clear_rows(table, consumed_rows)
    return state, table, n_init


_DELAYED_INIT_JOINT = True  # joint batched init; sequential path = oracle


def delayed_init(state: VioState, cfg: FilterConfig, table: ft.FeatureTable,
                 tri_opts: tri.TriangulationOptions, gather_fn,
                 collect: bool = False):
    """Promote up to MAX_INIT_PER_FRAME mature tracks into free SLAM slots —
    JOINT BATCHED delayed initialization.

    StateHelper::initialize parity (UpdaterSLAM.cpp:100-240) with a TPU
    twist: each candidate's stacked system is QR-split into an invertible
    landmark part + leftover state rows (batched over candidates), then ALL
    accepted landmarks enter the covariance in one joint insertion — the
    [F·k, F·k] grammian carries the exact landmark-landmark cross blocks
    the reference's sequential loop accumulates through its running P — and
    every leftover row feeds ONE stacked EKF update.  Independent linearized
    Gaussian updates commute, so the joint posterior equals the sequential
    loop's (tests/test_slam.py pins it against `_delayed_init_sequential`);
    the one semantic deviation: chi2 gates evaluate against the pre-init
    covariance instead of the running one.

    gather_fn(state, cfg, table, rows) -> (tri_obs, gobs)  (manager's
    gather_feature_obs, passed in to avoid a circular import).

    `collect=True` (the joint per-frame update): the landmark insertion
    still happens here, but the leftover measurement rows are RETURNED
    (zero-padded when no init ran) instead of applied, so the caller can
    stack them into the one joint EKF update.  Return value gains
    (H_up [F·(2·C·N−k), D], res_up) with row noise cfg.sigma_pix_slam.
    """
    k1 = 1 if lrep.is_single(cfg.feat_rep_slam) else 3
    up_rows = MAX_INIT_PER_FRAME * (2 * cfg.max_clones * cfg.num_cams - k1)
    D = cfg.state_dim
    dt = state.cov.dtype
    zero_up = (jnp.zeros((up_rows, D), dt), jnp.zeros((up_rows,), dt))
    if not _DELAYED_INIT_JOINT:
        assert not collect, "collect requires the joint batched init"
        return _delayed_init_sequential(state, cfg, table, tri_opts,
                                        gather_fn)
    if cfg.max_slam == 0:
        zero = (state, table, jnp.asarray(0, dtype=jnp.int32))
        return zero + zero_up if collect else zero
    F = MAX_INIT_PER_FRAME

    delay_ok = (state.t - state.t_init) >= cfg.dt_slam_delay
    window_full = (state.n_clones >= cfg.max_clones) & delay_ok
    fullw = ft.full_window_rows(table, state.n_clones, cfg) & window_full
    already = slam_row_mask(state, table)
    cand = fullw & (~already)
    n_free = jnp.sum((~state.slam_valid).astype(jnp.int32))

    score = jnp.where(cand, ft.row_obs_counts(table).astype(jnp.float32), -1.0)
    score = jnp.where(cand & _aruco_landmark_mask(cfg, table.ids),
                      score + 1e4, score)
    _, rows = jax.lax.top_k(score, F)
    cand_ok = score[rows] > 0

    # steady state (all slots full / no mature candidates) skips the whole
    # init block on-device: its per-candidate QRs + joint insertion + EKF
    # update showed up at ~25 us/frame in the TPU profile even with no work
    any_work = jnp.any(cand_ok) & (n_free > 0)
    out = jax.lax.cond(
        any_work,
        lambda st_tb: _delayed_init_work(st_tb[0], cfg, st_tb[1], tri_opts,
                                         gather_fn, rows, cand_ok, collect),
        lambda st_tb: (st_tb[0], st_tb[1], jnp.asarray(0, jnp.int32))
        + (zero_up if collect else ()),
        (state, table))
    return out


def _delayed_init_work(state: VioState, cfg: FilterConfig,
                       table: ft.FeatureTable,
                       tri_opts: tri.TriangulationOptions, gather_fn,
                       rows, cand_ok, collect: bool = False):
    """The joint batched init body (see delayed_init docstring)."""
    from open_vins_tpu.ops import smallmat

    L = cfg.max_slam
    D = cfg.state_dim
    F = MAX_INIT_PER_FRAME
    sigma = cfg.sigma_pix_slam
    dtype = state.cov.dtype
    rep = cfg.feat_rep_slam
    single = lrep.is_single(rep)
    rep_lin = lrep.ANCHORED_MSCKF_INVERSE_DEPTH if single else rep
    k = 1 if single else 3
    n_free = jnp.sum((~state.slam_valid).astype(jnp.int32))

    tri_obs, gobs = gather_fn(state, cfg, table, rows)
    p_f, tri_ok = tri.triangulate_batch(tri_obs, tri_opts)
    tri_ok = tri_ok & jnp.all(jnp.isfinite(p_f), axis=-1)
    p_f = jnp.where(tri_ok[:, None], p_f, jnp.asarray([0.0, 0.0, 1.0]))

    feat_ids = jnp.where(
        rows < table.ids.shape[0],
        table.ids[jnp.minimum(rows, table.ids.shape[0] - 1)], -1)
    free_order = jnp.sort(jnp.where(~state.slam_valid, jnp.arange(L), L))

    ctx0 = uh.obs_context(state, cfg, gobs.clone_slot[0], gobs.cam[0])

    def build(i):
        """Rotated init system of candidate i (pre-frame linearization)."""
        obs_i = jax.tree_util.tree_map(lambda a: a[i], gobs)
        H_x, H_fg, res, row_mask = uh.feature_jacobian(
            state, cfg, obs_i, p_f[i], p_f[i], ctx=ctx0)
        extra_ok = jnp.asarray(True)
        if lrep.needs_lam_jacobian(rep_lin):
            a_slot = state.head
            q_c = take1(state.clones_q, a_slot)
            p_c = take1(state.clones_p, a_slot)
            q_e = state.calib_ext_q[0]
            p_e = state.calib_ext_p[0]
            lam0 = lrep.from_global(rep_lin, p_f[i], q_c, p_c, q_e, p_e)
            if cfg.use_fej and lrep.is_anchored(rep_lin):
                q_cl = take1(state.clones_q_fej, a_slot)
                p_cl = take1(state.clones_p_fej, a_slot)
                lam_lin = lrep.from_global(rep_lin, p_f[i], q_cl, p_cl,
                                           q_e, p_e)
            else:
                q_cl = q_c
                lam_lin = lam0
            dpG_dlam = lrep.d_pFinG_d_lam(rep_lin, lam_lin, q_cl, q_e)
            H_lam = H_fg @ dpG_dlam
            if lrep.is_anchored(rep_lin):
                dth, dp = lrep.d_pFinG_d_anchor(rep_lin, lam_lin, q_cl, q_e,
                                                p_e)
                H_x = _add_clone_block(
                    H_x, cfg, a_slot,
                    jnp.concatenate([H_fg @ dth, H_fg @ dp], axis=1))
        else:
            lam0 = p_f[i]
            H_lam = H_fg
        if cfg.num_aruco_tags > 0:
            # aruco candidates carry sigma_pix_aruco: whiten their rows so
            # the seeding/leftover math stays isotropic at sigma (exact)
            c = jnp.where(_aruco_landmark_mask(cfg, feat_ids[i]),
                          sigma / cfg.sigma_pix_aruco, 1.0)
            H_x = H_x * c
            H_lam = H_lam * c
            res = res * c
        # kill non-finite/absurd rows BEFORE the QR: rejected candidates
        # keep the [0,0,1] placeholder point, whose projection overflows
        # the radtan distortion polynomial at tiny depth (inf, or finite
        # ~1e30 values whose squared norms overflow inside the QR to NaN);
        # the joint insertion masks by multiplication (okf), where
        # inf·0 = NaN would poison the whole covariance — select-based
        # masking downstream is NOT enough, one bad row NaNs the whole QR
        def _bad(M):
            return ~jnp.isfinite(M) | (jnp.abs(M) > 1e8)

        sane = ~(jnp.any(_bad(H_x)) | jnp.any(_bad(H_lam))
                 | jnp.any(_bad(res)))
        extra_ok = extra_ok & sane
        H_x = jnp.where(_bad(H_x), 0.0, H_x)
        H_lam = jnp.where(_bad(H_lam), 0.0, H_lam)
        res = jnp.where(_bad(res), 0.0, res)
        n_valid = jnp.sum(row_mask.astype(jnp.int32))
        if single:
            # bearing columns nullspace-projected out; rho is the 1-dof state
            h_rho = H_lam[:, 2:3]
            Dx = H_x.shape[1]
            _, Mr = uh.householder_rotate(
                jnp.where(row_mask[:, None], H_lam[:, :2], 0.0),
                jnp.concatenate([
                    jnp.where(row_mask[:, None], H_x, 0.0),
                    jnp.where(row_mask[:, None], h_rho, 0.0),
                    jnp.where(row_mask, res, 0.0)[:, None]], 1))
            H_x_m = Mr[:, :Dx].at[:2].set(0.0)
            H_lam_m = Mr[:, Dx:Dx + 1].at[:2].set(0.0)
            res_m = Mr[:, -1].at[:2].set(0.0)
            lam0 = jnp.stack([lam0[2], lam0[0], lam0[1]])
            extra_ok = extra_ok & (jnp.linalg.norm(H_lam_m) > 1e-6)
        else:
            H_lam_m = jnp.where(row_mask[:, None], H_lam, 0.0)
            H_x_m = jnp.where(row_mask[:, None], H_x, 0.0)
            res_m = jnp.where(row_mask, res, 0.0)
        R_full, Br = uh.householder_rotate(
            H_lam_m, jnp.concatenate([H_x_m, res_m[:, None]], 1))
        Hx_rot, res_rot = Br[:, :-1], Br[:, -1]
        return (lam0, R_full[:k, :k], Hx_rot[:k], res_rot[:k],
                Hx_rot[k:], res_rot[k:], n_valid, extra_ok)

    (lam0, R1, Hx1, res1, H_up, res_up, n_valid, extra_ok) = jax.vmap(build)(
        jnp.arange(F))

    # attempt budget first (reference: feats_slam is sized to the open
    # slots upstream, VioManager.cpp:410-453), THEN the quality gates —
    # failed attempts are consumed below so they cannot head-of-line-block
    # the candidate queue (see the consumption note at the end)
    attempt_rank = jnp.cumsum(cand_ok.astype(jnp.int32)) - 1
    attempted = cand_ok & (attempt_rank < n_free)
    ok = attempted & tri_ok & extra_ok
    # chi2 gate on the leftover rows (pre-init covariance, support columns)
    sup = cfg.cam_meas_support_ranges
    P_ss = uh.take_cols(uh.take_cols(state.cov, sup).T, sup)
    gamma = jax.vmap(lambda H, r: uh.chi2_statistic(
        P_ss, uh.take_cols(H, sup), r, sigma))(H_up, res_up)
    dof = jnp.maximum(n_valid - 3, 1)
    mult = jnp.where(_aruco_landmark_mask(cfg, feat_ids),
                     cfg.chi2_multiplier_aruco, cfg.chi2_multiplier_slam)
    ok = ok & jnp.isfinite(gamma) & (gamma < ekf.chi2_gate(dof) * mult)

    # R1^{-1} + OBSERVABILITY CAP.  At near-zero parallax a candidate can
    # slip past the triangulation gates with a nearly singular landmark
    # factor R1; inv(R1) then inserts a ~1e12 landmark covariance into P,
    # and because the JOINT update's support spans all landmark columns,
    # ONE poisoned block blows up ||I + G·P_ss|| for every subsequent
    # frame — the newton solve no-ops (visibly, resid=inf) and the filter
    # goes permanently blind (measured on the MH_03 stationary-start
    # replay: covariance sigma_p 90 m, then NaN).  Gate on the inserted
    # variance proxy sigma²·Σ R1inv² — an unobservable landmark must be
    # refused, not inserted with an astronomical prior.  (The sequential
    # oracle path omits the cap: it only binds in degenerate geometry the
    # equivalence tests never construct, and a sequential update isolates
    # the poison to one landmark anyway.)
    if single:
        r1 = R1[:, 0, 0]
        r1_inv = jnp.where(jnp.abs(r1) > 1e-9, 1.0 / r1, 0.0)
        R1inv_raw = r1_inv[:, None, None]
    else:
        R1inv_raw = smallmat.inv_upper3(R1)
    var_proxy = sigma ** 2 * jnp.sum(R1inv_raw ** 2, axis=(1, 2))
    ok = ok & jnp.isfinite(var_proxy) & (var_proxy < _INIT_VAR_CAP)

    rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
    slot = free_order[jnp.clip(jnp.where(ok, rank, 0), 0, L - 1)]
    slot_eff = jnp.where(ok, slot, L)  # L = out-of-range -> dropped

    okf = ok.astype(dtype)
    R1inv = R1inv_raw * okf[:, None, None]

    # joint covariance insertion (StateHelper.cpp:484-577 math, stacked):
    #   P_fX = -R1inv Hx1 P ;  P_FF = R1inv (Hx1 P Hx1^T + sigma^2 I) R1inv^T
    Hx1_ok = Hx1 * okf[:, None, None]  # [F,k,D]
    X = Hx1_ok.reshape(F * k, D)
    HxP = X @ state.cov  # [F*k, D]
    eye_F = jnp.eye(F, dtype=dtype)
    Bflat = (eye_F[:, None, :, None] * R1inv[:, :, None, :]).reshape(
        F * k, F * k)  # block-diagonal of the R1 inverses
    G = HxP @ X.T + sigma ** 2 * jnp.eye(F * k, dtype=dtype)
    P_FF = Bflat @ G @ Bflat.T
    P_fX = -(Bflat @ HxP)  # [F*k, D]

    col = (3 * slot_eff)[:, None] + jnp.arange(k)[None, :]  # [F,k]
    # one-hot over the FULL state width: the slam-block .at[so:...].add
    # writes lowered to [D,D] dynamic-update-slices that copied the whole
    # covariance three times per frame (TPU profile); expanding E to [Fk,D]
    # turns the insertion into two matmul-shaped adds + one corner product
    E = (jnp.arange(D)[None, :]
         == (cfg.slam_off + col.reshape(F * k))[:, None]).astype(dtype)
    rows_add = E.T @ P_fX  # [D, D], nonzero only at the new slam rows
    # P_fX's columns at the new slots are zero (free-slot covariance rows
    # are zero), so the corner gets exactly P_FF with no double count
    cov = state.cov + rows_add + rows_add.T + E.T @ P_FF @ E

    # mean correction per landmark: dlam = R1inv res1 (rho-only for single)
    df = jax.vmap(lambda B, r: B @ r)(R1inv, res1)  # [F,k]
    if single:
        lam_new = lam0.at[:, 0].add(df[:, 0])
    else:
        lam_new = lam0 + df

    head_i32 = state.head.astype(jnp.int32)
    state = state._replace(
        cov=0.5 * (cov + cov.T),
        slam_p=state.slam_p.at[slot_eff].set(lam_new, mode="drop"),
        slam_p_fej=state.slam_p_fej.at[slot_eff].set(lam0, mode="drop"),
        slam_id=state.slam_id.at[slot_eff].set(
            feat_ids.astype(jnp.int32), mode="drop"),
        slam_valid=state.slam_valid.at[slot_eff].set(True, mode="drop"),
        slam_anchor_slot=state.slam_anchor_slot.at[slot_eff].set(
            head_i32, mode="drop"),
        slam_anchor_cam=state.slam_anchor_cam.at[slot_eff].set(
            0, mode="drop"),
    )

    # one stacked system over every accepted candidate's leftover rows
    keep = okf[:, None, None]
    H_up_all = (H_up * keep).reshape(-1, D)
    res_up_all = (res_up * keep[..., 0]).reshape(-1)

    n_init = jnp.sum(ok.astype(jnp.int32))
    T = table.ids.shape[0]
    # consume EVERY attempted candidate's measurements, success or failure
    # (reference to_delete on processed features, UpdaterSLAM.cpp:139-147,
    # 237): a failed candidate left unconsumed stays a full-window row with
    # a tied top_k score and is re-selected every frame, starving the
    # other candidates (measured on the slow-parallax EuRoC V1_01 replay:
    # SLAM stuck at 0-7/50 active landmarks until this fix)
    consumed_rows = jnp.any(
        (jnp.arange(T)[:, None] == rows[None, :]) & attempted[None, :],
        axis=1)
    table = ft.clear_rows(table, consumed_rows)

    if collect:  # joint mode: the caller applies the leftover rows
        return state, table, n_init, H_up_all, res_up_all

    r_diag = jnp.full((H_up_all.shape[0],), sigma ** 2, dtype=dtype)
    # leftover rows are pure H_x rows: clones + cam calib support only;
    # zero rows are exact update no-ops (no any_ok select needed)
    state = ekf.ekf_update(state, cfg, H_up_all, res_up_all, r_diag,
                           ranges=cfg.cam_meas_support_ranges)
    return state, table, n_init


def update(state: VioState, cfg: FilterConfig, table: ft.FeatureTable):
    """One batched EKF update over all in-state landmarks' unconsumed
    measurements.

    UpdaterSLAM::update parity (UpdaterSLAM.cpp:254-470): every measurement
    accumulated since the landmark's last update is stacked (the reference's
    `max_meas_size += 2 * timestamps.size()` loop over all clone times), the
    per-landmark system is chi2-gated, and all consumed measurements are
    cleared from the table afterwards — success or failure — exactly like
    the reference's `to_delete = true` on every processed feature, so no
    information is ever used twice.  Because consumption happens every
    frame, unconsumed rows only exist at the newest clone(s); the gather is
    therefore restricted to the newest cfg.slam_stack_clones slots (static
    shape [W·N] instead of [C·N]) — set 0 for the full-window gather.

    Returns (state, table, fail_count [L], n_used).
    """
    state, table, H_big, res_big, failed, n_used = build_update(
        state, cfg, table)
    if cfg.max_slam == 0:
        return state, table, failed, n_used
    D = cfg.state_dim
    sigma = cfg.sigma_pix_slam
    # compress the (mostly-masked) stacked system when it is taller than its
    # static column support (clones+landmarks+calib — never the IMU block) —
    # the same orthogonal-transform argument as the MSCKF compression
    # applies since the landmark columns are ordinary state columns here
    ranges = cfg.slam_meas_support_ranges
    k_sup = sum(b - a for a, b in ranges)
    if H_big.shape[0] > k_sup:
        H_big, res_big = uh.compress_system_ranges(H_big, res_big, ranges, D)
    r_diag = jnp.full((H_big.shape[0],), sigma**2, dtype=H_big.dtype)

    # zero rows are exact update no-ops — no any_ok select needed
    state = ekf.ekf_update(state, cfg, H_big, res_big, r_diag, ranges=ranges)
    return state, table, failed, n_used


def build_update(state: VioState, cfg: FilterConfig, table: ft.FeatureTable):
    """The linearization/gating/bookkeeping half of `update` — NO state
    update.  Returns (state, table, H [L·2·O, D], res, fail_count [L],
    n_used) with row noise = cfg.sigma_pix_slam (aruco rows pre-whitened)
    and column support cfg.slam_meas_support_ranges.  `state` carries the
    updated slam_fail counters; `table` has consumed measurements cleared.
    Used directly by the joint per-frame update."""
    if cfg.max_slam == 0:
        return (state, table,
                jnp.zeros((0, cfg.state_dim), dtype=state.cov.dtype),
                jnp.zeros((0,), dtype=state.cov.dtype),
                jnp.zeros((0,), dtype=jnp.int32),
                jnp.asarray(0, jnp.int32))
    L, C, N, D = cfg.max_slam, cfg.max_clones, cfg.num_cams, cfg.state_dim
    # gather only the newest-W clone slots per landmark: measurements are
    # consumed every frame, so older slots are empty padding in steady
    # state (slam_stack_clones=0 restores the full reference-exact window)
    W = C if cfg.slam_stack_clones <= 0 else min(cfg.slam_stack_clones, C)
    O = W * N
    sigma = cfg.sigma_pix_slam

    # landmark -> table row (match by id)
    eq = state.slam_id[:, None] == table.ids[None, :]  # [L, T]
    row = jnp.argmax(eq, axis=1)
    has_row = jnp.any(eq, axis=1) & state.slam_valid & (state.slam_id >= 0)

    from open_vins_tpu.core.state import clone_age_order

    slots_w = clone_age_order(state, cfg)[:W].astype(jnp.int32)  # newest first
    slot_idx = jnp.repeat(slots_w, N)  # [O] slot-major
    cam_idx = jnp.tile(jnp.arange(N, dtype=jnp.int32), W)
    # one-hot lookups (take1): dynamic gathers over the small clone dim
    # miscompile on the axon backend
    clone_valid_w = jax.vmap(
        lambda s: take1(state.clone_valid.astype(jnp.float32), s) > 0.5
    )(slot_idx)

    single = lrep.is_single(cfg.feat_rep_slam)

    # chi2 gates contract over the static SLAM support columns (P_ss hoisted
    # out of the vmap); landmark rows are exact zeros on the IMU block
    sup = cfg.slam_meas_support_ranges
    P_ss = uh.take_cols(uh.take_cols(state.cov, sup).T, sup)

    ctx_w = uh.obs_context(state, cfg, slot_idx, cam_idx)

    def per_landmark(slot):
        r = row[slot]
        uv_r, uvn_r = table.uv[r], table.uvn[r]
        bits_r = table.mbits[r]  # [N] packed clone bits

        def gather_slot(s):
            return (take1(uv_r, s), take1(uvn_r, s),
                    ((bits_r >> s) & 1) > 0)

        uv_w, uvn_w, m_w = jax.vmap(gather_slot)(slots_w)
        obs = uh.GatheredObs(
            clone_slot=slot_idx,
            cam=cam_idx,
            uv=uv_w.reshape(O, 2),
            uvn=uvn_w.reshape(O, 2),
            mask=(m_w.reshape(O) & has_row[slot] & clone_valid_w),
        )
        p_G_cur = landmark_global(state, cfg, slot, fej=False)
        p_G_fej = (landmark_global(state, cfg, slot, fej=True)
                   if cfg.use_fej else p_G_cur)
        H_x, H_fg, res, row_mask = uh.feature_jacobian(
            state, cfg, obs, p_G_cur, p_G_fej, ctx=ctx_w
        )
        n_valid = jnp.sum(row_mask.astype(jnp.int32))
        if single:
            # 1-dof depth-only landmark (UpdaterSLAM.cpp:340-380): linearize
            # as the MSCKF-inverse-depth equivalent, move the ρ column into
            # the state, and nullspace-project the (marginalized-at-init)
            # bearing columns out of the whole system — crucial so the
            # bearing is not treated as perfectly known.
            H_x, H_lam3 = _chain_anchored(
                state, cfg, slot, H_x, H_fg, p_G_cur,
                rep=lrep.ANCHORED_MSCKF_INVERSE_DEPTH)
            H_full = _set_slam_cols(H_x, cfg, slot, H_lam3[:, 2:3])
            _, Mr = uh.householder_rotate(
                H_lam3[:, :2], jnp.concatenate([H_full, res[:, None]], 1))
            H_full = Mr[:, :-1].at[:2].set(0.0)
            res = Mr[:, -1].at[:2].set(0.0)
            out_mask = jnp.arange(res.shape[0]) >= 2
            dof = jnp.maximum(n_valid - 2, 1)
            min_rows = 4  # required_meas = 2 obs (UpdaterSLAM.cpp:286)
        else:
            H_x, H_lam = _chain_anchored(state, cfg, slot, H_x, H_fg, p_G_cur)
            # place the landmark rows at its own columns
            H_full = _set_slam_cols(H_x, cfg, slot, H_lam)
            out_mask = row_mask
            dof = jnp.maximum(n_valid, 1)
            min_rows = 1
        # aruco landmarks carry their own noise/gate (the reference runs a
        # second UpdaterSLAM instance for them): whiten the rows by
        # sigma/sigma_aruco so the stacked system stays isotropic at sigma
        # (exactly equivalent to per-row sigma_aruco noise)
        mult = cfg.chi2_multiplier_slam
        if cfg.num_aruco_tags > 0:
            is_ar = _aruco_landmark_mask(cfg, take1(state.slam_id, slot))
            c = jnp.where(is_ar, sigma / cfg.sigma_pix_aruco, 1.0)
            H_full = H_full * c
            res = res * c
            mult = jnp.where(is_ar, cfg.chi2_multiplier_aruco, mult)
        gamma = uh.chi2_statistic(P_ss, uh.take_cols(H_full, sup), res, sigma)
        ok = (
            has_row[slot]
            & (n_valid >= min_rows)
            & jnp.isfinite(gamma)
            & (gamma < ekf.chi2_gate(dof) * mult)
        )
        return H_full, res, out_mask, row_mask, ok

    H, res, out_mask, row_mask, ok = jax.vmap(per_landmark)(jnp.arange(L))
    keep = (ok[:, None] & out_mask)  # [L, 2O]
    H_big = jnp.where(keep[..., None], H, 0.0).reshape(L * 2 * O, D)
    res_big = jnp.where(keep, res, 0.0).reshape(L * 2 * O)

    # consume: every landmark with >=1 valid stacked row had its measurements
    # processed (used or chi2-rejected) — clear them from the table
    consumed = has_row & jnp.any(row_mask, axis=1)  # [L]
    consumed_rows = jnp.any(eq & consumed[:, None], axis=0)  # [T]
    table = ft.clear_rows(table, consumed_rows)

    failed = consumed & (~ok)
    state = state._replace(slam_fail=state.slam_fail + failed.astype(jnp.int32))
    return (state, table, H_big, res_big, failed.astype(jnp.int32),
            jnp.sum(ok.astype(jnp.int32)))


def _anchor_change_terms(state: VioState, cfg: FilterConfig, slot,
                         dying_slot, new_slot):
    """Per-landmark anchor-change pieces: (need, lam_new, lam_new_fej,
    row [3, D]) where `row` is the landmark's new block-row of the exact
    covariance row map M (δλ_new = J [δλ_old; δx_Aold; δx_Anew])."""
    rep = cfg.feat_rep_slam
    D = cfg.state_dim
    dtype = state.cov.dtype
    need = take1(state.slam_valid.astype(jnp.float32), slot) > 0.5
    need = need & (take1(state.slam_anchor_slot, slot) == dying_slot)
    a_cam = take1(state.slam_anchor_cam, slot)
    q_e = take1(state.calib_ext_q, a_cam)
    p_e = take1(state.calib_ext_p, a_cam)

    # Jacobians + FEJ transform at first-estimate values
    q_of = take1(state.clones_q_fej, dying_slot)
    p_of = take1(state.clones_p_fej, dying_slot)
    q_nf = take1(state.clones_q_fej, new_slot)
    p_nf = take1(state.clones_p_fej, new_slot)
    # single-depth landmarks have no separate FEJ value — the reference's
    # get_xyz(true) reads the current value/bearing (Landmark.cpp:53-57)
    lam_f = take1(
        state.slam_p if lrep.is_single(rep) else state.slam_p_fej, slot)
    lam_new_f, J_lam, J_xo, J_xn = lrep.anchor_change_jacobians(
        rep, lam_f, q_of, p_of, q_nf, p_nf, q_e, p_e
    )
    # value transform at current estimates
    q_o = take1(state.clones_q, dying_slot)
    p_o = take1(state.clones_p, dying_slot)
    q_n = take1(state.clones_q, new_slot)
    p_n = take1(state.clones_p, new_slot)
    lam_c = take1(state.slam_p, slot)
    p_G = lrep.to_global(rep, lam_c, q_o, p_o, q_e, p_e)
    lam_new = lrep.from_global(rep, p_G, q_n, p_n, q_e, p_e)

    # assemble the [3, D] row by one-hot contraction (a traced-offset
    # dynamic_update_slice inside the change_anchors vmap serializes all L
    # landmarks into a while loop — see _add_clone_block)
    C, L = cfg.max_clones, cfg.max_slam
    oh_d = (jnp.arange(C) == dying_slot).astype(dtype)  # [C]
    oh_n = (jnp.arange(C) == new_slot).astype(dtype)
    # overwrite semantics: the new-anchor block wins if slots collide
    clone_blk = (oh_n[None, :, None] * J_xn[:, None, :]
                 + (1.0 - oh_n[None, :, None]) * oh_d[None, :, None]
                 * J_xo[:, None, :]).reshape(3, 6 * C)
    oh_l = (jnp.arange(L) == slot).astype(dtype)  # [L]
    # identity landmark block when no change is needed
    lam_blk = jnp.where(need, J_lam, jnp.eye(3, dtype=dtype))
    slam_blk = (lam_blk[:, None, :] * oh_l[None, :, None]).reshape(3, 3 * L)
    needf = jnp.asarray(need, dtype)
    row = jnp.concatenate([
        jnp.zeros((3, cfg.clones_off), dtype),
        needf * clone_blk,
        slam_blk,
        jnp.zeros((3, D - cfg.calib_dt_off), dtype),
    ], axis=1)
    return need, lam_new, lam_new_f, row


def change_anchors(state: VioState, cfg: FilterConfig, dying_slot):
    """Re-anchor landmarks whose anchor clone is about to be marginalized
    onto the newest clone (UpdaterSLAM::change_anchors /
    perform_anchor_change parity, UpdaterSLAM.cpp:481-647).

    The covariance transform is the exact row map  δλ_new = J [δλ_old;
    δx_Aold; δx_Anew]  applied as cov' = M cov Mᵀ with M = I except the
    landmark rows; Jacobians at FEJ values, value transform at current
    values; FEJ of the landmark reset to the transformed FEJ value.

    TPU shape: each landmark's map touches only its own 3 rows (reading
    shared clone columns), so ALL landmarks transform jointly — M is built
    with one vmap and applied as two [D,D] matmuls on the MXU instead of an
    L-sequential loop of small updates (identical algebra: row maps with
    disjoint row support commute).
    """
    if cfg.max_slam == 0 or not lrep.is_anchored(cfg.feat_rep_slam):
        return state
    L = cfg.max_slam
    D = cfg.state_dim
    new_slot = state.head
    dtype = state.cov.dtype

    need, lam_new, lam_new_f, rows = jax.vmap(
        lambda s: _anchor_change_terms(state, cfg, s, dying_slot, new_slot)
    )(jnp.arange(L))

    M = jnp.eye(D, dtype=dtype)
    M = M.at[cfg.slam_off:cfg.slam_off + 3 * L].set(rows.reshape(3 * L, D))
    cov = M @ state.cov @ M.T
    cov = 0.5 * (cov + cov.T)

    needc = need[:, None]
    return state._replace(
        cov=cov,
        slam_p=jnp.where(needc, lam_new, state.slam_p),
        slam_p_fej=jnp.where(needc, lam_new_f, state.slam_p_fej),
        slam_anchor_slot=jnp.where(
            need, new_slot.astype(jnp.int32), state.slam_anchor_slot),
    )


def evict(state: VioState, cfg: FilterConfig, table: ft.FeatureTable):
    """Marginalize landmarks whose track died or that keep failing the gate
    (state.slam_fail carries the update_fail_count, VioManager.cpp:461-481).
    A landmark is dead when its feature was not tracked into the current
    frame (the reference's should_marg when the database entry is gone) or
    its fail count reached MAX_FAIL.  The evicted landmark's table row is
    freed too — its measurements were already consumed by SLAM updates and
    must not be re-used by the MSCKF path (information re-use)."""
    if cfg.max_slam == 0:
        return state, table
    L = cfg.max_slam
    eq = state.slam_id[:, None] == table.ids[None, :]  # [L, T]
    tracked = jnp.any(eq & (table.ids[None, :] >= 0), axis=1)
    # seen this frame: the row's transient `seen` flag (measurements were
    # consumed by update(), so obs counts cannot distinguish live tracks)
    seen = jnp.any(eq & table.seen[None, :], axis=1)
    dead = state.slam_valid & (
        (~tracked) | (~seen) | (state.slam_fail >= MAX_FAIL))

    dead_rows = jnp.any(eq & dead[:, None], axis=0)
    table = ft.free_rows(table, dead_rows)
    # batched marginalization: dropping a landmark = zeroing its covariance
    # rows/cols (StateHelper::marginalize_slam under the static layout) —
    # all dead slots at once with one rank-1 mask product instead of an
    # L-sequential loop of slice updates
    D = cfg.state_dim
    keep = jnp.ones((D,), dtype=state.cov.dtype)
    keep = keep.at[cfg.slam_off:cfg.slam_off + 3 * L].set(
        jnp.repeat((~dead).astype(state.cov.dtype), 3))
    cov = state.cov * keep[:, None] * keep[None, :]
    state = state._replace(
        cov=cov,
        slam_valid=state.slam_valid & (~dead),
        slam_id=jnp.where(dead, -1, state.slam_id),
        slam_fail=jnp.where(dead, 0, state.slam_fail),
    )
    return state, table
