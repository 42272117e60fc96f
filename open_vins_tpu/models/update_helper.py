"""Measurement linearization: per-feature Jacobians, nullspace projection,
measurement compression.

Capability parity with ov_msckf::UpdaterHelper (UpdaterHelper.{h,cpp}):
  * get_feature_jacobian_full (UpdaterHelper.cpp:192-424): stacked per-feature
    system {H_f, H_x, res} with the full distortion chain dz/dz_n · dz_n/dp_C,
    clone Jacobians [R_ItoC ⌊R_GtoI(p_f−p_I)⌋ , −R_ItoC R_GtoI], extrinsic and
    intrinsic calibration columns, and FEJ substitution of clone/feature
    linearization points (UpdaterHelper.cpp:353-363, 87-96),
  * nullspace_project_inplace (…:426-454) — here an orthogonal-complement
    projection via thin-QR of H_f (numerically equivalent: both apply an
    orthonormal basis of null(H_fᵀ)),
  * measurement_compress_inplace (…:456-487) — Householder QR of the stacked
    [H | res], keeping the leading D rows.

TPU-first design: one observation = one row-pair computed by a pure function;
features are vmapped; dynamic per-feature row counts become masks; the
sequential Givens sweeps become batched QR factorizations (MXU-friendly).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import VioState
from open_vins_tpu.ops import cameras, lie
from open_vins_tpu.ops.indexing import take1


class GatheredObs(NamedTuple):
    """Per-feature observations with state context gathered per obs slot.

    All arrays have leading dim O = max obs per feature.
    """

    clone_slot: jax.Array  # [O] int32 — clone ring slot of each obs
    cam: jax.Array  # [O] int32 — camera index
    uv: jax.Array  # [O, 2] raw pixel measurement
    uvn: jax.Array  # [O, 2] normalized measurement (for triangulation)
    mask: jax.Array  # [O] valid


class ObsContext(NamedTuple):
    """Per-obs-slot state context (clone poses + camera calib), computed
    ONCE per frame with `obs_context` and shared by every feature.

    Why: `feature_jacobian` is vmapped over F features; its per-obs state
    lookups (take1 + quat_2_rot chains) do not depend on the feature, but
    under the vmap XLA materializes them per (feature, obs) — F×O small-
    rotation soups ([F,O,3,3] fusions were ~12% of the B=8 device program)
    instead of O.  Hoisting them here makes the per-feature work start at
    the geometry that actually varies.
    """

    R_GtoI: jax.Array  # [O, 3, 3]
    R_GtoI_fej: jax.Array  # [O, 3, 3]
    p_c: jax.Array  # [O, 3]
    p_c_fej: jax.Array  # [O, 3]
    R_ItoC: jax.Array  # [O, 3, 3]
    p_IinC: jax.Array  # [O, 3]
    zeta: jax.Array  # [O, 8]


def obs_context(state: VioState, cfg: FilterConfig, slot_idx, cam_idx
                ) -> ObsContext:
    """Build the [O]-indexed state context for (clone slot, camera) pairs.

    take1 = gather-free one-hot lookup (axon small-gather miscompile
    workaround)."""

    def one(slot, cam):
        q_c = take1(state.clones_q, slot)
        p_c = take1(state.clones_p, slot)
        q_c_fej = take1(state.clones_q_fej, slot) if cfg.use_fej else q_c
        p_c_fej = take1(state.clones_p_fej, slot) if cfg.use_fej else p_c
        return ObsContext(
            R_GtoI=lie.quat_2_rot(q_c),
            R_GtoI_fej=lie.quat_2_rot(q_c_fej),
            p_c=p_c,
            p_c_fej=p_c_fej,
            R_ItoC=lie.quat_2_rot(take1(state.calib_ext_q, cam)),
            p_IinC=take1(state.calib_ext_p, cam),
            zeta=take1(state.calib_intr, cam),
        )

    return jax.vmap(one)(slot_idx, cam_idx)


def feature_jacobian(
    state: VioState, cfg: FilterConfig, obs: GatheredObs, p_f, p_f_fej,
    ctx: ObsContext = None,
):
    """Stacked measurement system for one feature (GLOBAL_3D representation).

    Returns (H_x [2O, D], H_f [2O, 3], res [2O], row_mask [2O]).
    Rows for invalid observations are zeroed.  Pass a precomputed `ctx`
    (see ObsContext) whenever this is called under a feature vmap.
    """
    D = cfg.state_dim
    O = obs.mask.shape[0]
    dtype = state.cov.dtype
    if ctx is None:
        ctx = obs_context(state, cfg, obs.clone_slot, obs.cam)

    def one_obs(cx, slot, cam, uv, valid):
        # state lookups all live in cx (hoisted out of the feature vmap)
        p_c = cx.p_c
        p_c_fej = cx.p_c_fej
        R_GtoI = cx.R_GtoI
        R_GtoI_fej = cx.R_GtoI_fej
        R_ItoC = cx.R_ItoC
        p_IinC = cx.p_IinC
        zeta = cx.zeta

        # prediction with current estimates
        p_FinI = R_GtoI @ (p_f - p_c)
        p_FinC = R_ItoC @ p_FinI + p_IinC
        z_safe = jnp.where(jnp.abs(p_FinC[2]) > 1e-6, p_FinC[2], 1e-6)
        uvn_pred = p_FinC[:2] / z_safe
        uv_pred = cameras.distort(cfg.cam_model, zeta, uvn_pred)
        res = uv - uv_pred

        # FEJ-linearized geometry (UpdaterHelper.cpp:353-363): the reference
        # recomputes the camera-frame point at the first-estimate values and
        # builds dzn/dpC there; only the distortion Jacobian dz/dzn stays at
        # the current-estimate prediction.
        p_FinI_fej = R_GtoI_fej @ (p_f_fej - p_c_fej)
        p_FinC_fej = R_ItoC @ p_FinI_fej + p_IinC
        z_fej = jnp.where(jnp.abs(p_FinC_fej[2]) > 1e-6, p_FinC_fej[2], 1e-6)

        # chain: dz/duvn (distortion, current) and duvn/dpC (projection, FEJ)
        J_dist, J_zeta = cameras.distort_jacobians(cfg.cam_model, zeta, uvn_pred)
        inv_z = 1.0 / z_fej
        J_proj = jnp.asarray(
            [
                [inv_z, 0.0, -p_FinC_fej[0] * inv_z * inv_z],
                [0.0, inv_z, -p_FinC_fej[1] * inv_z * inv_z],
            ],
            dtype=dtype,
        )
        dz_dpC = J_dist @ J_proj  # [2,3]

        dpC_dth = R_ItoC @ lie.skew(p_FinI_fej)  # [3,3]  w.r.t. clone δθ
        dpC_dp = -(R_ItoC @ R_GtoI_fej)  # w.r.t. clone δp
        dpC_dpf = R_ItoC @ R_GtoI_fej  # w.r.t. feature

        H_f_o = dz_dpC @ dpC_dpf  # [2,3]
        H_th = dz_dpC @ dpC_dth  # [2,3]
        H_p = dz_dpC @ dpC_dp  # [2,3]

        # place blocks by ONE-HOT CONTRACTION, never by dynamic_update_slice
        # with a traced offset: a data-dependent scatter inside this vmap
        # forces XLA to lower the whole per-obs batch as a sequential while
        # loop (observed: ~45% of TPU frame time as a 440-iteration loop of
        # [1,1,2,3] updates); one-hot products keep it a single fused batch.
        C, N = cfg.max_clones, cfg.num_cams
        blk = jnp.concatenate([H_th, H_p], axis=1)  # [2, 6]
        oh_c = (jnp.arange(C) == slot).astype(dtype)  # [C]
        clone_cols = (blk[:, None, :] * oh_c[None, :, None]).reshape(2, 6 * C)
        oh_n = (jnp.arange(N) == cam).astype(dtype)  # [N]
        if cfg.calib_cam_extrinsics:
            # d pC / dθ_calib = ⌊R_ItoC p_FinI⌋ ; d pC / dp_calib = I
            # (FEJ point, matching the reference's dpfc_dcalib at p_FinCi_fej)
            H_cth = dz_dpC @ lie.skew(R_ItoC @ p_FinI_fej)
            H_cp = dz_dpC
            ext_blk = jnp.concatenate([H_cth, H_cp], axis=1)  # [2, 6]
            ext_cols = (ext_blk[:, None, :] * oh_n[None, :, None]
                        ).reshape(2, 6 * N)
        else:
            ext_cols = jnp.zeros((2, 6 * N), dtype=dtype)
        if cfg.calib_cam_intrinsics:
            intr_cols = (J_zeta[:, None, :] * oh_n[None, :, None]
                         ).reshape(2, 8 * N)
        else:
            intr_cols = jnp.zeros((2, 8 * N), dtype=dtype)
        row = jnp.concatenate([
            jnp.zeros((2, cfg.clones_off), dtype=dtype),  # imu block
            clone_cols,
            jnp.zeros((2, cfg.calib_ext_off - cfg.slam_off),
                      dtype=dtype),  # slam + dt blocks
            ext_cols,
            intr_cols,
            jnp.zeros((2, D - cfg.calib_intr_off - 8 * N),
                      dtype=dtype),  # imu-intrinsic tail
        ], axis=1)

        # physical per-observation depth gate: the triangulation distance
        # gates run in the ANCHOR frame only (reference featinit min_dist,
        # triangulation.py:119), so a feature 2 m from its anchor can sit
        # centimeters from ANOTHER clone — its 1/z² projection Jacobian
        # rows reach O(10²-10⁶) and push S = HPHᵀ+R indefinite in f32
        # (measured: chol NaN at frame 77 of a close-depth corridor sim,
        # escaping into the state).  Such an observation is physically
        # untrackable anyway; zero the row exactly (no-op convention).
        depth_ok = (p_FinC[2] > 0.05) & (p_FinC_fej[2] > 0.05)
        valid = valid & depth_ok
        w = valid.astype(dtype)
        return row * w, H_f_o * w, res * w, valid

    H_x_rows, H_f_rows, res_rows, vmask = jax.vmap(one_obs)(
        ctx, obs.clone_slot, obs.cam, obs.uv, obs.mask
    )
    H_x = H_x_rows.reshape(2 * O, D)
    H_f = H_f_rows.reshape(2 * O, 3)
    res = res_rows.reshape(2 * O)
    row_mask = jnp.repeat(vmask, 2)
    return H_x, H_f, res, row_mask


def householder_rotate(H_f, M):
    """Apply Qᵀ — the complete-QR orthogonal factor of H_f [m, k] — to both
    H_f and M [m, n], LAPACK-free.

    The k reflectors are built and applied as unrolled rank-1 batched vector
    ops (k is tiny: 1–3), so under a feature vmap this fuses into a handful
    of batched multiply-adds instead of a geqrf+orgqr custom-call pair whose
    tiny per-feature factorizations execute serially on TPU (profiled ~8 us
    per frame per call site at the operating point, plus the launch tax).

    Returns (R_f [m, k], QtM [m, n]): R_f upper-triangular in its leading
    k×k block (up to sign conventions identical to jnp.linalg.qr), rows k:
    of QtM spanning the left-nullspace image — exactly the contract of the
    complete-QR path it replaces (both apply *an* orthonormal basis, and
    every consumer is invariant to which one).  All-zero columns yield
    identity reflectors (exact no-ops), matching the masked-row convention.
    """
    m, k = H_f.shape
    ridx = jnp.arange(m)
    A, B = H_f, M
    for j in range(k):
        x = jnp.where(ridx >= j, A[:, j], 0.0)
        normx = jnp.sqrt(jnp.sum(x * x))
        sgn = jnp.where(A[j, j] >= 0, 1.0, -1.0)
        beta = -sgn * normx
        v = x - beta * (ridx == j).astype(A.dtype)
        vn2 = jnp.sum(v * v)
        scale = jnp.where(vn2 > 1e-30, 2.0 / vn2, 0.0)
        A = A - (scale * v)[:, None] * (v @ A)[None, :]
        B = B - (scale * v)[:, None] * (v @ B)[None, :]
    return A, B


def nullspace_project(H_x, H_f, res):
    """Left-nullspace projection of H_f (UpdaterHelper.cpp:426-454 parity).

    [m, D], [m, 3], [m] -> (H_proj [m, D], res_proj [m], proj_row_mask [m])
    where only the first (rank_valid - 3) rows carry information; trailing
    rows are exactly zero (orthogonal complement of a rank-3 column space).
    Inputs must already have invalid rows zeroed.
    """
    _, B = householder_rotate(H_f, jnp.concatenate([H_x, res[:, None]], 1))
    # discard the first 3 rows (the H_f column space)
    return B[3:, :-1], B[3:, -1]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _tsqr_r(A, min_ratio=4):
    """R factor of a tall [m, n] matrix by TSQR row-block reduction.

    The m-row column-sequential Householder QR (HBM-bound on TPU) becomes
    g independent [B, n] block factorizations — each done entirely in VMEM
    by a Pallas kernel on TPU (ops.pallas_kernels.householder_qr_blocks) —
    followed by one small [g·n, n] combine QR.  Any R with RᵀR = AᵀA is an
    orthogonal transform of the same system, so the EKF update is identical
    (the UpdaterHelper.cpp:456-487 argument).  Zero-padded rows/cols are
    exact no-ops.  Falls back to one dense QR when m < min_ratio·n.
    """
    m, n = A.shape
    if m < min_ratio * n:
        return jnp.linalg.qr(A, mode="r")
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        from open_vins_tpu.ops.pallas_kernels import (
            householder_qr_blocks_pallas)
        n_pad = _round_up(n, 128)
        B = _round_up(2 * n_pad, 8)
    else:
        n_pad = n
        B = 2 * n
    g = max(1, -(-m // B))
    A_p = jnp.zeros((g * B, n_pad), A.dtype).at[:m, :n].set(A)
    blocks = A_p.reshape(g, B, n_pad)
    if on_tpu:
        R_b = householder_qr_blocks_pallas(blocks)  # [g, n_pad, n_pad]
    else:
        R_b = jax.vmap(lambda b: jnp.linalg.qr(b, mode="r"))(blocks)
    stacked = R_b.reshape(g * n_pad, n_pad)[:, :n]
    return jnp.linalg.qr(stacked, mode="r")[:n, :]


def compress_system(H, res, out_rows):
    """QR measurement compression (UpdaterHelper.cpp:456-487 parity).

    Householder QR of the augmented [H | res]; the leading `out_rows` rows of
    R give the compressed system under the same orthogonal transform (the
    first D reflectors depend only on H, so column D+1 of R is Qᵀ res).
    Tall systems route through the blocked TSQR reduction (`_tsqr_r`).
    """
    m, D = H.shape
    A = jnp.concatenate([H, res[:, None]], axis=1)
    R = _tsqr_r(A)
    k = min(out_rows, R.shape[0])
    H_c = jnp.zeros((out_rows, D), dtype=H.dtype).at[:k].set(R[:k, :D])
    res_c = jnp.zeros((out_rows,), dtype=H.dtype).at[:k].set(R[:k, D])
    return H_c, res_c


def take_cols(M, ranges):
    """Static-slice gather of column ranges: M[:, ∪ranges] (axon-safe)."""
    return jnp.concatenate([M[..., a:b] for a, b in ranges], axis=-1)


def scatter_cols(M_s, ranges, D):
    """Inverse of take_cols: place [rows, k] back into [rows, D] zeros."""
    out = jnp.zeros(M_s.shape[:-1] + (D,), M_s.dtype)
    off = 0
    for a, b in ranges:
        out = out.at[..., a:b].set(M_s[..., off:off + (b - a)])
        off += b - a
    return out


def _cholqr2_r(A, shift_rel=3e-6):
    """R factor by SHIFTED CHOLESKYQR2 — the MXU-native tall-QR.

    Two Gram-Cholesky passes: R₁ = chol(AᵀA + sI)ᵀ, Q₁ = A R₁⁻¹,
    R = chol(Q₁ᵀQ₁ + s₂I)ᵀ R₁.  In exact arithmetic RᵀR = AᵀA holds for ANY
    shift (R₁ᵀ(Q₁ᵀQ₁)R₁ = AᵀA identically); in f32 the error is
    ~eps·cond(Q₁) ≈ eps — the second pass refines away both the shift and
    the squared-condition error that makes single-pass normal equations
    unsafe (see compress_system_cholesky's caveat; this is NOT that).  The
    shift only provides rank-safety for structurally zero columns (e.g.
    uncalibrated blocks inside the support set).  Cost: three MXU matmuls +
    two [n,n] factorizations — no sequential Householder panels (XLA geqrf
    burned ~330 us/frame on the TPU profile; this runs in ~1/4 of it).
    """
    n = A.shape[1]
    dt = A.dtype
    eye = jnp.eye(n, dtype=dt)
    G = A.T @ A
    s1 = shift_rel * (jnp.trace(G) / n) + jnp.asarray(1e-30, dt)
    L1 = jnp.linalg.cholesky(G + s1 * eye)
    L1 = jnp.where(jnp.isfinite(L1), L1, eye)  # total breakdown guard
    L1_inv = jax.scipy.linalg.solve_triangular(L1, eye, lower=True)
    Q1 = A @ L1_inv.T
    G2 = Q1.T @ Q1
    s2 = shift_rel * (jnp.trace(G2) / n) + jnp.asarray(1e-30, dt)
    L2 = jnp.linalg.cholesky(G2 + s2 * eye)
    L2 = jnp.where(jnp.isfinite(L2), L2, eye)
    return L2.T @ L1.T  # upper triangular [n, n]


def compress_system_ranges(H, res, ranges, D):
    """QR compression restricted to a STATIC column-support set.

    Measurement rows from the camera pipeline are exactly zero outside
    `ranges` (clones + calib [+ landmarks] — never the IMU block, see
    FilterConfig.cam_meas_support_ranges), so the compression QR and the
    downstream S-solve can run at k = |support| columns/rows instead of D:
    identical algebra (the dropped columns contribute nothing to RᵀR), a
    ~(D/k)² cheaper factorization.  The factorization itself is the
    MXU-native CholeskyQR2 (`_cholqr2_r`).  Returns (H_c [k, D], res_c [k]).
    """
    k = sum(b - a for a, b in ranges)
    A = jnp.concatenate([take_cols(H, ranges), res[:, None]], axis=1)
    R = _cholqr2_r(A)
    kk = min(k, R.shape[0])
    Hc_s = jnp.zeros((k, k), H.dtype).at[:kk].set(R[:kk, :k])
    res_c = jnp.zeros((k,), H.dtype).at[:kk].set(R[:kk, k])
    return scatter_cols(Hc_s, ranges, D), res_c


def compress_system_cholesky(H, res, out_rows):
    """Normal-equation compression: one MXU matmul + a [D,D] Cholesky.

    Produces (H_c, res_c) with H_cᵀH_c = HᵀH and H_cᵀres_c = Hᵀres — an
    information-equivalent system under isotropic noise, hence the same EKF
    update as the QR path.  ~10x cheaper than tall Householder QR on TPU
    (H is [m,D] with m up to ~8D).

    NUMERICS CAVEAT (why this is opt-in, not the default): squaring the
    condition number means the f32 Cholesky needs jitter ~ eps_f32*||HᵀH||,
    and that jitter IS spurious measurement information (H_c gains √jitter
    rows on every dim with zero residual).  On weakly-constrained dims with
    large covariance this measurably shrinks P every frame and corrupts
    long-horizon consistency — closed-loop SLAM runs diverged after ~70
    frames.  Sound usages: f64, short horizons, or well-excited states.
    """
    m, D = H.shape
    assert out_rows >= D
    G = H.T @ H  # [D,D], one MXU pass
    g = H.T @ res
    jitter = 1e-6 * (jnp.trace(G) / D + 1.0)
    L = jnp.linalg.cholesky(G + jitter * jnp.eye(D, dtype=H.dtype))
    H_c = L.T  # upper triangular, H_cᵀ H_c = G
    res_c = jax.scipy.linalg.solve_triangular(L, g, lower=True)
    pad = out_rows - D
    if pad > 0:
        H_c = jnp.concatenate([H_c, jnp.zeros((pad, D), H.dtype)])
        res_c = jnp.concatenate([res_c, jnp.zeros((pad,), H.dtype)])
    return H_c, res_c


def chi2_statistic(state_cov, H, res, sigma):
    """γ = resᵀ (H P Hᵀ + σ²I)⁻¹ res for one feature's projected system.

    Mirrors the UpdaterMSCKF chi2 gate (UpdaterMSCKF.cpp:208-234).  Zero
    rows contribute σ² on the diagonal only, leaving γ unchanged.  Small
    systems route through the unrolled-Cholesky quadratic form
    (ops/smallmat.py) — the batched lapack-style solve custom call runs its
    tiny factorizations serially on TPU (~0.2 ms/frame at the operating
    point); the unrolled form fuses.
    """
    m = H.shape[0]
    S = H @ state_cov @ H.T + sigma**2 * jnp.eye(m, dtype=H.dtype)
    if m <= 32:
        from open_vins_tpu.ops import smallmat

        return smallmat.chi2_quadform(S, res)
    sol = jnp.linalg.solve(S, res)
    return jnp.dot(res, sol)


def _soa_mm(A, B):
    """[a,k,M] @ [k,b,M] -> [a,b,M] with the flat obs axis trailing.

    Written as broadcast-multiply-sum, NOT einsum/dot_general: XLA lowers
    a dot with batch dim M to a [M,a,b]-batched matmul and relays the
    operands M-major (transpose copies of every [3,3,M] array, visible in
    the B=8 trace); the elementwise form keeps M on lanes."""
    return (A[:, :, None, :] * B[None, :, :, :]).sum(1)


def _soa_skew(p):
    """[3,M] -> skew matrices [3,3,M]."""
    z = jnp.zeros_like(p[0])
    return jnp.stack([
        jnp.stack([z, -p[2], p[1]]),
        jnp.stack([p[2], z, -p[0]]),
        jnp.stack([-p[1], p[0], z]),
    ])


def feature_jacobian_batch(
    state: VioState, cfg: FilterConfig, gobs: GatheredObs, p_f, p_f_fej,
    ctx: ObsContext,
):
    """Batched `feature_jacobian` in SoA layout: the whole [F, O] obs grid
    is linearized with component dims LEADING and a flattened M = F·O obs
    axis trailing, so the small-matrix chains (projection, distortion,
    clone/calib blocks) run as lane-parallel elementwise ops instead of
    [F,O,2,3]-shaped fusions whose 3-wide minor dims tile at ~2% lane
    occupancy on TPU.  Same math as `feature_jacobian` (pinned by
    tests/test_update_helper_batch.py); GLOBAL_3D representation.

    gobs: batched [F, O] GatheredObs (slot/cam rows identical per feature).
    p_f / p_f_fej: [F, 3].  ctx: ObsContext over the [O] slot layout.
    Returns (H_x [F, 2O, D], H_f [F, 2O, 3], res [F, 2O], row_mask [F, 2O]).
    """
    from open_vins_tpu.ops import cameras as cam_ops

    D = cfg.state_dim
    F, O = gobs.mask.shape
    M = F * O
    dtype = state.cov.dtype
    C, N = cfg.max_clones, cfg.num_cams
    slot_idx = gobs.clone_slot[0]  # [O] (identical rows)
    cam_idx = gobs.cam[0]

    def ob(a, comp_shape):
        """ctx array [O, *comp] -> [ *comp, M ] broadcast over features."""
        moved = jnp.moveaxis(a, 0, -1)  # [*comp, O]
        return jnp.broadcast_to(
            moved[..., None, :], comp_shape + (F, O)).reshape(comp_shape + (M,))

    R_GtoI = ob(ctx.R_GtoI, (3, 3))
    R_GtoI_fej = ob(ctx.R_GtoI_fej, (3, 3))
    p_c = ob(ctx.p_c, (3,))
    p_c_fej = ob(ctx.p_c_fej, (3,))
    R_ItoC = ob(ctx.R_ItoC, (3, 3))
    p_IinC = ob(ctx.p_IinC, (3,))
    zeta = ob(ctx.zeta, (8,))

    def fcol(a):
        """[F, k] -> [k, M] broadcast over obs."""
        moved = a.T[:, :, None]  # [k, F, 1]
        return jnp.broadcast_to(moved, (a.shape[1], F, O)).reshape(-1, M)

    pf = fcol(p_f)
    pf_fej = fcol(p_f_fej)

    # geometry at current estimates
    p_FinI = (R_GtoI * (pf - p_c)[None, :, :]).sum(1)
    p_FinC = (R_ItoC * p_FinI[None, :, :]).sum(1) + p_IinC
    z_safe = jnp.where(jnp.abs(p_FinC[2]) > 1e-6, p_FinC[2], 1e-6)
    x_n, y_n = p_FinC[0] / z_safe, p_FinC[1] / z_safe
    uv_pred, J_dist, J_zeta = cam_ops.distort_jacobians_soa(
        cfg.cam_model, zeta, x_n, y_n)
    uv_meas = jnp.moveaxis(gobs.uv, -1, 0).reshape(2, M)
    res = uv_meas - uv_pred  # [2, M]

    # FEJ-linearized geometry (UpdaterHelper.cpp:353-363)
    p_FinI_fej = (R_GtoI_fej * (pf_fej - p_c_fej)[None, :, :]).sum(1)
    p_FinC_fej = (R_ItoC * p_FinI_fej[None, :, :]).sum(1) + p_IinC
    z_fej = jnp.where(jnp.abs(p_FinC_fej[2]) > 1e-6, p_FinC_fej[2], 1e-6)
    inv_z = 1.0 / z_fej
    zero = jnp.zeros_like(inv_z)
    J_proj = jnp.stack([
        jnp.stack([inv_z, zero, -p_FinC_fej[0] * inv_z * inv_z]),
        jnp.stack([zero, inv_z, -p_FinC_fej[1] * inv_z * inv_z]),
    ])  # [2, 3, M]
    dz_dpC = _soa_mm(J_dist, J_proj)  # [2, 3, M]

    dpC_dth = _soa_mm(R_ItoC, _soa_skew(p_FinI_fej))
    RR = _soa_mm(R_ItoC, R_GtoI_fej)
    H_f_o = _soa_mm(dz_dpC, RR)        # [2, 3, M]
    H_th = _soa_mm(dz_dpC, dpC_dth)
    H_p = -_soa_mm(dz_dpC, RR)

    # per-observation depth gate (see feature_jacobian): rows of a feature
    # transiting within 5 cm of ANY clone camera are zeroed exactly —
    # their 1/z² Jacobians otherwise reach magnitudes that break the f32
    # chol(S) downstream
    depth_ok = (p_FinC[2] > 0.05) & (p_FinC_fej[2] > 0.05)  # [M]
    vmask = gobs.mask & depth_ok.reshape(F, O)
    w = vmask.reshape(M).astype(dtype)

    def to_fo(a):
        """[2, k, M] -> [F, O, 2, k] (weighted)."""
        k = a.shape[1]
        return jnp.moveaxis((a * w).reshape(2, k, F, O), (2, 3), (0, 1))

    blk = jnp.concatenate([to_fo(H_th), to_fo(H_p)], axis=-1)  # [F,O,2,6]
    oh_c = (slot_idx[:, None] == jnp.arange(C)[None, :]).astype(dtype)
    clone_cols = (blk[:, :, :, None, :]
                  * oh_c[None, :, None, :, None]).reshape(F, O, 2, 6 * C)
    oh_n = (cam_idx[:, None] == jnp.arange(N)[None, :]).astype(dtype)
    if cfg.calib_cam_extrinsics:
        H_cth = _soa_mm(dz_dpC, _soa_skew(
            (R_ItoC * p_FinI_fej[None, :, :]).sum(1)))
        ext_blk = jnp.concatenate([to_fo(H_cth), to_fo(dz_dpC)], axis=-1)
        ext_cols = (ext_blk[:, :, :, None, :]
                    * oh_n[None, :, None, :, None]).reshape(F, O, 2, 6 * N)
    else:
        ext_cols = jnp.zeros((F, O, 2, 6 * N), dtype=dtype)
    if cfg.calib_cam_intrinsics:
        intr = to_fo(J_zeta)  # [F,O,2,8]
        intr_cols = (intr[:, :, :, None, :]
                     * oh_n[None, :, None, :, None]).reshape(F, O, 2, 8 * N)
    else:
        intr_cols = jnp.zeros((F, O, 2, 8 * N), dtype=dtype)

    rows = jnp.concatenate([
        jnp.zeros((F, O, 2, cfg.clones_off), dtype=dtype),
        clone_cols,
        jnp.zeros((F, O, 2, cfg.calib_ext_off - cfg.slam_off), dtype=dtype),
        ext_cols,
        intr_cols,
        jnp.zeros((F, O, 2, D - cfg.calib_intr_off - 8 * N), dtype=dtype),
    ], axis=-1)

    H_x = rows.reshape(F, 2 * O, D)
    H_f = to_fo(H_f_o).reshape(F, 2 * O, 3)
    res_out = jnp.moveaxis((res * w).reshape(2, F, O), 0, -1).reshape(F, 2 * O)
    row_mask = jnp.repeat(vmask, 2, axis=-1)
    return H_x, H_f, res_out, row_mask
