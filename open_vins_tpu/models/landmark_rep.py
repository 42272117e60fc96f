"""Landmark parameterizations: GLOBAL_3D, ANCHORED_3D,
ANCHORED_MSCKF_INVERSE_DEPTH — and the anchor-change transform.

Capability parity with ov_core::LandmarkRepresentation
(LandmarkRepresentation.h:38-45) and the representation Jacobians of
UpdaterHelper::get_feature_jacobian_representation
(UpdaterHelper.cpp:32-190, FEJ anchor handling :87-96), plus
UpdaterSLAM::perform_anchor_change (UpdaterSLAM.cpp:481-647) re-derived as
an exact covariance row transform.

Conventions: the anchor is a (clone slot, camera) pair; the anchor camera
frame A has R_GtoA = R_ItoC R_GtoI_A and p_AinG = p_I_A − R_ItoG_A R_ItoCᵀ
p_IinC.  λ is the stored 3-vector whose meaning depends on the rep:
  GLOBAL_3D:                   λ = p_FinG
  ANCHORED_3D:                 λ = p_FinA
  ANCHORED_MSCKF_INVERSE_DEPTH λ = (α, β, ρ) with p_FinA = (α/ρ, β/ρ, 1/ρ)
  ANCHORED_INVERSE_DEPTH_SINGLE λ = (ρ, b_x, b_y): ONE estimated dof — the
    inverse z-depth ρ at slot 0 — plus the fixed init bearing b = p_FinA/z
    stored in the two frozen (zero-covariance) slots, so
    p_FinA = (1/ρ)(b_x, b_y, 1).  The bearing is data, not state: the
    reference stores it as Landmark::uv_norm_zero (Landmark.cpp:50-58) and
    its uncertainty is marginalized by nullspace projection at init/update
    (UpdaterSLAM.cpp:190-206, 340-380).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_vins_tpu.ops import lie

GLOBAL_3D = "GLOBAL_3D"
GLOBAL_FULL_INVERSE_DEPTH = "GLOBAL_FULL_INVERSE_DEPTH"
ANCHORED_3D = "ANCHORED_3D"
ANCHORED_FULL_INVERSE_DEPTH = "ANCHORED_FULL_INVERSE_DEPTH"
ANCHORED_MSCKF_INVERSE_DEPTH = "ANCHORED_MSCKF_INVERSE_DEPTH"
ANCHORED_INVERSE_DEPTH_SINGLE = "ANCHORED_INVERSE_DEPTH_SINGLE"


def is_anchored(rep: str) -> bool:
    return rep.startswith("ANCHORED")


def is_single(rep: str) -> bool:
    """True for the 1-dof depth-only representation."""
    return rep == ANCHORED_INVERSE_DEPTH_SINGLE


def needs_lam_jacobian(rep: str) -> bool:
    """True when λ is not the plain global xyz (∂p_FinG/∂λ ≠ I)."""
    return rep != GLOBAL_3D


def _spherical_to_xyz(lam):
    """(θ, φ, ρ) -> point (UpdaterHelper.cpp:44-70 convention):
    p = (1/ρ)[cosθ sinφ, sinθ sinφ, cosφ]."""
    th, phi, rho = lam[0], lam[1], lam[2]
    rho = jnp.where(jnp.abs(rho) > 1e-8, rho, 1e-8)
    return (1.0 / rho) * jnp.asarray(
        [jnp.cos(th) * jnp.sin(phi), jnp.sin(th) * jnp.sin(phi), jnp.cos(phi)]
    )


def _xyz_to_spherical(p):
    n = jnp.maximum(jnp.linalg.norm(p), 1e-8)
    rho = 1.0 / n
    phi = jnp.arccos(jnp.clip(p[2] / n, -1.0, 1.0))
    th = jnp.arctan2(p[1], p[0])
    return jnp.asarray([th, phi, rho])


def _spherical_jacobian(lam):
    """∂p/∂(θ,φ,ρ) (UpdaterHelper.cpp:58-70 matrix)."""
    th, phi, rho = lam[0], lam[1], lam[2]
    rho = jnp.where(jnp.abs(rho) > 1e-8, rho, 1e-8)
    s_t, c_t = jnp.sin(th), jnp.cos(th)
    s_p, c_p = jnp.sin(phi), jnp.cos(phi)
    inv = 1.0 / rho
    inv2 = inv * inv
    return jnp.asarray(
        [
            [-inv * s_t * s_p, inv * c_t * c_p, -inv2 * c_t * s_p],
            [inv * c_t * s_p, inv * s_t * c_p, -inv2 * s_t * s_p],
            [0.0, -inv * s_p, -inv2 * c_p],
        ],
        dtype=lam.dtype,
    )


def anchor_frame(q_clone, p_clone, q_ext, p_ext):
    """(R_GtoA [3,3], p_AinG [3]) of the anchor camera."""
    R_GtoI = lie.quat_2_rot(q_clone)
    R_ItoC = lie.quat_2_rot(q_ext)
    R_GtoA = R_ItoC @ R_GtoI
    p_AinG = p_clone - R_GtoI.T @ (R_ItoC.T @ p_ext)
    return R_GtoA, p_AinG


def lam_to_pFinA(rep: str, lam):
    if rep in (ANCHORED_3D, GLOBAL_3D):
        return lam
    if rep == ANCHORED_MSCKF_INVERSE_DEPTH:
        rho = jnp.where(jnp.abs(lam[2]) > 1e-8, lam[2], 1e-8)
        return jnp.asarray([lam[0] / rho, lam[1] / rho, 1.0 / rho])
    if rep == ANCHORED_INVERSE_DEPTH_SINGLE:
        rho = jnp.where(jnp.abs(lam[0]) > 1e-8, lam[0], 1e-8)
        return (1.0 / rho) * jnp.asarray([lam[1], lam[2], 1.0])
    if rep in (ANCHORED_FULL_INVERSE_DEPTH, GLOBAL_FULL_INVERSE_DEPTH):
        return _spherical_to_xyz(lam)
    raise ValueError(rep)


def pFinA_to_lam(rep: str, p_FinA):
    if rep in (ANCHORED_3D, GLOBAL_3D):
        return p_FinA
    if rep == ANCHORED_MSCKF_INVERSE_DEPTH:
        z = jnp.where(jnp.abs(p_FinA[2]) > 1e-8, p_FinA[2], 1e-8)
        return jnp.asarray([p_FinA[0] / z, p_FinA[1] / z, 1.0 / z])
    if rep == ANCHORED_INVERSE_DEPTH_SINGLE:
        z = jnp.where(jnp.abs(p_FinA[2]) > 1e-8, p_FinA[2], 1e-8)
        return jnp.asarray([1.0 / z, p_FinA[0] / z, p_FinA[1] / z])
    if rep in (ANCHORED_FULL_INVERSE_DEPTH, GLOBAL_FULL_INVERSE_DEPTH):
        return _xyz_to_spherical(p_FinA)
    raise ValueError(rep)


def to_global(rep: str, lam, q_clone, p_clone, q_ext, p_ext):
    """λ -> p_FinG given the anchor pose (anchor ignored for GLOBAL_*)."""
    if rep == GLOBAL_3D:
        return lam
    if rep == GLOBAL_FULL_INVERSE_DEPTH:
        return _spherical_to_xyz(lam)
    R_GtoA, p_AinG = anchor_frame(q_clone, p_clone, q_ext, p_ext)
    return R_GtoA.T @ lam_to_pFinA(rep, lam) + p_AinG


def from_global(rep: str, p_FinG, q_clone, p_clone, q_ext, p_ext):
    """p_FinG -> λ given the anchor pose."""
    if rep == GLOBAL_3D:
        return p_FinG
    if rep == GLOBAL_FULL_INVERSE_DEPTH:
        return _xyz_to_spherical(p_FinG)
    R_GtoA, p_AinG = anchor_frame(q_clone, p_clone, q_ext, p_ext)
    return pFinA_to_lam(rep, R_GtoA @ (p_FinG - p_AinG))


def d_pFinG_d_lam(rep: str, lam, q_clone, q_ext):
    """[3,3] representation Jacobian ∂p_FinG/∂λ (UpdaterHelper.cpp:32-190)."""
    if rep == GLOBAL_3D:
        return jnp.eye(3, dtype=lam.dtype)
    if rep == GLOBAL_FULL_INVERSE_DEPTH:
        return _spherical_jacobian(lam)
    R_GtoA = lie.quat_2_rot(q_ext) @ lie.quat_2_rot(q_clone)
    if rep == ANCHORED_3D:
        return R_GtoA.T
    if rep == ANCHORED_FULL_INVERSE_DEPTH:
        return R_GtoA.T @ _spherical_jacobian(lam)
    if rep == ANCHORED_INVERSE_DEPTH_SINGLE:
        # only the depth slot is state: ∂p_FinA/∂ρ = −(1/ρ²) b with the
        # fixed bearing b = (b_x, b_y, 1) (UpdaterHelper.cpp:175-186);
        # bearing slots are frozen data → zero columns
        rho = jnp.where(jnp.abs(lam[0]) > 1e-8, lam[0], 1e-8)
        b = jnp.asarray([lam[1], lam[2], 1.0], dtype=lam.dtype)
        col = R_GtoA.T @ (-(1.0 / rho**2) * b)
        return jnp.concatenate(
            [col[:, None], jnp.zeros((3, 2), dtype=lam.dtype)], axis=1)
    # MSCKF inverse depth: ∂p_FinA/∂(α,β,ρ)
    rho = jnp.where(jnp.abs(lam[2]) > 1e-8, lam[2], 1e-8)
    d = jnp.asarray(
        [
            [1.0 / rho, 0.0, -lam[0] / rho**2],
            [0.0, 1.0 / rho, -lam[1] / rho**2],
            [0.0, 0.0, -1.0 / rho**2],
        ],
        dtype=lam.dtype,
    )
    return R_GtoA.T @ d


def d_pFinG_d_anchor(rep: str, lam, q_clone, q_ext, p_ext):
    """(∂p_FinG/∂δθ_A [3,3], ∂p_FinG/∂δp_A [3,3]) w.r.t. the anchor CLONE.

    With u = R_ItoCᵀ (p_FinA − p_IinC):
        p_FinG = R_GtoI_Aᵀ (I + ⌊δθ⌋) u + p_A + ...
        ∂/∂δθ_A = −R_ItoG_A ⌊u⌋ ,  ∂/∂δp_A = I.
    Evaluate at FEJ values for consistency (UpdaterHelper.cpp:87-96).
    """
    dtype = lam.dtype
    if not is_anchored(rep):
        z = jnp.zeros((3, 3), dtype)
        return z, z
    R_GtoI = lie.quat_2_rot(q_clone)
    R_ItoC = lie.quat_2_rot(q_ext)
    p_FinA = lam_to_pFinA(rep, lam)
    u = R_ItoC.T @ (p_FinA - p_ext)
    return -R_GtoI.T @ lie.skew(u), jnp.eye(3, dtype=dtype)


def anchor_change_jacobians(rep: str, lam_old,
                            q_old, p_old, q_new, p_new, q_ext, p_ext):
    """Exact transform for moving a landmark to a new anchor.

    Returns (lam_new, J_lam [3,3], J_xold [3,6], J_xnew [3,6]) such that
        δλ_new = J_lam δλ_old + J_xold [δθ_A,δp_A]_old + J_xnew [δθ,δp]_new
    (the UpdaterSLAM::perform_anchor_change covariance propagation,
    UpdaterSLAM.cpp:505-647, via the implicit-function chain
    dλn = (∂pG/∂λn)⁻¹ (dpG − (∂pG/∂xn) dxn)).
    """
    p_G = to_global(rep, lam_old, q_old, p_old, q_ext, p_ext)
    lam_new = from_global(rep, p_G, q_new, p_new, q_ext, p_ext)

    dpG_dlam_o = d_pFinG_d_lam(rep, lam_old, q_old, q_ext)
    dth_o, dp_o = d_pFinG_d_anchor(rep, lam_old, q_old, q_ext, p_ext)
    dpG_dlam_n = d_pFinG_d_lam(rep, lam_new, q_new, q_ext)
    dth_n, dp_n = d_pFinG_d_anchor(rep, lam_new, q_new, q_ext, p_ext)

    if rep == ANCHORED_INVERSE_DEPTH_SINGLE:
        # 1-dof: left pseudo-inverse of the [3,1] new-rep depth Jacobian
        # (H_f_new_inv = H_f_newᵀ/‖H_f_new‖², UpdaterSLAM.cpp:617-621);
        # bearing slots are frozen data, so rows/cols 1-2 stay zero.
        h_n = dpG_dlam_n[:, 0]
        inv_n = h_n / jnp.maximum(jnp.dot(h_n, h_n), 1e-12)  # [3]
        dtype = lam_old.dtype
        J_lam = jnp.zeros((3, 3), dtype).at[0, 0].set(
            jnp.dot(inv_n, dpG_dlam_o[:, 0]))
        row_xo = inv_n @ jnp.concatenate([dth_o, dp_o], axis=1)  # [6]
        row_xn = -(inv_n @ jnp.concatenate([dth_n, dp_n], axis=1))
        J_xold = jnp.zeros((3, 6), dtype).at[0].set(row_xo)
        J_xnew = jnp.zeros((3, 6), dtype).at[0].set(row_xn)
        return lam_new, J_lam, J_xold, J_xnew

    inv_n = jnp.linalg.inv(
        dpG_dlam_n + 1e-12 * jnp.eye(3, dtype=lam_old.dtype)
    )
    J_lam = inv_n @ dpG_dlam_o
    J_xold = inv_n @ jnp.concatenate([dth_o, dp_o], axis=1)
    J_xnew = -inv_n @ jnp.concatenate([dth_n, dp_n], axis=1)
    return lam_new, J_lam, J_xold, J_xnew
