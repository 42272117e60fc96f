"""Distributed sliding-window bundle adjustment via Schur complement over a
device mesh.

The new-capability row of the build plan (SURVEY.md §2.9, BASELINE.json):
"distributed batch bundle-adjustment via Schur-complement reduction over ICI
collectives" — the reference's closest analog is the Ceres DENSE_SCHUR solve
inside dynamic initialization (DynamicInitializer.cpp:622-628), generalized
to a sliding-window refiner that scales over chips.

Structure (classic BA sparsity):
  * unknowns: K camera/clone poses (6-dof each) + L landmarks (3-dof each),
  * landmarks are sharded over the mesh axis; each device builds ONLY its
    landmark blocks: H_pp (pose Hessian contribution), H_pl, H_ll,
  * Schur: each device eliminates its landmarks locally
      S_d = Σ_{l∈d} ( H_pl,l H_ll,l⁻¹ H_lp,l ),  b via the same blocks,
  * one `psum` over the mesh reduces the pose system (rides ICI),
  * every device solves the small reduced pose system, then back-substitutes
    its own landmarks locally — no further communication.

The implementation is a `shard_map` over the landmark axis; on one device it
degenerates to plain (correct) dense-equivalent BA, which the tests exploit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from open_vins_tpu.ops import lie


class BAProblem(NamedTuple):
    """Gauss-Newton BA linearization inputs (fixed shapes).

    K poses (R_GtoI [K,3,3], p_IinG [K,3]); L landmarks [L,3] (global);
    observations: for each landmark, up to O obs: pose index, normalized uv,
    validity.  Extrinsics fixed (refinement runs in the IMU frame directly
    here; camera extrinsics are folded into the poses by the caller).
    """

    R: jax.Array  # [K,3,3] world-to-body
    p: jax.Array  # [K,3]
    landmarks: jax.Array  # [L,3]
    obs_pose: jax.Array  # [L,O] int32
    obs_uvn: jax.Array  # [L,O,2]
    obs_mask: jax.Array  # [L,O]
    R_ItoC: jax.Array  # [3,3]
    p_IinC: jax.Array  # [3]


def _landmark_system(prob: BAProblem, l):
    """Per-landmark GN blocks: (H_pp [K6,K6] sparse-as-dense contribution is
    avoided — instead returns per-obs pieces) -> (A_p [O,2,K*6] via scatter,
    A_l [O,2,3], r [O,2]).
    """
    K = prob.R.shape[0]
    O = prob.obs_pose.shape[1]

    def one_obs(o):
        k = prob.obs_pose[l, o]
        Rk = prob.R[k]
        pk = prob.p[k]
        pf = prob.landmarks[l]
        p_C = prob.R_ItoC @ (Rk @ (pf - pk)) + prob.p_IinC
        z = jnp.where(jnp.abs(p_C[2]) > 1e-6, p_C[2], 1e-6)
        pred = p_C[:2] / z
        r = (prob.obs_uvn[l, o] - pred)
        inv_z = 1.0 / z
        J_proj = jnp.asarray(
            [[inv_z, 0.0, -p_C[0] * inv_z * inv_z],
             [0.0, inv_z, -p_C[1] * inv_z * inv_z]], dtype=pred.dtype,
        )
        dpC_dth = prob.R_ItoC @ lie.skew(Rk @ (pf - pk))
        dpC_dp = -(prob.R_ItoC @ Rk)
        dpC_dpf = prob.R_ItoC @ Rk
        Jth = J_proj @ dpC_dth  # [2,3]
        Jp = J_proj @ dpC_dp
        Jl = J_proj @ dpC_dpf
        w = prob.obs_mask[l, o].astype(pred.dtype)
        A_pose = jnp.zeros((2, K * 6), dtype=pred.dtype)
        A_pose = jax.lax.dynamic_update_slice(A_pose, Jth * w, (0, 6 * k))
        A_pose = jax.lax.dynamic_update_slice(A_pose, Jp * w, (0, 6 * k + 3))
        return A_pose, Jl * w, r * w

    A_p, A_l, r = jax.vmap(one_obs)(jnp.arange(O))
    return A_p.reshape(-1, K * 6), A_l.reshape(-1, 3), r.reshape(-1)


def _local_schur(prob: BAProblem, damping):
    """Schur pieces from this shard's landmarks:
    (S [K6,K6], b [K6], Hll_inv [Lloc,3,3], Hlp [Lloc,3,K6], bl [Lloc,3])."""
    Lloc = prob.landmarks.shape[0]
    K6 = prob.R.shape[0] * 6

    def per_lm(l):
        A_p, A_l, r = _landmark_system(prob, l)
        Hpp = A_p.T @ A_p
        Hpl = A_p.T @ A_l  # [K6,3]
        Hll = A_l.T @ A_l + damping * jnp.eye(3, dtype=A_l.dtype)
        bp = A_p.T @ r
        bl = A_l.T @ r
        Hll_inv = jnp.linalg.inv(Hll)
        S = Hpp - Hpl @ Hll_inv @ Hpl.T
        b = bp - Hpl @ Hll_inv @ bl
        return S, b, Hll_inv, Hpl.T, bl

    S, b, Hll_inv, Hlp, bl = jax.vmap(per_lm)(jnp.arange(Lloc))
    return jnp.sum(S, axis=0), jnp.sum(b, axis=0), Hll_inv, Hlp, bl


def ba_step(prob: BAProblem, mesh=None, damping=1e-6, pose_damping=1e-4):
    """One distributed Gauss-Newton step.  Returns (new problem, dx_pose).

    With `mesh` (1-D, axis 'ba'), landmarks must be sharded along axis 0;
    the reduced pose system is psum'd over the mesh.  Without a mesh the
    same code runs single-device.
    """

    def kernel(prob_shard):
        S, b, Hll_inv, Hlp, bl = _local_schur(prob_shard, damping)
        if mesh is not None:
            S = jax.lax.psum(S, "ba")
            b = jax.lax.psum(b, "ba")
        K6 = S.shape[0]
        S = S + pose_damping * jnp.eye(K6, dtype=S.dtype)
        dx_pose = jnp.linalg.solve(S, b)
        # back-substitute local landmarks: dx_l = Hll^-1 (bl - Hlp dx_pose)
        dx_l = jax.vmap(lambda Hi, Hl, bb: Hi @ (bb - Hl @ dx_pose))(
            Hll_inv, Hlp, bl
        )
        return dx_pose, dx_l

    if mesh is None:
        dx_pose, dx_l = kernel(prob)
    else:
        spec_lm = BAProblem(
            R=P(), p=P(), landmarks=P("ba"), obs_pose=P("ba"),
            obs_uvn=P("ba"), obs_mask=P("ba"), R_ItoC=P(), p_IinC=P(),
        )
        dx_pose, dx_l = jax.shard_map(
            kernel, mesh=mesh, in_specs=(spec_lm,),
            out_specs=(P(), P("ba")),
        )(prob)

    K = prob.R.shape[0]
    dx = dx_pose.reshape(K, 6)
    # pose update: R <- exp(-δθ) R (JPL left), p <- p + δp
    R_new = jax.vmap(lambda d, Rk: lie.exp_so3(-d) @ Rk)(dx[:, :3], prob.R)
    p_new = prob.p + dx[:, 3:]
    lm_new = prob.landmarks + dx_l
    return prob._replace(R=R_new, p=p_new, landmarks=lm_new), dx_pose


def refine(prob: BAProblem, iters=5, mesh=None, gauge_fix=True):
    """Run GN iterations; the BA gauge freedom (global rigid transform) is
    fixed by re-anchoring the whole solution so pose 0 stays at its input
    value after every step (a world-frame similarity with unit scale)."""
    R0d, p0d = prob.R[0], prob.p[0]

    def reanchor(prob):
        # world transform x' = Q x + d with Q = R0dᵀ R0c, d = p0d - Q p0c
        Q = R0d.T @ prob.R[0]
        d = p0d - Q @ prob.p[0]
        R_new = jnp.einsum("kij,jl->kil", prob.R, Q.T)
        p_new = (Q @ prob.p.T).T + d
        lm_new = (Q @ prob.landmarks.T).T + d
        return prob._replace(R=R_new, p=p_new, landmarks=lm_new)

    def body(prob, _):
        prob, dx = ba_step(prob, mesh=mesh)
        if gauge_fix:
            prob = reanchor(prob)
        return prob, jnp.linalg.norm(dx)

    prob, norms = jax.lax.scan(body, prob, None, length=iters)
    return prob, norms


def reprojection_rmse(prob: BAProblem):
    """Masked RMS reprojection error (normalized coords)."""
    def per_lm(l):
        _, _, r = _landmark_system(prob, l)
        m = jnp.repeat(prob.obs_mask[l], 2)
        return jnp.sum(r * r), jnp.sum(m.astype(r.dtype))

    ss, nn = jax.vmap(per_lm)(jnp.arange(prob.landmarks.shape[0]))
    return jnp.sqrt(jnp.sum(ss) / jnp.maximum(jnp.sum(nn), 1.0))
