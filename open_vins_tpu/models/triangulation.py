"""Batched feature triangulation: linear solve + Gauss-Newton refinement.

Capability parity with ov_core::FeatureInitializer
(FeatureInitializer.cpp:30-422): anchor-frame 3D linear triangulation from
skew(bearing) constraint rows with condition/depth gating, then a damped
Gauss-Newton refinement in MSCKF inverse-depth coordinates (α, β, ρ).

TPU-first design: one feature = fixed-size observation arrays + validity
mask; everything is `vmap`ped over the feature axis so the whole per-frame
candidate set triangulates as a handful of batched 3x3 solves on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.ops import smallmat


class TriangulationOptions(NamedTuple):
    """FeatureInitializerOptions parity (FeatureInitializerOptions.h)."""

    refine: bool = True
    triangulate_1d: bool = False  # depth-only along the anchor bearing
    max_runs: int = 5
    init_lamda: float = 1e-3
    max_lamda: float = 1e10
    min_dx: float = 1e-6
    min_dcost: float = 1e-6
    lam_mult: float = 10.0
    min_dist: float = 0.10
    max_dist: float = 60.0
    max_cond_number: float = 10000.0


class FeatureObs(NamedTuple):
    """Per-feature observation set in *camera* frames (already gathered).

    R_GtoC: [O, 3, 3], p_CinG: [O, 3] — pose of each observing camera.
    uvn:    [O, 2] normalized undistorted measurements.
    mask:   [O] validity.
    """

    R_GtoC: jax.Array
    p_CinG: jax.Array
    uvn: jax.Array
    mask: jax.Array


def _anchor_index(obs: FeatureObs):
    """Newest valid observation is the anchor (reference picks the camera
    with most measurements at the latest time, FeatureInitializer.cpp:35-46;
    with our gathered per-obs layout the last valid obs is that anchor)."""
    O = obs.mask.shape[0]
    idx = jnp.arange(O)
    return jnp.max(jnp.where(obs.mask, idx, -1))


def triangulate_linear(obs: FeatureObs, opts: TriangulationOptions):
    """3D linear triangulation in the anchor camera frame.

    Mirrors single_triangulation (FeatureInitializer.cpp:30-112): rows
    N_o (p_f^A - p_o^A) = 0 with N_o = skew(bearing_o in anchor frame),
    solved via 3x3 normal equations; gated on condition number and depth.

    Returns (p_f_global [3], valid, p_f_anchor [3], anchor_idx).
    """
    from open_vins_tpu.ops.indexing import take1

    a = _anchor_index(obs)
    R_GtoA = take1(obs.R_GtoC, a)
    p_AinG = take1(obs.p_CinG, a)

    # per-obs pose relative to anchor
    R_AtoC = obs.R_GtoC @ R_GtoA.T  # [O,3,3]
    p_CinA = (R_GtoA @ (obs.p_CinG - p_AinG)[..., None])[..., 0]  # [O,3]

    b_C = jnp.concatenate([obs.uvn, jnp.ones_like(obs.uvn[..., :1])], axis=-1)
    b_C = b_C / jnp.linalg.norm(b_C, axis=-1, keepdims=True)
    b_A = (jnp.swapaxes(R_AtoC, -1, -2) @ b_C[..., None])[..., 0]  # [O,3]

    # N_o p = N_o p_o ; accumulate masked normal equations
    def skew(v):
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        zero = jnp.zeros_like(x)
        return jnp.stack(
            [
                jnp.stack([zero, -z, y], -1),
                jnp.stack([z, zero, -x], -1),
                jnp.stack([-y, x, zero], -1),
            ],
            -2,
        )

    N = skew(b_A)  # [O,3,3]
    w = obs.mask[..., None, None].astype(b_A.dtype)
    AtA = jnp.sum(w * (jnp.swapaxes(N, -1, -2) @ N), axis=0)  # [3,3]
    Atb = jnp.sum(
        w * (jnp.swapaxes(N, -1, -2) @ (N @ p_CinA[..., None])), axis=0
    )[..., 0]

    # solve + condition gate via eigenvalues of AtA (symmetric psd);
    # closed-form 3x3 routines fuse on TPU (ops/smallmat.py) where the
    # lapack-style custom calls pay a fixed launch latency per op.
    # The reference's A IS this accumulated normal matrix (per-obs
    # Ai = I − b·bᵀ = NᵀN, FeatureInitializer.cpp:48-66), so the gate is
    # the same eigenvalue ratio it thresholds.
    evals = smallmat.eigvalsh3(AtA)
    cond = evals[-1] / jnp.maximum(evals[0], 1e-18)
    p_A = smallmat.solve3(AtA + 1e-12 * jnp.eye(3, dtype=AtA.dtype), Atb)

    n_obs = jnp.sum(obs.mask)
    valid = (
        (n_obs >= 2)
        & (cond < opts.max_cond_number)
        & (p_A[2] > opts.min_dist)
        & (p_A[2] < opts.max_dist)
        & jnp.all(jnp.isfinite(p_A))
    )
    p_G = R_GtoA.T @ p_A + p_AinG
    return p_G, valid, p_A, a


def triangulate_linear_1d(obs: FeatureObs, opts: TriangulationOptions):
    """Depth-only linear triangulation along the anchor bearing.

    Mirrors single_triangulation_1d (FeatureInitializer.cpp:114-195): the
    feature is constrained to p_A = d · b_A with b_A the (frozen) anchor
    bearing; every other observation contributes the scalar normal equation
    A += |B⊥ b_A|², b += (B⊥ b_A)·(B⊥ p_CinA) with B⊥ = skew(b_i in A).
    This is the initializer matching the 1-dof
    ANCHORED_INVERSE_DEPTH_SINGLE landmark representation.

    Returns (p_f_global [3], valid, p_f_anchor [3], anchor_idx).
    """
    from open_vins_tpu.ops.indexing import take1

    a = _anchor_index(obs)
    R_GtoA = take1(obs.R_GtoC, a)
    p_AinG = take1(obs.p_CinG, a)
    R_AtoC = obs.R_GtoC @ R_GtoA.T  # [O,3,3]
    p_CinA = (R_GtoA @ (obs.p_CinG - p_AinG)[..., None])[..., 0]  # [O,3]

    b_C = jnp.concatenate([obs.uvn, jnp.ones_like(obs.uvn[..., :1])], axis=-1)
    b_C = b_C / jnp.linalg.norm(b_C, axis=-1, keepdims=True)
    b_A = (jnp.swapaxes(R_AtoC, -1, -2) @ b_C[..., None])[..., 0]  # [O,3]
    bearing_A = take1(b_A, a)  # anchor bearing (unit)

    O = obs.mask.shape[0]
    not_anchor = obs.mask & (jnp.arange(O) != a)
    w = not_anchor.astype(b_A.dtype)

    # B⊥ b_anchor and B⊥ p_CinA as cross products (skew contraction)
    Bb = jnp.cross(b_A, jnp.broadcast_to(bearing_A, b_A.shape))  # [O,3]
    Bp = jnp.cross(b_A, p_CinA)  # [O,3]
    A = jnp.sum(w * jnp.sum(Bb * Bb, axis=-1))
    b = jnp.sum(w * jnp.sum(Bb * Bp, axis=-1))

    depth = b / jnp.where(jnp.abs(A) > 1e-12, A, 1e-12)
    p_A = depth * bearing_A
    n_obs = jnp.sum(obs.mask)
    valid = (
        (n_obs >= 2)
        & (p_A[2] > opts.min_dist)
        & (p_A[2] < opts.max_dist)
        & jnp.all(jnp.isfinite(p_A))
    )
    p_G = R_GtoA.T @ p_A + p_AinG
    return p_G, valid, p_A, a


def refine_gauss_newton(obs: FeatureObs, p_A, anchor_idx, opts: TriangulationOptions):
    """Damped GN in anchor inverse depth (α, β, ρ) = (x/z, y/z, 1/z).

    Mirrors single_gaussnewton (FeatureInitializer.cpp:197-422) with a
    static iteration count (jit-friendly Levenberg schedule).
    Returns (p_A_refined, base_cost, final_cost).
    """
    from open_vins_tpu.ops.indexing import take1

    a = anchor_idx
    R_GtoA = take1(obs.R_GtoC, a)
    p_AinG = take1(obs.p_CinG, a)
    R_AtoC = obs.R_GtoC @ R_GtoA.T
    p_CinA = (R_GtoA @ (obs.p_CinG - p_AinG)[..., None])[..., 0]
    # camera positions in anchor & anchor->cam transforms
    w = obs.mask.astype(p_A.dtype)

    z = jnp.maximum(p_A[2], 1e-6)
    x0 = jnp.asarray([p_A[0] / z, p_A[1] / z, 1.0 / z])

    def cost_fn(x):
        alpha, beta, rho = x[0], x[1], x[2]
        # p_f^Ci = R_AtoC ( [α,β,1]/ρ - p_CinA ) ρ-scaled form:
        # h = R_AtoC [α,β,1]ᵀ + ρ (−R_AtoC p_CinA)   (homogeneous trick)
        dirs = (R_AtoC @ jnp.asarray([alpha, beta, 1.0])[..., None])[..., 0]
        offs = -(R_AtoC @ p_CinA[..., None])[..., 0]
        h = dirs + rho * offs  # [O,3]
        hz = jnp.where(jnp.abs(h[..., 2]) > 1e-9, h[..., 2], 1e-9)
        pred = h[..., :2] / hz[..., None]
        r = (pred - obs.uvn) * w[..., None]
        return jnp.sum(r * r), r

    def step(carry, _):
        x, lam, cost = carry
        _, r = cost_fn(x)
        J = jax.jacfwd(lambda xx: cost_fn(xx)[1])(x).reshape(-1, 3)
        rf = r.reshape(-1)
        JtJ = J.T @ J
        Jtr = J.T @ rf
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ))
        dx = smallmat.solve3(A + 1e-12 * jnp.eye(3, dtype=A.dtype), Jtr)
        x_new = x - dx
        cost_new, _ = cost_fn(x_new)
        accept = cost_new < cost
        x = jnp.where(accept, x_new, x)
        lam = jnp.where(accept, lam / opts.lam_mult, lam * opts.lam_mult)
        lam = jnp.clip(lam, 1e-12, opts.max_lamda)
        cost = jnp.where(accept, cost_new, cost)
        return (x, lam, cost), None

    cost0, _ = cost_fn(x0)
    # unroll: max_runs is tiny; a device while-loop would serialize with
    # per-iteration overhead larger than the batched GN step itself
    (x, _, cost), _ = jax.lax.scan(
        step, (x0, jnp.asarray(opts.init_lamda, dtype=p_A.dtype), cost0),
        None, length=opts.max_runs, unroll=True,
    )
    rho = jnp.where(jnp.abs(x[2]) > 1e-6, x[2], 1e-6)
    p_A_new = jnp.asarray([x[0] / rho, x[1] / rho, 1.0 / rho])
    return p_A_new, cost0, cost


def triangulate(obs: FeatureObs, opts: TriangulationOptions):
    """Full pipeline for one feature: linear + optional GN refine + gates.

    Returns (p_f_global [3], valid).
    """
    if opts.triangulate_1d:
        p_G, valid, p_A, a = triangulate_linear_1d(obs, opts)
    else:
        p_G, valid, p_A, a = triangulate_linear(obs, opts)
    if opts.refine:
        p_A2, cost0, cost = refine_gauss_newton(obs, p_A, a, opts)
        ok = (
            (p_A2[2] > opts.min_dist)
            & (p_A2[2] < opts.max_dist)
            & jnp.all(jnp.isfinite(p_A2))
            & (cost <= cost0 + 1e-9)
        )
        p_A = jnp.where(ok, p_A2, p_A)
        R_GtoA = obs.R_GtoC[a]
        p_AinG = obs.p_CinG[a]
        p_G = jnp.where(ok, R_GtoA.T @ p_A + p_AinG, p_G)
    return p_G, valid


triangulate_batch = jax.vmap(triangulate, in_axes=(0, None))
