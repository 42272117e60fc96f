"""Uniform cumulative cubic B-spline on SE(3), jit-pure.

Capability parity with the reference's BsplineSE3 (ov_core/src/sim/BsplineSE3.h:30-120,
BsplineSE3.cpp): convert a discrete trajectory into uniform control points and
evaluate C²-continuous pose / angular velocity / linear velocity / acceleration
for exact IMU measurement synthesis.

TPU-first design notes:
  * control points are dense arrays (R: [N,3,3], p: [N,3]) with the relative
    twists Ω_k = log(T_{k-1}^{-1} T_k) precomputed once, so a pose evaluation
    is 3 gathers + 3 exp maps — fully vectorizable over query times,
  * velocities/accelerations come from forward-mode autodiff (jax.jvp) through
    the spline instead of hand-derived formulas — exactly consistent with the
    pose by construction (the reference derives these analytically).

Convention: control/returned transforms are body-to-global, T = (R_ItoG, p_IinG).
Body angular velocity ω = unskew(Rᵀ Ṙ); acceleration is the global p̈.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.ops import lie


class Bspline(NamedTuple):
    """Immutable spline data (a pytree; safe to close over or pass to jit)."""

    ctrl_R: jax.Array  # [N, 3, 3] body-to-global rotations
    ctrl_p: jax.Array  # [N, 3] positions
    omegas: jax.Array  # [N-1, 6] relative twists log(T_{k-1}^-1 T_k), [w; rho]
    dt: jax.Array  # scalar control-point spacing (seconds)
    t0: jax.Array  # scalar start time of control grid


def _cumulative_basis(u):
    """Cumulative cubic B-spline basis B̃_1..B̃_3 at normalized u ∈ [0,1)."""
    u2 = u * u
    u3 = u2 * u
    b1 = (5.0 + 3.0 * u - 3.0 * u2 + u3) / 6.0
    b2 = (1.0 + 3.0 * u + 3.0 * u2 - 2.0 * u3) / 6.0
    b3 = u3 / 6.0
    return b1, b2, b3


def _cumulative_basis_dot(u):
    """d/du of the cumulative basis (used only in tests)."""
    u2 = u * u
    return (
        (3.0 - 6.0 * u + 3.0 * u2) / 6.0,
        (3.0 + 6.0 * u - 6.0 * u2) / 6.0,
        3.0 * u2 / 6.0,
    )


def fit(times, Rs, ps):
    """Build a spline whose control points are the given uniform-rate poses.

    Mirrors BsplineSE3::feed_trajectory (BsplineSE3.cpp): the input poses are
    used directly as control points on a uniform grid (the spline approximates,
    not interpolates, the input — same as the reference).  `times` must be
    uniformly spaced and sorted.
    """
    times = jnp.asarray(times)
    Rs = jnp.asarray(Rs)
    ps = jnp.asarray(ps)
    dt = (times[-1] - times[0]) / (times.shape[0] - 1)
    T_prev_inv_R = jnp.swapaxes(Rs[:-1], -1, -2)
    rel_R = T_prev_inv_R @ Rs[1:]
    rel_p = (T_prev_inv_R @ (ps[1:] - ps[:-1])[..., None])[..., 0]
    w = lie.log_so3(rel_R)
    rho = (lie.Jl_so3_inv(w) @ rel_p[..., None])[..., 0]
    omegas = jnp.concatenate([w, rho], axis=-1)
    return Bspline(ctrl_R=Rs, ctrl_p=ps, omegas=omegas, dt=dt, t0=times[0])


def _pose_impl(spline: Bspline, t):
    """Evaluate T(t) = (R_ItoG, p_IinG). Valid for t within the control grid."""
    n = spline.ctrl_R.shape[0]
    s = (t - spline.t0) / spline.dt
    # segment [t_i, t_{i+1}) uses control points i-1, i, i+1, i+2
    i = jnp.clip(jnp.floor(s).astype(jnp.int32), 1, n - 3)
    u = s - i.astype(s.dtype)

    b1, b2, b3 = _cumulative_basis(u)
    # Ω_k = log(T_{k-1}^{-1} T_k) lives at omegas[k-1]; segment i needs
    # Ω_i, Ω_{i+1}, Ω_{i+2} = omegas[i-1], omegas[i], omegas[i+1].
    om1 = jax.lax.dynamic_index_in_dim(spline.omegas, i - 1, keepdims=False)
    om2 = jax.lax.dynamic_index_in_dim(spline.omegas, i, keepdims=False)
    om3 = jax.lax.dynamic_index_in_dim(spline.omegas, i + 1, keepdims=False)
    R0 = jax.lax.dynamic_index_in_dim(spline.ctrl_R, i - 1, keepdims=False)
    p0 = jax.lax.dynamic_index_in_dim(spline.ctrl_p, i - 1, keepdims=False)

    A1 = lie.exp_se3(b1 * om1)
    A2 = lie.exp_se3(b2 * om2)
    A3 = lie.exp_se3(b3 * om3)
    A = A1 @ A2 @ A3
    R = R0 @ A[:3, :3]
    p = p0 + (R0 @ A[:3, 3][..., None])[..., 0]
    return R, p


def pose(spline: Bspline, t):
    """T(t) -> (R_ItoG [3,3], p_IinG [3])."""
    return _pose_impl(spline, t)


def velocity(spline: Bspline, t):
    """(ω_body [3], v_global [3]) at time t via jvp through the spline."""
    t = jnp.asarray(t, dtype=spline.ctrl_p.dtype)
    (R, p), (Rdot, pdot) = jax.jvp(
        lambda tt: _pose_impl(spline, tt), (t,), (jnp.ones_like(t),)
    )
    w_body = lie.unskew(jnp.swapaxes(R, -1, -2) @ Rdot)
    return w_body, pdot


def acceleration(spline: Bspline, t):
    """(ω_body, ω̇_body, v_global, a_global) at time t (second-order jvp)."""
    t = jnp.asarray(t, dtype=spline.ctrl_p.dtype)

    def first(tt):
        (R, p), (Rdot, pdot) = jax.jvp(
            lambda x: _pose_impl(spline, x), (tt,), (jnp.ones_like(tt),)
        )
        w_body = lie.unskew(jnp.swapaxes(R, -1, -2) @ Rdot)
        return w_body, pdot

    (w, v), (wdot, a) = jax.jvp(first, (t,), (jnp.ones_like(t),))
    return w, wdot, v, a


def imu_measurement(spline: Bspline, t, gravity):
    """Noise-free IMU sample at t: (ω_m body rate, a_m specific force in body).

    Convention matches the reference estimator (Propagator.cpp): the stored
    gravity vector is [0, 0, +9.81] in a z-up world and the true dynamics are
    v̇ = R_ItoG a_hat - g, hence a_hat = R_GtoI (a_global + g).  A resting IMU
    therefore measures +9.81 on its z axis.  Mirrors Simulator::get_next_imu's
    true-signal path (Simulator.cpp:311-390).
    """
    R, _ = _pose_impl(spline, t)
    w, _, _, a = acceleration(spline, t)
    a_m = jnp.swapaxes(R, -1, -2) @ (a + gravity)
    return w, a_m
