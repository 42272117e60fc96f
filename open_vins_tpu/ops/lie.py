"""SO(3)/SE(3)/JPL-quaternion toolbox as pure jnp functions.

Covers the capability surface of the reference's quaternion/Lie utilities
(ov_core/src/utils/quat_ops.h:88-646): JPL-convention quaternion algebra,
SO(3)/SE(3) exponential/logarithm maps, left/right Jacobians, and the Omega
matrix used in quaternion kinematics.  All functions are written for a single
element and are `vmap`/`jit`-friendly (static shapes, double-`where` guarded
small-angle branches so gradients stay finite).

Conventions (JPL, as in Trawny & Roumeliotis TR-2005-002):
  * quaternion q = [x, y, z, w]  (vector part first, scalar last)
  * R(q) = (2w^2 - 1) I - 2 w [q_v]_x + 2 q_v q_v^T  rotates global -> local
  * q ⊗ p satisfies R(q ⊗ p) = R(q) R(p)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def skew(v):
    """[v]_x skew-symmetric matrix. v: (..., 3) -> (..., 3, 3).

    Implementation note: built as one flat 9-element stack + reshape.  The
    nested stack-of-stacks formulation miscompiled (axis-permuted rows) on
    the experimental axon TPU backend inside large fused programs.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    flat = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return flat.reshape(v.shape[:-1] + (3, 3))


def unskew(m):
    """Inverse of :func:`skew`. (..., 3, 3) -> (..., 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def quat_norm(q):
    """Normalize quaternion, keeping scalar part non-negative (JPL canonical)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_multiply(q, p):
    """JPL quaternion product q ⊗ p with R(q⊗p) = R(q)R(p)."""
    qv, q4 = q[..., :3], q[..., 3:4]
    pv, p4 = p[..., :3], p[..., 3:4]
    vec = q4 * pv + p4 * qv - jnp.cross(qv, pv)
    sca = q4 * p4 - jnp.sum(qv * pv, axis=-1, keepdims=True)
    return quat_norm(jnp.concatenate([vec, sca], axis=-1))


def quat_inv(q):
    """Quaternion inverse (conjugate for unit quats)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_2_rot(q):
    """JPL quaternion -> rotation matrix (global-to-local).

    R = (2w²-1)I - 2w⌊q_v⌋ + 2 q_v q_vᵀ, written element-wise as one flat
    stack + reshape (see `skew` for why).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    d = 2.0 * w * w - 1.0
    flat = jnp.stack(
        [
            d + 2.0 * x * x, 2.0 * (w * z + x * y), 2.0 * (x * z - w * y),
            2.0 * (x * y - w * z), d + 2.0 * y * y, 2.0 * (w * x + y * z),
            2.0 * (w * y + x * z), 2.0 * (y * z - w * x), d + 2.0 * z * z,
        ],
        axis=-1,
    )
    return flat.reshape(q.shape[:-1] + (3, 3))


def rot_2_quat(R):
    """Rotation matrix -> JPL quaternion (Shepperd's method, branch-free).

    Numerically stable version of the reference's rot_2_quat
    (quat_ops.h:88-140): pick the largest of the four candidate pivots via
    jnp.where so it is jit/vmap safe.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # Four candidate squared pivots (each 4*c_i^2):
    cw = 1.0 + tr
    cx = 1.0 + 2.0 * R[..., 0, 0] - tr
    cy = 1.0 + 2.0 * R[..., 1, 1] - tr
    cz = 1.0 + 2.0 * R[..., 2, 2] - tr

    # JPL convention: with R = quat_2_rot(q),
    #   R12 - R21 = -4 w x  (note sign flip vs Hamilton)
    # off-diagonal sums are convention independent.
    sxy = R[..., 0, 1] + R[..., 1, 0]
    syz = R[..., 1, 2] + R[..., 2, 1]
    szx = R[..., 2, 0] + R[..., 0, 2]
    dyz = R[..., 1, 2] - R[..., 2, 1]  # = -4 w x / (4c)... see below
    dzx = R[..., 2, 0] - R[..., 0, 2]
    dxy = R[..., 0, 1] - R[..., 1, 0]

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # Case w largest: w = sqrt(cw)/2 ; x = (R12-R21)/(4w) etc (JPL signs)
    w0 = 0.5 * safe_sqrt(cw)
    q_w = jnp.stack([dyz / (4.0 * w0), dzx / (4.0 * w0), dxy / (4.0 * w0), w0], axis=-1)
    x1 = 0.5 * safe_sqrt(cx)
    q_x = jnp.stack([x1, sxy / (4.0 * x1), szx / (4.0 * x1), dyz / (4.0 * x1)], axis=-1)
    y2 = 0.5 * safe_sqrt(cy)
    q_y = jnp.stack([sxy / (4.0 * y2), y2, syz / (4.0 * y2), dzx / (4.0 * y2)], axis=-1)
    z3 = 0.5 * safe_sqrt(cz)
    q_z = jnp.stack([szx / (4.0 * z3), syz / (4.0 * z3), z3, dxy / (4.0 * z3)], axis=-1)

    cands = jnp.stack([cw, cx, cy, cz], axis=-1)
    idx = jnp.argmax(cands, axis=-1)
    qs = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    # pivot selection via one-hot sum, NOT take_along_axis: small-array
    # gathers miscompile on the axon TPU backend inside large programs
    # (this very gather returned rolled garbage — round-1 debugging)
    onehot = (jnp.arange(4) == idx[..., None]).astype(q_w.dtype)
    q = jnp.sum(qs * onehot[..., None], axis=-2)
    return quat_norm(q)


def _sinc_half(theta2):
    """sin(t)/t with Taylor fallback; input is t^2."""
    t = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    safe = jnp.where(small, 1.0, t)
    return jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe) / safe)


def _one_minus_cos_over_t2(theta2):
    """(1-cos t)/t^2 with Taylor fallback; input is t^2."""
    small = theta2 < 1e-8
    safe = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(jnp.maximum(safe, _EPS))
    return jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / safe)


def _t_minus_sin_over_t3(theta2):
    """(t - sin t)/t^3 with Taylor fallback; input is t^2."""
    small = theta2 < 1e-8
    safe = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(jnp.maximum(safe, _EPS))
    return jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (t - jnp.sin(t)) / (safe * t))


def exp_so3(w):
    """SO(3) exponential map (Rodrigues). Reference: quat_ops.h:231-271."""
    theta2 = jnp.sum(w * w, axis=-1)
    A = _sinc_half(theta2)[..., None, None]
    B = _one_minus_cos_over_t2(theta2)[..., None, None]
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * (W @ W)


def log_so3(R):
    """SO(3) logarithm, uniformly stable including near pi.

    Same capability as the reference's log_so3 (quat_ops.h:273-330) but
    implemented through the Shepperd-stable quaternion extraction: with
    q = rot_2_quat(R) = [k sin(θ/2), cos(θ/2)] (JPL, qw >= 0) we have
    R = exp_so3(-θ k), hence log(R) = -θ k with θ = 2 atan2(|q_v|, q_w).
    """
    q = rot_2_quat(R)
    qv, qw = q[..., :3], q[..., 3]
    n2 = jnp.sum(qv * qv, axis=-1)
    n = jnp.sqrt(jnp.maximum(n2, _EPS))
    small = n2 < 1e-14
    theta = 2.0 * jnp.arctan2(n, qw)
    # scale = θ / |q_v| ; for small |q_v|, θ ≈ 2 |q_v| / q_w  → scale ≈ 2/q_w
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), theta / n)
    return -scale[..., None] * qv


def quat_2_axis_angle(q):
    """JPL quaternion -> rotation vector (axis*angle of R(q))."""
    return log_so3(quat_2_rot(q))


def axis_angle_2_quat(w):
    """Rotation vector -> JPL quaternion with R(q) = exp_so3(w).

    Note the JPL twist: for q = [k sin(θ/2), cos(θ/2)], R(q) = exp_so3(-θk)
    (the global-to-local DCM), so to satisfy R(q) = exp_so3(w) the vector
    part is NEGATED.  The JPL zeroth-order attitude integrator
    q(t+dt) = dq ⊗ q(t) with body rate ω therefore uses
    dq = axis_angle_2_quat(-ω dt)  (since Ṙ_GtoI = -[ω]x R_GtoI).
    """
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-10
    half = 0.5 * theta
    # sin(t/2)/t
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / jnp.where(small, 1.0, theta))
    vec = -k * w
    sca = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_norm(jnp.concatenate([vec, sca], axis=-1))


def Jl_so3(w):
    """Left Jacobian of SO(3). Reference: quat_ops.h:515-536."""
    theta2 = jnp.sum(w * w, axis=-1)
    B = _one_minus_cos_over_t2(theta2)[..., None, None]
    C = _t_minus_sin_over_t3(theta2)[..., None, None]
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B * W + C * (W @ W)


def Jr_so3(w):
    """Right Jacobian of SO(3): Jr(w) = Jl(-w). Reference: quat_ops.h:537-545."""
    return Jl_so3(-w)


def Jl_so3_inv(w):
    """Inverse left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    t = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    half = 0.5 * t
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - 0.5 * t / jnp.tan(jnp.where(small, 1.0, half))) / jnp.where(small, 1.0, theta2),
    )
    W = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * (W @ W)


def Omega(w):
    """Quaternion-kinematics Omega(w) (JPL): q̇ = 0.5 Ω(w) q.

    Reference: quat_ops.h:482-493.
    """
    W = -skew(w)
    top = jnp.concatenate([W, w[..., :, None]], axis=-1)
    bot = jnp.concatenate([-w[..., None, :], jnp.zeros_like(w[..., :1, None])], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def exp_se3(v):
    """SE(3) exponential. v = [omega; rho] (6,) -> (4,4) homogeneous.

    Reference: quat_ops.h:332-386.
    """
    w, rho = v[..., :3], v[..., 3:]
    R = exp_so3(w)
    V = Jl_so3(w)
    t = (V @ rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bot_shape = top.shape[:-2] + (1, 4)
    bot = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=v.dtype), bot_shape)
    return jnp.concatenate([top, bot], axis=-2)


def log_se3(T):
    """SE(3) logarithm -> [omega; rho]. Reference: quat_ops.h:388-434."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    rho = (Jl_so3_inv(w) @ t[..., :, None])[..., 0]
    return jnp.concatenate([w, rho], axis=-1)


def hat_se3(v):
    """se(3) hat operator: (6,) -> (4,4). Reference: quat_ops.h:436-448."""
    w, rho = v[..., :3], v[..., 3:]
    top = jnp.concatenate([skew(w), rho[..., :, None]], axis=-1)
    bot = jnp.zeros(top.shape[:-2] + (1, 4), dtype=v.dtype)
    return jnp.concatenate([top, bot], axis=-2)


def inv_se3(T):
    """Inverse of a homogeneous SE(3) matrix. Reference: quat_ops.h:450-466."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., :, None])
    top = jnp.concatenate([Rt, ti], axis=-1)
    bot_shape = top.shape[:-2] + (1, 4)
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), bot_shape
    )
    return jnp.concatenate([top, bot], axis=-2)
