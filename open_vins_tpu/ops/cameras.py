"""Camera projection models (pinhole radtan + equidistant/fisheye).

Capability parity with the reference camera layer (ov_core/src/cam/CamBase.h:39-190,
CamRadtan.h:40-200, CamEqui.h:45-235): distort/undistort between normalized image
coordinates and raw pixels, plus the distortion Jacobians ∂uv/∂uv_norm and
∂uv/∂ζ (ζ = [fx fy cx cy d1..d4]) needed for online intrinsic calibration.

TPU-first design notes:
  * models are pure functions over an 8-vector of intrinsics; the model kind is
    a *static* python argument so everything stays jit/vmap friendly,
  * undistortion is a fixed-iteration Newton solve (static trip count) instead
    of OpenCV's data-dependent loop,
  * Jacobians come from `jax.jacfwd` of the analytic distort functions — exact
    by construction, and XLA fuses them into the surrounding update kernels.

Intrinsics layout: zeta = [fx, fy, cx, cy, d0, d1, d2, d3]
  radtan: d = [k1, k2, p1, p2]      equi: d = [k1, k2, k3, k4]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

RADTAN = "radtan"
EQUI = "equi"

_UNDISTORT_ITERS = 25  # fixed-point contraction ~|2 k1 r²| per iter; 25 gives
# <1e-10 even at image corners with strong (EuRoC-level) distortion


def _distort_norm_radtan(zeta, xy):
    """Normalized -> distorted-normalized (radtan). CamRadtan.h:100-140 math."""
    k1, k2, p1, p2 = zeta[4], zeta[5], zeta[6], zeta[7]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def _distort_norm_equi(zeta, xy):
    """Normalized -> distorted-normalized (equidistant). CamEqui.h:100-150 math."""
    k1, k2, k3, k4 = zeta[4], zeta[5], zeta[6], zeta[7]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    # scale -> 1 as r -> 0 (theta/r -> 1 and polynomial -> 1)
    scale = jnp.where(r2 < 1e-16, 1.0, theta_d / r)
    return jnp.stack([x * scale, y * scale], axis=-1)


_DISTORT_NORM = {RADTAN: _distort_norm_radtan, EQUI: _distort_norm_equi}


@functools.partial(jax.jit, static_argnums=0)
def distort(model: str, zeta, uv_norm):
    """Normalized image coords -> raw pixel coords. (..., 2) -> (..., 2)."""
    d = _DISTORT_NORM[model](zeta, uv_norm)
    fx, fy, cx, cy = zeta[0], zeta[1], zeta[2], zeta[3]
    return jnp.stack([fx * d[..., 0] + cx, fy * d[..., 1] + cy], axis=-1)


def _undistort_norm_radtan(zeta, target):
    """OpenCV-style fixed-point iteration (cheap trace, no autodiff):
    x <- (x_d - tangential(x)) / radial(x)."""
    k1, k2, p1, p2 = zeta[4], zeta[5], zeta[6], zeta[7]

    def step(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xn = (target[..., 0] - dx) / radial
        yn = (target[..., 1] - dy) / radial
        return jnp.stack([xn, yn], axis=-1)

    return jax.lax.fori_loop(0, _UNDISTORT_ITERS, step, target)


def _undistort_norm_equi(zeta, target):
    """Equidistant inverse: |xy_d| = θ_d; scalar Newton for θ, then rescale."""
    k1, k2, k3, k4 = zeta[4], zeta[5], zeta[6], zeta[7]
    theta_d = jnp.sqrt(jnp.maximum(jnp.sum(target * target, axis=-1), 1e-24))

    def step(_, theta):
        t2 = theta * theta
        poly = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
        dpoly = 3.0 * k1 * t2 + 5.0 * k2 * t2 * t2 + 7.0 * k3 * t2**3 + 9.0 * k4 * t2**4
        f = theta * poly - theta_d
        df = poly + dpoly
        return theta - f / jnp.where(jnp.abs(df) > 1e-6, df, 1.0)

    theta = jax.lax.fori_loop(0, _UNDISTORT_ITERS, step, theta_d)
    scale = jnp.where(theta_d > 1e-9, jnp.tan(theta) / theta_d, 1.0)
    return target * scale[..., None]


_UNDISTORT_NORM = {RADTAN: _undistort_norm_radtan, EQUI: _undistort_norm_equi}


@functools.partial(jax.jit, static_argnums=0)
def undistort(model: str, zeta, uv_px):
    """Raw pixel coords -> normalized image coords via fixed-count iteration.

    Matches CamBase::undistort_f (CamBase.h:70-110) behavior; OpenCV's
    data-dependent iteration is replaced by shape-static fixed-point /
    scalar-Newton solves (cheap to trace — no autodiff in the loop).
    """
    fx, fy, cx, cy = zeta[0], zeta[1], zeta[2], zeta[3]
    target = jnp.stack(
        [(uv_px[..., 0] - cx) / fx, (uv_px[..., 1] - cy) / fy], axis=-1
    )
    return _UNDISTORT_NORM[model](zeta, target)


@functools.partial(jax.jit, static_argnums=0)
def distort_jacobians(model: str, zeta, uv_norm):
    """(d_uv/d_uvnorm (...,2,2), d_uv/d_zeta (...,2,8)).

    Capability of CamBase::compute_distort_jacobian (CamRadtan.h:150-200,
    CamEqui.h:160-235), obtained by forward-mode autodiff of the analytic
    distort function.
    """
    single = uv_norm.ndim == 1
    pts = uv_norm.reshape(-1, 2)

    def f(p, z):
        return distort(model, z, p)

    J_pt = jax.vmap(jax.jacfwd(f, argnums=0), in_axes=(0, None))(pts, zeta)
    J_zeta = jax.vmap(jax.jacfwd(f, argnums=1), in_axes=(0, None))(pts, zeta)
    if single:
        return J_pt[0], J_zeta[0]
    return (
        J_pt.reshape(uv_norm.shape[:-1] + (2, 2)),
        J_zeta.reshape(uv_norm.shape[:-1] + (2, 8)),
    )


# ---------------------------------------------------------------------------
# SoA (structure-of-arrays) distortion Jacobians: component dims LEADING,
# a flat obs axis M trailing.  Functionally identical to distort_jacobians
# (pinned by tests/test_cameras.py), but written as hand-derived analytic
# expressions over [M]-shaped lanes — the autodiff version under a feature
# vmap materializes [F,O,2,2]-shaped fusions whose tiny minor dims tile at
# a few percent lane occupancy on TPU (see update_helper.ObsContext note).
# Reference math: CamRadtan.h:150-200, CamEqui.h:160-235.
# ---------------------------------------------------------------------------


def _distort_jac_soa_radtan(zc, x, y):
    """zc [8, M], x/y [M] -> (uv [2,M], J_pt [2,2,M], J_zeta [2,8,M])."""
    fx, fy, cx, cy, k1, k2, p1, p2 = (zc[i] for i in range(8))
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    u = fx * xd + cx
    v = fy * yd + cy
    dk = k1 + 2.0 * k2 * r2  # d radial / d r2
    dxd_dx = radial + 2.0 * x * x * dk + 2.0 * p1 * y + 6.0 * p2 * x
    dxd_dy = 2.0 * x * y * dk + 2.0 * p1 * x + 2.0 * p2 * y
    dyd_dx = dxd_dy
    dyd_dy = radial + 2.0 * y * y * dk + 6.0 * p1 * y + 2.0 * p2 * x
    J_pt = jnp.stack([
        jnp.stack([fx * dxd_dx, fx * dxd_dy]),
        jnp.stack([fy * dyd_dx, fy * dyd_dy]),
    ])  # [2, 2, M]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    J_zeta = jnp.stack([
        jnp.stack([xd, zero, one, zero, fx * x * r2, fx * x * r2 * r2,
                   fx * 2.0 * x * y, fx * (r2 + 2.0 * x * x)]),
        jnp.stack([zero, yd, zero, one, fy * y * r2, fy * y * r2 * r2,
                   fy * (r2 + 2.0 * y * y), fy * 2.0 * x * y]),
    ])  # [2, 8, M]
    uv = jnp.stack([u, v])
    return uv, J_pt, J_zeta


def _distort_jac_soa_equi(zc, x, y):
    """Equidistant model, same contract as the radtan variant."""
    fx, fy, cx, cy, k1, k2, k3, k4 = (zc[i] for i in range(8))
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    small = r2 < 1e-16
    theta = jnp.arctan(r)
    t2 = theta * theta
    poly = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
    theta_d = theta * poly
    scale = jnp.where(small, 1.0, theta_d / r)
    xd = x * scale
    yd = y * scale
    u = fx * xd + cx
    v = fy * yd + cy
    # d theta / d r = 1/(1+r^2);  d theta_d / d theta = 1 + 3k1 t^2 + ...
    dthd_dth = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2
                                            + t2 * (7.0 * k3 + 9.0 * k4 * t2)))
    dth_dr = 1.0 / (1.0 + r2)
    # d scale / d r = (dthd_dth * dth_dr * r - theta_d) / r^2
    dscale_dr = jnp.where(
        small, 0.0,
        (dthd_dth * dth_dr - scale) / jnp.maximum(r, 1e-12))
    # dr/dx = x/r, dr/dy = y/r
    rx = jnp.where(small, 0.0, x / jnp.maximum(r, 1e-12))
    ry = jnp.where(small, 0.0, y / jnp.maximum(r, 1e-12))
    dxd_dx = scale + x * dscale_dr * rx
    dxd_dy = x * dscale_dr * ry
    dyd_dx = y * dscale_dr * rx
    dyd_dy = scale + y * dscale_dr * ry
    J_pt = jnp.stack([
        jnp.stack([fx * dxd_dx, fx * dxd_dy]),
        jnp.stack([fy * dyd_dx, fy * dyd_dy]),
    ])
    # d theta_d / d k_i = theta^(3+2i); d xd/dk = x/r * dthd_dk
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    t3 = t2 * theta
    safe_inv_r = jnp.where(small, 0.0, 1.0 / jnp.maximum(r, 1e-12))
    dthd_k = [t3, t3 * t2, t3 * t2 * t2, t3 * t2 * t2 * t2]
    J_zeta = jnp.stack([
        jnp.stack([xd, zero, one, zero]
                  + [fx * x * safe_inv_r * d for d in dthd_k]),
        jnp.stack([zero, yd, zero, one]
                  + [fy * y * safe_inv_r * d for d in dthd_k]),
    ])
    uv = jnp.stack([u, v])
    return uv, J_pt, J_zeta


_DISTORT_JAC_SOA = {RADTAN: _distort_jac_soa_radtan,
                    EQUI: _distort_jac_soa_equi}


def distort_jacobians_soa(model: str, zeta_cols, x, y):
    """SoA distortion: zeta_cols [8, M], x/y [M] →
    (uv_pred [2,M], d_uv/d_uvnorm [2,2,M], d_uv/d_zeta [2,8,M])."""
    return _DISTORT_JAC_SOA[model](zeta_cols, x, y)
