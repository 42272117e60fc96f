"""Static (standstill) initialization.

Capability parity with ov_init::StaticInitializer
(StaticInitializer.cpp:37-220): two half-windows of IMU — the newer one must
show an excitation jerk (or not, when not waiting for jerk), the older one
must be quiet; gravity direction from the quiet window's mean specific force
via Gram-Schmidt; gyro bias = mean gyro; accel bias = mean accel minus
gravity; diagonal initial covariance.

jit-pure over a fixed-size IMU buffer with validity masking.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.ops import lie


class StaticInitOptions(NamedTuple):
    """InertialInitializerOptions subset (InertialInitializerOptions.h)."""

    window_time: float = 0.75  # seconds per half-window (init_window_time/2)
    imu_thresh: float = 1.0  # accel variance jerk threshold (init_imu_thresh)
    wait_for_jerk: bool = True
    gravity_mag: float = 9.81
    # initial standard deviations (diag prior)
    sigma_q: float = 0.02
    sigma_p: float = 1e-4
    sigma_v: float = 0.05
    sigma_bg: float = 0.005
    sigma_ba: float = 0.05


class StaticInitResult(NamedTuple):
    success: jax.Array  # bool
    q_GtoI: jax.Array  # [4] JPL
    p: jax.Array  # [3] (zero)
    v: jax.Array  # [3] (zero)
    bg: jax.Array  # [3]
    ba: jax.Array  # [3]
    prior_diag15: jax.Array  # [15] diagonal covariance for the IMU block


def gram_schmidt_gravity(z):
    """Build R_GtoI from the gravity direction in the IMU frame.

    helper.h:138 parity: z-axis = gravity in IMU frame, x/y by Gram-Schmidt
    against e1.
    """
    z = z / jnp.linalg.norm(z)
    e1 = jnp.asarray([1.0, 0.0, 0.0], dtype=z.dtype)
    x = e1 - z * jnp.dot(z, e1)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    # columns (x, y, ĝ_I): maps world e_z to the measured gravity direction
    # in the IMU frame — i.e. this IS R_GtoI (world gravity-aligned, z up)
    return jnp.stack([x, y, z], axis=1)


def try_static_init(opts: StaticInitOptions, imu_t, imu_w, imu_a, mask,
                    t_newest) -> StaticInitResult:
    """Attempt static init from a buffered IMU window.

    imu_t/w/a: [K] / [K,3] arrays (fixed size, `mask` marks valid samples);
    t_newest: the timestamp initialization would apply at (newest sample).
    Window 2 = (t_newest - window, t_newest]; window 1 = the window before.
    """
    dtype = imu_a.dtype
    t1_lo = t_newest - 2.0 * opts.window_time
    t1_hi = t_newest - opts.window_time
    in1 = mask & (imu_t >= t1_lo) & (imu_t < t1_hi)
    in2 = mask & (imu_t >= t1_hi) & (imu_t <= t_newest)

    def mean_var(x, m):
        mf = m.astype(dtype)[:, None]
        n = jnp.maximum(jnp.sum(mf), 1.0)
        mu = jnp.sum(x * mf, axis=0) / n
        var = jnp.sum(((x - mu) ** 2) * mf, axis=0) / jnp.maximum(n - 1.0, 1.0)
        return mu, jnp.sqrt(jnp.sum(var)), n

    a1_mu, a1_std, n1 = mean_var(imu_a, in1)
    a2_mu, a2_std, n2 = mean_var(imu_a, in2)
    w1_mu, _, _ = mean_var(imu_w, in1)

    enough = (n1 > 5) & (n2 > 5)
    quiet_old = a1_std < opts.imu_thresh
    if opts.wait_for_jerk:
        excite_new = a2_std > opts.imu_thresh
        success = enough & quiet_old & excite_new
    else:
        # both windows must be still (device starts from standstill)
        success = enough & quiet_old & (a2_std < opts.imu_thresh)

    R_GtoI = gram_schmidt_gravity(a1_mu)
    q_GtoI = lie.rot_2_quat(R_GtoI)
    gravity = jnp.asarray([0.0, 0.0, opts.gravity_mag], dtype=dtype)
    bg = w1_mu
    ba = a1_mu - R_GtoI @ gravity

    prior = jnp.concatenate([
        jnp.full((3,), opts.sigma_q**2, dtype=dtype),
        jnp.full((3,), opts.sigma_p**2, dtype=dtype),
        jnp.full((3,), opts.sigma_v**2, dtype=dtype),
        jnp.full((3,), opts.sigma_bg**2, dtype=dtype),
        jnp.full((3,), opts.sigma_ba**2, dtype=dtype),
    ])
    z3 = jnp.zeros(3, dtype=dtype)
    return StaticInitResult(
        success=success, q_GtoI=q_GtoI, p=z3, v=z3, bg=bg, ba=ba,
        prior_diag15=prior,
    )
