"""Rendered-image simulator: splat the persistent feature map into synthetic
camera images so the *real* KLT front-end can be validated in closed loop.

The reference never renders — its simulator hands groundtruth uv straight to
TrackSIM (Simulator.cpp:391-500) and real-image accuracy is only ever
measured on datasets.  Since no dataset is mountable here, this module is
the accuracy bridge: each map point becomes a Gaussian sprite at its *true*
(noise-free) projection, so KLT → filter error is attributable end-to-end.

TPU-first: a frame is two matmuls.  A Gaussian blob is separable, so the
image is  gy.T @ (amp * gx)  with gy:[M,H], gx:[M,W] — the whole frame
renders on the MXU with no scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from open_vins_tpu.ops import cameras
from open_vins_tpu.sim import bspline
from open_vins_tpu.sim import simulator


@functools.partial(jax.jit, static_argnames=("params", "cam"))
def render_frame(sim: simulator.SimData, params: simulator.SimParams, frame,
                 cam: int = 0, gain=1.0, offset=0.0,
                 blob_sigma=1.7, background=0.08):
    """Render one camera frame at integer frame index.

    Returns a [H, W] float32 image in ~[0, 1].  `gain`/`offset` model
    illumination change (the tracker's histogram equalization must absorb
    them).  Blob centers are the exact projections used by
    `simulator.get_cam`, so a perfect tracker reproduces the noise-free
    measurement stream.
    """
    t_cam = sim.t_start + frame / params.cam_rate
    R_ItoG, p_IinG = bspline.pose(sim.spline, t_cam + sim.calib_dt)
    R_GtoI = jnp.swapaxes(R_ItoG, -1, -2)

    R_ItoC = sim.cam_R_ItoC[cam]
    p_IinC = sim.cam_p_IinC[cam]
    intr = sim.cam_intr[cam]
    p_C = (R_ItoC @ (R_GtoI @ (sim.map_pts - p_IinG)[..., None]))[..., 0] + p_IinC
    z = p_C[..., 2]
    safe_z = jnp.where(z > 0.1, z, 1.0)
    uvn = p_C[..., :2] / safe_z[..., None]
    uv = cameras.distort(params.cam_model, intr, uvn)
    m = 2.0  # blob must fit inside the frame to be a clean corner
    valid = (
        (z > 0.1)
        & (uv[..., 0] > m) & (uv[..., 0] < params.width - m)
        & (uv[..., 1] > m) & (uv[..., 1] < params.height - m)
    )

    M = sim.map_pts.shape[0]
    # deterministic per-feature brightness (golden-ratio hash — no RNG, so
    # a feature looks the same in every frame and both stereo eyes)
    amp = 0.45 + 0.55 * jnp.mod(
        jnp.arange(M, dtype=jnp.float32) * 0.6180339887, 1.0
    )
    amp = jnp.where(valid, amp, 0.0)

    xs = jnp.arange(params.width, dtype=jnp.float32)
    ys = jnp.arange(params.height, dtype=jnp.float32)
    inv2s2 = 1.0 / (2.0 * blob_sigma * blob_sigma)
    gx = jnp.exp(-(xs[None, :] - uv[:, 0:1]) ** 2 * inv2s2)  # [M, W]
    gy = jnp.exp(-(ys[None, :] - uv[:, 1:2]) ** 2 * inv2s2)  # [M, H]
    img = gy.T @ (amp[:, None] * gx)  # [H, W] — one MXU matmul

    # smooth low-amplitude background so the image is not pure black
    # (keeps equalization well-conditioned without adding trackable corners)
    bg = background * (
        0.5
        + 0.25 * jnp.sin(xs[None, :] * (2.0 * jnp.pi / params.width))
        + 0.25 * jnp.cos(ys[:, None] * (2.0 * jnp.pi / params.height))
    )
    img = jnp.clip(img + bg, 0.0, 1.5)
    return jnp.clip(gain * img + offset, 0.0, 2.0)


def render_run(sim: simulator.SimData, params: simulator.SimParams,
               cam: int = 0, gain=1.0, offset=0.0):
    """Render every frame of the run: [n_frames, H, W] (device-resident)."""
    n_frames = simulator.n_cam_frames(params)
    return jax.lax.map(
        lambda k: render_frame(sim, params, k, cam=cam, gain=gain,
                               offset=offset),
        jnp.arange(n_frames),
    )
