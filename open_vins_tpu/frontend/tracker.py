"""Image-based feature tracker: the TrackKLT orchestration layer.

Capability parity with ov_core::TrackKLT::feed_new_camera / feed_monocular
(TrackKLT.cpp:34-201, 395-529): per-camera state (previous image + tracked
points + ids), per-frame pipeline of
    equalize → pyramidal-LK track from previous frame → in-bound/quality
    masking → fundamental-RANSAC outlier rejection → grid re-detection to
    top the feature budget back up → id assignment,
emitting fixed-shape (ids, uv, uvn, mask) packets compatible with
models.manager.FrameInput (the TrackSIM contract).

TPU-first: all per-frame work is one jit-compiled function of static shapes;
track state is a pytree carried frame to frame.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.frontend import klt, ransac
from open_vins_tpu.ops import cameras


class TrackerState(NamedTuple):
    prev_img: jax.Array  # [H, W]
    pts: jax.Array  # [P, 2] current pixel positions
    ids: jax.Array  # [P] int32 (-1 = empty slot)
    valid: jax.Array  # [P]
    next_id: jax.Array  # scalar int32
    key: jax.Array  # PRNG for RANSAC


def init_tracker(height, width, num_pts, seed=0, num_aruco_tags=0):
    """`num_aruco_tags` reserves ids [0, 4*tags] for aruco tag corners —
    natural features allocate above (TrackBase's `currid = 4*max_aruco + 1`
    contract, TrackBase.h:117)."""
    return TrackerState(
        prev_img=jnp.zeros((height, width), dtype=jnp.float32),
        pts=jnp.zeros((num_pts, 2), dtype=jnp.float32),
        ids=jnp.full((num_pts,), -1, dtype=jnp.int32),
        valid=jnp.zeros((num_pts,), dtype=bool),
        next_id=jnp.asarray(
            4 * num_aruco_tags + 1 if num_aruco_tags > 0 else 0,
            dtype=jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


@functools.partial(jax.jit, static_argnames=("params", "cam_model"))
def track_frame(state: TrackerState, img, zeta, params: klt.KltParams,
                cam_model: str = "radtan", first_frame=False):
    """Process one frame.  Returns (new_state, ids, uv, uvn, mask).

    `first_frame` may be a traced bool: when True tracking is skipped and
    only detection runs.
    """
    P = state.pts.shape[0]
    img = klt.equalize(img)

    # --- track existing features from the previous frame
    pts1, ok = klt.track(state.prev_img, img, state.pts, params)
    ok = ok & state.valid & jnp.logical_not(first_frame)

    # --- RANSAC on undistorted normalized coords (TrackKLT.cpp:829-886)
    uvn0 = cameras.undistort(cam_model, zeta, state.pts)
    uvn1 = cameras.undistort(cam_model, zeta, pts1)
    key, sub = jax.random.split(state.key)
    max_f = jnp.maximum(zeta[0], zeta[1])
    inliers, _ = ransac.ransac_fundamental(
        uvn0, uvn1, ok, sub, thresh=2.0 / max_f
    )
    ok = ok & inliers

    # --- re-detect to fill empty slots (grid + occupancy dedup)
    new_pts, new_ok = klt.detect_grid(img, pts1, ok, params, P)
    free = ~ok
    # rank free slots and new detections; place i-th detection in i-th free
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    T = P
    det_for_slot = jnp.full((T,), T, dtype=jnp.int32)
    det_for_slot = det_for_slot.at[
        jnp.where(free, free_rank, T)
    ].set(jnp.arange(T), mode="drop")
    take_det = free & (det_for_slot < T) & new_ok[jnp.clip(det_for_slot, 0, T - 1)]
    det_idx = jnp.clip(det_for_slot, 0, T - 1)
    pts_out = jnp.where(take_det[:, None], new_pts[det_idx], pts1)
    n_new_before = jnp.cumsum(take_det.astype(jnp.int32)) - 1
    ids_out = jnp.where(
        take_det, state.next_id + n_new_before, state.ids
    ).astype(jnp.int32)
    valid_out = ok | take_det
    ids_out = jnp.where(valid_out, ids_out, -1)
    next_id = state.next_id + jnp.sum(take_det.astype(jnp.int32))

    uvn_out = cameras.undistort(cam_model, zeta, pts_out)
    new_state = TrackerState(
        prev_img=img, pts=pts_out, ids=ids_out, valid=valid_out,
        next_id=next_id, key=key,
    )
    return new_state, ids_out, pts_out, uvn_out, valid_out


@functools.partial(jax.jit, static_argnames=("params", "cam_model"))
def track_frame_stereo(state: TrackerState, img_l, img_r, zeta_l, zeta_r,
                       params: klt.KltParams, cam_model: str = "radtan",
                       first_frame=False):
    """Stereo tracking: left eye is the temporal master; the right eye's
    measurements come from a left→right KLT pass on the current pair with
    epipolar RANSAC, sharing the left ids.

    Mirrors TrackKLT::feed_stereo (TrackKLT.cpp:202-393): temporal tracking
    plus a left↔right id join; returns (new_state, ids [2,P], uv [2,P,2],
    uvn [2,P,2], mask [2,P]) in FrameInput layout (num_cams=2).
    """
    new_state, ids, uv_l, uvn_l, mask_l = track_frame(
        state, img_l, zeta_l, params, cam_model=cam_model,
        first_frame=first_frame,
    )
    img_r_eq = klt.equalize(img_r)
    uv_r, ok_r = klt.track(new_state.prev_img, img_r_eq, uv_l, params)
    uvn_r = cameras.undistort(cam_model, zeta_r, uv_r)
    # epipolar consistency on normalized coords
    key, sub = jax.random.split(new_state.key)
    max_f = jnp.maximum(zeta_l[0], zeta_l[1])
    inl, _ = ransac.ransac_fundamental(
        uvn_l, uvn_r, mask_l & ok_r, sub, thresh=2.0 / max_f
    )
    mask_r = mask_l & ok_r & inl
    new_state = new_state._replace(key=key)

    ids2 = jnp.stack([ids, jnp.where(mask_r, ids, -1)])
    uv2 = jnp.stack([uv_l, uv_r])
    uvn2 = jnp.stack([uvn_l, uvn_r])
    mask2 = jnp.stack([mask_l, mask_r])
    return new_state, ids2, uv2, uvn2, mask2
