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


@functools.partial(jax.jit,
                   static_argnames=("params", "cam_model", "hist_method"))
def track_frame(state: TrackerState, img, zeta, params: klt.KltParams,
                cam_model: str = "radtan", first_frame=False,
                hist_method: str = "STRETCH", det_mask=None):
    """Process one frame.  Returns (new_state, ids, uv, uvn, mask).

    `first_frame` may be a traced bool: when True tracking is skipped and
    only detection runs.
    `hist_method`: NONE | HISTOGRAM | CLAHE | STRETCH pre-tracking
    normalization (TrackBase::HistogramMethod, TrackKLT.cpp:56-75).
    `det_mask`: optional [H, W] bool, True = usable region (the reference's
    per-camera mask image, TrackBase.h:97-104 `use_mask`): features are
    neither detected nor kept inside masked-out areas.
    """
    P = state.pts.shape[0]
    img = klt.equalize_method(img, hist_method)

    # --- track existing features from the previous frame
    pts1, ok = klt.track(state.prev_img, img, state.pts, params)
    ok = ok & state.valid & jnp.logical_not(first_frame)
    if det_mask is not None:
        # kill tracked points that land in the masked-out region
        H, W = img.shape
        iy = jnp.clip(jnp.round(pts1[:, 1]).astype(jnp.int32), 0, H - 1)
        ix = jnp.clip(jnp.round(pts1[:, 0]).astype(jnp.int32), 0, W - 1)
        ok = ok & det_mask[iy, ix]

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
    if det_mask is not None:
        # reject detections inside the masked-out region (the reference
        # hands the mask to the detector; filtering after is equivalent
        # and avoids fake gradients at mask boundaries)
        H, W = img.shape
        ny = jnp.clip(jnp.round(new_pts[:, 1]).astype(jnp.int32), 0, H - 1)
        nx = jnp.clip(jnp.round(new_pts[:, 0]).astype(jnp.int32), 0, W - 1)
        new_ok = new_ok & det_mask[ny, nx]
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


@functools.partial(jax.jit,
                   static_argnames=("params", "cam_model", "hist_method"))
def track_frame_multi(state: TrackerState, imgs, zetas,
                      params: klt.KltParams, cam_model: str = "radtan",
                      first_frame=False, hist_method: str = "STRETCH",
                      det_mask=None):
    """N-camera tracking: cam 0 is the temporal master; every other camera
    gets a master→cam_i KLT pass on the current frame set with epipolar
    RANSAC, sharing the master ids.

    Generalizes the reference's per-camera-pair loop
    (TrackKLT::feed_new_camera binocular loop, TrackKLT.cpp:80-93 +
    feed_stereo:202-393) to KAIST-style N-camera rigs: returns
    (new_state, ids [N,P], uv [N,P,2], uvn [N,P,2], mask [N,P]) in
    FrameInput layout.  `imgs` [N,H,W] stacked (static N); `zetas` [N,8].
    `hist_method`/`det_mask`: see track_frame (mask applies to the master
    eye)."""
    N = imgs.shape[0]
    new_state, ids, uv_0, uvn_0, mask_0 = track_frame(
        state, imgs[0], zetas[0], params, cam_model=cam_model,
        first_frame=first_frame, hist_method=hist_method, det_mask=det_mask,
    )
    ids_all, uv_all, uvn_all, mask_all = [ids], [uv_0], [uvn_0], [mask_0]
    key = new_state.key
    max_f = jnp.maximum(zetas[0][0], zetas[0][1])
    for i in range(1, N):  # static camera count — unrolled per-camera join
        img_i = klt.equalize_method(imgs[i], hist_method)
        uv_i, ok_i = klt.track(new_state.prev_img, img_i, uv_0, params)
        uvn_i = cameras.undistort(cam_model, zetas[i], uv_i)
        key, sub = jax.random.split(key)
        inl, _ = ransac.ransac_fundamental(
            uvn_0, uvn_i, mask_0 & ok_i, sub, thresh=2.0 / max_f
        )
        mask_i = mask_0 & ok_i & inl
        ids_all.append(jnp.where(mask_i, ids, -1))
        uv_all.append(uv_i)
        uvn_all.append(uvn_i)
        mask_all.append(mask_i)
    new_state = new_state._replace(key=key)
    return (new_state, jnp.stack(ids_all), jnp.stack(uv_all),
            jnp.stack(uvn_all), jnp.stack(mask_all))


def track_frame_stereo(state: TrackerState, img_l, img_r, zeta_l, zeta_r,
                       params: klt.KltParams, cam_model: str = "radtan",
                       first_frame=False, hist_method: str = "STRETCH",
                       det_mask=None):
    """Stereo tracking — the N=2 case of `track_frame_multi` (left eye is
    the temporal master, shared ids via a left→right join; mirrors
    TrackKLT::feed_stereo, TrackKLT.cpp:202-393)."""
    return track_frame_multi(
        state, jnp.stack([img_l, img_r]), jnp.stack([zeta_l, zeta_r]),
        params, cam_model=cam_model, first_frame=first_frame,
        hist_method=hist_method, det_mask=det_mask,
    )
