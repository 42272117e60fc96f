"""Descriptor-based feature matching front-end.

Capability parity with ov_core::TrackDescriptor (TrackDescriptor.{h,cpp}:
FAST-grid detect + ORB descriptors, knn ratio test robust_ratio_test:538,
symmetry test :554, RANSAC).  TPU-first redesign: descriptors are
ORB-STEERED normalized 16x16 intensity patches — each patch is sampled in
a frame rotated to the keypoint's intensity-centroid orientation (the same
IC_Angle steering cv::ORB uses), giving in-plane rotation invariance while
keeping the entire N×N matching problem ONE [N,256]x[256,N] matmul on the
MXU, followed by ratio + mutual-consistency masking — no per-feature loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from open_vins_tpu.frontend import klt

PATCH = 16  # descriptor patch side
DESC_DIM = PATCH * PATCH
ORI_RADIUS = 7  # intensity-centroid disc radius (ORB HARRIS_K block scale)


def patch_orientation(img, pts, mask, radius=ORI_RADIUS):
    """Keypoint orientation by intensity centroid (cv::ORB IC_Angle, the
    steering the reference's ORB descriptors get for free): the dominant
    direction θ = atan2(m01, m10) of the patch mass over a disc."""
    offs = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    disc = ((ox**2 + oy**2) <= radius**2).astype(img.dtype)

    def one(pt, ok):
        patch = klt._bilinear(img, pt[1] + oy, pt[0] + ox) * disc
        m10 = jnp.sum(patch * ox)
        m01 = jnp.sum(patch * oy)
        return jnp.arctan2(m01, m10) * ok.astype(img.dtype)

    return jax.vmap(one)(pts, mask)


def extract(img, pts, mask, steered=True, scale=1.0):
    """Steered normalized-patch descriptors at pts [N,2] -> [N, 256].

    The 16x16 sampling lattice is rotated to each keypoint's intensity-
    centroid orientation (rotation invariance) and scaled by `scale`
    (callers matching across pyramid levels pass the level ratio).
    Invalid points get zero descriptors (never match).
    """
    half = PATCH // 2
    offs = (jnp.arange(-half, half, dtype=img.dtype) + 0.5) * scale
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    if steered:
        theta = patch_orientation(img, pts, mask)
    else:
        theta = jnp.zeros((pts.shape[0],), img.dtype)

    def one(pt, th, ok):
        c, s = jnp.cos(th), jnp.sin(th)
        rx = c * ox - s * oy
        ry = s * ox + c * oy
        patch = klt._bilinear(img, pt[1] + ry, pt[0] + rx)
        v = patch.reshape(-1)
        v = v - jnp.mean(v)
        n = jnp.linalg.norm(v)
        v = v / jnp.maximum(n, 1e-6)
        return v * ok.astype(img.dtype)

    return jax.vmap(one)(pts, theta, mask)


def match(desc0, desc1, mask0, mask1, ratio=0.85, min_score=0.5):
    """NCC matching with ratio + symmetry tests.

    Returns (idx1_for_0 [N0], matched [N0]): for each feature in frame 0,
    its match index in frame 1 (valid where matched).
    Mirrors robust_match/robust_ratio_test/robust_symmetry_test
    (TrackDescriptor.cpp:480-575) with scores = normalized correlation.
    """
    S = desc0 @ desc1.T  # [N0, N1] one MXU matmul
    neg = jnp.asarray(-2.0, S.dtype)
    S = jnp.where(mask0[:, None] & mask1[None, :], S, neg)

    best1 = jnp.argmax(S, axis=1)  # [N0]
    s_sorted = jax.lax.top_k(S, 2)[0]  # [N0, 2]
    ratio_ok = s_sorted[:, 1] < ratio * s_sorted[:, 0]
    score_ok = s_sorted[:, 0] > min_score

    best0 = jnp.argmax(S, axis=0)  # [N1]
    mutual = best0[best1] == jnp.arange(desc0.shape[0])

    matched = mask0 & score_ok & ratio_ok & mutual
    return best1, matched


class DescTrackerState(NamedTuple):
    prev_desc: jax.Array  # [P, 256]
    prev_pts: jax.Array  # [P, 2]
    ids: jax.Array  # [P]
    valid: jax.Array  # [P]
    next_id: jax.Array
    key: jax.Array


def init_tracker(num_pts, seed=0):
    return DescTrackerState(
        prev_desc=jnp.zeros((num_pts, DESC_DIM), jnp.float32),
        prev_pts=jnp.zeros((num_pts, 2), jnp.float32),
        ids=jnp.full((num_pts,), -1, jnp.int32),
        valid=jnp.zeros((num_pts,), bool),
        next_id=jnp.asarray(0, jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


def track_frame(state: DescTrackerState, img, zeta, params: klt.KltParams,
                cam_model="radtan", first_frame=False):
    """Detect-and-match tracking (TrackDescriptor::feed_monocular parity).

    Returns (new_state, ids, uv, uvn, mask) in FrameInput layout.
    """
    from open_vins_tpu.frontend import ransac
    from open_vins_tpu.ops import cameras

    P = state.prev_pts.shape[0]
    img = klt.equalize(img)
    # detect fresh corners every frame
    pts, det_ok = klt.detect_grid(
        img, jnp.zeros((1, 2), img.dtype), jnp.zeros((1,), bool), params, P
    )
    desc = extract(img, pts, det_ok)

    # match previous -> current
    idx1, matched = match(state.prev_desc, desc, state.valid, det_ok)
    matched = matched & jnp.logical_not(first_frame)

    # RANSAC on normalized coords of matched pairs
    uvn0 = cameras.undistort(cam_model, zeta, state.prev_pts)
    uvn1_all = cameras.undistort(cam_model, zeta, pts)
    uvn1 = uvn1_all[idx1]
    key, sub = jax.random.split(state.key)
    max_f = jnp.maximum(zeta[0], zeta[1])
    inl, _ = ransac.ransac_fundamental(uvn0, uvn1, matched, sub,
                                       thresh=2.0 / max_f)
    matched = matched & inl

    # ids for the current detections: inherit where matched, fresh otherwise
    ids_cur = jnp.full((P,), -1, jnp.int32)
    ids_cur = ids_cur.at[idx1].set(
        jnp.where(matched, state.ids, -1), mode="drop"
    )
    is_new = det_ok & (ids_cur < 0)
    n_new_before = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    ids_cur = jnp.where(is_new, state.next_id + n_new_before, ids_cur)
    next_id = state.next_id + jnp.sum(is_new.astype(jnp.int32))
    valid_cur = det_ok & (ids_cur >= 0)

    new_state = DescTrackerState(
        prev_desc=desc, prev_pts=pts, ids=ids_cur, valid=valid_cur,
        next_id=next_id, key=key,
    )
    return new_state, ids_cur, pts, uvn1_all, valid_cur
