"""TPU-native sparse pyramidal Lucas-Kanade tracking + grid corner detection.

Capability parity with the reference visual front-end (ov_core/src/track/):
  * TrackKLT (TrackKLT.cpp:34-886): CLAHE-free histogram-equalized pyramids,
    pyramidal LK with initial-flow warm start, per-cell grid detection with
    minimum pixel distance dedup and top-off,
  * Grider_GRID / Grider_FAST (Grider_GRID.h:46-74): image divided into
    grid_x × grid_y cells, best corners per cell,
  * the fundamental-matrix RANSAC outlier rejection lives in
    frontend/ransac.py.

TPU-first design: everything is fixed-shape and batched —
  * pyramids via 2x2 average pooling (lax.reduce_window),
  * Shi-Tomasi corner response computed densely with separable convs (VPU),
    then per-cell argmax via reshape (no data-dependent loops),
  * per-feature LK iterations vmapped over the feature axis; patch sampling
    is bilinear gather; the iteration count is static with convergence masks.

Images are float32 [H, W] in [0, 1].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KltParams(NamedTuple):
    num_pyr: int = 4  # pyramid levels (TrackKLT pyr_levels)
    win: int = 10  # half window -> patch (2*win+1)^2 (win_size 21x21)
    iters: int = 10  # LK iterations per level
    min_eig: float = 1e-4  # minimum GN conditioning
    max_flow: float = 40.0  # per-level divergence guard (pixels)
    grid_x: int = 10  # detection grid (grid_x × grid_y cells)
    grid_y: int = 8
    min_px_dist: int = 10  # occupancy dedup radius
    num_features: int = 200
    # patch-local LK: per level, ONE img1 patch with this margin ring is
    # extracted per feature and all `iters` iterations sample inside it
    # (small one-hot contractions) instead of re-extracting against the
    # full image each iteration.  A track whose in-level excursion exceeds
    # the margin is dropped (LK cannot reliably lock beyond ~half-window
    # per level anyway).  0 = exact full-image iteration (the slow path,
    # kept for equivalence testing).
    iter_margin: int = 8


def _avgpool2(x):
    """2x2/stride-2 average pool via lax.reduce_window — NOT strided
    slices: `x[1::2, 0::2]`-style stride-2 slicing lowers to full-size
    GATHERS on this backend (measured 0.9 ms each at 752×480; four per
    pyramid level dominated the tracker), while reduce_window is native
    TPU pooling."""
    h2, w2 = (x.shape[0] // 2) * 2, (x.shape[1] // 2) * 2
    return 0.25 * jax.lax.reduce_window(
        x[:h2, :w2], 0.0, jax.lax.add, (2, 2), (2, 2), "VALID")


def build_pyramid(img, levels):
    """[H,W] -> list of levels (2x2 average pooled)."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(_avgpool2(pyr[-1]))
    return pyr


def _grad(img):
    """Central-difference gradients (Scharr-lite), same shape."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    return gx, gy


def _bilinear(img, y, x):
    """Bilinear sample img at float coords (y [..],x [..]), clamped."""
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x0i + 1]
    v10 = img[y0i + 1, x0i]
    v11 = img[y0i + 1, x0i + 1]
    return (
        v00 * (1 - dy) * (1 - dx)
        + v01 * (1 - dy) * dx
        + v10 * dy * (1 - dx)
        + v11 * dy * dx
    )


def extract_patches(img, centers, half):
    """Batched (2·half+2)² integer-base patch extraction via ONE-HOT
    CONTRACTIONS — zero gathers.

    TPU-critical: a per-pixel bilinear gather of [F·(2w+1)²] elements
    executes near-scalar on this backend (measured 0.86 ms per gather op,
    ~40 of them per KLT frame ⇒ 2.7 frames/s).  Expressed as two one-hot
    matmuls — rows = onehot(y)·img, patch = rows·onehot(x)ᵀ — the same
    access is MXU work (~1.7 GFLOP per 200-feature extraction ≈ 0.1 ms).

    centers: [F, 2] float (x, y).  Returns (patches [F, S, S], fx [F],
    fy [F]) with S = 2·half + 2; patches[f, i, j] = img[y0+i, x0+j]
    (indices clamped), y0 = floor(cy) − half, x0 = floor(cx) − half, and
    (fx, fy) the fractional parts — `shift_patches` combines the four
    integer shifts into the bilinear sample at the true center.
    """
    H, W = img.shape
    S = 2 * half + 2
    x0 = jnp.floor(centers[:, 0])
    y0 = jnp.floor(centers[:, 1])
    fx = centers[:, 0] - x0
    fy = centers[:, 1] - y0
    ridx = jnp.clip(y0.astype(jnp.int32)[:, None] - half
                    + jnp.arange(S, dtype=jnp.int32)[None, :], 0, H - 1)
    cidx = jnp.clip(x0.astype(jnp.int32)[:, None] - half
                    + jnp.arange(S, dtype=jnp.int32)[None, :], 0, W - 1)
    F = centers.shape[0]
    R = (ridx[..., None] == jnp.arange(H, dtype=jnp.int32)).astype(img.dtype)
    C = (cidx[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(img.dtype)
    rows = (R.reshape(F * S, H) @ img).reshape(F, S, W)
    patches = rows @ jnp.swapaxes(C, -1, -2)  # [F, S, S]
    return patches, fx, fy


def shift_patches(patches, fx, fy):
    """Bilinear sample of integer-base patches at their fractional center:
    [F, S, S] -> [F, S-1, S-1].  The whole patch shifts rigidly, so the
    four weights are scalars per feature."""
    wx = fx[:, None, None]
    wy = fy[:, None, None]
    return ((1 - wy) * (1 - wx) * patches[:, :-1, :-1]
            + (1 - wy) * wx * patches[:, :-1, 1:]
            + wy * (1 - wx) * patches[:, 1:, :-1]
            + wy * wx * patches[:, 1:, 1:])


def _sample_patches(img, centers, half):
    """[F, 2·half+1, 2·half+1] bilinear patches at float centers (the
    gather-free replacement for per-pixel `_bilinear` grids)."""
    p, fx, fy = extract_patches(img, centers, half)
    return shift_patches(p, fx, fy)


def sample_inpatch(P, cy, cx, half):
    """Bilinear (2·half+1)² window sampled INSIDE integer-base patches.

    P: [F, S, S] integer-base patches (rows/cols of the source image);
    (cy, cx): float window centers in PATCH coordinates.  Same one-hot
    contraction trick as `extract_patches`, but over the tiny patch dim S
    instead of the full image — the per-iteration cost of an LK/subpix
    refinement loop drops from one full-image matmul to an [F, ·, S]
    contraction.  Out-of-patch indices clamp; callers gate validity on the
    excursion staying inside the margin ring.
    """
    F, S, _ = P.shape
    So = 2 * half + 2
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    ridx = jnp.clip(y0.astype(jnp.int32)[:, None] - half
                    + jnp.arange(So, dtype=jnp.int32)[None, :], 0, S - 1)
    cidx = jnp.clip(x0.astype(jnp.int32)[:, None] - half
                    + jnp.arange(So, dtype=jnp.int32)[None, :], 0, S - 1)
    R = (ridx[..., None] == jnp.arange(S, dtype=jnp.int32)).astype(P.dtype)
    C = (cidx[..., None] == jnp.arange(S, dtype=jnp.int32)).astype(P.dtype)
    Q = jnp.matmul(jnp.matmul(R, P), jnp.swapaxes(C, -1, -2))
    return shift_patches(Q, cx - x0, cy - y0)


def _track_level(img0, img1, gx0, gy0, pts0, guess, params: KltParams):
    """One pyramid level of LK for all features — fully batched over the
    feature axis with one-hot patch extraction (no gathers; see
    `extract_patches`).

    pts0: [N,2] (x,y) in this level's coords; guess: [N,2] current flow.
    Returns (flow [N,2], ok [N]).
    """
    w = params.win
    # template + gradient patches at pts0 (fixed per level)
    t0 = _sample_patches(img0, pts0, w)   # [F, P, P]
    ix = _sample_patches(gx0, pts0, w)
    iy = _sample_patches(gy0, pts0, w)
    # structure tensor (constant per feature at this level)
    a = jnp.sum(ix * ix, axis=(1, 2))
    b = jnp.sum(ix * iy, axis=(1, 2))
    c = jnp.sum(iy * iy, axis=(1, 2))
    det = a * c - b * b
    tr = a + c
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    npix = (2 * w + 1) ** 2
    cond_ok = min_eig / npix > params.min_eig
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    def body(_, flow):
        t1 = _sample_patches(img1, pts0 + flow, w)
        e = t1 - t0
        bx = jnp.sum(e * ix, axis=(1, 2))
        by = jnp.sum(e * iy, axis=(1, 2))
        du = inv_det * (c * bx - b * by)
        dv = inv_det * (-b * bx + a * by)
        return flow - jnp.stack([du, dv], axis=-1)

    flow = jax.lax.fori_loop(0, params.iters, body, guess)
    ok = cond_ok & (jnp.linalg.norm(flow - guess, axis=-1) < params.max_flow)
    return flow, ok


def _track_level_local(img0, img1, pts0, guess, params: KltParams):
    """One pyramid level of LK, PATCH-LOCAL: two full-image one-hot
    extractions per level total (template+gradients from one img0 patch,
    one margin-ringed img1 patch), then every iteration samples inside the
    img1 patch with `sample_inpatch` — ~6× fewer MXU FLOPs than the
    full-image path at 752×480 (each of the `iters` iterations there is a
    [F·S, H]@[H, W] matmul).

    Template gradients come from central differences INSIDE the bilinear
    img0 patch — exactly equal to bilinear-sampling a full-image
    central-difference gradient (sampling is linear, grid spacing 1 px),
    modulo image-border clamping.

    Tracks whose in-level excursion from the warm start exceeds
    `iter_margin − 1` are dropped (the img1 patch no longer covers the
    window); LK cannot reliably lock beyond ~half-window per level, so
    such tracks are divergent under the full-image path too.
    """
    w = params.win
    m = params.iter_margin
    # template + gradients from ONE img0 patch with a +1 gradient ring
    B = _sample_patches(img0, pts0, w + 1)        # [F, 2w+3, 2w+3]
    t0 = B[:, 1:-1, 1:-1]                         # [F, 2w+1, 2w+1]
    ix = 0.5 * (B[:, 1:-1, 2:] - B[:, 1:-1, :-2])
    iy = 0.5 * (B[:, 2:, 1:-1] - B[:, :-2, 1:-1])
    a = jnp.sum(ix * ix, axis=(1, 2))
    b = jnp.sum(ix * iy, axis=(1, 2))
    c = jnp.sum(iy * iy, axis=(1, 2))
    det = a * c - b * b
    tr = a + c
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    npix = (2 * w + 1) ** 2
    cond_ok = min_eig / npix > params.min_eig
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    # ONE img1 patch per feature covering the whole in-level excursion
    base = pts0 + guess
    P1, _, _ = extract_patches(img1, base, w + m)  # [F, S1, S1]
    bx0 = jnp.floor(base[:, 0]) - (w + m)
    by0 = jnp.floor(base[:, 1]) - (w + m)

    def body(_, carry):
        flow, maxexc = carry
        ctr = pts0 + flow
        t1 = sample_inpatch(P1, ctr[:, 1] - by0, ctr[:, 0] - bx0, w)
        e = t1 - t0
        bx = jnp.sum(e * ix, axis=(1, 2))
        by = jnp.sum(e * iy, axis=(1, 2))
        du = inv_det * (c * bx - b * by)
        dv = inv_det * (-b * bx + a * by)
        flow = flow - jnp.stack([du, dv], axis=-1)
        exc = jnp.max(jnp.abs(flow - guess), axis=-1)
        return flow, jnp.maximum(maxexc, exc)

    flow, maxexc = jax.lax.fori_loop(
        0, params.iters, body, (guess, jnp.zeros(pts0.shape[0], img0.dtype)))
    ok = (cond_ok & (maxexc < m - 1.0)
          & (jnp.linalg.norm(flow - guess, axis=-1) < params.max_flow))
    return flow, ok


def track(img0, img1, pts0, params: KltParams, initial_flow=None):
    """Pyramidal LK: track pts0 [N,2] (x,y) from img0 to img1.

    Returns (pts1 [N,2], ok [N]).  Mirrors TrackKLT::perform_matching's
    calcOpticalFlowPyrLK call (TrackKLT.cpp:829-886) with initial-flow
    warm start.
    """
    if 0 < params.iter_margin < 3:
        # the local-path ok-gate is `maxexc < iter_margin - 1`: margin 1
        # silently drops EVERY track (gate < 0 px) and margin 2 allows
        # under 1 px of refinement — neither is a usable configuration
        raise ValueError(
            f"iter_margin={params.iter_margin}: use 0 (exact full-image "
            "path) or >= 3 (patch-local path needs >= 2 px of usable "
            "excursion before its margin gate)")
    L = params.num_pyr
    pyr0 = build_pyramid(img0, L)
    pyr1 = build_pyramid(img1, L)
    local = params.iter_margin > 0
    grads = None if local else [_grad(p) for p in pyr0]

    N = pts0.shape[0]
    flow = (initial_flow if initial_flow is not None
            else jnp.zeros((N, 2), dtype=img0.dtype)) / (2.0 ** (L - 1))
    ok_all = jnp.ones((N,), dtype=bool)
    for lev in range(L - 1, -1, -1):
        scale = 2.0**lev
        pts_l = pts0 / scale
        if local:
            flow, ok = _track_level_local(
                pyr0[lev], pyr1[lev], pts_l, flow, params)
        else:
            flow, ok = _track_level(
                pyr0[lev], pyr1[lev], grads[lev][0], grads[lev][1], pts_l,
                flow, params,
            )
        ok_all = ok_all & ok
        if lev > 0:
            flow = flow * 2.0
    pts1 = pts0 + flow
    H, W = img0.shape
    inb = (
        (pts1[:, 0] > 2) & (pts1[:, 0] < W - 3)
        & (pts1[:, 1] > 2) & (pts1[:, 1] < H - 3)
    )
    return pts1, ok_all & inb


def shi_tomasi_response(img, win=2):
    """Dense min-eigenvalue corner response (goodFeaturesToTrack analog)."""
    gx, gy = _grad(img)
    ixx, ixy, iyy = gx * gx, gx * gy, gy * gy

    def boxsum(x):
        k = 2 * win + 1
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (k, k), (1, 1), "SAME"
        )

    a, b, c = boxsum(ixx), boxsum(ixy), boxsum(iyy)
    tr = a + c
    det = a * c - b * b
    return 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))


def detect_grid(img, occupancy_pts, occupancy_mask, params: KltParams,
                max_new: int):
    """Grid-based corner detection with occupancy dedup.

    Mirrors TrackKLT::perform_detection_monocular (TrackKLT.cpp:395-529) +
    Grider_GRID: split the image into grid cells, take the best corner per
    cell that is not within min_px_dist of an existing feature, return the
    top `max_new` across cells.

    Returns (pts [max_new, 2], ok [max_new]).
    """
    H, W = img.shape
    resp = shi_tomasi_response(img)
    # suppress borders
    border = 8
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (
        (xx >= border) & (xx < W - border) & (yy >= border) & (yy < H - border)
    )
    resp = jnp.where(inb, resp, -1.0)

    # occupancy mask: zero response near existing features
    cell = params.min_px_dist
    gw, gh = (W + cell - 1) // cell, (H + cell - 1) // cell
    occ = jnp.zeros((gh, gw), dtype=bool)
    ox = jnp.clip((occupancy_pts[:, 0] / cell).astype(jnp.int32), 0, gw - 1)
    oy = jnp.clip((occupancy_pts[:, 1] / cell).astype(jnp.int32), 0, gh - 1)
    occ = occ.at[oy, ox].max(occupancy_mask)
    # upsample the occupancy grid densely (jnp.repeat = broadcast+reshape):
    # the obvious occ[yy//cell, xx//cell] lookup is a full-image GATHER,
    # which executes near-scalar on this backend (3.7 ms/frame measured)
    occ_full = jnp.repeat(jnp.repeat(occ, cell, axis=0), cell,
                          axis=1)[:H, :W]
    resp = jnp.where(occ_full, -1.0, resp)

    # per-cell best corner: pad to multiples of the cell grid then argmax
    ch = (H + params.grid_y - 1) // params.grid_y
    cw = (W + params.grid_x - 1) // params.grid_x
    Hp, Wp = ch * params.grid_y, cw * params.grid_x
    rp = jnp.full((Hp, Wp), -1.0, dtype=resp.dtype).at[:H, :W].set(resp)
    cells = rp.reshape(params.grid_y, ch, params.grid_x, cw)
    cells = cells.transpose(0, 2, 1, 3).reshape(-1, ch * cw)
    best = jnp.argmax(cells, axis=1)
    best_val = jnp.take_along_axis(cells, best[:, None], axis=1)[:, 0]
    cy = best // cw
    cx = best % cw
    gy = jnp.arange(params.grid_y * params.grid_x) // params.grid_x
    gx = jnp.arange(params.grid_y * params.grid_x) % params.grid_x
    px = (gx * cw + cx).astype(img.dtype)
    py = (gy * ch + cy).astype(img.dtype)

    k = min(max_new, px.shape[0])
    val, idx = jax.lax.top_k(best_val, k)
    pts = jnp.stack([px[idx], py[idx]], axis=1)
    ok = val > 1e-6
    if k < max_new:
        pts = jnp.concatenate([pts, jnp.zeros((max_new - k, 2), img.dtype)])
        ok = jnp.concatenate([ok, jnp.zeros((max_new - k,), bool)])
    # sub-pixel refinement of the integer-pixel cell argmax (the reference
    # runs cv::cornerSubPix on every detection, Grider_FAST.h:46-73)
    pts = corner_subpix(img, pts, ok)
    return pts, ok


def corner_subpix(img, pts, ok, win=4, iters=3):
    """Sub-pixel corner refinement (cv::cornerSubPix parity — the
    reference refines every FAST detection, Grider_FAST.h:46-73).

    Classic saddle-point solve: at the true corner q, the image gradient at
    every window pixel p is orthogonal to (q − p), so q solves
        [Σ ∇I∇Iᵀ] q = Σ (∇I∇Iᵀ) p
    over the (2·win+1)² window.  Iterated a fixed `iters` times with the
    window re-centered (bilinear gathers), per-iteration step clamped to
    1 px; singular/diverged refinements fall back to the integer corner.
    Fully vmapped over the feature axis — fixed shapes, no host loop.

    Returns refined pts [N, 2]; invalid rows pass through unchanged.
    """
    gx, gy = _grad(img)
    # gather-free: extract one gradient patch per corner that covers the
    # whole refinement excursion (≤1 px per iteration), then every
    # iteration samples INSIDE the patch with small one-hot contractions
    # (see extract_patches for why gathers are fatal on this backend)
    half_base = win + iters + 1
    Pgx, _, _ = extract_patches(gx, pts, half_base)
    Pgy, _, _ = extract_patches(gy, pts, half_base)
    bx0 = jnp.floor(pts[:, 0]) - half_base
    by0 = jnp.floor(pts[:, 1]) - half_base
    offs = jnp.arange(-win, win + 1, dtype=img.dtype)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")

    def body(_, q):
        lx = q[:, 0] - bx0
        ly = q[:, 1] - by0
        ixp = sample_inpatch(Pgx, ly, lx, win)  # [F, 2w+1, 2w+1]
        iyp = sample_inpatch(Pgy, ly, lx, win)
        px = q[:, 0, None, None] + ox
        py = q[:, 1, None, None] + oy
        a = jnp.sum(ixp * ixp, axis=(1, 2))
        b = jnp.sum(ixp * iyp, axis=(1, 2))
        c = jnp.sum(iyp * iyp, axis=(1, 2))
        bx = jnp.sum(ixp * ixp * px + ixp * iyp * py, axis=(1, 2))
        by = jnp.sum(ixp * iyp * px + iyp * iyp * py, axis=(1, 2))
        det = a * c - b * b
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        qx = inv * (c * bx - b * by)
        qy = inv * (-b * bx + a * by)
        qn = jnp.stack([qx, qy], axis=-1)
        qn = jnp.where((inv == 0.0)[:, None], q, qn)
        return q + jnp.clip(qn - q, -1.0, 1.0)

    q = jax.lax.fori_loop(0, iters, body, pts)
    good = ok & (jnp.linalg.norm(q - pts, axis=-1) < win)
    return jnp.where(good[:, None], q, pts)


def equalize(img):
    """Global contrast normalization (a rank-free stretch; cheap default
    used by the sim/descriptor paths — see `equalize_method` for the
    reference's NONE/HISTOGRAM/CLAHE modes, TrackKLT.cpp:56-75).

    Moment-based clip bounds (mean ± 2.3σ ≈ the 1st/99th percentile of a
    near-Gaussian intensity histogram): the exact-percentile version
    full-image SORTED twice per camera per frame — ~0.6 ms each on TPU —
    for bounds the tracker only needs approximately."""
    mu = jnp.mean(img)
    sd = jnp.std(img)
    lo = mu - 2.3 * sd
    hi = mu + 2.3 * sd
    return jnp.clip((img - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)


_EQ_BINS = 256


def _hist_lut(counts, total):
    """Equalization LUT from bin counts: the normalized cdf (the classic
    cv::equalizeHist map, with the cdf-min offset)."""
    cdf = jnp.cumsum(counts)
    cdf_min = cdf[jnp.argmax(counts > 0)]
    denom = jnp.maximum(total - cdf_min, 1.0)
    return jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)


def equalize_hist(img):
    """Full-image histogram equalization (cv::equalizeHist parity,
    TrackKLT.cpp:58-60).  img float32 [H,W] in [0,1] -> same."""
    q = jnp.clip((img * (_EQ_BINS - 1)).astype(jnp.int32), 0, _EQ_BINS - 1)
    counts = jnp.zeros((_EQ_BINS,), jnp.float32).at[q.reshape(-1)].add(1.0)
    lut = _hist_lut(counts, img.size)
    return lut[q]


def equalize_clahe(img, clip_limit=10.0, grid=8):
    """Contrast-limited adaptive histogram equalization
    (cv::createCLAHE(10, (8,8)) parity, TrackKLT.cpp:61-64).

    TPU-shaped: per-tile histograms by one scatter-add over flat
    (tile·bin) indices, clip + uniform redistribution of the excess, then
    per-pixel bilinear interpolation between the four neighboring tile
    LUTs (the standard CLAHE seam-removal).  Image dims need not divide
    the grid — tiles are ceil-sized and the histogram pads with weight 0.
    """
    H, W = img.shape
    th = -(-H // grid)  # ceil tile sizes
    tw = -(-W // grid)
    q = jnp.clip((img * (_EQ_BINS - 1)).astype(jnp.int32), 0, _EQ_BINS - 1)
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    ty = yy // th
    tx = xx // tw
    tile = ty * grid + tx
    flat = (tile * _EQ_BINS + q).reshape(-1)
    counts = jnp.zeros((grid * grid * _EQ_BINS,), jnp.float32).at[flat].add(
        1.0).reshape(grid * grid, _EQ_BINS)
    # contrast limiting: clip each bin at clip_limit × the uniform level and
    # spread the clipped mass uniformly (cv::CLAHE semantics)
    tile_total = counts.sum(axis=1, keepdims=True)
    limit = clip_limit * jnp.maximum(tile_total / _EQ_BINS, 1.0)
    clipped = jnp.minimum(counts, limit)
    excess = (counts - clipped).sum(axis=1, keepdims=True)
    counts = clipped + excess / _EQ_BINS
    luts = jax.vmap(_hist_lut)(counts, tile_total[:, 0])  # [T, 256]

    # bilinear interpolation between the 4 surrounding tile centers
    cy = (yy + 0.5) / th - 0.5  # tile-center coordinates
    cx = (xx + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, grid - 1)
    x0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, grid - 1)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(cy - y0, 0.0, 1.0)
    fx = jnp.clip(cx - x0, 0.0, 1.0)
    v00 = luts[y0 * grid + x0, q]
    v01 = luts[y0 * grid + x1, q]
    v10 = luts[y1 * grid + x0, q]
    v11 = luts[y1 * grid + x1, q]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def equalize_method(img, method: str):
    """Dispatch the configured pre-tracking normalization
    (TrackBase::HistogramMethod NONE/HISTOGRAM/CLAHE, TrackKLT.cpp:56-75)."""
    m = method.upper()
    if m == "NONE":
        return img
    if m == "CLAHE":
        return equalize_clahe(img)
    if m == "HISTOGRAM":
        return equalize_hist(img)
    if m == "STRETCH":  # this repo's rank-free extra (sim default)
        return equalize(img)
    raise ValueError(f"unknown histogram_method: {method}")


def downsample2(img):
    """2x2 average-pool halving (the reference's downsample_cameras
    pyrDown role, TrackBase.h:106; pair with halved fx/fy/cx/cy)."""
    return _avgpool2(img)
