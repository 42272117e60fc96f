"""Front-end tests: pyramidal KLT on synthetic warped textures, grid corner
detection, fundamental-matrix RANSAC (TrackKLT / Grider_GRID parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.frontend import klt, ransac


def texture(h=240, w=320, seed=0, octaves=4):
    """Smooth random texture with multi-scale detail (trackable)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w))
    for o in range(octaves):
        s = 2**o
        small = rng.normal(size=(h // (4 * s) + 2, w // (4 * s) + 2))
        up = np.kron(small, np.ones((4 * s, 4 * s)))[:h, :w]
        img += up / (o + 1)
    # light smoothing for differentiability
    k = np.array([0.25, 0.5, 0.25])
    for ax in (0, 1):
        img = (
            0.25 * np.roll(img, 1, axis=ax)
            + 0.5 * img
            + 0.25 * np.roll(img, -1, axis=ax)
        )
    img -= img.min()
    img /= img.max()
    return jnp.asarray(img, dtype=jnp.float32)


def shift_image(img, dx, dy):
    """Bilinear shift: out(y,x) = img(y - dy, x - dx)."""
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=img.dtype),
                          jnp.arange(W, dtype=img.dtype), indexing="ij")
    return klt._bilinear(img, yy - dy, xx - dx)


def rotate_image(img, deg):
    """Bilinear in-plane rotation about the image center: a point at p0 in
    img appears at p1 = R(p0 - c) + c in the output."""
    H, W = img.shape
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=img.dtype),
                          jnp.arange(W, dtype=img.dtype), indexing="ij")
    # inverse warp: source = R^-1 (dest - c) + c
    dx, dy = xx - cx, yy - cy
    sx = c * dx + s * dy + cx
    sy = -s * dx + c * dy + cy
    return klt._bilinear(img, sy, sx)


def rotate_points(pts, deg, h, w):
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    d = np.asarray(pts) - np.array([cx, cy])
    return np.stack([c * d[:, 0] - s * d[:, 1] + cx,
                     s * d[:, 0] + c * d[:, 1] + cy], -1)


PARAMS = klt.KltParams(num_pyr=4, win=7, iters=12, num_features=60,
                       grid_x=8, grid_y=6)


class TestKlt:
    def test_tracks_pure_translation(self):
        img0 = texture()
        dx, dy = 6.3, -3.7
        img1 = shift_image(img0, dx, dy)
        pts, ok = klt.detect_grid(img0, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                  PARAMS, 40)
        assert int(ok.sum()) > 20
        pts1, tok = klt.track(img0, img1, pts, PARAMS)
        good = np.array(ok & tok)
        assert good.sum() > 15
        flow = np.array(pts1 - pts)[good]
        err = np.abs(flow - np.array([dx, dy])).max(axis=1)
        assert np.median(err) < 0.25, f"median flow err {np.median(err)}"

    def test_large_motion_with_pyramid(self):
        img0 = texture(seed=1)
        dx, dy = 18.0, 11.0
        img1 = shift_image(img0, dx, dy)
        pts, ok = klt.detect_grid(img0, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                  PARAMS, 40)
        pts1, tok = klt.track(img0, img1, pts, PARAMS)
        good = np.array(ok & tok)
        flow = np.array(pts1 - pts)[good]
        err = np.abs(flow - np.array([dx, dy])).max(axis=1)
        assert np.median(err) < 0.5, f"median flow err {np.median(err)}"

    def test_detection_avoids_occupied_cells(self):
        img = texture(seed=2)
        # occupy the left half densely
        ox = np.linspace(5, 150, 40)
        oy = np.linspace(5, 230, 40)
        occ = jnp.asarray(np.stack(np.meshgrid(ox, oy), -1).reshape(-1, 2),
                          dtype=jnp.float32)
        pts, ok = klt.detect_grid(img, occ, jnp.ones(occ.shape[0], bool),
                                  PARAMS, 40)
        good = np.array(pts)[np.array(ok)]
        frac_left = (good[:, 0] < 150).mean() if len(good) else 0.0
        assert frac_left < 0.25, f"detections in occupied half: {frac_left}"

    def test_tracks_in_plane_rotation(self):
        """Camera-roll robustness: track through a known rotation warp and
        compare against the analytic point motion (TrackKLT on rolling
        cameras; the LK model is locally translational, so the angle is a
        few degrees — one camera frame's worth of roll at 20 Hz)."""
        img0 = texture(seed=4)
        deg = 4.0
        img1 = rotate_image(img0, deg)
        pts, ok = klt.detect_grid(img0, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                  PARAMS, 40)
        pts1, tok = klt.track(img0, img1, pts, PARAMS)
        good = np.array(ok & tok)
        assert good.sum() > 15, f"lost too many under rotation: {good.sum()}"
        h, w = img0.shape
        expect = rotate_points(np.array(pts), deg, h, w)
        err = np.abs(np.array(pts1) - expect).max(axis=1)[good]
        assert np.median(err) < 0.5, f"median rotation-flow err {np.median(err)}"

    def test_tracks_illumination_change(self):
        """Global gain+offset change between frames: the equalize stage
        (TrackKLT.cpp:56-75 histogram-equalize role) must absorb it."""
        img0 = texture(seed=5)
        dx, dy = 5.0, -2.0
        img1 = jnp.clip(1.6 * shift_image(img0, dx, dy) + 0.15, 0.0, 2.0)
        e0, e1 = klt.equalize(img0), klt.equalize(img1)
        pts, ok = klt.detect_grid(e0, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                  PARAMS, 40)
        pts1, tok = klt.track(e0, e1, pts, PARAMS)
        good = np.array(ok & tok)
        assert good.sum() > 15, f"lost too many under illumination: {good.sum()}"
        flow = np.array(pts1 - pts)[good]
        err = np.abs(flow - np.array([dx, dy])).max(axis=1)
        assert np.median(err) < 0.5, f"median illum-flow err {np.median(err)}"

    def test_jit_compiles(self):
        img0 = texture(seed=3)
        img1 = shift_image(img0, 2.0, 1.0)
        pts = jnp.asarray([[100.0, 100.0], [200.0, 150.0]])
        f = jax.jit(lambda a, b, p: klt.track(a, b, p, PARAMS))
        pts1, ok = f(img0, img1, pts)
        assert np.array(ok).all()


class TestRansac:
    def test_rejects_outliers(self):
        rng = np.random.default_rng(5)
        n = 100
        # random 3D scene viewed from two poses
        X = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])
        R = np.eye(3)
        t = np.array([0.4, 0.1, 0.0])
        p0 = X[:, :2] / X[:, 2:3]
        X2 = (R @ (X - t).T).T
        p1 = X2[:, :2] / X2[:, 2:3]
        p1 += rng.normal(size=p1.shape) * 5e-4
        # corrupt 20%
        bad = rng.choice(n, 20, replace=False)
        p1[bad] += rng.uniform(0.05, 0.2, size=(20, 2)) * rng.choice([-1, 1], (20, 2))
        mask = jnp.ones(n, bool)
        inl, F = ransac.ransac_fundamental(
            jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
            mask, jax.random.PRNGKey(0), thresh=2.0 / 460.0,
        )
        inl = np.array(inl)
        assert inl[bad].sum() <= 2, "outliers kept"
        good = np.setdiff1d(np.arange(n), bad)
        assert inl[good].mean() > 0.9, "inliers rejected"

    def test_few_points_passthrough(self):
        p = jnp.asarray(np.random.default_rng(0).normal(size=(20, 2)),
                        jnp.float32)
        mask = jnp.zeros(20, bool).at[:5].set(True)
        inl, _ = ransac.ransac_fundamental(
            p, p, mask, jax.random.PRNGKey(1), thresh=0.01
        )
        assert np.array_equal(np.array(inl), np.array(mask))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
