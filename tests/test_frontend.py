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
    def test_corner_subpix_recovers_fractional_centers(self):
        """detect_grid + corner_subpix (cv::cornerSubPix parity,
        Grider_FAST.h:46-73): Gaussian blobs at known FRACTIONAL centers
        must come back sub-pixel accurate — strictly better than the
        integer-pixel cell argmax."""
        H, W = 240, 320
        rng = np.random.default_rng(5)
        yy, xx = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32), indexing="ij")
        centers = []
        img = np.zeros((H, W), np.float32)
        for gy in range(3):
            for gx in range(4):
                cx = 40 + gx * 70 + rng.uniform(-0.45, 0.45)
                cy = 40 + gy * 70 + rng.uniform(-0.45, 0.45)
                centers.append((cx, cy))
                img += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 1.7**2))
        centers = np.asarray(centers)
        pts, ok = klt.detect_grid(jnp.asarray(img), jnp.zeros((1, 2)),
                                  jnp.zeros(1, bool), PARAMS, 60)
        pts = np.asarray(pts)[np.asarray(ok)]
        errs = []
        for c in centers:
            d = np.linalg.norm(pts - c, axis=1)
            j = np.argmin(d)
            if d[j] < 2.0:  # matched detection
                errs.append(d[j])
        assert len(errs) >= 8, f"only {len(errs)} blobs detected"
        errs = np.asarray(errs)
        # integer argmax has mean error ~0.25-0.5 px on fractional centers;
        # sub-pixel refinement must land well under that
        assert errs.mean() < 0.12, f"mean sub-pixel error {errs.mean():.3f} px"
        assert errs.max() < 0.3, f"max sub-pixel error {errs.max():.3f} px"

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

    def test_patch_local_matches_full_image_path(self):
        # the iter_margin=0 full-image path is the equivalence oracle for
        # the patch-local default (klt.py KltParams.iter_margin docstring);
        # on a moderate shift the two must agree on the surviving tracks
        img0 = texture(seed=3)
        dx, dy = 4.2, -2.6
        img1 = shift_image(img0, dx, dy)
        pts, ok = klt.detect_grid(img0, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                  PARAMS, 40)
        p_full = PARAMS._replace(iter_margin=0)
        pts_f, ok_f = klt.track(img0, img1, pts, p_full)
        pts_l, ok_l = klt.track(img0, img1, pts, PARAMS)
        both = np.array(ok & ok_f & ok_l)
        assert both.sum() > 15
        d = np.linalg.norm(np.array(pts_f - pts_l)[both], axis=1)
        assert np.median(d) < 0.05, f"paths disagree: median {np.median(d)}"
        # the local path may only drop tracks the full path also finds
        # marginal — it must keep the vast majority
        assert int(np.array(ok & ok_l).sum()) >= 0.8 * int(np.array(ok & ok_f).sum())

    def test_small_iter_margin_rejected(self):
        img = texture(seed=4)
        pts = jnp.zeros((4, 2)) + 30.0
        for m in (1, 2):
            with pytest.raises(ValueError, match="iter_margin"):
                klt.track(img, img, pts, PARAMS._replace(iter_margin=m))

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

    def test_eight_point_matches_svd(self):
        """The matmul-only nullspace + closed-form rank-2 projection must
        reproduce the SVD 8-point solution (the custom-call-free path is
        what runs on TPU — batched svd serializes there)."""
        rng = np.random.default_rng(11)
        for trial in range(10):
            X = rng.uniform(-2, 2, size=(8, 3)) + np.array([0, 0, 6.0])
            t = rng.normal(size=3) * 0.3
            p0 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
            X2 = X - t
            p1 = (X2[:, :2] / X2[:, 2:3]).astype(np.float32)
            p1 += rng.normal(size=p1.shape).astype(np.float32) * 1e-4
            F = np.array(ransac._eight_point(jnp.asarray(p0),
                                             jnp.asarray(p1)))
            # SVD oracle with the same Hartley normalization
            def hartley(p):
                c = p.mean(0)
                d = p - c
                s = np.sqrt(2.0) / np.linalg.norm(d, axis=1).mean()
                T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]],
                              [0, 0, 1.0]])
                return s * d, T
            q0, T0 = hartley(p0.astype(np.float64))
            q1, T1 = hartley(p1.astype(np.float64))
            x0, y0 = q0[:, 0], q0[:, 1]
            x1, y1 = q1[:, 0], q1[:, 1]
            A = np.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                          x0, y0, np.ones_like(x0)], axis=1)
            _, _, Vt = np.linalg.svd(A)
            Fs = Vt[-1].reshape(3, 3)
            U, S, Vt2 = np.linalg.svd(Fs)
            Fs = (U * np.array([S[0], S[1], 0.0])[None]) @ Vt2
            Fs = T1.T @ Fs @ T0
            Fn = F / np.linalg.norm(F)
            Fsn = Fs / np.linalg.norm(Fs)
            if np.sum(Fn * Fsn) < 0:
                Fsn = -Fsn
            err = np.abs(Fn - Fsn).max()
            assert err < 5e-3, f"trial {trial}: 8-point mismatch {err}"
            # rank-2 actually enforced
            s = np.linalg.svd(Fn, compute_uv=False)
            assert s[2] < 1e-4 * s[0], f"trial {trial}: rank-2 not enforced"

    def test_few_points_passthrough(self):
        p = jnp.asarray(np.random.default_rng(0).normal(size=(20, 2)),
                        jnp.float32)
        mask = jnp.zeros(20, bool).at[:5].set(True)
        inl, _ = ransac.ransac_fundamental(
            p, p, mask, jax.random.PRNGKey(1), thresh=0.01
        )
        assert np.array_equal(np.array(inl), np.array(mask))


class TestVsOpenCV:
    """Cross-validation against cv2.calcOpticalFlowPyrLK — the reference's
    actual front-end kernel (TrackKLT.cpp:450-510).  Our pyramidal LK must
    agree with OpenCV's to a fraction of a pixel on the same inputs."""

    def test_lk_matches_opencv(self):
        import cv2

        img0 = texture(h=240, w=320, seed=12)
        dx, dy = 5.3, -3.7
        img1 = shift_image(img0, dx, dy)
        rng = np.random.default_rng(13)
        pts = rng.uniform([30, 30], [290, 210], size=(40, 2)).astype(
            np.float32)

        p1, ok = klt.track(img0, img1, jnp.asarray(pts),
                           klt.KltParams(num_pyr=3, win=10))
        p1 = np.array(p1)[np.array(ok)]
        p0_ok = pts[np.array(ok)]
        assert len(p1) > 25, "too few tracked"

        a0 = (np.array(img0) * 255).astype(np.uint8)
        a1 = (np.array(img1) * 255).astype(np.uint8)
        cv_pts, cv_ok, _ = cv2.calcOpticalFlowPyrLK(
            a0, a1, p0_ok.reshape(-1, 1, 2), None, winSize=(21, 21),
            maxLevel=3,
            criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30,
                      0.01))
        cv_pts = cv_pts.reshape(-1, 2)
        cv_ok = cv_ok.reshape(-1).astype(bool)
        both = cv_ok
        assert both.sum() > 20
        diff = np.linalg.norm(p1[both] - cv_pts[both], axis=1)
        assert np.median(diff) < 0.3, \
            f"median deviation from OpenCV LK {np.median(diff):.3f} px"
        # and both must be near the true flow
        true1 = p0_ok + np.array([dx, dy])
        err = np.linalg.norm(p1[both] - true1[both], axis=1)
        assert np.median(err) < 0.3, f"median true error {np.median(err):.3f}"


class TestEqualization:
    """NONE / HISTOGRAM / CLAHE pre-tracking normalization
    (TrackBase::HistogramMethod, TrackKLT.cpp:56-75)."""

    def test_histogram_flattens_cdf(self):
        """A low-contrast image must map to a near-uniform distribution
        spanning [0, 1] (cv::equalizeHist behavior)."""
        img = 0.4 + 0.2 * texture(h=120, w=160, seed=5)  # values in [.4,.6]
        out = np.array(klt.equalize_hist(img))
        assert out.min() < 0.05 and out.max() > 0.95, "range not stretched"
        # near-uniform: each quartile holds 25% +- 10% of pixels
        for lo in (0.0, 0.25, 0.5, 0.75):
            frac = ((out >= lo) & (out < lo + 0.25)).mean()
            assert 0.15 < frac < 0.35, f"quartile {lo}: {frac:.2f}"

    def test_clahe_local_contrast(self):
        """CLAHE must stretch contrast locally: a tile-dark/tile-bright
        image with small local texture gets its local variation amplified
        in BOTH halves, and output stays in [0, 1]."""
        rng = np.random.default_rng(6)
        img = np.zeros((128, 128), np.float32)
        img[:, :64] = 0.2 + 0.02 * rng.random((128, 64))
        img[:, 64:] = 0.8 + 0.02 * rng.random((128, 64))
        out = np.array(klt.equalize_clahe(jnp.asarray(img)))
        assert np.isfinite(out).all()
        assert out.min() >= 0.0 and out.max() <= 1.0
        # local contrast amplified in the interior of each half
        for sl in (np.s_[32:96, 16:48], np.s_[32:96, 80:112]):
            assert out[sl].std() > 3.0 * img[sl].std(), \
                f"local contrast not amplified: {out[sl].std():.4f}"

    def test_none_is_identity_and_dispatch(self):
        img = texture(h=64, w=64, seed=7)
        np.testing.assert_array_equal(np.array(klt.equalize_method(img, "NONE")),
                                      np.array(img))
        for m in ("HISTOGRAM", "CLAHE", "STRETCH"):
            out = np.array(klt.equalize_method(img, m))
            assert np.isfinite(out).all()
        with pytest.raises(ValueError):
            klt.equalize_method(img, "bogus")

    def test_downsample2(self):
        img = texture(h=130, w=121, seed=8)  # odd dims are truncated
        out = np.array(klt.downsample2(img))
        assert out.shape == (65, 60)
        np.testing.assert_allclose(out.mean(), np.array(img)[:130, :120].mean(),
                                   atol=1e-3)


class TestTrackerOptions:
    def test_det_mask_blocks_half(self):
        """With the right half masked out, no features may live there."""
        from open_vins_tpu.frontend import tracker

        img = texture(h=120, w=160, seed=9)
        mask = jnp.ones((120, 160), bool).at[:, 80:].set(False)
        st = tracker.init_tracker(120, 160, 40)
        st, ids, uv, uvn, ok = tracker.track_frame(
            st, img, jnp.asarray([100.0, 100.0, 80.0, 60.0] + [0.0] * 4),
            klt.KltParams(num_features=40, grid_x=8, grid_y=6),
            first_frame=True, det_mask=mask)
        uv = np.array(uv)[np.array(ok)]
        assert len(uv) > 5, "no detections at all"
        assert (uv[:, 0] < 80.5).all(), f"masked-region detections: {uv}"
        # second frame: tracked points stay out of the masked region too
        st, ids, uv2, uvn2, ok2 = tracker.track_frame(
            st, shift_image(img, 30.0, 0.0),
            jnp.asarray([100.0, 100.0, 80.0, 60.0] + [0.0] * 4),
            klt.KltParams(num_features=40, grid_x=8, grid_y=6),
            det_mask=mask)
        uv2 = np.array(uv2)[np.array(ok2)]
        assert (uv2[:, 0] < 80.5).all()

    def test_track_visualization(self, tmp_path):
        """display_active/display_history parity: debug images render the
        tracked points and the stateful visualizer writes PNGs."""
        from open_vins_tpu.frontend import visualization as vis

        img = np.array(texture(h=120, w=160, seed=11))
        uv = np.array([[20.0, 30.0], [100.0, 80.0], [150.0, 110.0]])
        mask = np.array([True, True, False])
        out = vis.draw_active(img, uv, mask, ids=np.array([3, 7, 9]))
        assert out.shape == (120, 160, 3) and out.dtype == np.uint8
        base = vis._to_u8_bgr(img)
        assert (out != base).any(), "active draw changed nothing"
        # masked-out point untouched
        assert (out[108:113, 148:153] == base[108:113, 148:153]).all()

        v = vis.TrackVisualizer(str(tmp_path), every=2)
        ids = np.array([1, 2, 3])
        for k in range(5):
            uv_k = uv + 3.0 * k
            v.feed(img, ids, uv_k, np.array([True, True, True]))
        import os

        pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
        assert len(pngs) == 3, f"expected 3 debug images, got {pngs}"
        assert all(len(t) <= v.max_trail for t in v.trails.values())

    def test_hist_method_tracks(self):
        """Tracking works under each normalization mode."""
        from open_vins_tpu.frontend import tracker

        img = texture(h=120, w=160, seed=10)
        zeta = jnp.asarray([100.0, 100.0, 80.0, 60.0] + [0.0] * 4)
        params = klt.KltParams(num_features=30, grid_x=8, grid_y=6)
        for m in ("NONE", "HISTOGRAM", "CLAHE"):
            st = tracker.init_tracker(120, 160, 30)
            st, *_ = tracker.track_frame(st, img, zeta, params,
                                         first_frame=True, hist_method=m)
            st, ids, uv, uvn, ok = tracker.track_frame(
                st, shift_image(img, 3.0, 2.0), zeta, params, hist_method=m)
            assert int(np.array(ok).sum()) > 10, f"{m}: lost the features"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
