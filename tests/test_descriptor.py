"""Descriptor tracker tests (TrackDescriptor parity): patch-NCC matching
with ratio/symmetry tests across shifted frames."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.frontend import descriptor, klt
from tests.test_frontend import texture, shift_image

PARAMS = klt.KltParams(grid_x=8, grid_y=6, min_px_dist=14)
ZETA = jnp.asarray([300.0, 300.0, 160.0, 120.0, 0.0, 0.0, 0.0, 0.0])


def test_match_identical_frames():
    img = texture(h=240, w=320, seed=1)
    pts, ok = klt.detect_grid(img, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                              PARAMS, 40)
    d = descriptor.extract(img, pts, ok)
    idx, matched = descriptor.match(d, d, ok, ok)
    m = np.array(matched)
    # the ratio test correctly drops self-similar texture patches; most
    # distinctive corners must still self-match
    assert m.sum() >= 0.7 * int(np.array(ok).sum())
    np.testing.assert_array_equal(np.array(idx)[m], np.arange(40)[m])


def test_tracking_across_shift():
    base = texture(h=240, w=320, seed=2)
    st = descriptor.init_tracker(50)
    shifts = [(0, 0), (4, 2), (8, 4)]
    ids_hist, pts_hist = [], []
    for k, (dx, dy) in enumerate(shifts):
        img = shift_image(base, float(dx), float(dy))
        st, ids, uv, uvn, mask = descriptor.track_frame(
            st, img, ZETA, PARAMS, first_frame=(k == 0))
        ids_hist.append(np.array(ids))
        pts_hist.append(np.array(uv))
        assert int(np.array(mask).sum()) > 20
    s1 = set(ids_hist[1][ids_hist[1] >= 0].tolist())
    s2 = set(ids_hist[2][ids_hist[2] >= 0].tolist())
    keep = len(s1 & s2) / max(1, len(s1))
    assert keep > 0.5, f"descriptor track survival {keep}"
    # matched displacement equals the true shift
    errs = []
    for fid in sorted(s1 & s2)[:15]:
        p1 = pts_hist[1][ids_hist[1] == fid][0]
        p2 = pts_hist[2][ids_hist[2] == fid][0]
        errs.append(np.abs((p2 - p1) - np.array([4.0, 2.0])).max())
    assert np.median(errs) < 1.5, f"median match displacement err {np.median(errs)}"


def test_no_false_matches_on_unrelated_images():
    a = texture(h=240, w=320, seed=3)
    b = texture(h=240, w=320, seed=4)
    pa, oka = klt.detect_grid(a, jnp.zeros((1, 2)), jnp.zeros(1, bool), PARAMS, 40)
    pb, okb = klt.detect_grid(b, jnp.zeros((1, 2)), jnp.zeros(1, bool), PARAMS, 40)
    da = descriptor.extract(a, pa, oka)
    db = descriptor.extract(b, pb, okb)
    _, matched = descriptor.match(da, db, oka, okb, min_score=0.7)
    # a handful of chance correlations is expected (RANSAC rejects them
    # downstream, as in the reference); most must be rejected here
    assert int(np.array(matched).sum()) < 8


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_rotation_invariant_matching():
    """Steered patches must survive in-plane camera roll (the reference gets
    this from ORB steering, TrackDescriptor.cpp ORB; plain NCC patches fail
    here)."""
    from tests.test_frontend import texture, rotate_image, rotate_points
    from open_vins_tpu.frontend import klt as _klt

    img0 = texture(seed=9)
    h, w = img0.shape
    params = _klt.KltParams(num_features=40, grid_x=8, grid_y=6)
    pts0, ok0 = _klt.detect_grid(img0, jnp.zeros((1, 2)),
                                 jnp.zeros(1, bool), params, 40)
    # keep points whose rotated image stays in-frame for every test angle
    for deg in (30.0, 90.0):
        img1 = rotate_image(img0, deg)
        pts1 = jnp.asarray(rotate_points(np.array(pts0), deg, h, w),
                           jnp.float32)
        inb = ((pts1[:, 0] > 12) & (pts1[:, 0] < w - 12)
               & (pts1[:, 1] > 12) & (pts1[:, 1] < h - 12)) & ok0
        d0 = descriptor.extract(img0, pts0, inb)
        d1 = descriptor.extract(img1, pts1, inb)
        idx1, matched = descriptor.match(d0, d1, inb, inb)
        m = np.array(matched)
        assert m.sum() > 0.6 * np.array(inb).sum(), (
            f"rot {deg}: only {m.sum()}/{np.array(inb).sum()} matched")
        # matches must be the true correspondence (same index)
        correct = np.array(idx1)[m] == np.where(m)[0]
        assert correct.mean() > 0.95, f"rot {deg}: wrong correspondences"


def test_scale_parameter_samples_wider():
    """The scale hook used for cross-pyramid matching changes the lattice."""
    from tests.test_frontend import texture

    img = texture(seed=10)
    pts = jnp.asarray([[160.0, 120.0], [100.0, 80.0]])
    ok = jnp.ones(2, bool)
    d1 = descriptor.extract(img, pts, ok, scale=1.0)
    d2 = descriptor.extract(img, pts, ok, scale=2.0)
    assert not np.allclose(np.array(d1), np.array(d2))
    # moderate scale change is tolerated by normalized patches
    _, matched = descriptor.match(d1, descriptor.extract(
        img, pts, ok, scale=1.15), ok, ok)
    assert np.array(matched).all()
