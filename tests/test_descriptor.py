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
