"""Tracker orchestration test: full KLT front-end over a synthetic rendered
sequence, checking id continuity and flow accuracy (TrackKLT parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.frontend import klt, tracker
from tests.test_frontend import texture, shift_image

PARAMS = klt.KltParams(num_pyr=4, win=7, iters=12, grid_x=8, grid_y=6,
                       min_px_dist=12)
ZETA = jnp.asarray([300.0, 300.0, 160.0, 120.0, 0.0, 0.0, 0.0, 0.0])


def test_tracking_sequence():
    base = texture(h=240, w=320, seed=7)
    P = 60
    st = tracker.init_tracker(240, 320, P)
    shifts = [(0.0, 0.0), (3.0, 1.5), (6.5, 2.5), (9.0, 4.5), (12.5, 6.0)]
    all_ids = []
    all_pts = []
    for k, (dx, dy) in enumerate(shifts):
        img = shift_image(base, dx, dy)
        st, ids, uv, uvn, mask = tracker.track_frame(
            st, img, ZETA, PARAMS, first_frame=(k == 0)
        )
        all_ids.append(np.array(ids))
        all_pts.append(np.array(uv))
        n = int(np.array(mask).sum())
        assert n > 25, f"frame {k}: only {n} features"

    # id continuity: most ids survive consecutive frames
    s1 = set(all_ids[1][all_ids[1] >= 0].tolist())
    s3 = set(all_ids[3][all_ids[3] >= 0].tolist())
    keep = len(s1 & s3) / max(1, len(s1))
    assert keep > 0.6, f"track survival too low: {keep}"

    # flow accuracy: common ids between frames 1 and 3 moved by the true
    # relative shift (9-3, 4.5-1.5) = (6, 3)
    common = sorted(s1 & s3)[:20]
    errs = []
    for fid in common:
        p1 = all_pts[1][all_ids[1] == fid][0]
        p3 = all_pts[3][all_ids[3] == fid][0]
        errs.append(np.abs((p3 - p1) - np.array([6.0, 3.0])).max())
    assert np.median(errs) < 0.5, f"median flow err {np.median(errs)}"


def test_redetection_fills_budget():
    base = texture(h=240, w=320, seed=8)
    st = tracker.init_tracker(240, 320, 40)
    st, ids, uv, uvn, mask = tracker.track_frame(
        st, base, ZETA, PARAMS, first_frame=True
    )
    n0 = int(np.array(mask).sum())
    # big jump kills most tracks; budget must be refilled by detection
    img2 = shift_image(base, 150.0, 90.0)
    st, ids, uv, uvn, mask = tracker.track_frame(st, img2, ZETA, PARAMS)
    n1 = int(np.array(mask).sum())
    assert n1 > 0.5 * n0, f"budget not refilled: {n0} -> {n1}"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_stereo_pair_tracking():
    """Right-eye measurements = left shifted by a known disparity."""
    base = texture(h=240, w=320, seed=9)
    disparity = 7.0
    st = tracker.init_tracker(240, 320, 50)
    for k, (dx, dy) in enumerate([(0.0, 0.0), (3.0, 1.0)]):
        img_l = shift_image(base, dx, dy)
        img_r = shift_image(base, dx - disparity, dy)  # right eye shifted
        st, ids, uv, uvn, mask = tracker.track_frame_stereo(
            st, img_l, img_r, ZETA, ZETA, PARAMS, first_frame=(k == 0))
    m = np.array(mask)
    assert m[0].sum() > 25, "left eye lost features"
    assert m[1].sum() > 15, f"stereo join too sparse: {m[1].sum()}"
    both = m[0] & m[1]
    d = np.array(uv)[0][both] - np.array(uv)[1][both]
    assert np.abs(np.median(d[:, 0]) - disparity) < 0.3, \
        f"disparity {np.median(d[:, 0])}"
    assert np.abs(np.median(d[:, 1])) < 0.3
    # shared ids across the pair
    ids_np = np.array(ids)
    np.testing.assert_array_equal(ids_np[0][both], ids_np[1][both])
