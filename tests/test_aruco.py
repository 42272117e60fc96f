"""ArUco tracker tests (TrackAruco parity): detection of rendered markers
with the deterministic 4*tag_id+corner feature-id contract."""

import numpy as np
import pytest

from open_vins_tpu.frontend import aruco

pytestmark = pytest.mark.skipif(not aruco.available(),
                                reason="cv2.aruco not available")


def scene_with_markers(tags=(7, 23), size=100):
    img = np.full((480, 640), 180, np.uint8)
    for i, t in enumerate(tags):
        m = aruco.render_marker(t, size)
        y, x = 60, 60 + i * 260
        img[y : y + size, x : x + size] = m
    return img


def test_detects_markers_with_id_contract():
    img = scene_with_markers()
    tr = aruco.ArucoTracker()
    ids, uv, mask = tr.detect(img, 64)
    got_tags = set((ids[mask] // 4).tolist())
    assert got_tags == {7, 23}, f"tags {got_tags}"
    # 4 corners per tag, ids 4t..4t+3
    for t in (7, 23):
        corner_ids = sorted(ids[mask][(ids[mask] // 4) == t].tolist())
        assert corner_ids == [4 * t, 4 * t + 1, 4 * t + 2, 4 * t + 3]
    # corners must lie inside the marker bounding boxes
    for t, x0 in [(7, 60), (23, 320)]:
        pts = uv[mask][(ids[mask] // 4) == t]
        assert pts[:, 0].min() > x0 - 5 and pts[:, 0].max() < x0 + 105
        assert pts[:, 1].min() > 55 and pts[:, 1].max() < 165


def test_ids_stable_across_frames():
    img = scene_with_markers(tags=(3,))
    tr = aruco.ArucoTracker()
    ids1, uv1, m1 = tr.detect(img, 16)
    # shift the scene; ids must persist (same tag -> same ids)
    img2 = np.roll(img, 15, axis=1)
    ids2, uv2, m2 = tr.detect(img2, 16)
    assert set(ids1[m1]) == set(ids2[m2]) == {12, 13, 14, 15}
    # corners moved by the shift
    d = uv2[m2][np.argsort(ids2[m2])] - uv1[m1][np.argsort(ids1[m1])]
    np.testing.assert_allclose(d[:, 0], 15.0, atol=1.5)


def test_empty_scene():
    tr = aruco.ArucoTracker()
    ids, uv, mask = tr.detect(np.full((240, 320), 128, np.uint8), 16)
    assert mask.sum() == 0
