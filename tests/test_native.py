"""Native host runtime tests: C++ sensor hub window packing vs the pure
python reference, EuRoC loader on a synthetic ASL tree."""

import os

import numpy as np
import pytest

from open_vins_tpu.utils import native

if not native.available():
    try:
        native.build()
    except Exception:
        pass

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


class TestSensorHub:
    def test_window_matches_python(self):
        rng = np.random.default_rng(0)
        hub = native.SensorHub()
        t = np.arange(0.0, 2.0, 0.005)
        w = rng.normal(size=(len(t), 3))
        a = rng.normal(size=(len(t), 3))
        for i in range(len(t)):
            hub.feed_imu(t[i], w[i], a[i])
        assert hub.imu_count() == len(t)

        from open_vins_tpu.models.propagator import make_window

        t0, t1, K = 0.5012, 0.5523, 16
        n, wt, ww, wa = hub.make_window(t0, t1, K)
        assert n > 2
        ref = make_window(t, w, a, t0, t1, K)
        np.testing.assert_allclose(wt, np.array(ref.t), atol=1e-9)
        np.testing.assert_allclose(ww, np.array(ref.w), atol=1e-6)
        np.testing.assert_allclose(wa, np.array(ref.a), atol=1e-6)

    def test_incomplete_stream_returns_zero(self):
        hub = native.SensorHub()
        hub.feed_imu(0.0, np.zeros(3), np.zeros(3))
        hub.feed_imu(0.1, np.zeros(3), np.zeros(3))
        n, *_ = hub.make_window(0.05, 0.5, 8)
        assert n == 0

    def test_prune(self):
        hub = native.SensorHub()
        for i in range(100):
            hub.feed_imu(i * 0.01, np.zeros(3), np.zeros(3))
        hub.prune(0.5)
        assert hub.imu_count() < 60
        # still windowable after the horizon
        n, *_ = hub.make_window(0.6, 0.7, 16)
        assert n > 2


class TestEurocLoader:
    def _make_tree(self, root):
        import cv2

        os.makedirs(f"{root}/mav0/imu0", exist_ok=True)
        os.makedirs(f"{root}/mav0/cam0/data", exist_ok=True)
        with open(f"{root}/mav0/imu0/data.csv", "w") as f:
            f.write("#timestamp,wx,wy,wz,ax,ay,az\n")
            for i in range(20):
                f.write(f"{int(1e18)+i*5000000},0.1,0.2,0.3,0.0,0.0,9.81\n")
        with open(f"{root}/mav0/cam0/data.csv", "w") as f:
            f.write("#timestamp,filename\n")
            for i in range(3):
                tns = int(1e18) + i * 50000000
                fn = f"{tns}.png"
                img = (np.arange(48 * 64).reshape(48, 64) % 256).astype(np.uint8)
                cv2.imwrite(f"{root}/mav0/cam0/data/{fn}", img)
                f.write(f"{tns},{fn}\n")

    def test_load(self, tmp_path):
        self._make_tree(str(tmp_path))
        ds = native.EurocDataset(str(tmp_path), num_cams=1)
        t, w, a = ds.imu()
        assert len(t) == 20
        np.testing.assert_allclose(w[0], [0.1, 0.2, 0.3])
        np.testing.assert_allclose(a[:, 2], 9.81)
        ct = ds.cam_times(0)
        assert len(ct) == 3
        img = ds.load_image(0, 1)
        assert img is not None and img.shape == (48, 64)
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_prefetch_matches_sync(self, tmp_path):
        """Decode-ahead worker returns bit-identical frames to the
        synchronous path, in order, with fallback on re-reads and
        skip-ahead consumption."""
        self._make_tree(str(tmp_path))
        ds = native.EurocDataset(str(tmp_path), num_cams=1)
        sync = [ds.load_image(0, i) for i in range(3)]
        assert ds.prefetch_start(num_cams=1, start=0, depth=2)
        for i in range(3):
            img = ds.prefetch_get(0, i)
            np.testing.assert_array_equal(img, sync[i])
        # past-the-end returns None; re-read falls back to sync decode
        assert ds.prefetch_get(0, 99) is None
        np.testing.assert_array_equal(ds.prefetch_get(0, 1), sync[1])
        ds.prefetch_stop()
        # after stop, prefetch_get still works (pure sync fallback)
        np.testing.assert_array_equal(ds.prefetch_get(0, 2), sync[2])

    def test_prefetch_skip_ahead(self, tmp_path):
        """Jumping the consumer forward drops stale slots without
        deadlocking the bounded ring."""
        self._make_tree(str(tmp_path))
        ds = native.EurocDataset(str(tmp_path), num_cams=1)
        ref = ds.load_image(0, 2)
        assert ds.prefetch_start(num_cams=1, start=0, depth=1)
        np.testing.assert_array_equal(ds.prefetch_get(0, 2), ref)
        ds.prefetch_stop()
