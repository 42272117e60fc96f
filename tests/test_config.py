"""Config loader tests against the reference's real config trees
(YamlParser / VioManagerOptions parity)."""

import os

import numpy as np
import pytest

from open_vins_tpu.utils import config

REF = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not mounted"
)


def test_euroc_config():
    c = config.load(f"{REF}/euroc_mav/estimator_config.yaml")
    assert c.filter.max_clones == 11
    assert c.filter.max_slam == 50
    assert c.filter.num_cams == 2
    assert c.filter.use_fej
    assert c.cams[0].model == "radtan"
    np.testing.assert_allclose(
        c.cams[0].intrinsics[:4], [458.654, 457.296, 367.215, 248.375]
    )
    assert c.imu.sigma_w == pytest.approx(1.6968e-4)
    for cam in c.cams:
        np.testing.assert_allclose(
            cam.R_ItoC @ cam.R_ItoC.T, np.eye(3), atol=1e-5
        )


def test_tumvi_fisheye_config():
    c = config.load(f"{REF}/tum_vi/estimator_config.yaml")
    assert c.cams[0].model == "equi"
    assert c.filter.num_cams == 2
    assert c.filter.calib_cam_timeoffset


def test_all_reference_configs_parse():
    count = 0
    for d in sorted(os.listdir(REF)):
        path = f"{REF}/{d}/estimator_config.yaml"
        if os.path.exists(path):
            c = config.load(path)
            assert c.filter.max_clones > 0
            assert len(c.cams) == c.filter.num_cams
            count += 1
    assert count >= 10, f"only {count} dataset configs parsed"


def test_missing_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("max_clones: 5\n")
    with pytest.raises(KeyError):
        config.load(str(p))
