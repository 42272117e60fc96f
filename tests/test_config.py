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


def _write_min_config(tmp_path, imu_extra):
    """Minimal 3-file config tree with the given kalibr_imu_chain extras."""
    (tmp_path / "kalibr_imu_chain.yaml").write_text(
        "imu0:\n"
        "  accelerometer_noise_density: 2.0e-3\n"
        "  accelerometer_random_walk: 3.0e-3\n"
        "  gyroscope_noise_density: 1.7e-4\n"
        "  gyroscope_random_walk: 1.9e-5\n"
        "  update_rate: 200.0\n" + imu_extra)
    (tmp_path / "kalibr_imucam_chain.yaml").write_text(
        "cam0:\n"
        "  T_cam_imu:\n"
        "    - [1.0, 0.0, 0.0, 0.0]\n"
        "    - [0.0, 1.0, 0.0, 0.0]\n"
        "    - [0.0, 0.0, 1.0, 0.0]\n"
        "    - [0.0, 0.0, 0.0, 1.0]\n"
        "  intrinsics: [400.0, 400.0, 320.0, 240.0]\n"
        "  distortion_coeffs: [0.0, 0.0, 0.0, 0.0]\n"
        "  distortion_model: radtan\n"
        "  resolution: [640, 480]\n")
    p = tmp_path / "estimator_config.yaml"
    p.write_text(
        "relative_config_imu: kalibr_imu_chain.yaml\n"
        "relative_config_imucam: kalibr_imucam_chain.yaml\n"
        "max_cameras: 1\nmax_clones: 11\nmax_slam: 25\n")
    return str(p)


def test_imu_model_and_seeded_intrinsics(tmp_path):
    """model: rpng + non-identity Tw/Ta/Tg/R_IMUtoACC must seed the state
    initial values (StateOptions.h:141-146, VioManagerOptions.h:306-353):
    dw/da hold inv(Tw)/inv(Ta) packed upper-triangular, tg is column-major,
    and q_acc holds R_ACCtoIMU = R_IMUtoACC^T."""
    path = _write_min_config(tmp_path, (
        "  model: \"rpng\"\n"
        "  Tw:\n"
        "    - [ 1.02, 0.01, -0.003 ]\n"
        "    - [ 0.0, 0.98, 0.004 ]\n"
        "    - [ 0.0, 0.0, 1.01 ]\n"
        "  Ta:\n"
        "    - [ 0.99, 0.002, 0.0 ]\n"
        "    - [ 0.0, 1.03, -0.001 ]\n"
        "    - [ 0.0, 0.0, 0.97 ]\n"
        "  Tg:\n"
        "    - [ 0.001, 0.0, 0.0 ]\n"
        "    - [ 0.0, 0.002, 0.0 ]\n"
        "    - [ 0.0, 0.0, 0.003 ]\n"
        "  R_IMUtoACC:\n"
        "    - [ 1.0, 0.0, 0.0 ]\n"
        "    - [ 0.0, 0.0, -1.0 ]\n"
        "    - [ 0.0, 1.0, 0.0 ]\n"))
    c = config.load(path, warn_unknown=False)
    assert c.imu.model == "rpng"
    assert c.filter.imu_model == "rpng"
    Tw = np.array([[1.02, 0.01, -0.003], [0, 0.98, 0.004], [0, 0, 1.01]])
    Dw = np.linalg.inv(Tw)
    np.testing.assert_allclose(
        c.imu.dw,
        [Dw[0, 0], Dw[0, 1], Dw[1, 1], Dw[0, 2], Dw[1, 2], Dw[2, 2]],
        atol=1e-9)
    np.testing.assert_allclose(c.imu.tg, [0.001, 0, 0, 0, 0.002, 0, 0, 0,
                                          0.003], atol=1e-12)
    # q_acc: quat of R_ACCtoIMU = R_IMUtoACC^T
    from open_vins_tpu.ops import lie
    import jax.numpy as jnp
    R_back = np.array(lie.quat_2_rot(jnp.asarray(c.imu.q_acc)))
    R_expect = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]]).T
    np.testing.assert_allclose(R_back, R_expect, atol=1e-6)
    # kalibr stays default when no model key present
    path2 = _write_min_config(tmp_path, "")
    c2 = config.load(path2, warn_unknown=False)
    assert c2.imu.model == "kalibr"
    np.testing.assert_allclose(c2.imu.dw, [1, 0, 0, 1, 0, 1], atol=1e-12)


def test_seed_imu_intrinsics_state():
    """manager.seed_imu_intrinsics applies the loaded values verbatim."""
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.core.state import init_state
    from open_vins_tpu.models import manager

    imu = config.ImuCalib(
        sigma_w=1e-4, sigma_wb=1e-5, sigma_a=1e-3, sigma_ab=1e-3, rate=200.0,
        model="rpng", dw=(1.1, 0.0, 0.9, 0.0, 0.0, 1.0),
        da=(1.0, 0.1, 1.0, 0.0, 0.0, 1.0), tg=(0.01,) + (0.0,) * 8,
        q_gyro=(0.0, 0.0, 0.0, 1.0), q_acc=(0.1, 0.0, 0.0, 0.995))
    st = init_state(FilterConfig(max_clones=4, max_slam=0))
    st = manager.seed_imu_intrinsics(st, imu)
    np.testing.assert_allclose(np.array(st.imu_dw),
                               [1.1, 0.0, 0.9, 0.0, 0.0, 1.0], atol=1e-7)
    np.testing.assert_allclose(np.array(st.imu_q_acc),
                               [0.1, 0.0, 0.0, 0.995], atol=1e-7)
