"""Config system: loads the reference's three-file YAML layout.

Capability parity with ov_core::YamlParser + VioManagerOptions
(utils/opencv_yaml_parse.h:58-280, core/VioManagerOptions.h): an
`estimator_config.yaml` plus `kalibr_imu_chain.yaml` and
`kalibr_imucam_chain.yaml` (referenced by relative path) are parsed into the
TPU build's typed configs — FilterConfig, SimParams-compatible noise, and
calibration arrays.  Existing OpenVINS config directories (e.g.
config/euroc_mav) load unmodified.

Strict-mode parity: `load()` raises KeyError on missing required keys
(the reference aborts startup via `successful()`).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import yaml

from open_vins_tpu.core.layout import FilterConfig


def _load_yaml(path):
    with open(path) as f:
        text = f.read()
    # OpenCV-YAML files start with "%YAML:1.0" which pyyaml rejects
    lines = [l for l in text.splitlines() if not l.startswith("%YAML")]
    return yaml.safe_load("\n".join(lines))


class CameraCalib(NamedTuple):
    model: str  # "radtan" | "equi"
    intrinsics: np.ndarray  # [8] = fx fy cx cy d0..d3
    R_ItoC: np.ndarray  # [3,3]
    p_IinC: np.ndarray  # [3]
    resolution: tuple  # (w, h)


class ImuCalib(NamedTuple):
    sigma_w: float
    sigma_wb: float
    sigma_a: float
    sigma_ab: float
    rate: float


class VioConfig(NamedTuple):
    filter: FilterConfig
    cams: list  # list[CameraCalib]
    imu: ImuCalib
    calib_dt: float
    use_stereo: bool
    downsample_cameras: bool
    init_window_time: float
    init_imu_thresh: float
    try_zupt: bool


def load(config_path: str) -> VioConfig:
    """Load an estimator_config.yaml (reference layout) into typed configs."""
    base = os.path.dirname(os.path.abspath(config_path))
    est = _load_yaml(config_path)

    def req(d, key):
        if key not in d:
            raise KeyError(f"missing required config key: {key}")
        return d[key]

    imu_file = os.path.join(base, req(est, "relative_config_imu"))
    cam_file = os.path.join(base, req(est, "relative_config_imucam"))
    imu_y = _load_yaml(imu_file)["imu0"]
    cam_y = _load_yaml(cam_file)

    num_cams = int(req(est, "max_cameras"))
    cams = []
    for i in range(num_cams):
        c = cam_y[f"cam{i}"]
        # kalibr chains carry either T_imu_cam (R_CtoI, p_CinI — EuRoC style)
        # or T_cam_imu (R_ItoC, p_IinC — TUM-VI style)
        if "T_imu_cam" in c:
            T_CtoI = np.asarray(c["T_imu_cam"], dtype=np.float64)
            R_ItoC = T_CtoI[:3, :3].T
            p_IinC = -R_ItoC @ T_CtoI[:3, 3]
        else:
            T_ItoC = np.asarray(c["T_cam_imu"], dtype=np.float64)
            R_ItoC = T_ItoC[:3, :3]
            p_IinC = T_ItoC[:3, 3]
        intr4 = np.asarray(c["intrinsics"], dtype=np.float64)
        dist = np.asarray(c["distortion_coeffs"], dtype=np.float64)
        model = "equi" if c.get("distortion_model") == "equidistant" else "radtan"
        cams.append(CameraCalib(
            model=model,
            intrinsics=np.concatenate([intr4, dist]).astype(np.float32),
            R_ItoC=R_ItoC.astype(np.float32),
            p_IinC=p_IinC.astype(np.float32),
            resolution=tuple(c["resolution"]),
        ))

    imu = ImuCalib(
        sigma_w=float(imu_y["gyroscope_noise_density"]),
        sigma_wb=float(imu_y["gyroscope_random_walk"]),
        sigma_a=float(imu_y["accelerometer_noise_density"]),
        sigma_ab=float(imu_y["accelerometer_random_walk"]),
        rate=float(imu_y.get("update_rate", 200.0)),
    )

    cam_model = cams[0].model if cams else "radtan"
    fil = FilterConfig(
        max_clones=int(req(est, "max_clones")),
        max_slam=int(req(est, "max_slam")),
        num_cams=num_cams,
        max_msckf_in_update=int(est.get("max_msckf_in_update", 40)),
        calib_cam_timeoffset=bool(est.get("calib_cam_timeoffset", False)),
        calib_cam_extrinsics=bool(est.get("calib_cam_extrinsics", False)),
        calib_cam_intrinsics=bool(est.get("calib_cam_intrinsics", False)),
        calib_imu_intrinsics=bool(est.get("calib_imu_intrinsics", False)),
        calib_imu_g_sensitivity=bool(est.get("calib_imu_g_sensitivity", False)),
        use_fej=bool(est.get("use_fej", True)),
        use_zupt=bool(est.get("try_zupt", False)),
        cam_model=cam_model,
        sigma_w=imu.sigma_w, sigma_wb=imu.sigma_wb,
        sigma_a=imu.sigma_a, sigma_ab=imu.sigma_ab,
        sigma_pix=float(est.get("up_msckf_sigma_px", 1.0)),
        gravity_mag=float(est.get("gravity_mag", 9.81)),
        chi2_multiplier=float(est.get("up_msckf_chi2_multipler", 1.0)),
    )

    return VioConfig(
        filter=fil,
        cams=cams,
        imu=imu,
        calib_dt=float(est.get("calib_camimu_dt", 0.0)),
        use_stereo=bool(est.get("use_stereo", num_cams > 1)),
        downsample_cameras=bool(est.get("downsample_cameras", False)),
        init_window_time=float(est.get("init_window_time", 1.0)),
        init_imu_thresh=float(est.get("init_imu_thresh", 1.0)),
        try_zupt=bool(est.get("try_zupt", False)),
    )
