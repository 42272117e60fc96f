"""Full-pipeline smoke test: synthetic EuRoC-format dataset (rendered moving
texture + consistent IMU) through examples/run_euroc.py — the serial-replay
entry point (ros1_serial_msckf parity)."""

import os
import subprocess
import sys

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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_dataset(root, n_frames=12, rate_cam=10.0, rate_imu=100.0):
    """Constant-velocity camera over a textured plane: images shift
    linearly, accel is pure gravity, gyro is zero."""
    import cv2

    from tests.test_frontend import texture, shift_image
    import jax.numpy as jnp

    os.makedirs(f"{root}/mav0/imu0", exist_ok=True)
    os.makedirs(f"{root}/mav0/cam0/data", exist_ok=True)
    base = np.array(texture(h=240, w=320, seed=3))
    t0 = 1.0e9  # ns scale kept small-ish for float64 seconds
    with open(f"{root}/mav0/imu0/data.csv", "w") as f:
        f.write("#t,w,a\n")
        n_imu = int(n_frames * rate_imu / rate_cam) + 20
        for i in range(n_imu):
            tns = int(t0 + i * 1e9 / rate_imu)
            f.write(f"{tns},0,0,0,0.0,0.0,9.81\n")
    with open(f"{root}/mav0/cam0/data.csv", "w") as f:
        f.write("#t,fn\n")
        for k in range(n_frames):
            tns = int(t0 + k * 1e9 / rate_cam)
            img = np.array(shift_image(jnp.asarray(base), 2.0 * k, 1.0 * k))
            fn = f"{tns}.png"
            cv2.imwrite(f"{root}/mav0/cam0/data/{fn}",
                        (img * 255).astype(np.uint8))
            f.write(f"{tns},{fn}\n")


def write_config(path, extra=""):
    cfgdir = os.path.dirname(path)
    with open(os.path.join(cfgdir, "kalibr_imu_chain.yaml"), "w") as f:
        f.write(
            "imu0:\n"
            "  gyroscope_noise_density: 1.7e-4\n"
            "  gyroscope_random_walk: 2.0e-5\n"
            "  accelerometer_noise_density: 2.0e-3\n"
            "  accelerometer_random_walk: 3.0e-3\n"
            "  update_rate: 100\n"
        )
    with open(os.path.join(cfgdir, "kalibr_imucam_chain.yaml"), "w") as f:
        f.write(
            "cam0:\n"
            "  T_imu_cam:\n"
            "    - [1.0, 0.0, 0.0, 0.0]\n"
            "    - [0.0, 1.0, 0.0, 0.0]\n"
            "    - [0.0, 0.0, 1.0, 0.0]\n"
            "    - [0.0, 0.0, 0.0, 1.0]\n"
            "  camera_model: pinhole\n"
            "  distortion_model: radtan\n"
            "  distortion_coeffs: [0.0, 0.0, 0.0, 0.0]\n"
            "  intrinsics: [300.0, 300.0, 160.0, 120.0]\n"
            "  resolution: [320, 240]\n"
        )
    with open(path, "w") as f:
        f.write(
            "max_cameras: 1\nmax_clones: 6\nmax_slam: 0\n"
            "max_msckf_in_update: 15\nuse_fej: true\n"
            "init_window_time: 0.5\ninit_imu_thresh: 0.5\n"
            "relative_config_imu: kalibr_imu_chain.yaml\n"
            "relative_config_imucam: kalibr_imucam_chain.yaml\n"
            + extra
        )


def test_run_euroc_smoke(tmp_path):
    ds = tmp_path / "dataset"
    build_dataset(str(ds))
    cfg = tmp_path / "estimator_config.yaml"
    write_config(str(cfg))
    out = tmp_path / "est.txt"
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_euroc.py"),
         str(ds), "--config", str(cfg), "--out", str(out), "--cpu",
         "--num-pts", "40"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert out.exists(), r.stdout
    from open_vins_tpu.eval import traj_io
    t, p, q = traj_io.load_tum(str(out))
    assert len(t) >= 5
    assert np.all(np.isfinite(p))
    # gravity-only IMU + shifting images: the filter must stay bounded
    assert np.abs(p).max() < 10.0, f"diverged: {p}"


def test_run_euroc_tracker_options(tmp_path):
    """Exercises the four previously-unconsumed TrackerConfig options
    end-to-end (VERDICT round-2 #6): downsample_cameras halves the working
    resolution, histogram_method=CLAHE drives the adaptive equalizer,
    track_frequency=5 Hz drops ~half of the 10 Hz frames, and use_mask
    blocks the left quarter of the image via mask0."""
    import cv2

    ds = tmp_path / "dataset"
    build_dataset(str(ds), n_frames=24)
    # mask: left quarter masked OUT (value 255 = ignore, >127 threshold)
    mask = np.zeros((240, 320), np.uint8)
    mask[:, :80] = 255
    cv2.imwrite(str(tmp_path / "mask0.png"), mask)
    cfg = tmp_path / "estimator_config.yaml"
    write_config(str(cfg), extra=(
        "downsample_cameras: true\n"
        "histogram_method: \"CLAHE\"\n"
        "track_frequency: 5.0\n"
        "use_mask: true\n"
        "mask0: mask0.png\n"
    ))
    out = tmp_path / "est.txt"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_euroc.py"),
         str(ds), "--config", str(cfg), "--out", str(out), "--cpu",
         "--num-pts", "40"],
        capture_output=True, text=True, timeout=900, env=dict(os.environ),
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert out.exists(), r.stdout
    assert "skipped" in r.stdout, "track_frequency throttle never fired:\n" \
        + r.stdout
    from open_vins_tpu.eval import traj_io
    t, p, q = traj_io.load_tum(str(out))
    assert np.all(np.isfinite(p))
