"""Tests for the evaluation suite: alignment recovery, ATE/RPE/NEES sanity,
trajectory file IO round trips (ov_eval parity)."""

import os

import numpy as np
import pytest

from open_vins_tpu.eval import metrics, traj_io
from open_vins_tpu.eval import alignment
from open_vins_tpu.eval.alignment import align_trajectory, apply_alignment


def make_traj(n=200, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * 0.05
    p = np.stack([np.sin(0.3 * t) * 5, np.cos(0.3 * t) * 5, 0.5 * t], axis=1)
    yaw = 0.3 * t
    R = np.zeros((n, 3, 3))
    R[:, 0, 0] = np.cos(yaw)
    R[:, 0, 1] = -np.sin(yaw)
    R[:, 1, 0] = np.sin(yaw)
    R[:, 1, 1] = np.cos(yaw)
    R[:, 2, 2] = 1.0
    return t, p, R


class TestAlignment:
    @pytest.mark.parametrize("method,scale", [("se3", 1.0), ("sim3", 1.7)])
    def test_recovers_transform(self, method, scale):
        t, p, R = make_traj()
        rng = np.random.default_rng(1)
        w = rng.normal(size=3)
        from scipy.spatial.transform import Rotation as Rot
        R_true = Rot.from_rotvec(w).as_matrix()
        t_true = rng.normal(size=3) * 10
        # est = transform applied to gt (so aligning est onto gt inverts it)
        p_est = (np.linalg.inv(R_true) @ ((p - t_true).T / scale)).T
        R_est = np.einsum("ij,njk->nik", np.linalg.inv(R_true), R)
        s, Ra, ta = align_trajectory(p_est, p, method)
        p_a, _ = apply_alignment(p_est, R_est, s, Ra, ta)
        np.testing.assert_allclose(p_a, p, atol=1e-9)
        assert s == pytest.approx(scale, rel=1e-9)

    def test_posyaw_recovers_yaw_only(self):
        t, p, R = make_traj()
        yaw = 0.7
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        p_est = (Rz.T @ (p - np.array([1.0, 2.0, 3.0])).T).T
        s, Ra, ta = align_trajectory(p_est, p, "posyaw")
        p_a, _ = apply_alignment(p_est, R, s, Ra, ta)
        np.testing.assert_allclose(p_a, p, atol=1e-9)


class TestMetrics:
    def test_ate_zero_for_identical(self):
        _, p, R = make_traj()
        o, e = metrics.ate(p, R, p, R, method="se3")
        assert o.rmse < 1e-9 and e.rmse < 1e-9

    def test_ate_detects_offset_after_none(self):
        _, p, R = make_traj()
        o, e = metrics.ate(p + 0.1, R, p, R, method="none")
        assert e.rmse == pytest.approx(np.sqrt(3) * 0.1, rel=1e-6)

    def test_rpe_zero_for_identical(self):
        _, p, R = make_traj(400)
        seg = metrics.rpe(p, R, p, R, segment_lengths=(8.0, 16.0))
        for L, (so, sp) in seg.items():
            # arccos near 1 has sqrt-of-eps sensitivity: 1e-6 deg is "zero"
            assert so.rmse < 1e-5 and sp.rmse < 1e-9

    def test_nees_unit_for_matched_noise(self):
        rng = np.random.default_rng(3)
        n = 2000
        sig_th, sig_p = 0.01, 0.05
        _, p, R = make_traj(n)
        from scipy.spatial.transform import Rotation as Rot
        dth = rng.normal(size=(n, 3)) * sig_th
        dp = rng.normal(size=(n, 3)) * sig_p
        # gt = est perturbed consistently with the JPL-left convention:
        # δθ = -log(R_gt R_estᵀ)  →  R_gt = exp(-δθ) R_est
        R_gt = np.einsum("nij,njk->nik", Rot.from_rotvec(-dth).as_matrix(), R)
        p_gt = p + dp
        cov6 = np.tile(np.diag([sig_th**2] * 3 + [sig_p**2] * 3), (n, 1, 1))
        so, sp_, sf = metrics.nees(p, R, p_gt, R_gt, cov6)
        assert so.mean == pytest.approx(3.0, rel=0.1)
        assert sp_.mean == pytest.approx(3.0, rel=0.1)
        assert sf.mean == pytest.approx(6.0, rel=0.1)


class TestIO:
    def test_tum_roundtrip(self, tmp_path):
        t, p, R = make_traj(50)
        q = traj_io.rot_to_quat_xyzw(R)
        path = tmp_path / "traj.txt"
        traj_io.save_tum(path, t, p, q)
        t2, p2, q2 = traj_io.load_tum(path)
        np.testing.assert_allclose(t2, t, atol=1e-8)
        np.testing.assert_allclose(p2, p, atol=1e-5)
        R2 = traj_io.quat_xyzw_to_rot(q2)
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_quat_rot_roundtrip(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=(100, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        R = traj_io.quat_xyzw_to_rot(q)
        q2 = traj_io.rot_to_quat_xyzw(R)
        dot = np.abs(np.sum(q * q2, axis=1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-12)

    def test_euroc_conversion(self, tmp_path):
        csv = tmp_path / "data.csv"
        with open(csv, "w") as f:
            f.write("#timestamp,p,q,v,bw,ba\n")
            for i in range(5):
                tns = int(1.4e18) + i * int(5e7)
                f.write(f"{tns},1.0,2.0,{i*0.1},1.0,0.0,0.0,0.0,"
                        "0.1,0.2,0.3,0.001,0.002,0.003,0.01,0.02,0.03\n")
        out = tmp_path / "out.txt"
        traj_io.euroc_to_tum(csv, out)
        t, p, q = traj_io.load_tum(out)
        assert len(t) == 5
        np.testing.assert_allclose(p[:, 0], 1.0)
        np.testing.assert_allclose(q[0], [0, 0, 0, 1], atol=1e-9)


class TestEvalCLIs:
    """The eval CLIs must run end-to-end on repo-produced artifacts
    (error_dataset / timing_flamegraph / timing_comparison / pose_to_file /
    live_align_trajectory parity, /root/reference/ov_eval/src/)."""

    def _write_runs(self, tmp_path):
        t, p, R = make_traj(300, seed=5)
        q = traj_io.rot_to_quat_xyzw(R)
        gt = tmp_path / "gt.txt"
        traj_io.save_tum(gt, t, p, q)
        algos = tmp_path / "algorithms"
        rng = np.random.default_rng(6)
        for algo, sigma in [("ours", 0.01), ("noisy", 0.05)]:
            d = algos / algo
            d.mkdir(parents=True)
            for run in range(2):
                pe = p + rng.normal(size=p.shape) * sigma
                traj_io.save_tum(d / f"run{run}.txt", t, pe, q)
        return gt, algos, (t, p, q)

    def test_ate_2d(self):
        _, p, R = make_traj(100)
        yaw, pos = metrics.ate_2d(p + [0.0, 0.0, 9.0], R, p, R, "posyaw")
        # pure z offset: zero planar error after alignment
        assert pos.rmse < 1e-6 and yaw.rmse < 1e-6

    def test_error_dataset_cli(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "examples"))
        import error_dataset
        gt, algos, _ = self._write_runs(tmp_path)
        results = error_dataset.evaluate("se3", str(gt), str(algos),
                                         segments=(2.0, 4.0))
        assert set(results) == {"ours", "noisy"}
        assert len(results["ours"][1]) == 2  # two runs evaluated
        assert np.mean(results["ours"][1]) < np.mean(results["noisy"][1])

    def test_timing_clis(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "examples"))
        from open_vins_tpu.utils.timing import FrameTimer
        import timing_comparison
        import timing_flamegraph
        csvs = []
        for name in ("a", "b"):
            path = tmp_path / f"{name}.csv"
            timer = FrameTimer(str(path))
            for k in range(20):
                timer.start_frame()
                timer.stage("tracking")
                timer.stage("propagation")
                timer.stage("msckf")
                timer.end_frame(k * 0.05)
            timer.close()
            csvs.append(str(path))
        rows = timing_comparison.compare(csvs)
        assert rows and rows[0][0] == "tracking"
        timing_flamegraph.flamegraph(csvs[0])  # prints; must not raise

    def test_pose_to_file_and_live_align(self, tmp_path):
        import io
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "examples"))
        import live_align_trajectory
        import pose_to_file
        gt, _, (t, p, q) = self._write_runs(tmp_path)
        # stream poses (with a yaw+offset disturbance) through pose_to_file
        yaw = 0.4
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        p_est = (Rz.T @ (p - [1.0, -2.0, 0.5]).T).T
        R_est = np.einsum("ij,njk->nik", Rz.T, traj_io.quat_xyzw_to_rot(q))
        q_est = traj_io.rot_to_quat_xyzw(R_est)
        lines = "\n".join(
            " ".join(f"{v:.9f}" for v in [t[i], *p_est[i], *q_est[i]])
            for i in range(len(t))
        )
        est = tmp_path / "est.txt"
        n = pose_to_file.record(io.StringIO(lines), str(est))
        assert n == len(t)
        out = tmp_path / "aligned.txt"
        ok = live_align_trajectory.align_once("posyaw", str(gt), str(est),
                                              str(out))
        assert ok
        t2, p2, _ = traj_io.load_tum(out)
        err = np.linalg.norm(p2 - p, axis=1)
        assert np.sqrt((err**2).mean()) < 1e-6


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestSingleAlignment:
    """First-pose gauge alignment (AlignTrajectory *_single variants)."""

    def _traj(self, seed=0):
        rng = np.random.default_rng(seed)
        t = np.linspace(0, 10, 60)
        gt_p = np.stack([np.sin(t), np.cos(t), 0.1 * t], -1)
        # a rigid transform of gt is the estimate
        ang = 0.7
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        dt = np.array([1.0, -2.0, 0.5])
        est_p = (R.T @ (gt_p - dt).T).T
        return est_p, gt_p, R

    def test_se3_single_exact_on_rigid_offset(self):
        est_p, gt_p, R = self._traj()
        gt_R0 = np.eye(3)
        est_R0 = R.T @ gt_R0
        s, Ra, ta = alignment.align_trajectory(
            est_p, gt_p, "se3_single", est_R0=est_R0, gt_R0=gt_R0)
        p_al, _ = alignment.apply_alignment(est_p, np.tile(np.eye(3), (1, 1, 1)), s, Ra, ta)
        assert np.abs(p_al - gt_p).max() < 1e-9

    def test_posyaw_single_exact_on_yaw_offset(self):
        est_p, gt_p, R = self._traj()  # R is yaw-only by construction
        gt_R0 = np.eye(3)
        est_R0 = R.T @ gt_R0
        s, Ra, ta = alignment.align_trajectory(
            est_p, gt_p, "posyaw_single", est_R0=est_R0, gt_R0=gt_R0)
        p_al, _ = alignment.apply_alignment(est_p, np.tile(np.eye(3), (1, 1, 1)), s, Ra, ta)
        assert np.abs(p_al - gt_p).max() < 1e-9

    def test_single_requires_rotations(self):
        est_p, gt_p, _ = self._traj()
        import pytest as _pytest
        with _pytest.raises(ValueError):
            alignment.align_trajectory(est_p, gt_p, "se3_single")
