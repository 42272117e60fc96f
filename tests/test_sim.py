"""Tests for the SE(3) B-spline and the seeded simulator.

Reference test strategy being mirrored: test_sim_repeat (bitwise determinism,
ov_msckf/src/test_sim_repeat.cpp:134-154) and test_sim_meas (measurement
consistency vs the spline, ov_msckf/src/test_sim_meas.cpp:60-80).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.ops import cameras, lie
from open_vins_tpu.sim import bspline, simulator


def make_spline(x64=False):
    t, R, p = simulator.sine_trajectory(30.0)
    return bspline.fit(t, R, p)


class TestBspline:
    def test_pose_orthonormal(self):
        sp = make_spline()
        for t in [1.0, 5.3, 12.77, 25.0]:
            R, p = bspline.pose(sp, jnp.asarray(t))
            np.testing.assert_allclose(
                np.array(R @ R.T), np.eye(3), atol=1e-5
            )

    def test_velocity_matches_finite_diff(self):
        sp = make_spline()
        eps = 1e-3
        for t in [2.0, 7.5, 20.1]:
            w, v = bspline.velocity(sp, jnp.asarray(t))
            Rp, pp = bspline.pose(sp, jnp.asarray(t + eps))
            Rm, pm = bspline.pose(sp, jnp.asarray(t - eps))
            v_fd = (np.array(pp) - np.array(pm)) / (2 * eps)
            np.testing.assert_allclose(np.array(v), v_fd, atol=1e-3)
            # w: R^T Rdot = skew(w)
            R, _ = bspline.pose(sp, jnp.asarray(t))
            Rdot_fd = (np.array(Rp) - np.array(Rm)) / (2 * eps)
            w_fd = np.array(lie.unskew(jnp.asarray(np.array(R).T @ Rdot_fd)))
            np.testing.assert_allclose(np.array(w), w_fd, atol=1e-3)

    def test_acceleration_matches_finite_diff(self):
        sp = make_spline()
        eps = 1e-2
        for t in [3.0, 11.3]:
            _, _, _, a = bspline.acceleration(sp, jnp.asarray(t))
            _, vp = bspline.velocity(sp, jnp.asarray(t + eps))
            _, vm = bspline.velocity(sp, jnp.asarray(t - eps))
            a_fd = (np.array(vp) - np.array(vm)) / (2 * eps)
            np.testing.assert_allclose(np.array(a), a_fd, atol=5e-3)

    def test_imu_at_rest_measures_gravity(self):
        """A static trajectory must yield ω=0, a_m = +g up in body frame
        (z-up world, OpenVINS gravity convention)."""
        n = 40
        t = jnp.arange(n) * 0.5
        R = jnp.tile(jnp.eye(3), (n, 1, 1))
        p = jnp.tile(jnp.asarray([1.0, 2.0, 3.0]), (n, 1))
        sp = bspline.fit(t, R, p)
        g = jnp.asarray([0.0, 0.0, 9.81])
        w, am = bspline.imu_measurement(sp, jnp.asarray(5.0), g)
        np.testing.assert_allclose(np.array(w), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.array(am), [0.0, 0.0, 9.81], atol=1e-5)


PARAMS = simulator.SimParams(
    imu_rate=200.0, cam_rate=20.0, num_cams=2, num_pts=24, map_size=512,
    duration=5.0,
)


class TestSimulator:
    def test_bitwise_repeatability(self):
        """Two builds with the same seed must agree bit-for-bit
        (test_sim_repeat contract)."""
        s1 = simulator.build(PARAMS, seed=42)
        s2 = simulator.build(PARAMS, seed=42)
        for step in [0, 7, 500]:
            a = simulator.get_imu(s1, PARAMS, step)
            b = simulator.get_imu(s2, PARAMS, step)
            assert np.array_equal(np.array(a.wm), np.array(b.wm))
            assert np.array_equal(np.array(a.am), np.array(b.am))
        for frame in [0, 3, 60]:
            fa = simulator.get_cam(s1, PARAMS, frame)
            fb = simulator.get_cam(s2, PARAMS, frame)
            assert np.array_equal(np.array(fa.uvs), np.array(fb.uvs))
            assert np.array_equal(np.array(fa.ids), np.array(fb.ids))

    def test_different_seed_differs(self):
        s1 = simulator.build(PARAMS, seed=1)
        s2 = simulator.build(PARAMS, seed=2)
        a = simulator.get_imu(s1, PARAMS, 5)
        b = simulator.get_imu(s2, PARAMS, 5)
        assert not np.allclose(np.array(a.wm), np.array(b.wm))

    def test_imu_noise_free_matches_spline(self):
        p0 = PARAMS._replace(sigma_w=0.0, sigma_wb=0.0, sigma_a=0.0, sigma_ab=0.0)
        sim = simulator.build(p0, seed=0)
        s = simulator.get_imu(sim, p0, 100)
        t_abs = sim.t_start + 100 / p0.imu_rate
        w_true, a_true = bspline.imu_measurement(sim.spline, t_abs, sim.gravity)
        np.testing.assert_allclose(np.array(s.wm), np.array(w_true), atol=1e-6)
        np.testing.assert_allclose(np.array(s.am), np.array(a_true), atol=1e-6)

    def test_cam_measurements_reproject(self):
        """Noise-free uv must equal the projection of the map point
        (test_sim_meas contract)."""
        p0 = PARAMS._replace(sigma_pix=0.0)
        sim = simulator.build(p0, seed=3)
        frame = simulator.get_cam(sim, p0, 10)
        t_abs = sim.t_start + 10 / p0.cam_rate + sim.calib_dt
        R_ItoG, p_IinG = bspline.pose(sim.spline, t_abs)
        for ci in range(p0.num_cams):
            ids = np.array(frame.ids[ci])
            mask = np.array(frame.mask[ci])
            valid = mask & (ids >= 0)
            assert valid.sum() >= 10, "expected at least 10 visible features"
            pts = np.array(sim.map_pts)[ids[valid]]
            R_GtoI = np.array(R_ItoG).T
            p_C = (
                np.array(sim.cam_R_ItoC[ci]) @ (R_GtoI @ (pts - np.array(p_IinG)).T)
            ).T + np.array(sim.cam_p_IinC[ci])
            uvn = p_C[:, :2] / p_C[:, 2:3]
            uv = np.array(
                cameras.distort(p0.cam_model, sim.cam_intr[ci], jnp.asarray(uvn))
            )
            np.testing.assert_allclose(
                np.array(frame.uvs[ci])[valid], uv, atol=1e-3
            )

    def test_ids_persist_across_frames(self):
        sim = simulator.build(PARAMS, seed=4)
        f0 = simulator.get_cam(sim, PARAMS, 20)
        f1 = simulator.get_cam(sim, PARAMS, 21)
        ids0 = set(np.array(f0.ids[0])[np.array(f0.mask[0])].tolist())
        ids1 = set(np.array(f1.ids[0])[np.array(f1.mask[0])].tolist())
        overlap = len(ids0 & ids1) / max(1, len(ids0))
        assert overlap > 0.5, f"track continuity too low: {overlap}"

    def test_jit_scan_full_run(self):
        """The whole sensor stream must generate under one jit scan."""
        sim = simulator.build(PARAMS, seed=5)

        @jax.jit
        def gen_all():
            imu = jax.vmap(lambda n: simulator.get_imu(sim, PARAMS, n))(
                jnp.arange(simulator.n_imu_steps(PARAMS))
            )
            cams = jax.vmap(lambda k: simulator.get_cam(sim, PARAMS, k))(
                jnp.arange(simulator.n_cam_frames(PARAMS))
            )
            return imu, cams

        imu, cams = gen_all()
        assert np.all(np.isfinite(np.array(imu.wm)))
        assert np.all(np.isfinite(np.array(cams.uvs)))
        # every frame must have a healthy number of visible features
        per_frame = np.array(cams.mask[:, 0]).sum(axis=-1)
        assert per_frame.min() >= 10, f"min features/frame {per_frame.min()}"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestPerturbCalib:
    """Simulator::perturb_parameters parity (Simulator.cpp:209-265)."""

    def test_seeded_and_scaled(self):
        params = simulator.SimParams(num_cams=2, duration=4.0)
        calib = simulator.default_calib(params)
        a = simulator.perturb_calib(3, calib, imu_intrinsics=True,
                                    g_sensitivity=True)
        b = simulator.perturb_calib(3, calib, imu_intrinsics=True,
                                    g_sensitivity=True)
        for x, y in zip(a, b):
            assert np.allclose(np.array(x), np.array(y))
        c = simulator.perturb_calib(4, calib)
        assert not np.allclose(np.array(a.cam_intr), np.array(c.cam_intr))
        # scales: focal/center sigma 1.0 px, ext pos 0.01 m, ext rot 1e-3
        d_inr = np.abs(np.array(a.cam_intr - calib[0]))
        assert d_inr[:, :4].max() < 6.0 and d_inr[:, 4:].max() < 0.03
        assert np.abs(np.array(a.cam_p_IinC - calib[2])).max() < 0.05
        dR = np.array(a.cam_R_ItoC[0] @ calib[1][0].T)
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.006
        # imu intrinsics move only when asked
        assert not np.allclose(np.array(a.imu_dw),
                               np.array([1, 0, 0, 1, 0, 1.0]))
        assert np.allclose(np.array(c.imu_tg), np.zeros(9))

    def test_flows_into_filter_init(self):
        from open_vins_tpu.core.layout import FilterConfig
        from open_vins_tpu.models import manager
        from open_vins_tpu.ops import lie as _lie
        params = simulator.SimParams(num_cams=1, duration=4.0)
        calib = simulator.default_calib(params)
        pert = simulator.perturb_calib(5, calib)
        cfg = FilterConfig(max_clones=4, num_cams=1, calib_cam_extrinsics=True)
        st = manager.initialize_from_gt(
            cfg, jnp.asarray([0.0, 0, 0, 1]), jnp.zeros(3), jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3), 0.0,
            jax.vmap(_lie.rot_2_quat)(pert.cam_R_ItoC), pert.cam_p_IinC,
            pert.cam_intr)
        assert np.allclose(np.array(st.calib_intr), np.array(pert.cam_intr))
        assert np.allclose(np.array(st.calib_ext_p),
                           np.array(pert.cam_p_IinC))


class TestSkipUntilMotion:
    def test_start_advances_past_stationary_phase(self):
        """distance_threshold > 0 must move the sim start past an initial
        stationary stretch (Simulator.cpp:80-109 skip-until-motion)."""
        import jax.numpy as jnp

        dt = 0.1
        n = 200
        t = jnp.arange(n) * dt
        # stationary for 8 s, then constant-velocity drive
        moving = jnp.maximum(t - 8.0, 0.0)
        p = jnp.stack([moving * 1.0, jnp.zeros_like(t), jnp.ones_like(t)],
                      axis=-1)
        R = jnp.tile(jnp.eye(3), (n, 1, 1))
        params = simulator.SimParams(duration=5.0, map_size=64, num_pts=8,
                                     start_offset=1.0,
                                     distance_threshold=0.5)
        sim = simulator.build(params, seed=0, traj=(t, R, p))
        # 0.5 m at 1 m/s from t=8 → start must be past ~8.3 s
        assert float(sim.t_start) > 8.0, f"t_start {float(sim.t_start)}"
        params0 = params._replace(distance_threshold=0.0)
        sim0 = simulator.build(params0, seed=0, traj=(t, R, p))
        assert float(sim0.t_start) < 2.5  # fixed-offset behavior unchanged
