"""IMU intrinsic calibration tests (StateOptions::do_calib_imu_intrinsics
parity, KALIBR model): measurement correction math and closed-loop gyro
scale/skew convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core import ekf
from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.core.state import init_state
from open_vins_tpu.models import feature_table as ft
from open_vins_tpu.models import manager, runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.models.propagator import (_lower_tri, correct_imu,
                                             imu_intrinsic_mats)
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator

TRI = tri.TriangulationOptions()


class TestCorrection:
    def test_identity_is_noop(self):
        cfg = FilterConfig(max_clones=4, max_slam=0)
        st = init_state(cfg)
        st = st._replace(bg=jnp.asarray([0.01, -0.02, 0.03]),
                         ba=jnp.asarray([0.1, 0.2, -0.1]))
        w = jnp.asarray([0.5, -0.3, 0.2])
        a = jnp.asarray([0.1, 9.8, 0.3])
        w_hat, a_hat, _, _ = correct_imu(st, w, a)
        np.testing.assert_allclose(np.array(w_hat), np.array(w - st.bg), atol=1e-6)
        np.testing.assert_allclose(np.array(a_hat), np.array(a - st.ba), atol=1e-6)

    def test_kalibr_model_structure(self):
        cfg = FilterConfig(max_clones=4, max_slam=0)
        st = init_state(cfg)
        dw = jnp.asarray([1.02, 0.01, -0.005, 0.98, 0.002, 1.01])
        tg = jnp.asarray(np.arange(9, dtype=np.float32) * 1e-3)
        st = st._replace(imu_dw=dw, imu_tg=tg)
        Dw, Da, Tg, R_w, R_a = imu_intrinsic_mats(st)
        np.testing.assert_allclose(np.array(Dw), [[1.02, 0, 0],
                                                  [0.01, 0.98, 0],
                                                  [-0.005, 0.002, 1.01]])
        # column-major Tg: Tg[i,j] = tg[3j+i]
        np.testing.assert_allclose(np.array(Tg)[1, 2], 7e-3, atol=1e-9)
        w = jnp.asarray([0.5, -0.3, 0.2])
        a = jnp.asarray([0.1, 9.8, 0.3])
        w_hat, a_hat, u_w, u_a = correct_imu(st, w, a)
        expect_a = np.array(Da) @ np.array(a)
        np.testing.assert_allclose(np.array(a_hat), expect_a, atol=1e-6)
        expect_w = np.array(Dw) @ (np.array(w) - np.array(Tg) @ expect_a)
        np.testing.assert_allclose(np.array(w_hat), expect_w, atol=1e-5)


class TestClosedLoopCalib:
    def test_gyro_scale_convergence(self):
        """Feed measurements distorted by a known gyro scale; the estimated
        Dw must converge toward the inverse distortion."""
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=40,
            map_size=1024, duration=15.0, sigma_pix=1.0,
        )
        cfg = FilterConfig(max_clones=11, max_slam=0, num_cams=1,
                           max_msckf_in_update=30, calib_imu_intrinsics=True)
        sim = simulator.build(params, seed=77)
        run = runner.stage_run(sim, params)

        # physical gyro: w_m = S w_true (+noise, biases ~0 here)
        S = np.array([[1.03, 0.0, 0.0], [0.01, 0.97, 0.0], [0.0, 0.005, 1.02]])
        w_dist = jnp.einsum("ij,fkj->fki", jnp.asarray(S, jnp.float32),
                            run.frames.win.w)
        frames = run.frames._replace(win=run.frames.win._replace(w=w_dist))
        run = run._replace(frames=frames)

        state = manager.initialize_from_gt(
            cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
            sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
            jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
            sim.cam_intr,
        )
        # prior on the Dw block (+ loose gyro-frame rotation prior)
        D = cfg.state_dim
        diag = jnp.diagonal(state.cov)
        diag = diag.at[cfg.imu_dw_off : cfg.imu_dw_off + 6].set(0.05**2)
        diag = diag.at[cfg.imu_thw_off : cfg.imu_thw_off + 3].set(1e-6)
        state = ekf.set_initial_covariance(state, cfg, diag)

        table = ft.init_table(cfg, 256)

        def body(carry, frame):
            st, tb = carry
            st, tb, d = manager.step_frame(st, tb, cfg, TRI, frame)
            return (st, tb), st.imu_dw

        (state, table), dw_hist = jax.jit(
            lambda s, t, f: jax.lax.scan(body, (s, t), f)
        )(state, table, run.frames)

        assert bool(jnp.isfinite(state.cov).all())
        S_inv = np.linalg.inv(S)
        dw_true = np.array([S_inv[0, 0], S_inv[1, 0], S_inv[2, 0],
                            S_inv[1, 1], S_inv[2, 1], S_inv[2, 2]])
        dw0 = np.array([1, 0, 0, 1, 0, 1.0])
        e0 = np.linalg.norm(dw0 - dw_true)
        e1 = np.linalg.norm(np.array(state.imu_dw) - dw_true)
        assert e1 < 0.5 * e0, f"Dw not converging: {e0:.4f} -> {e1:.4f} " \
                              f"(est {np.array(state.imu_dw)})"

    def test_intrinsics_frozen_without_flag(self):
        """Zero covariance on the block must keep Dw exactly at its prior."""
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=24,
            map_size=512, duration=3.0,
        )
        cfg = FilterConfig(max_clones=7, max_slam=0, num_cams=1,
                           max_msckf_in_update=15)
        sim = simulator.build(params, seed=78)
        run = runner.stage_run(sim, params)
        state, outs = jax.jit(
            lambda r: runner.run_filter(cfg, TRI, sim, params, r)
        )(run)
        np.testing.assert_array_equal(
            np.array(state.imu_dw), np.array([1, 0, 0, 1, 0, 1], np.float32)
        )


class TestRpngModel:
    """RPNG IMU model (StateOptions::ImuModel::RPNG): upper-triangular
    Dw/Da + estimated accelerometer frame (State.h:91-116)."""

    def test_rpng_model_structure(self):
        cfg = FilterConfig(max_clones=4, max_slam=0, imu_model="rpng")
        st = init_state(cfg)
        dw = jnp.asarray([1.02, 0.01, 0.98, -0.005, 0.002, 1.01])
        st = st._replace(imu_dw=dw)
        Dw, Da, Tg, R_w, R_a = imu_intrinsic_mats(st, "rpng")
        np.testing.assert_allclose(np.array(Dw), [[1.02, 0.01, -0.005],
                                                  [0, 0.98, 0.002],
                                                  [0, 0, 1.01]])
        w = jnp.asarray([0.5, -0.3, 0.2])
        a = jnp.asarray([0.1, 9.8, 0.3])
        w_hat, a_hat, _, _ = correct_imu(st, w, a, model="rpng")
        np.testing.assert_allclose(np.array(w_hat), np.array(Dw) @ np.array(w),
                                   atol=1e-5)

    def test_acc_frame_rotation_applied(self):
        """rpng: â = R_a Da (a−ba); the accel rotation must show up."""
        cfg = FilterConfig(max_clones=4, max_slam=0, imu_model="rpng")
        st = init_state(cfg)
        w_rot = jnp.asarray([0.0, 0.0, 0.1])
        q_acc = lie.rot_2_quat(lie.exp_so3(w_rot))
        st = st._replace(imu_q_acc=q_acc)
        a = jnp.asarray([1.0, 0.0, 0.0])
        _, a_hat, _, _ = correct_imu(st, jnp.zeros(3), a, model="rpng")
        expect = np.array(lie.exp_so3(w_rot)) @ np.array(a)
        np.testing.assert_allclose(np.array(a_hat), expect, atol=1e-6)

    def test_h_scale6_upper_vs_fd(self):
        """RPNG H_Dw layout vs finite differences of upper_tri(d) u."""
        from open_vins_tpu.models.propagator import _H_scale6, _upper_tri

        rng = np.random.default_rng(3)
        d = jnp.asarray(rng.normal(size=6), jnp.float32)
        u = jnp.asarray(rng.normal(size=3), jnp.float32)
        H = np.array(_H_scale6(u, "rpng"))
        eps = 1e-3
        for k in range(6):
            dd = jnp.zeros(6).at[k].set(eps)
            fd = (np.array(_upper_tri(d + dd) @ u)
                  - np.array(_upper_tri(d) @ u)) / eps
            np.testing.assert_allclose(H[:, k], fd, atol=1e-3)

    @pytest.mark.parametrize("model", [
        pytest.param("kalibr", marks=pytest.mark.slow),  # duplicate of
        # TestClosedLoopCalib::test_gyro_scale_convergence in the default set
        "rpng"])
    def test_gyro_scale_convergence_both_models(self, model):
        """VERDICT round-2 #5 done-criterion: recover a perturbed
        non-identity Tw (gyro scale) under both IMU models."""
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=40,
            map_size=1024, duration=12.0, sigma_pix=1.0,
        )
        cfg = FilterConfig(max_clones=11, max_slam=0, num_cams=1,
                           max_msckf_in_update=30, calib_imu_intrinsics=True,
                           imu_model=model)
        sim = simulator.build(params, seed=79)
        run = runner.stage_run(sim, params)

        # physical gyro applies S (upper-tri so both packings represent its
        # inverse exactly): w_m = S w_true
        S = np.array([[1.03, 0.01, 0.0], [0.0, 0.97, 0.005], [0.0, 0.0, 1.02]])
        w_dist = jnp.einsum("ij,fkj->fki", jnp.asarray(S, jnp.float32),
                            run.frames.win.w)
        frames = run.frames._replace(win=run.frames.win._replace(w=w_dist))
        run = run._replace(frames=frames)

        state = manager.initialize_from_gt(
            cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
            sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
            jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
            sim.cam_intr,
        )
        diag = jnp.diagonal(state.cov)
        diag = diag.at[cfg.imu_dw_off : cfg.imu_dw_off + 6].set(0.05**2)
        diag = diag.at[cfg.imu_thw_off : cfg.imu_thw_off + 3].set(1e-6)
        state = ekf.set_initial_covariance(state, cfg, diag)
        table = ft.init_table(cfg, 256)

        def body(carry, frame):
            st, tb = carry
            st, tb, d = manager.step_frame(st, tb, cfg, TRI, frame)
            return (st, tb), None

        (state, table), _ = jax.jit(
            lambda s, t, f: jax.lax.scan(body, (s, t), f)
        )(state, table, run.frames)

        assert bool(jnp.isfinite(state.cov).all())
        S_inv = np.linalg.inv(S)
        if model == "kalibr":
            dw_true = np.array([S_inv[0, 0], S_inv[1, 0], S_inv[2, 0],
                                S_inv[1, 1], S_inv[2, 1], S_inv[2, 2]])
            dw0 = np.array([1, 0, 0, 1, 0, 1.0])
        else:
            dw_true = np.array([S_inv[0, 0], S_inv[0, 1], S_inv[1, 1],
                                S_inv[0, 2], S_inv[1, 2], S_inv[2, 2]])
            dw0 = np.array([1, 0, 1, 0, 0, 1.0])
        e0 = np.linalg.norm(dw0 - dw_true)
        e1 = np.linalg.norm(np.array(state.imu_dw) - dw_true)
        assert e1 < 0.5 * e0, f"{model}: Dw not converging: " \
                              f"{e0:.4f} -> {e1:.4f} " \
                              f"(est {np.array(state.imu_dw)})"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
