"""Closed-loop tests for stereo VIO and online camera-IMU calibration
(BASELINE configs 3-4: stereo + SLAM; online extrinsic/intrinsic/time-offset
calibration on perturbed calib — Simulator::perturb_parameters parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator

TRI = tri.TriangulationOptions()


class TestStereo:
    def test_stereo_vio_accuracy(self):
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=2, num_pts=30,
            map_size=1024, duration=8.0, sigma_pix=1.0,
        )
        cfg = FilterConfig(max_clones=11, max_slam=8, num_cams=2,
                           max_msckf_in_update=25)
        sim = simulator.build(params, seed=33)
        run = runner.stage_run(sim, params)
        state, outs = jax.jit(
            lambda r: runner.run_filter(cfg, TRI, sim, params, r)
        )(run)
        ps = np.array(outs[1])
        gt = np.array(run.gt_p)[1:]
        rmse = np.sqrt(((ps - gt) ** 2).sum(1).mean())
        assert np.isfinite(np.array(state.cov)).all()
        assert rmse < 0.08, f"stereo RMSE {rmse:.3f} m"
        # updates must actually engage (with SLAM slots most tracks promote;
        # the MSCKF channel handles the surplus)
        n_msckf = np.array(outs[4].n_msckf)
        n_slam_used = np.array(outs[4].n_slam_used)
        assert (n_msckf + n_slam_used)[20:].mean() > 4, \
            f"updates too sparse: msckf {n_msckf[20:].mean():.1f} " \
            f"slam {n_slam_used[20:].mean():.1f}"


class TestOnlineCalib:
    def _run(self, calib_on, seed=44):
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=40,
            map_size=1024, duration=12.0, sigma_pix=1.0,
        )
        cfg = FilterConfig(
            max_clones=11, max_slam=0, num_cams=1, max_msckf_in_update=30,
            calib_cam_extrinsics=calib_on,
        )
        sim = simulator.build(params, seed=seed)
        run = runner.stage_run(sim, params)

        # perturb the filter's extrinsic calib (truth stays in the sim)
        dth = jnp.asarray([0.01, -0.015, 0.008])
        dp = jnp.asarray([0.01, -0.005, 0.008])
        R_true = sim.cam_R_ItoC[0]
        R_pert = lie.exp_so3(-dth) @ R_true
        p_pert = sim.cam_p_IinC[0] + dp

        from open_vins_tpu.core import ekf
        from open_vins_tpu.models import feature_table as ft
        from open_vins_tpu.models import manager

        state = manager.initialize_from_gt(
            cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
            sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
            lie.rot_2_quat(R_pert)[None], p_pert[None], sim.cam_intr,
        )
        if calib_on:
            # give the calib block its prior uncertainty
            D = cfg.state_dim
            diag = jnp.diagonal(state.cov)
            diag = diag.at[cfg.calib_ext_off : cfg.calib_ext_off + 3].set(0.02**2)
            diag = diag.at[cfg.calib_ext_off + 3 : cfg.calib_ext_off + 6].set(0.02**2)
            state = ekf.set_initial_covariance(state, cfg, diag)
        table = ft.init_table(cfg, 256)

        def body(carry, frame):
            st, tb = carry
            st, tb, diag = manager.step_frame(st, tb, cfg, TRI, frame)
            return (st, tb), (st.p, st.calib_ext_q, st.calib_ext_p)

        (state, table), (ps, eq, ep) = jax.jit(
            lambda s, t, f: jax.lax.scan(body, (s, t), f)
        )(state, table, run.frames)
        return sim, run, state, np.array(ps), R_true, p_pert, dp

    def test_extrinsic_calibration_converges(self):
        sim, run, state, ps, R_true, p_pert, dp = self._run(calib_on=True)
        # final extrinsic must be closer to truth than the perturbed start
        R_est = np.array(lie.quat_2_rot(state.calib_ext_q[0]))
        ang_end = np.linalg.norm(
            np.array(lie.log_so3(jnp.asarray(R_est @ np.array(R_true).T)))
        )
        p_err_end = np.linalg.norm(np.array(state.calib_ext_p[0]) - np.array(sim.cam_p_IinC[0]))
        # initial perturbation: |dth| ≈ 0.0196 rad, |dp| ≈ 0.0137 m.  The
        # rotation must reduce well over half in 12 s; the translation is
        # weakly observable at this excitation (cm-level lever arm — the
        # reference's docs note the same slow convergence) so it must at
        # least not diverge.
        # gate recalibrated 0.008 -> 0.010 for the round-4 consume-on-
        # attempt parity (UpdaterMSCKF.cpp:108-116): every selected full-
        # window row dies after its update attempt, so per-feature windows
        # are shorter and the calib excitation per track slightly lower
        # (measured 0.0084 end error vs 0.0196 initial — still >half)
        assert ang_end < 0.010, f"extrinsic rotation not calibrated: {ang_end}"
        assert p_err_end < 0.016, f"extrinsic translation diverged: {p_err_end}"
        gt = np.array(run.gt_p)[1:]
        rmse = np.sqrt(((ps - gt) ** 2).sum(1).mean())
        # gate recalibrated for the reference-exact FEJ linearization
        # (projection + calib lever-arm Jacobians at first estimates,
        # UpdaterHelper.cpp:353-380): the consistent filter trades a little
        # RMSE on this weakly-excited calib scenario (0.149 vs 0.119 with
        # the old current-estimate projection Jacobian) for the SLAM-NEES
        # fix; see round-2 consistency notes in CLAUDE.md
        assert rmse < 0.18, f"RMSE with online calib {rmse}"

    def test_wrong_calib_without_estimation_hurts(self):
        """Sanity: the same perturbation WITHOUT calibration estimation must
        leave a larger error (shows the calib update is doing real work)."""
        *_, state_off, ps_off, R_true, _, dp = self._run(calib_on=False)
        R_est = np.array(lie.quat_2_rot(state_off.calib_ext_q[0]))
        ang = np.linalg.norm(
            np.array(lie.log_so3(jnp.asarray(R_est @ np.array(R_true).T)))
        )
        # calib must NOT have moved (zero covariance -> zero gain)
        assert ang > 0.015, f"calib moved without being estimated: {ang}"


class TestTimeOffsetCalib:
    """Online camera-IMU time-offset estimation (calib_camimu_dt /
    calib_cam_timeoffset — the Li&Mourikis dt column,
    StateHelper::augment_clone, StateHelper.cpp:598-616).

    The sim stamps measurements in the camera clock with true imu-time
    t_cam + calib_dt; the filter starts at dt_est = 0 with a prior and
    must recover the true offset.  This exercises BOTH the dt covariance
    column and the round-4 first-order clone-mean extension (without the
    mean extension the predicted measurements never respond to dt updates
    and the estimate random-walks — measured 0.024 s drift on a 0 true
    offset)."""

    def _run(self, dt_true, seed=17):
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=40,
            map_size=1024, duration=12.0, sigma_pix=1.0,
        )
        cfg = FilterConfig(
            max_clones=11, max_slam=0, num_cams=1, max_msckf_in_update=30,
            calib_cam_timeoffset=True,
        )
        sim = simulator.build(params, seed=seed, calib_dt=dt_true)
        run = runner.stage_run(sim, params)

        from open_vins_tpu.core import ekf
        from open_vins_tpu.models import feature_table as ft
        from open_vins_tpu.models import manager

        state = manager.initialize_from_gt(
            cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
            sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
            jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
            sim.cam_intr,
        )
        diag = jnp.diagonal(state.cov)
        diag = diag.at[cfg.calib_dt_off].set(0.02**2)
        state = ekf.set_initial_covariance(state, cfg, diag)
        table = ft.init_table(cfg, 256)

        def body(carry, frame):
            st, tb = carry
            st, tb, _ = manager.step_frame(st, tb, cfg, TRI, frame)
            return (st, tb), st.calib_dt

        (state, table), dts = jax.jit(
            lambda s, t, f: jax.lax.scan(body, (s, t), f)
        )(state, table, run.frames)
        return float(state.calib_dt), np.array(dts)

    def test_dt_converges_to_true_offset(self):
        dt_true = 0.008
        dt_end, dts = self._run(dt_true)
        assert abs(dt_end - dt_true) < 0.003, (
            f"dt not calibrated: est {dt_end:.4f} vs true {dt_true:.4f} "
            f"(started at 0)")

    def test_dt_stays_put_when_true_is_zero(self):
        dt_end, dts = self._run(0.0)
        assert abs(dt_end) < 0.003, f"dt drifted from true 0: {dt_end:.4f}"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
