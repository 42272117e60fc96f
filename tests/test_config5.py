"""BASELINE config-5 coverage: fisheye (equidistant) camera simulation,
multi-camera (3-cam binocular) VIO, and distributed BA refinement of the
live filter window (UZH-FPV / KAIST analog capabilities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import manager, runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator

TRI = tri.TriangulationOptions()


def fisheye_calib(num_cams):
    intr = jnp.tile(
        jnp.asarray([278.66, 278.48, 319.75, 241.96, -0.0139, 0.0579,
                     -0.0744, 0.0331]),
        (num_cams, 1),
    )
    Rs, ps = [], []
    for i in range(num_cams):
        w = jnp.asarray([-1.2, 1.2, -1.2]) * (1.0 + 0.02 * i)
        Rs.append(lie.exp_so3(w))
        ps.append(jnp.asarray([0.05 * i, -0.01, 0.02]))
    return intr, jnp.stack(Rs), jnp.stack(ps)


class TestFisheye:
    def test_equidistant_vio(self):
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=40,
            map_size=1024, duration=8.0, sigma_pix=1.0,
            cam_model="equi", width=640, height=480,
        )
        cfg = FilterConfig(max_clones=11, max_slam=0, num_cams=1,
                           max_msckf_in_update=25, cam_model="equi")
        sim = simulator.build(params, seed=55, calib=fisheye_calib(1))
        run = runner.stage_run(sim, params)
        state, outs = jax.jit(
            lambda r: runner.run_filter(cfg, TRI, sim, params, r)
        )(run)
        ps = np.array(outs[1])
        gt = np.array(run.gt_p)[1:]
        rmse = np.sqrt(((ps - gt) ** 2).sum(1).mean())
        assert np.isfinite(np.array(state.cov)).all()
        assert rmse < 0.10, f"fisheye RMSE {rmse:.3f}"


class TestMultiCam:
    def test_three_camera_vio(self):
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=3, num_pts=20,
            map_size=1024, duration=6.0, sigma_pix=1.0,
        )
        cfg = FilterConfig(max_clones=9, max_slam=0, num_cams=3,
                           max_msckf_in_update=25)
        sim = simulator.build(params, seed=56)
        run = runner.stage_run(sim, params)
        state, outs = jax.jit(
            lambda r: runner.run_filter(cfg, TRI, sim, params, r)
        )(run)
        ps = np.array(outs[1])
        gt = np.array(run.gt_p)[1:]
        rmse = np.sqrt(((ps - gt) ** 2).sum(1).mean())
        assert np.isfinite(np.array(state.cov)).all()
        assert rmse < 0.10, f"3-cam RMSE {rmse:.3f}"


class TestWindowRefine:
    @pytest.mark.slow
    def test_distributed_window_refinement(self):
        from open_vins_tpu.core import ekf
        from open_vins_tpu.models import feature_table as ft
        from open_vins_tpu.parallel import mesh as meshlib
        from open_vins_tpu.parallel import window_refine

        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=40,
            map_size=1024, duration=3.0, sigma_pix=1.0,
        )
        cfg = FilterConfig(max_clones=11, max_slam=0, num_cams=1,
                           max_msckf_in_update=20)
        sim = simulator.build(params, seed=57)
        run = runner.stage_run(sim, params)
        state = manager.initialize_from_gt(
            cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
            sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
            jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
            sim.cam_intr,
        )
        table = ft.init_table(cfg, 128)
        step = jax.jit(lambda s, t, f: manager.step_frame(s, t, cfg, TRI, f))
        for k in range(30):
            f = jax.tree_util.tree_map(lambda a: a[k], run.frames)
            state, table, _ = step(state, table, f)

        mesh = meshlib.make_mesh((8,), ("ba",))
        R, p, lms, e0, e1 = window_refine.refine_window(
            state, cfg, table, TRI, manager.gather_feature_obs,
            mesh=mesh, max_landmarks=64, iters=3,
        )
        assert np.isfinite(np.array(p)).all()
        assert float(e1) <= float(e0) + 1e-6, \
            f"refinement increased rms: {float(e0)} -> {float(e1)}"
        # refined poses must stay near the filter window (already good)
        d = np.array(p) - np.array(state.clones_p)
        assert np.abs(d[np.array(state.clone_valid)]).max() < 0.3


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
