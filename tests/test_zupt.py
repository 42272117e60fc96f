"""Zero-velocity update tests: stationary detection, bias correction,
moving-platform rejection (UpdaterZeroVelocity parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import feature_table as ft
from open_vins_tpu.models import manager, runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.models import updater_zupt as zupt
from open_vins_tpu.models.propagator import ImuWindow
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import bspline, simulator

CFG = FilterConfig(max_clones=5, max_slam=0, num_cams=1, use_zupt=True)


def static_window(n=11, dt=0.005, bg=None, ba=None, q=None):
    """IMU window from a perfectly stationary platform."""
    g = 9.81
    R = lie.quat_2_rot(q) if q is not None else jnp.eye(3)
    w = jnp.zeros((n, 3)) + (bg if bg is not None else 0.0)
    a = jnp.tile(R @ jnp.asarray([0.0, 0.0, g]), (n, 1)) + (
        ba if ba is not None else 0.0
    )
    t = jnp.arange(n) * dt
    return ImuWindow(t=t, w=w, a=a)


def make_state(v=0.0):
    from open_vins_tpu.core.state import init_state
    from open_vins_tpu.core import ekf

    st = init_state(CFG)
    st = st._replace(v=jnp.asarray([v, 0.0, 0.0]))
    D = CFG.state_dim
    diag = jnp.zeros(D).at[:15].set(
        jnp.concatenate([jnp.full(3, 1e-3), jnp.full(3, 1e-4), jnp.full(3, 1e-2),
                         jnp.full(3, 1e-3), jnp.full(3, 1e-2)])
    )
    return ekf.set_initial_covariance(st, CFG, diag)


class TestZupt:
    def test_stationary_accepted(self):
        st = make_state()
        win = static_window()
        st2, acc = zupt.try_zupt(st, CFG, win, 0.05, jnp.asarray(0.0))
        assert bool(acc)
        assert float(st2.t) == pytest.approx(0.05)

    def test_moving_rejected_by_velocity(self):
        st = make_state(v=1.0)
        win = static_window()
        _, acc = zupt.try_zupt(st, CFG, win, 0.05, jnp.asarray(0.0))
        assert not bool(acc)

    def test_rotating_rejected_by_chi2(self):
        st = make_state()
        win = static_window()
        win = win._replace(w=win.w + jnp.asarray([0.5, 0.0, 0.0]))
        _, acc = zupt.try_zupt(st, CFG, win, 0.05, jnp.asarray(0.0))
        assert not bool(acc)

    def test_disparity_gate(self):
        st = make_state()
        win = static_window()
        _, acc = zupt.try_zupt(st, CFG, win, 0.05, jnp.asarray(5.0))
        assert not bool(acc)

    def test_bias_corrected_towards_truth(self):
        """With a gyro bias error, the ZUPT must pull bg toward the truth."""
        bg_true = jnp.asarray([0.02, -0.01, 0.015])
        st = make_state()  # filter believes bg = 0
        win = static_window(bg=bg_true)
        st2, acc = zupt.try_zupt(st, CFG, win, 0.05, jnp.asarray(0.0))
        assert bool(acc)
        err0 = float(jnp.linalg.norm(st.bg - bg_true))
        err1 = float(jnp.linalg.norm(st2.bg - bg_true))
        assert err1 < 0.3 * err0, f"bias err {err0} -> {err1}"

    def test_step_frame_with_zupt_compiles(self):
        """The lax.cond-wrapped step must jit and run on a moving sim."""
        params = simulator.SimParams(duration=2.0, map_size=256, num_pts=16,
                                     cam_rate=10.0, imu_rate=100.0)
        cfg = CFG._replace(max_clones=5)
        sim = simulator.build(params, seed=3)
        run = runner.stage_run(sim, params)
        state = manager.initialize_from_gt(
            cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
            sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
            jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
            sim.cam_intr,
        )
        table = ft.init_table(cfg, 64)
        step = jax.jit(lambda s, t, f: manager.step_frame(
            s, t, cfg, tri.TriangulationOptions(), f))
        for k in range(5):
            f = jax.tree_util.tree_map(lambda a: a[k], run.frames)
            state, table, diag = step(state, table, f)
        assert bool(jnp.isfinite(state.cov).all())
        # the sim trajectory is moving -> clones must have been created
        assert int(state.n_clones) == 5


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestZuptExplicit:
    """Two-clone explicit zero-motion variant
    (UpdaterZeroVelocity.cpp:279-324)."""

    CFG_E = CFG._replace(zupt_explicit_motion=True)

    def _state_with_clone(self, v=0.0):
        from open_vins_tpu.core import ekf

        st = make_state(v=v)
        return ekf.augment_clone(st, self.CFG_E, jnp.zeros(3))

    def test_stationary_accepted_pins_pose_and_velocity(self):
        st = self._state_with_clone(v=0.05)
        win = static_window()
        st2, acc = zupt.try_zupt_explicit(st, self.CFG_E, win, 0.05,
                                          jnp.asarray(0.0))
        assert bool(acc)
        assert float(st2.t) == pytest.approx(0.05)
        # zero-motion constraint: pose stays at the previous clone, velocity
        # pulled towards zero (stationary propagation + tight ori noise)
        p0 = np.array(st.clones_p[int(st.head)])
        assert np.linalg.norm(np.array(st2.p) - p0) < 5e-3
        assert np.linalg.norm(np.array(st2.v)) < np.linalg.norm(
            np.array(st.v))
        assert np.all(np.isfinite(np.array(st2.cov)))

    def test_no_clone_rejected(self):
        st = make_state()  # head = -1, no clones yet
        win = static_window()
        _, acc = zupt.try_zupt_explicit(st, self.CFG_E, win, 0.05,
                                        jnp.asarray(0.0))
        assert not bool(acc)

    def test_moving_rejected(self):
        st = self._state_with_clone(v=1.0)
        win = static_window()
        _, acc = zupt.try_zupt_explicit(st, self.CFG_E, win, 0.05,
                                        jnp.asarray(0.0))
        assert not bool(acc)

    def test_step_frame_explicit_compiles(self):
        cfg = self.CFG_E
        st = self._state_with_clone()
        tb = ft.init_table(cfg, 64)
        win = static_window()
        frame = manager.FrameInput(
            win=win, t_new=jnp.asarray(0.05),
            ids=jnp.full((1, 8), -1, jnp.int32),
            uv=jnp.zeros((1, 8, 2)), uvn=jnp.zeros((1, 8, 2)),
            mask=jnp.zeros((1, 8), bool),
        )
        topts = tri.TriangulationOptions()
        step = jax.jit(lambda s, t, f: manager.step_frame(s, t, cfg, topts, f))
        st2, tb2, diag = step(st, tb, frame)
        assert np.all(np.isfinite(np.array(st2.cov)))
