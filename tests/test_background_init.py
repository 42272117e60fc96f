"""Background initialization + camera catch-up replay
(VioManagerHelper.cpp:78-188 parity): the worker-thread driver queues
camera times while an attempt is in flight, and catch_up moves the
initialized state forward with propagate_and_clone over the queue."""

import time

import jax.numpy as jnp
import numpy as np

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.init import background
from open_vins_tpu.models import manager, propagator
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator


class TestDriver:
    def test_queueing_and_success(self):
        bg = background.BackgroundInitializer()
        ev = {"ran": 0}

        def slow_attempt():
            ev["ran"] += 1
            time.sleep(0.15)
            return "static", "RESULT"

        assert bg.try_to_initialize(1.0, slow_attempt) is False  # launched
        # frames arriving mid-attempt get queued
        assert bg.try_to_initialize(1.05, None) is False
        assert bg.try_to_initialize(1.10, None) is False
        bg.join(timeout=5.0)
        assert bg.try_to_initialize(1.15, None) is True  # observe success
        kind, res, t_init = bg.result
        assert kind == "static" and res == "RESULT" and t_init == 1.0
        assert ev["ran"] == 1
        assert bg.queued_times(1.04) == [1.05, 1.10]
        assert bg.queued_times(1.04) == []  # drained

    def test_failed_attempt_allows_retry(self):
        bg = background.BackgroundInitializer()

        def fail():
            return "none", None

        assert bg.try_to_initialize(1.0, fail) is False
        bg.join(timeout=5.0)
        assert bg.result is None
        ok = {"v": False}

        def succeed():
            ok["v"] = True
            return "dynamic", 42

        assert bg.try_to_initialize(2.0, succeed) is False
        bg.join(timeout=5.0)
        assert ok["v"] and bg.result[0] == "dynamic"


class TestCatchUp:
    def test_catch_up_advances_and_clones(self):
        params = simulator.SimParams(
            imu_rate=200.0, cam_rate=10.0, num_cams=1, num_pts=20,
            map_size=128, duration=4.0, start_offset=3.0)
        sim = simulator.build(params, seed=0)
        n_imu = simulator.n_imu_steps(params)
        import jax
        imu = jax.vmap(lambda n: simulator.get_imu(sim, params, n))(
            jnp.arange(n_imu + 1))
        imu_t = np.array(imu.t); imu_w = np.array(imu.wm)
        imu_a = np.array(imu.am)

        cfg = FilterConfig(max_clones=4, max_slam=0, num_cams=1)
        q0, p0, v0 = simulator.get_state(sim, params, 0.0)[:3]
        state = manager.initialize_from_gt(
            cfg, q0, p0, v0, sim.bias_g_traj[0], sim.bias_a_traj[0],
            jnp.asarray(0.0),
            jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
            sim.cam_intr)

        def mk(t0, t1, K):
            win = propagator.make_window(imu_t, imu_w, imu_a, t0, t1, K)
            return 1, np.array(win.t), np.array(win.w), np.array(win.a)

        # 10 queued frames over 1 s; ring of 4 — clone_rate = 3
        queued = [0.1 * k for k in range(1, 11)]
        out = background.catch_up(state, cfg, queued, mk, imu_rate=200.0)
        assert float(out.t) == np.float32(queued[-1] or 0) or float(out.t) > 0.89
        assert int(out.n_clones) > int(state.n_clones)
        assert int(out.n_clones) <= cfg.max_clones
        assert np.all(np.isfinite(np.array(out.cov)))
        # the propagated mean must track groundtruth (biases are true here)
        qg, pg, vg = simulator.get_state(sim, params, float(out.t))[:3]
        assert np.linalg.norm(np.array(out.p) - np.array(pg)) < 0.05
