"""Tests for fast_state_propagate (IMU-rate odometry) and checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import feature_table as ft
from open_vins_tpu.models import manager, runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.models.propagator import ImuWindow, fast_state_propagate
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator
from open_vins_tpu.utils import checkpoint

PARAMS = simulator.SimParams(imu_rate=200.0, cam_rate=20.0, num_cams=1,
                             num_pts=24, map_size=512, duration=4.0)
CFG = FilterConfig(max_clones=7, max_slam=0, num_cams=1,
                   max_msckf_in_update=15)
TRI = tri.TriangulationOptions()


def _setup():
    sim = simulator.build(PARAMS, seed=5)
    run = runner.stage_run(sim, PARAMS)
    state = manager.initialize_from_gt(
        CFG, run.gt_q[0], run.gt_p[0], run.gt_v[0],
        sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
        jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
        sim.cam_intr,
    )
    table = ft.init_table(CFG, 128)
    return sim, run, state, table


def test_fast_state_propagate_tracks_gt():
    sim, run, state, _ = _setup()
    # propagate the mean over one camera interval and compare to gt
    f0 = jax.tree_util.tree_map(lambda a: a[0], run.frames)
    q, p, v = fast_state_propagate(state, CFG, f0.win)
    q_gt, p_gt, v_gt, _, _ = simulator.get_state(sim, PARAMS, f0.t_new)
    assert float(jnp.linalg.norm(p - p_gt)) < 1e-3
    assert float(jnp.linalg.norm(v - v_gt)) < 5e-3


def test_checkpoint_roundtrip_resumes_exactly(tmp_path):
    sim, run, state, table = _setup()
    step = jax.jit(lambda s, t, f: manager.step_frame(s, t, CFG, TRI, f))
    # run 10 frames, checkpoint, run 5 more from both the live state and
    # the restored state — results must be bitwise identical
    for k in range(10):
        f = jax.tree_util.tree_map(lambda a: a[k], run.frames)
        state, table, _ = step(state, table, f)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, state, table, extra={"frame": np.asarray(10)})
    state_r, table_r, extra = checkpoint.load(path, state, table)
    assert int(extra["frame"]) == 10

    sa, ta = state, table
    sb, tb = state_r, table_r
    for k in range(10, 15):
        f = jax.tree_util.tree_map(lambda a: a[k], run.frames)
        sa, ta, _ = step(sa, ta, f)
        sb, tb, _ = step(sb, tb, f)
    assert np.array_equal(np.array(sa.p), np.array(sb.p))
    assert np.array_equal(np.array(sa.cov), np.array(sb.cov))
    assert np.array_equal(np.array(ta.ids), np.array(tb.ids))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
