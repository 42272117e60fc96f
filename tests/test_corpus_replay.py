"""Default-suite gate for the ov_data corpus replay (VERDICT r03 #1).

Pins ONE representative reference trajectory (EuRoC V1_02_medium — the most
dynamic V-room sequence) through the exact replay machinery
`examples/run_benchmark_suite.py` uses: padded fixed-shape trajectory,
reference operating point (200 pts / 11 clones / 50 SLAM / ≤40 MSCKF,
ANCHORED_MSCKF_INVERSE_DEPTH, room-scale map depths, min_view_depth gate),
posyaw-aligned ATE.  The full per-sequence table lives in ACCURACY.md;
this gate keeps the replay path from silently regressing.

Reduced to a 40 s window so the default (CPU) suite stays tractable — the
full-length replays run on TPU via the suite driver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.eval import metrics
from open_vins_tpu.models import runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator, trajectories

SEQ = "/root/reference/ov_data/euroc_mav/V1_02_medium.txt"
T_RUN = 40.0


@pytest.fixture(scope="module")
def replay():
    n_ctrl = int(round((3.0 + T_RUN + 3.0) / 0.05))
    traj, valid = trajectories.load_trajectory_padded(SEQ, n_ctrl)
    params = simulator.SimParams(
        imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=200,
        map_size=2048, duration=T_RUN, sigma_pix=1.0, start_offset=3.0,
        map_duration=min(valid - 3.5, T_RUN), min_view_depth=1.5,
        min_depth=3.0, max_depth=8.0,  # suite SEQ_DEPTH for V-rooms
    )
    cfg = FilterConfig(max_clones=11, max_slam=50, num_cams=1,
                       max_msckf_in_update=40, integration="analytical",
                       feat_rep_slam="ANCHORED_MSCKF_INVERSE_DEPTH")
    sim = simulator.build(params, seed=0, traj=traj)
    run = runner.stage_run(sim, params)
    state, outs = jax.jit(lambda s, r: runner.run_filter(
        cfg, tri.TriangulationOptions(), s, params, r, max_tracks=384)
    )(sim, run)
    jax.block_until_ready(state.cov)
    return params, cfg, sim, run, state, outs


def test_v102_replay_ate(replay):
    params, cfg, sim, run, state, outs = replay
    qs, ps, vs, covs6, diag = outs
    ps = np.array(ps)
    gt_p = np.array(run.gt_p)[1:]
    gt_q = np.array(run.gt_q)[1:]
    R_est = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(np.array(qs))))
    R_gt = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(gt_q)))
    o, p = metrics.ate(ps, np.swapaxes(R_est, -1, -2),
                       gt_p, np.swapaxes(R_gt, -1, -2), method="posyaw")
    assert np.isfinite(np.array(state.cov)).all()
    # full-length TPU replay measures 0.027 m; the 40 s window is ~0.03.
    # Gate at 2x: a regression to the pre-round-4 starvation (1 m+) or any
    # loader/gate bug trips this immediately.
    assert p.rmse < 0.08, f"V1_02 replay posyaw ATE {p.rmse:.3f} m"
    assert o.rmse < 1.5, f"V1_02 replay ori ATE {o.rmse:.3f} deg"


def test_v102_replay_consistency(replay):
    params, cfg, sim, run, state, outs = replay
    qs, ps, vs, covs6, diag = outs
    ps = np.array(ps)
    gt_p = np.array(run.gt_p)[1:]
    gt_q = np.array(run.gt_q)[1:]
    R_est = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(np.array(qs))))
    R_gt = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(gt_q)))
    n = len(gt_p)
    sl = slice(n // 4, n)
    _, _, full = metrics.nees(ps[sl], R_est[sl], gt_p[sl], R_gt[sl],
                              np.array(covs6)[sl])
    assert 0.5 < full.mean < 30.0, f"V1_02 replay pose NEES {full.mean:.1f}"
    # SLAM must actually engage on a real trajectory (the round-4
    # starvation bug showed 0-7 active landmarks)
    n_slam = np.array(diag.n_slam)
    assert n_slam[n // 4:].mean() > 10, \
        f"SLAM starved: mean active {n_slam[n // 4:].mean():.1f}"


def test_run_filter_from_gt_state_matches(replay):
    """run_filter_from with a groundtruth state at k0 must track the
    plain replay: pins the --init auto runner path (k0 frame/window
    alignment, the lax.cond skip)."""
    from open_vins_tpu.models import manager

    params, cfg, sim, run, state, outs = replay
    k0 = 40
    t_new = np.array(run.frames.t_new)
    gt_q = np.array(run.gt_q)[k0]
    gt_p0 = np.array(run.gt_p)[k0]
    gt_v0 = np.array(run.gt_v)[k0]
    st0 = manager.initialize_from_gt(
        cfg, jnp.asarray(gt_q), jnp.asarray(gt_p0), jnp.asarray(gt_v0),
        sim.bias_g_traj[0], sim.bias_a_traj[0], float(t_new[k0 - 1]),
        jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
        sim.cam_intr)
    st, fouts = jax.jit(lambda s0, k: runner.run_filter_from(
        cfg, tri.TriangulationOptions(), sim, params, run, s0, k,
        max_tracks=384))(st0, jnp.asarray(k0, jnp.int32))
    assert np.isfinite(np.array(st.cov)).all()
    ps = np.array(fouts[1])[k0:]
    gt = np.array(run.gt_p)[1:][k0:]
    rmse = float(np.sqrt(((ps - gt) ** 2).sum(1).mean()))
    assert rmse < 0.1, f"run_filter_from gt-state rmse {rmse:.3f} m"


def test_auto_init_replay(replay):
    """The build's own routed initialization on a real trajectory must
    produce a near-truth state (pins the r05 stale-pose-grid bug: the
    newest frame missing from the dynamic-init pose grid handed the
    filter a ~0.35 s stale state, 3.5 deg of gravity error)."""
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    suite = importlib.import_module("run_benchmark_suite")
    params, cfg, sim, run, state, outs = replay
    ai = suite.auto_init_state(run, sim, cfg, params)
    assert ai is not None, "auto init did not converge on V1_02"
    st0, k0, kind, t_init = ai
    gt_q = np.array(run.gt_q)[k0]
    R_i = np.array(lie.quat_2_rot(st0.q))
    R_t = np.array(lie.quat_2_rot(jnp.asarray(gt_q)))
    g_i = R_i @ np.array([0.0, 0.0, 1.0])
    g_t = R_t @ np.array([0.0, 0.0, 1.0])
    ang = np.degrees(np.arccos(np.clip(g_i @ g_t, -1.0, 1.0)))
    assert ang < 1.0, f"init gravity-direction error {ang:.2f} deg"
    v_err = abs(float(np.linalg.norm(np.array(st0.v)))
                - float(np.linalg.norm(np.array(run.gt_v)[k0])))
    assert v_err < 0.1, f"init |v| error {v_err:.3f} m/s"
