"""Pin `slam_stack_clones=3` against exact full-window stacking.

VERDICT round-2 #9: the W=3 default deviates from reference-exact stacking
(UpdaterSLAM.cpp:300-340 gathers every unconsumed measurement) on the
argument that measurements are consumed every frame, so only the newest
clones can hold rows.  That argument must survive the two aging hazards:
ZUPT-consumed frames (the frame is consumed WITHOUT a vision update, so
rows age one extra clone) and chi2-failure stretches (failed landmark
updates also leave rows unconsumed).  This closed loop forces both — a
stop-and-go trajectory with ZUPT enabled and sim pixel noise 2.5× the
filter's assumed sigma — and asserts W=3 == W=0 to f32 noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.sim import simulator

TRI = tri.TriangulationOptions()


def stop_and_go_trajectory(duration, dt=0.1):
    """Sine trajectory driven through a time warp whose rate hits zero
    periodically: the platform comes to genuine stops (v→0, ZUPT fires)
    and accelerates back out."""
    n = int(duration / dt) + 8
    t = jnp.arange(n) * dt
    w = 1.5
    s = t - jnp.sin(w * t) / w  # ds/dt = 1 − cos(wt) ∈ [0, 2]
    p = jnp.stack(
        [
            2.0 * jnp.sin(0.6 * s),
            2.0 * jnp.cos(0.6 * s),
            1.0 + 0.5 * jnp.sin(0.9 * s),
        ],
        axis=-1,
    )
    yaw = 0.6 * s + 0.3 * jnp.sin(0.5 * s)
    pitch = 0.2 * jnp.sin(0.7 * s)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    zero = jnp.zeros_like(t)
    one = jnp.ones_like(t)
    Rz = jnp.stack([
        jnp.stack([cy, -sy, zero], -1),
        jnp.stack([sy, cy, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    Ry = jnp.stack([
        jnp.stack([cp, zero, sp], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-sp, zero, cp], -1),
    ], -2)
    return t, Rz @ Ry, p


PARAMS = simulator.SimParams(
    imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=40,
    map_size=1024, duration=10.0, sigma_pix=1.0,
)


def _run(stack_w):
    from open_vins_tpu.models import feature_table as ft
    from open_vins_tpu.models import manager
    from open_vins_tpu.ops import lie

    cfg = FilterConfig(max_clones=11, max_slam=8, num_cams=1,
                       max_msckf_in_update=25, use_zupt=True,
                       # disparity gate above the 1 px measurement-noise
                       # floor (~1.8 px avg frame-to-frame) but below real
                       # motion (5-20 px): ZUPT fires only during the stops
                       zupt_max_velocity=0.2, zupt_max_disparity=3.0,
                       slam_stack_clones=stack_w)
    traj = stop_and_go_trajectory(
        PARAMS.duration + 2.0 * PARAMS.start_offset + 2.0)
    sim = simulator.build(PARAMS, seed=33, traj=traj)
    run = runner.stage_run(sim, PARAMS)
    # deterministic gross outliers: +0.08 normalized-coord offset (~37 px)
    # on a few measurement columns over a 20-frame stretch — guaranteed
    # chi2 failures for whichever landmarks hold those ids
    uvn = run.frames.uvn
    uvn = uvn.at[60:80, :, 0:3, :].add(0.08)
    uv = run.frames.uv
    uv = uv.at[60:80, :, 0:3, :].add(37.0)
    run = run._replace(frames=run.frames._replace(uvn=uvn, uv=uv))

    state = manager.initialize_from_gt(
        cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
        sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
        jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
        sim.cam_intr,
    )
    table = ft.init_table(cfg, 256)

    def body(carry, frame):
        st, tb = carry
        st, tb, d = manager.step_frame(st, tb, cfg, TRI, frame)
        # per-frame chi2-failure evidence: slam_fail counts accumulate on
        # failed landmark updates (and reset on success/eviction), so the
        # running max over frames sees them even if the final state is clean
        return (st, tb), (st.p, d, jnp.sum(st.slam_fail))

    (state, table), (ps, diag, fails) = jax.jit(
        lambda s, t, f: jax.lax.scan(body, (s, t), f)
    )(state, table, run.frames)
    return state, ps, diag, fails


@pytest.mark.slow
def test_stack3_equals_full_window():
    st3, p3, diag, fails = _run(3)
    st0, p0, _, _ = _run(0)  # 0 = gather the full window (exact ref)

    n_msckf = np.array(diag.n_msckf)
    # the run must actually contain ZUPT-consumed frames (no vision update
    # after warm-up) — otherwise this test proves nothing
    zupt_frames = int(((n_msckf[30:] == 0)
                       & (np.array(diag.n_slam_used)[30:] == 0)).sum())
    assert zupt_frames >= 3, f"only {zupt_frames} ZUPT-consumed frames"
    # and chi2-failed landmark updates at some point during the run
    assert int(np.array(fails).max()) > 0, "no chi2 failures seen"

    p3, p0 = np.array(p3), np.array(p0)
    assert np.isfinite(p3).all() and np.isfinite(p0).all()
    dmax = float(np.abs(p3 - p0).max())
    assert dmax < 1e-3, f"W=3 vs full-window trajectories diverge: {dmax} m"
    cdiff = float(np.abs(np.array(st3.cov) - np.array(st0.cov)).max())
    assert cdiff < 1e-3, f"W=3 vs full-window covariance diverges: {cdiff}"


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-m", ""])
