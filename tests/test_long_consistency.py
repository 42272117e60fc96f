"""Long-horizon consistency gate: yaw variance must not shrink.

Global yaw is unobservable in VIO — its variance can only grow (random
walk + zero information).  The r05 root cause this test pins: the
grammian-based joint update forms (newton/spd) square H in f32, which
rectifies rounding noise into an always-positive information floor along
the FEJ-cancelled gauge directions; on a fast sequence the yaw sigma
visibly SHRINKS within ~20 s (MH_05 95 s replay: 1.15 deg -> 0.56 deg,
pos NEES 209 vs sequential 20).  The default joint_update_form="qr"
(orthogonal compression, no H^T H) stays monotone; this test fails if a
future default or code change re-introduces the leak.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator, trajectories

SEQ = "/root/reference/ov_data/euroc_mav/MH_05_difficult.txt"
T_RUN = 40.0


def _run(form):
    n_ctrl = int(round((3.0 + T_RUN + 3.0) / 0.05))
    t_skip = trajectories.EUROC_START_SKIP.get("MH_05_difficult", 0.0)
    t_skip += trajectories.motion_skip(SEQ, t_skip, 3.0)
    traj, valid = trajectories.load_trajectory_padded(SEQ, n_ctrl,
                                                     t_skip=t_skip)
    params = simulator.SimParams(
        imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=200,
        map_size=2048, duration=T_RUN, sigma_pix=1.0, start_offset=3.0,
        map_duration=min(valid - 3.5, T_RUN), min_view_depth=1.5,
        min_depth=5.0, max_depth=10.0,
    )
    cfg = FilterConfig(max_clones=11, max_slam=50, num_cams=1,
                       max_msckf_in_update=40, integration="analytical",
                       feat_rep_slam="ANCHORED_MSCKF_INVERSE_DEPTH",
                       joint_update_form=form)
    sim = simulator.build(params, seed=1, traj=traj)
    run = runner.stage_run(sim, params)
    state, outs = jax.jit(lambda s, r: runner.run_filter(
        cfg, tri.TriangulationOptions(), s, params, r, max_tracks=384)
    )(sim, run)
    jax.block_until_ready(state.cov)
    qs, ps, vs, covs6, diag = outs
    qs = np.array(qs)
    cov6 = np.array(covs6)
    R_e = np.array(jax.vmap(lie.quat_2_rot)(jnp.asarray(qs)))
    # yaw sigma: project theta-covariance onto the (local-frame) global
    # z axis a = R_GtoI e_z
    sig = []
    for k in range(len(qs)):
        a = R_e[k] @ np.array([0.0, 0.0, 1.0])
        sig.append(float(np.sqrt(a @ cov6[k][:3, :3] @ a)))
    return np.degrees(np.asarray(sig))


def test_yaw_sigma_monotone_default_form():
    sig = _run(FilterConfig().joint_update_form)
    # allow tiny numerical wiggle (projection axis moves with the
    # estimate); a real leak shrinks sigma by 2x within ~20 s
    assert sig[-1] > 0.95 * sig[10], \
        f"yaw sigma shrank {sig[10]:.3f} -> {sig[-1]:.3f} deg " \
        "(unobservable direction gained information)"
    drops = sig[10:] / np.maximum.accumulate(sig[10:])
    assert drops.min() > 0.90, \
        f"yaw sigma dipped {100 * (1 - drops.min()):.1f}% below its " \
        "running max"


@pytest.mark.slow
def test_yaw_leak_reproduces_with_newton():
    """Documents the defect the default avoids (and will flip to XPASS
    if a future gauge-deflated newton fixes it — then retire newton's
    long-horizon caveat in core/layout.py)."""
    sig = _run("newton")
    assert sig[-1] < 0.8 * sig[10], "newton gauge leak no longer " \
        "reproduces — retire the layout.py caveat and consider " \
        "restoring the newton default"
