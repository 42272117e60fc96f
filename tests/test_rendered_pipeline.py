"""Rendered-image closed-loop accuracy: sim map → synthetic images → real
KLT front-end → MSCKF filter → trajectory RMSE vs groundtruth.

This is the accuracy gate for the vision path (no real dataset is mountable
here): blob centers are exact noise-free projections, so every centimetre of
trajectory error is attributable to the KLT→filter pipeline itself.  The
reference validates this path on EuRoC (ros1_serial_msckf.cpp); we validate
it on rendered frames with a hard RMSE bound — an upgrade over the previous
boundedness-only smoke test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.frontend import klt, tracker
from open_vins_tpu.models import feature_table as ft
from open_vins_tpu.models import manager
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import render, simulator
from open_vins_tpu.models import runner


def small_calib(num_cams, baseline=0.11):
    """320x240 pinhole (zero distortion), forward-looking; stereo eyes share
    orientation and differ by an x baseline so L→R KLT is well-posed."""
    intr = jnp.tile(
        jnp.asarray([260.0, 260.0, 160.0, 120.0, 0.0, 0.0, 0.0, 0.0]),
        (num_cams, 1),
    )
    R = lie.exp_so3(jnp.asarray([-1.2, 1.2, -1.2]))
    Rs = jnp.tile(R, (num_cams, 1, 1))
    ps = jnp.stack([
        jnp.asarray([baseline * i, -0.01, 0.02]) for i in range(num_cams)
    ])
    return intr, Rs, ps


def make_params(num_cams=1, duration=8.0):
    return simulator.SimParams(
        imu_rate=200.0, cam_rate=20.0, num_cams=num_cams, num_pts=60,
        map_size=384, duration=duration, sigma_pix=0.0, start_offset=3.0,
        width=320, height=240, min_depth=4.0, max_depth=9.0,
    )


def closed_loop(num_cams, duration, max_slam=0):
    params = make_params(num_cams=num_cams, duration=duration)
    calib = small_calib(num_cams)
    sim = simulator.build(params, seed=0, calib=calib)
    run = runner.stage_run(sim, params)

    cfg = FilterConfig(max_clones=8, max_slam=max_slam, num_cams=num_cams,
                       max_msckf_in_update=20)
    tri_opts = tri.TriangulationOptions()
    kparams = klt.KltParams(num_features=60, num_pyr=4, grid_x=8, grid_y=6)
    zeta = calib[0][0]  # single-camera intrinsics row [8]

    state = manager.initialize_from_gt(
        cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
        sim.bias_g_traj[0], sim.bias_a_traj[0], jnp.asarray(0.0),
        jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
        sim.cam_intr,
    )
    table = ft.init_table(cfg, 192)
    tstate = tracker.init_tracker(params.height, params.width, 60)

    step = jax.jit(lambda s, t, f: manager.step_frame(s, t, cfg, tri_opts, f))
    n_frames = simulator.n_cam_frames(params)

    # prime the tracker on frame 0 (the init anchor)
    img0 = render.render_frame(sim, params, 0)
    if num_cams == 2:
        img0r = render.render_frame(sim, params, 0, cam=1)
        tstate, *_ = tracker.track_frame_stereo(
            tstate, img0, img0r, zeta, zeta, kparams, first_frame=True)
    else:
        tstate, *_ = tracker.track_frame(tstate, img0, zeta, kparams,
                                         first_frame=True)

    est_p = []
    for k in range(1, n_frames):
        img = render.render_frame(sim, params, k)
        if num_cams == 2:
            img_r = render.render_frame(sim, params, k, cam=1)
            tstate, ids, uv, uvn, mask = tracker.track_frame_stereo(
                tstate, img, img_r, zeta, zeta, kparams)
        else:
            tstate, ids1, uv1, uvn1, mask1 = tracker.track_frame(
                tstate, img, zeta, kparams)
            ids, uv, uvn, mask = (ids1[None], uv1[None], uvn1[None],
                                  mask1[None])
        fr = jax.tree_util.tree_map(lambda a: a[k - 1], run.frames)
        fr = fr._replace(ids=ids, uv=uv, uvn=uvn, mask=mask)
        state, table, diag = step(state, table, fr)
        est_p.append(np.array(state.p))

    est_p = np.asarray(est_p)
    gt_p = np.asarray(run.gt_p)[1:n_frames]
    assert np.all(np.isfinite(est_p))
    assert np.all(np.isfinite(np.array(state.cov)))
    rmse = float(np.sqrt(((est_p - gt_p) ** 2).sum(1).mean()))
    return rmse, state


@pytest.mark.slow
def test_mono_rendered_accuracy():
    """Mono KLT → filter: trajectory RMSE must be small (not just bounded)."""
    rmse, _ = closed_loop(num_cams=1, duration=6.0)
    assert rmse < 0.15, f"mono rendered-image RMSE too high: {rmse:.3f} m"


@pytest.mark.slow
def test_stereo_rendered_accuracy():
    """Stereo KLT (left-master + L→R join) → filter: RMSE bound.

    Matches the role of TrackKLT::feed_stereo accuracy on EuRoC
    (TrackKLT.cpp:202-393)."""
    rmse, _ = closed_loop(num_cams=2, duration=4.0)
    assert rmse < 0.15, f"stereo rendered-image RMSE too high: {rmse:.3f} m"
