"""Per-landmark aruco noise wiring (the reference's second UpdaterSLAM
instance with up_aruco_sigma_px): whitened rows + gate multiplier +
promotion priority, keyed off the 4*tag+corner id space."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.frontend import tracker
from open_vins_tpu.models import runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.models import updater_slam as us
from open_vins_tpu.sim import simulator

PARAMS = simulator.SimParams(
    imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=30,
    map_size=512, duration=5.0, sigma_pix=1.0,
)
TRI = tri.TriangulationOptions()


def _run(cfg, seed=3):
    sim = simulator.build(PARAMS, seed=seed)
    run = runner.stage_run(sim, PARAMS)
    state, outs = jax.jit(
        lambda r: runner.run_filter(cfg, TRI, sim, PARAMS, r))(run)
    return jax.tree_util.tree_map(np.array, state), np.array(outs[1])


def test_aruco_mask_id_contract():
    cfg = FilterConfig(num_aruco_tags=16)
    ids = jnp.asarray([-1, 0, 4 * 16, 4 * 16 + 1, 500])
    m = np.array(us._aruco_landmark_mask(cfg, ids))
    assert m.tolist() == [False, True, True, False, False]
    cfg0 = FilterConfig(num_aruco_tags=0)
    assert not np.array(us._aruco_landmark_mask(cfg0, ids)).any()


@pytest.mark.slow
def test_equal_sigma_reproduces_baseline():
    """With sigma_aruco == sigma_slam and EVERY feature inside the aruco id
    space (sim ids are dense from 0), whitening is identity and the
    promotion boost is uniform — the run must be bitwise the baseline."""
    base = FilterConfig(max_clones=11, max_slam=8, num_cams=1,
                        max_msckf_in_update=20)
    st0, p0 = _run(base)
    st1, p1 = _run(base._replace(num_aruco_tags=10_000))
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(st0.cov, st1.cov)


def test_large_aruco_sigma_weakens_landmarks():
    """sigma_pix_aruco >> sigma_pix_slam must leave aruco landmarks with
    visibly larger covariance (their rows are downweighted)."""
    base = FilterConfig(max_clones=11, max_slam=8, num_cams=1,
                        max_msckf_in_update=20, num_aruco_tags=10_000)
    st0, _ = _run(base)
    st1, _ = _run(base._replace(sigma_pix_aruco=20.0))
    so = base.slam_off

    def slam_diag(st):
        d = np.diagonal(st.cov)[so:so + 3 * base.max_slam]
        v = np.repeat(st.slam_valid, 3)
        return d[v]

    d0, d1 = slam_diag(st0), slam_diag(st1)
    assert d0.size and d1.size
    assert np.isfinite(d1).all()
    assert d1.mean() > 3.0 * d0.mean(), (d0.mean(), d1.mean())


def test_tracker_id_offset_reserves_aruco_space():
    st = tracker.init_tracker(48, 64, 8, num_aruco_tags=16)
    assert int(st.next_id) == 4 * 16 + 1
    st0 = tracker.init_tracker(48, 64, 8)
    assert int(st0.next_id) == 0
