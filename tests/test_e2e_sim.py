"""Closed-loop estimator consistency test: sim → MSCKF VIO → RMSE/NEES.

This is the reference's primary quality bar (SURVEY.md §4: run_simulation +
error_simulation computing RMSE/NEES vs simulator groundtruth, FEJ-consistency
validation).  The filter must (a) not diverge, (b) keep position error small,
(c) keep pose NEES near its dof (covariance consistency).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator

PARAMS = simulator.SimParams(
    imu_rate=200.0,
    cam_rate=20.0,
    num_cams=1,
    num_pts=45,
    map_size=1024,
    duration=8.0,
    sigma_pix=1.0,
)
CFG = FilterConfig(max_clones=11, max_slam=0, num_cams=1,
                   max_msckf_in_update=30)
TRI = tri.TriangulationOptions()


@pytest.fixture(scope="module")
def sim_run():
    sim = simulator.build(PARAMS, seed=21)
    run = runner.stage_run(sim, PARAMS)
    state, outs = jax.jit(
        lambda r: runner.run_filter(CFG, TRI, sim, PARAMS, r)
    )(run)
    return sim, run, state, outs


def pose_errors(run, outs):
    qs, ps, vs, covs, diag = outs
    # outs index k corresponds to frame k+1
    gt_q = np.array(run.gt_q)[1:]
    gt_p = np.array(run.gt_p)[1:]
    # error convention MUST match the filter: δx = x_true ⊟ x_est, i.e.
    # δp = gt − est AND δθ = −log(R_gt R_estᵀ).  Mixing est−gt with that δθ
    # flips the sign of the θ–p cross term in the joint NEES and inflates it
    # ~3-5× once landmark updates build real cross-covariance (this exact
    # bug masqueraded as a SLAM FEJ inconsistency through round 1).
    perr = gt_p - np.array(ps)
    therr = []
    for k in range(len(gt_q)):
        R_est = np.array(lie.quat_2_rot(jnp.asarray(np.array(qs)[k])))
        R_gt = np.array(lie.quat_2_rot(jnp.asarray(gt_q[k])))
        # JPL left error: R_true = (I-⌊δθ⌋) R_est
        dth = -np.array(lie.log_so3(jnp.asarray(R_gt @ R_est.T)))
        therr.append(dth)
    return np.asarray(therr), perr, covs


class TestClosedLoop:
    def test_filter_ran_updates(self, sim_run):
        _, _, _, outs = sim_run
        diag = outs[4]
        n_msckf = np.array(diag.n_msckf)
        # updates should engage once the window has enough clones.  (Gate
        # recalibrated from >3 to >2 for the round-4 consume-on-attempt
        # parity: every SELECTED full-window row now dies after its update
        # attempt, pass or fail — UpdaterMSCKF.cpp:108-116 — so candidate
        # windows reset more often and the per-frame mean is slightly
        # lower at identical closed-loop RMSE.)
        assert n_msckf[20:].mean() > 2, f"too few MSCKF features: {n_msckf[20:].mean()}"

    def test_position_rmse(self, sim_run):
        sim, run, state, outs = sim_run
        therr, perr, _ = pose_errors(run, outs)
        rmse_p = np.sqrt((perr**2).sum(axis=1).mean())
        rmse_th = np.sqrt((therr**2).sum(axis=1).mean())
        # reference-grade accuracy on a sim run of this length is ~cm level
        assert rmse_p < 0.10, f"position RMSE too high: {rmse_p:.3f} m"
        assert rmse_th < 0.02, f"orientation RMSE too high: {rmse_th:.4f} rad"

    def test_no_nans_and_psd(self, sim_run):
        _, _, state, outs = sim_run
        assert np.all(np.isfinite(np.array(state.cov)))
        d = np.diagonal(np.array(state.cov))
        assert d.min() > -1e-8, f"negative covariance diagonal: {d.min()}"

    def test_nees_consistency(self, sim_run):
        """Average pose NEES should be near 6 (within loose bounds — the
        classic FEJ-consistency check, ResultSimulation parity)."""
        sim, run, state, outs = sim_run
        therr, perr, covs = pose_errors(run, outs)
        covs = np.array(covs)
        nees = []
        for k in range(40, len(therr)):  # skip convergence transient
            e = np.concatenate([therr[k], perr[k]])
            P = covs[k] + 1e-12 * np.eye(6)
            nees.append(e @ np.linalg.solve(P, e))
        nees = np.asarray(nees)
        m = nees.mean()
        assert m < 10.0, f"pose NEES inconsistent: {m:.1f} (dof 6)"
        assert m > 0.5, f"pose NEES suspiciously low: {m:.2f}"


class TestClosedLoopAnalytic:
    """ACI² analytic integrator must match RK4-grade accuracy + consistency
    in closed loop (integration='analytical', Propagator.cpp:588-829)."""

    def test_analytical_integration_closed_loop(self):
        cfg = CFG._replace(integration="analytical")
        sim = simulator.build(PARAMS, seed=21)
        run = runner.stage_run(sim, PARAMS)
        state, outs = jax.jit(
            lambda r: runner.run_filter(cfg, TRI, sim, PARAMS, r)
        )(run)
        therr, perr, covs = pose_errors(run, outs)
        rmse_p = np.sqrt((perr**2).sum(axis=1).mean())
        assert np.all(np.isfinite(np.array(state.cov)))
        assert rmse_p < 0.10, f"analytic position RMSE too high: {rmse_p:.3f} m"
        covs = np.array(covs)
        nees = []
        for k in range(40, len(therr)):
            e = np.concatenate([therr[k], perr[k]])
            nees.append(e @ np.linalg.solve(covs[k] + 1e-12 * np.eye(6), e))
        m = np.asarray(nees).mean()
        assert 0.5 < m < 10.0, f"analytic pose NEES inconsistent: {m:.1f}"


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-s"])
