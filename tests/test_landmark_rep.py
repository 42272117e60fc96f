"""Landmark representation tests: round trips, Jacobians vs finite
differences, anchor-change exactness, and closed-loop runs with anchored
representations (LandmarkRepresentation + UpdaterSLAM anchor parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import landmark_rep as lrep
from open_vins_tpu.models import runner
from open_vins_tpu.models import triangulation as tri
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator

REPS = [lrep.ANCHORED_3D, lrep.ANCHORED_MSCKF_INVERSE_DEPTH,
        lrep.ANCHORED_FULL_INVERSE_DEPTH]
GLOBAL_REPS = [lrep.GLOBAL_FULL_INVERSE_DEPTH]


def rand_pose(seed):
    rng = np.random.default_rng(seed)
    q_c = np.array(lie.quat_norm(jnp.asarray(rng.normal(size=4))))
    p_c = rng.normal(size=3)
    q_e = np.array(lie.quat_norm(jnp.asarray(rng.normal(size=4))))
    p_e = rng.normal(size=3) * 0.1
    return (jnp.asarray(q_c, jnp.float32), jnp.asarray(p_c, jnp.float32),
            jnp.asarray(q_e, jnp.float32), jnp.asarray(p_e, jnp.float32))


class TestRepMath:
    @pytest.mark.parametrize("rep", REPS)
    def test_roundtrip(self, rep):
        q_c, p_c, q_e, p_e = rand_pose(0)
        p_G = jnp.asarray([2.0, -1.0, 5.0])
        lam = lrep.from_global(rep, p_G, q_c, p_c, q_e, p_e)
        back = lrep.to_global(rep, lam, q_c, p_c, q_e, p_e)
        np.testing.assert_allclose(np.array(back), np.array(p_G), atol=1e-4)

    @pytest.mark.parametrize("rep", REPS)
    def test_rep_jacobian_vs_fd(self, rep):
        q_c, p_c, q_e, p_e = rand_pose(1)
        p_G = jnp.asarray([1.0, 2.0, 6.0])
        lam = lrep.from_global(rep, p_G, q_c, p_c, q_e, p_e)
        J = np.array(lrep.d_pFinG_d_lam(rep, lam, q_c, q_e))
        eps = 1e-3
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            fd = (np.array(lrep.to_global(rep, lam + d, q_c, p_c, q_e, p_e))
                  - np.array(lrep.to_global(rep, lam, q_c, p_c, q_e, p_e))) / eps
            np.testing.assert_allclose(J[:, k], fd, atol=2e-2, rtol=2e-2)

    @pytest.mark.parametrize("rep", REPS)
    def test_anchor_jacobian_vs_fd(self, rep):
        from open_vins_tpu.core.state import _quat_boxplus

        q_c, p_c, q_e, p_e = rand_pose(2)
        p_G = jnp.asarray([0.5, 1.5, 4.0])
        lam = lrep.from_global(rep, p_G, q_c, p_c, q_e, p_e)
        dth_J, dp_J = lrep.d_pFinG_d_anchor(rep, lam, q_c, q_e, p_e)
        eps = 1e-4
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            q_p = _quat_boxplus(q_c, d)
            fd = (np.array(lrep.to_global(rep, lam, q_p, p_c, q_e, p_e))
                  - np.array(lrep.to_global(rep, lam, q_c, p_c, q_e, p_e))) / eps
            np.testing.assert_allclose(np.array(dth_J)[:, k], fd, atol=5e-2,
                                       rtol=5e-2)
            fd_p = (np.array(lrep.to_global(rep, lam, q_c, p_c + d, q_e, p_e))
                    - np.array(lrep.to_global(rep, lam, q_c, p_c, q_e, p_e))) / eps
            np.testing.assert_allclose(np.array(dp_J)[:, k], fd_p, atol=1e-2)

    @pytest.mark.parametrize("rep", REPS)
    def test_anchor_change_exact_value(self, rep):
        q_o, p_o, q_e, p_e = rand_pose(3)
        q_n, p_n, _, _ = rand_pose(4)
        p_G = jnp.asarray([1.0, -2.0, 7.0])
        lam_o = lrep.from_global(rep, p_G, q_o, p_o, q_e, p_e)
        lam_n, J_lam, J_xo, J_xn = lrep.anchor_change_jacobians(
            rep, lam_o, q_o, p_o, q_n, p_n, q_e, p_e
        )
        back = lrep.to_global(rep, lam_n, q_n, p_n, q_e, p_e)
        np.testing.assert_allclose(np.array(back), np.array(p_G), atol=1e-4)
        # Jacobian sanity vs finite difference in λ_old
        eps = 1e-3
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            pG2 = lrep.to_global(rep, lam_o + d, q_o, p_o, q_e, p_e)
            lam_n2 = lrep.from_global(rep, pG2, q_n, p_n, q_e, p_e)
            fd = (np.array(lam_n2) - np.array(lam_n)) / eps
            np.testing.assert_allclose(np.array(J_lam)[:, k], fd, atol=5e-2,
                                       rtol=5e-2)


PARAMS = simulator.SimParams(imu_rate=200.0, cam_rate=20.0, num_cams=1,
                             num_pts=36, map_size=1024, duration=5.0,
                             sigma_pix=1.0)
TRI = tri.TriangulationOptions()


class TestClosedLoopAnchored:
    @pytest.mark.parametrize("rep", REPS)
    def test_anchored_slam_accuracy(self, rep):
        cfg = FilterConfig(max_clones=11, max_slam=10, num_cams=1,
                           max_msckf_in_update=25, feat_rep_slam=rep)
        sim = simulator.build(PARAMS, seed=21)
        run = runner.stage_run(sim, PARAMS)
        state, outs = jax.jit(
            lambda r: runner.run_filter(cfg, TRI, sim, PARAMS, r)
        )(run)
        ps = np.array(outs[1])
        gt = np.array(run.gt_p)[1:]
        rmse = np.sqrt(((ps - gt) ** 2).sum(1).mean())
        assert np.isfinite(np.array(state.cov)).all(), f"{rep} non-finite"
        assert rmse < 0.10, f"{rep} RMSE {rmse:.3f} m"
        n_slam = np.array(outs[4].n_slam)
        assert n_slam[40:].mean() > 3, f"{rep} landmarks died: {n_slam[40:].mean()}"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestSingleDepth:
    """ANCHORED_INVERSE_DEPTH_SINGLE: 1-dof depth state + frozen bearing."""

    REP = lrep.ANCHORED_INVERSE_DEPTH_SINGLE

    def test_roundtrip(self):
        q_c, p_c, q_e, p_e = rand_pose(7)
        p_G = jnp.asarray([1.5, -0.5, 4.0])
        lam = lrep.from_global(self.REP, p_G, q_c, p_c, q_e, p_e)
        back = lrep.to_global(self.REP, lam, q_c, p_c, q_e, p_e)
        np.testing.assert_allclose(np.array(back), np.array(p_G), atol=1e-4)
        # λ = [ρ, b_x, b_y] with p_FinA = (1/ρ)(b_x, b_y, 1)
        p_A = lrep.lam_to_pFinA(self.REP, lam)
        np.testing.assert_allclose(
            np.array(p_A[:2] / p_A[2]), np.array(lam[1:]), atol=1e-5)

    def test_depth_jacobian_vs_fd(self):
        q_c, p_c, q_e, p_e = rand_pose(8)
        p_G = jnp.asarray([2.0, 1.0, 5.0])
        lam = lrep.from_global(self.REP, p_G, q_c, p_c, q_e, p_e)
        J = np.array(lrep.d_pFinG_d_lam(self.REP, lam, q_c, q_e))
        # only the ρ column is a state Jacobian; bearing columns are zero
        np.testing.assert_allclose(J[:, 1:], 0.0)
        eps = 1e-3
        d = jnp.zeros(3).at[0].set(eps)
        fd = (np.array(lrep.to_global(self.REP, lam + d, q_c, p_c, q_e, p_e))
              - np.array(p_G)) / eps
        np.testing.assert_allclose(J[:, 0], fd, atol=2e-2, rtol=2e-2)

    def test_anchor_change_exact_value_and_jacobian(self):
        q_o, p_o, q_e, p_e = rand_pose(9)
        q_n, p_n, _, _ = rand_pose(10)
        p_G = jnp.asarray([1.0, -2.0, 7.0])
        lam_o = lrep.from_global(self.REP, p_G, q_o, p_o, q_e, p_e)
        lam_n, J_lam, J_xo, J_xn = lrep.anchor_change_jacobians(
            self.REP, lam_o, q_o, p_o, q_n, p_n, q_e, p_e
        )
        back = lrep.to_global(self.REP, lam_n, q_n, p_n, q_e, p_e)
        np.testing.assert_allclose(np.array(back), np.array(p_G), atol=1e-4)
        # frozen rows stay zero
        np.testing.assert_allclose(np.array(J_lam)[1:], 0.0)
        np.testing.assert_allclose(np.array(J_xo)[1:], 0.0)
        np.testing.assert_allclose(np.array(J_xn)[1:], 0.0)
        # dρ_new/dρ_old: FD along ρ, projected through the pseudo-inverse.
        # A pure δρ_old moves p_G along the old depth direction; the 1-dof
        # new rep can only capture its component along the new direction.
        eps = 1e-3
        d = jnp.zeros(3).at[0].set(eps)
        pG2 = lrep.to_global(self.REP, lam_o + d, q_o, p_o, q_e, p_e)
        h_n = np.array(lrep.d_pFinG_d_lam(self.REP, lam_n, q_n, q_e))[:, 0]
        drho_fd = h_n @ (np.array(pG2) - np.array(p_G)) / (h_n @ h_n) / eps
        np.testing.assert_allclose(np.array(J_lam)[0, 0], drho_fd,
                                   atol=5e-2, rtol=5e-2)

    def test_closed_loop_single_depth(self):
        cfg = FilterConfig(max_clones=11, max_slam=10, num_cams=1,
                           max_msckf_in_update=25, feat_rep_slam=self.REP)
        sim = simulator.build(PARAMS, seed=21)
        run = runner.stage_run(sim, PARAMS)
        state, outs = jax.jit(
            lambda r: runner.run_filter(cfg, TRI, sim, PARAMS, r)
        )(run)
        ps = np.array(outs[1])
        gt = np.array(run.gt_p)[1:]
        rmse = np.sqrt(((ps - gt) ** 2).sum(1).mean())
        assert np.isfinite(np.array(state.cov)).all(), "single-depth non-finite"
        assert rmse < 0.10, f"single-depth RMSE {rmse:.3f} m"
        n_slam = np.array(outs[4].n_slam)
        assert n_slam[40:].mean() > 3, f"landmarks died: {n_slam[40:].mean()}"


class TestGlobalInverseDepth:
    def test_roundtrip_and_jacobian(self):
        rep = lrep.GLOBAL_FULL_INVERSE_DEPTH
        q_c, p_c, q_e, p_e = rand_pose(5)
        p_G = jnp.asarray([2.0, -1.5, 4.0])
        lam = lrep.from_global(rep, p_G, q_c, p_c, q_e, p_e)
        back = lrep.to_global(rep, lam, q_c, p_c, q_e, p_e)
        np.testing.assert_allclose(np.array(back), np.array(p_G), atol=1e-4)
        J = np.array(lrep.d_pFinG_d_lam(rep, lam, q_c, q_e))
        eps = 1e-3
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            fd = (np.array(lrep.to_global(rep, lam + d, q_c, p_c, q_e, p_e))
                  - np.array(back)) / eps
            np.testing.assert_allclose(J[:, k], fd, atol=3e-2, rtol=3e-2)

    def test_closed_loop_global_inverse(self):
        cfg = FilterConfig(max_clones=11, max_slam=10, num_cams=1,
                           max_msckf_in_update=25,
                           feat_rep_slam=lrep.GLOBAL_FULL_INVERSE_DEPTH)
        sim = simulator.build(PARAMS, seed=21)
        run = runner.stage_run(sim, PARAMS)
        state, outs = jax.jit(
            lambda r: runner.run_filter(cfg, TRI, sim, PARAMS, r)
        )(run)
        ps = np.array(outs[1])
        gt = np.array(run.gt_p)[1:]
        rmse = np.sqrt(((ps - gt) ** 2).sum(1).mean())
        assert np.isfinite(np.array(state.cov)).all()
        assert rmse < 0.10, f"GLOBAL_FULL_INVERSE_DEPTH RMSE {rmse:.3f}"
