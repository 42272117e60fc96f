"""Equivalence of the fast normal-equation compression with the QR path:
both must produce the same EKF update (information equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.core import ekf
from open_vins_tpu.core.layout import FilterConfig
from open_vins_tpu.models import update_helper as uh
from tests.test_ekf import make_state, CFG


def test_information_equivalence():
    rng = np.random.default_rng(0)
    D = CFG.state_dim
    m = 6 * D
    H = jnp.asarray(rng.normal(size=(m, D)) * 0.3, jnp.float32)
    # zero some rows (padded features)
    H = H.at[m // 2 :].mul(0.0)
    res = jnp.asarray(rng.normal(size=m) * 0.05, jnp.float32)
    res = res.at[m // 2 :].set(0.0)

    Hq, rq = uh.compress_system(H, res, D)
    Hc, rc = uh.compress_system_cholesky(H, res, D)

    # same information matrices
    np.testing.assert_allclose(
        np.array(Hq.T @ Hq), np.array(Hc.T @ Hc), atol=2e-2, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.array(Hq.T @ rq), np.array(Hc.T @ rc), atol=5e-3, rtol=1e-3
    )


def test_same_ekf_update():
    rng = np.random.default_rng(1)
    st = make_state(seed=2)
    D = CFG.state_dim
    m = 4 * D
    H = jnp.asarray(rng.normal(size=(m, D)) * 0.2, jnp.float32)
    res = jnp.asarray(rng.normal(size=m) * 0.02, jnp.float32)
    r_diag = jnp.ones(D, jnp.float32) * 1.0

    Hq, rq = uh.compress_system(H, res, D)
    Hc, rc = uh.compress_system_cholesky(H, res, D)
    sq = ekf.ekf_update(st, CFG, Hq, rq, r_diag)
    sc = ekf.ekf_update(st, CFG, Hc, rc, r_diag)
    np.testing.assert_allclose(np.array(sq.p), np.array(sc.p), atol=2e-4)
    np.testing.assert_allclose(np.array(sq.cov), np.array(sc.cov), atol=2e-3)


def test_e2e_accuracy_default_path():
    """The default (QR) compression must stay accurate closed-loop.

    The opt-in cholesky path is NOT run closed-loop here: its f32 jitter
    injects spurious information and diverges over long horizons (the
    documented caveat in update_helper.compress_system_cholesky) — the
    one-shot equivalence above is its correctness contract.
    """
    from open_vins_tpu.models import runner
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.sim import simulator

    params = simulator.SimParams(imu_rate=200.0, cam_rate=20.0, num_cams=1,
                                 num_pts=30, map_size=512, duration=5.0)
    tri_opts = tri.TriangulationOptions()
    sim = simulator.build(params, seed=9)
    run = runner.stage_run(sim, params)
    cfg = FilterConfig(max_clones=9, max_slam=0, num_cams=1,
                       max_msckf_in_update=20)
    state, outs = jax.jit(
        lambda r: runner.run_filter(cfg, tri_opts, sim, params, r)
    )(run)
    ps = np.array(outs[1])
    gt = np.array(run.gt_p)[1:]
    rmse = np.sqrt(((ps - gt) ** 2).sum(1).mean())
    assert rmse < 0.15, f"default path RMSE {rmse}"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def _support_H(rng, m, cfg, ranges):
    """Random H with rows supported only on `ranges` (cam-feature shape)."""
    D = cfg.state_dim
    H = np.zeros((m, D), np.float32)
    for a, b in ranges:
        H[:, a:b] = rng.normal(size=(m, b - a)) * 0.3
    return jnp.asarray(H)


def test_compress_ranges_information_equivalence():
    """compress_system_ranges == compress_system for support-limited H."""
    rng = np.random.default_rng(3)
    cfg = CFG
    D = cfg.state_dim
    ranges = cfg.cam_meas_support_ranges
    m = 3 * D
    H = _support_H(rng, m, cfg, ranges)
    res = jnp.asarray(rng.normal(size=m).astype(np.float32) * 0.05)

    Hq, rq = uh.compress_system(H, res, D)
    Hr, rr = uh.compress_system_ranges(H, res, ranges, D)

    k = sum(b - a for a, b in ranges)
    assert Hr.shape == (k, D)
    np.testing.assert_allclose(
        np.array(Hq.T @ Hq), np.array(Hr.T @ Hr), atol=2e-2, rtol=1e-3)
    np.testing.assert_allclose(
        np.array(Hq.T @ rq), np.array(Hr.T @ rr), atol=5e-3, rtol=1e-3)


def test_ranges_update_matches_dense():
    """ekf_update with static column support == the dense update."""
    rng = np.random.default_rng(4)
    st = make_state(seed=5)
    cfg = CFG
    D = cfg.state_dim
    for ranges in (cfg.cam_meas_support_ranges, cfg.slam_meas_support_ranges):
        m = 2 * D
        H = _support_H(rng, m, cfg, ranges)
        res = jnp.asarray(rng.normal(size=m).astype(np.float32) * 0.02)

        Hq, rq = uh.compress_system(H, res, D)
        rdq = jnp.ones(D, jnp.float32)
        s_dense = ekf.ekf_update(st, cfg, Hq, rq, rdq)

        Hr, rr = uh.compress_system_ranges(H, res, ranges, D)
        rdr = jnp.ones(Hr.shape[0], jnp.float32)
        s_rng = ekf.ekf_update(st, cfg, Hr, rr, rdr, ranges=ranges)

        np.testing.assert_allclose(np.array(s_dense.p), np.array(s_rng.p),
                                   atol=2e-4)
        np.testing.assert_allclose(np.array(s_dense.cov), np.array(s_rng.cov),
                                   atol=2e-3)


def test_cholqr2_ill_conditioned_and_rank_deficient():
    """CholeskyQR2 must hold RᵀR = AᵀA through cond ~1e3 + zero columns."""
    rng = np.random.default_rng(7)
    m, n = 500, 80
    U = np.linalg.qr(rng.normal(size=(m, n)))[0]
    V = np.linalg.qr(rng.normal(size=(n, n)))[0]
    sv = np.logspace(0, -3, n)  # cond 1e3
    A = (U * sv) @ V.T
    A[:, 40:44] = 0.0  # structurally dead columns (uncalibrated block)
    A = jnp.asarray(A.astype(np.float32))
    R = uh._cholqr2_r(A)
    G = np.array(A, np.float64).T @ np.array(A, np.float64)
    G2 = np.array(R, np.float64).T @ np.array(R, np.float64)
    scale = float(np.abs(G).max())
    np.testing.assert_allclose(G2 / scale, G / scale, atol=5e-6)
