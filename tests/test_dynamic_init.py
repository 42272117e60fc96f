"""Dynamic initializer test: simulator data -> DynamicInitializer -> compare
to groundtruth (test_dynamic_init parity, ov_init/src/test_dynamic_init.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.init import dynamic_init
from open_vins_tpu.ops import lie
from open_vins_tpu.sim import simulator

PARAMS = simulator.SimParams(
    imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=30, map_size=512,
    duration=4.0, sigma_pix=1.0,
)


def build_input(sim, params, n_pose=6, window=2.0, seed=0, fixed_F=None):
    """Assemble a DynInitInput from the simulator over [0, window]."""
    frames_per_pose = int(window * params.cam_rate / (n_pose - 1))
    frame_idx = [k * frames_per_pose for k in range(n_pose)]
    t_pose = jnp.asarray([k / params.cam_rate for k in frame_idx])
    ipc = simulator.imu_per_cam(params)
    K = frames_per_pose * ipc + 1

    imu_t, imu_w, imu_a = [], [], []
    for s in range(n_pose - 1):
        i0 = frame_idx[s] * ipc
        steps = range(i0, i0 + K)
        samples = [simulator.get_imu(sim, params, n) for n in steps]
        imu_t.append([float(x.t) for x in samples])
        imu_w.append(np.stack([np.array(x.wm) for x in samples]))
        imu_a.append(np.stack([np.array(x.am) for x in samples]))

    cams = [simulator.get_cam(sim, params, k) for k in frame_idx]
    # collect features seen in >= half of the poses
    from collections import defaultdict
    obs = defaultdict(dict)
    for k, c in enumerate(cams):
        ids = np.array(c.ids[0])
        uvn = np.array(c.uvs_norm[0])
        mask = np.array(c.mask[0])
        for j in range(len(ids)):
            if mask[j] and ids[j] >= 0:
                obs[int(ids[j])][k] = uvn[j]
    feats = [fid for fid, d in obs.items() if len(d) >= n_pose // 2 + 1]
    F = min(len(feats), 25) if fixed_F is None else fixed_F
    uvn_arr = np.zeros((F, n_pose, 2), np.float32)
    m_arr = np.zeros((F, n_pose), bool)
    for fi, fid in enumerate(feats[:F]):
        for k, uv in obs[fid].items():
            uvn_arr[fi, k] = uv
            m_arr[fi, k] = True

    return dynamic_init.DynInitInput(
        t_pose=t_pose,
        imu_t=jnp.asarray(np.array(imu_t), jnp.float32),
        imu_w=jnp.asarray(np.array(imu_w), jnp.float32),
        imu_a=jnp.asarray(np.array(imu_a), jnp.float32),
        uvn=jnp.asarray(uvn_arr),
        obs_mask=jnp.asarray(m_arr),
        R_ItoC=sim.cam_R_ItoC[0],
        p_IinC=sim.cam_p_IinC[0],
    )


class TestDynamicInit:
    def test_recovers_state(self):
        sim = simulator.build(PARAMS, seed=11)
        inp = build_input(sim, PARAMS)
        opts = dynamic_init.DynamicInitOptions()
        res = jax.jit(lambda i: dynamic_init.initialize(i, opts))(inp)
        assert bool(res.success), "dynamic init did not converge"

        t_last = float(inp.t_pose[-1])
        q_gt, p_gt, v_gt, bg_gt, ba_gt = simulator.get_state(
            sim, PARAMS, jnp.asarray(t_last)
        )
        # velocity: a 2 s window leaves a scale/bias ambiguity (the reference
        # has the same observability limit) — require |v| within 20% and the
        # recovered covariance to actually cover the error (consistency).
        v_est = np.array(res.v)
        v_true = np.array(v_gt)
        assert abs(np.linalg.norm(v_est) - np.linalg.norm(v_true)) < 0.25, \
            f"|v| {np.linalg.norm(v_est)} vs {np.linalg.norm(v_true)}"
        P_vv = np.array(res.cov15)[6:9, 6:9]
        e_v_mag = abs(np.linalg.norm(v_est) - np.linalg.norm(v_true))
        sigma_v = np.sqrt(np.trace(P_vv))
        assert e_v_mag < 4.0 * sigma_v + 0.05, \
            f"velocity error {e_v_mag} not covered by sigma {sigma_v}"

        # gravity direction in the last body frame must match
        g_body_est = np.array(lie.quat_2_rot(res.q_GtoI)) @ np.array([0, 0, 1.0])
        g_body_true = np.array(lie.quat_2_rot(q_gt)) @ np.array([0, 0, 1.0])
        assert np.dot(g_body_est, g_body_true) > 0.999, \
            f"gravity dir {g_body_est} vs {g_body_true}"

        # biases near truth (sim biases are ~1e-3 magnitude random walks)
        assert np.linalg.norm(np.array(res.bg) - np.array(bg_gt)) < 0.02
        assert np.linalg.norm(np.array(res.ba) - np.array(ba_gt)) < 0.25

        # covariance must be positive definite and finite
        c = np.array(res.cov15)
        assert np.all(np.isfinite(c))
        assert np.linalg.eigvalsh(c).min() > 0

    @pytest.mark.slow
    def test_covariance_monte_carlo_nees(self):
        """Sampled NEES of the recovered init covariance ≈ dof.

        Validates the CPI-whitened GN covariance (VERDICT round-1 item #8):
        over noise realizations, the gauge-invariant error subset
        [v_body(3), bg(3), ba(3)] must be statistically covered by the
        corresponding cov15 blocks with inflation disabled.  v_body = R(q)v
        is gauge-invariant (global yaw/position are unobservable), with
        J = [⌊R̂v̂⌋, R̂] mapping (δθ, δv) covariance into it.
        """
        opts = dynamic_init.DynamicInitOptions(
            inflation_ori=1.0, inflation_vel=1.0,
            inflation_bg=1.0, inflation_ba=1.0,
        )
        init_fn = jax.jit(lambda i: dynamic_init.initialize(i, opts))
        nees = []
        for seed in range(6):
            sim = simulator.build(PARAMS, seed=100 + seed)
            inp = build_input(sim, PARAMS, fixed_F=25)
            res = init_fn(inp)
            if not bool(res.success):
                continue
            t_last = float(inp.t_pose[-1])
            q_gt, p_gt, v_gt, bg_gt, ba_gt = simulator.get_state(
                sim, PARAMS, jnp.asarray(t_last))
            R_est = np.array(lie.quat_2_rot(res.q_GtoI))
            v_est = np.array(res.v)
            v_body_est = R_est @ v_est
            v_body_gt = np.array(lie.quat_2_rot(q_gt)) @ np.array(v_gt)
            e = np.concatenate([
                v_body_est - v_body_gt,
                np.array(res.bg) - np.array(bg_gt),
                np.array(res.ba) - np.array(ba_gt),
            ])
            c = np.array(res.cov15, dtype=np.float64)
            J = np.zeros((3, 6))
            Rv = R_est @ v_est
            J[:, :3] = np.array([[0, -Rv[2], Rv[1]],
                                 [Rv[2], 0, -Rv[0]],
                                 [-Rv[1], Rv[0], 0]])
            J[:, 3:] = R_est
            idx_tv = np.r_[0:3, 6:9]
            P_vb = J @ c[np.ix_(idx_tv, idx_tv)] @ J.T
            P9 = np.zeros((9, 9))
            P9[:3, :3] = P_vb
            P9[3:6, 3:6] = c[9:12, 9:12]
            P9[6:9, 6:9] = c[12:15, 12:15]
            # cross terms between v_body and biases
            P9[:3, 3:9] = J @ c[np.ix_(idx_tv, np.r_[9:15])]
            P9[3:9, :3] = P9[:3, 3:9].T
            P9[3:9, 3:9] = c[9:15, 9:15]
            nees.append(e @ np.linalg.solve(P9 + 1e-14 * np.eye(9), e))
        assert len(nees) >= 4, f"too few successful inits ({len(nees)}/6)"
        m = float(np.mean(nees))
        # dof 9; loose band (few samples + nonlinearity), but catches the
        # old scalar-whitening miscalibration (which sat far outside it)
        assert 2.0 < m < 30.0, f"init MC NEES {m:.1f} (dof 9): {nees}"

    @pytest.mark.slow
    def test_fails_gracefully_without_features(self):
        sim = simulator.build(PARAMS, seed=12)
        inp = build_input(sim, PARAMS)
        inp = inp._replace(obs_mask=jnp.zeros_like(inp.obs_mask))
        opts = dynamic_init.DynamicInitOptions()
        res = dynamic_init.initialize(inp, opts)
        assert not bool(res.success)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestPreintCov15:
    """MC validation of the 15-state CPI measurement covariance
    (CpiBase.h:49-150 parity: bias random-walk rows propagate and inflate
    the [δθ δβ δα] marginal used to whiten the MLE residuals)."""

    @pytest.fixture(autouse=True, scope="class")
    def _x64(self):
        old = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        yield
        jax.config.update("jax_enable_x64", old)

    def _segment(self, K=40, rate=200.0):
        t = jnp.arange(K, dtype=jnp.float64) / rate
        w = jnp.stack([0.4 * jnp.sin(3 * t), 0.3 * jnp.cos(2 * t),
                       0.2 * jnp.ones_like(t)], axis=-1)
        a = jnp.stack([0.5 * jnp.cos(t), 9.81 + 0.3 * jnp.sin(2 * t),
                       0.4 * t], axis=-1)
        return t, w, a

    def test_bias_walk_blocks_and_inflation(self):
        t, w, a = self._segment()
        z = jnp.zeros(3, jnp.float64)
        sw, sa, swb, sab = 1.7e-4, 2e-3, 0.05, 0.5
        P15 = dynamic_init._preintegrate_cov(t, w, a, z, z, sw, sa,
                                             swb, sab, full15=True)
        T = float(t[-1] - t[0])
        # bias rows are a pure random walk: Var = σ_b² ΔT, no cross terms
        np.testing.assert_allclose(np.array(P15[9:12, 9:12]),
                                   swb**2 * T * np.eye(3), rtol=1e-6)
        np.testing.assert_allclose(np.array(P15[12:15, 12:15]),
                                   sab**2 * T * np.eye(3), rtol=1e-6)
        # the walk must inflate the measurement marginal beyond white noise
        P9_white = dynamic_init._preintegrate_cov(t, w, a, z, z, sw, sa)
        P9_walk = P15[:9, :9]
        d = np.diag(np.array(P9_walk - P9_white))
        assert (d >= -1e-18).all()
        assert d[3:].sum() > 0.2 * np.diag(np.array(P9_white))[3:].sum(), (
            "bias walk at this magnitude should visibly inflate β/α")

    def test_monte_carlo_marginal(self):
        """Empirical cov of preintegration error under white noise + bias
        walk matches the propagated [δθ δβ δα] marginal (NEES ≈ 9)."""
        t, w_true, a_true = self._segment()
        K = t.shape[0]
        dt = float(t[1] - t[0])
        z = jnp.zeros(3, jnp.float64)
        sw, sa, swb, sab = 2e-3, 2e-2, 0.02, 0.2
        P9 = np.array(dynamic_init._preintegrate_cov(
            t, w_true, a_true, z, z, sw, sa, swb, sab))

        R_c, al_c, be_c = dynamic_init._preintegrate(t, w_true, a_true, z, z)
        R_c, al_c, be_c = np.array(R_c), np.array(al_c), np.array(be_c)

        pre = jax.jit(jax.vmap(
            lambda wn, an: dynamic_init._preintegrate(t, wn, an, z, z)))
        rng = np.random.default_rng(3)
        N = 500
        ng = rng.normal(size=(N, K, 3)) * (sw / np.sqrt(dt))
        na = rng.normal(size=(N, K, 3)) * (sa / np.sqrt(dt))
        bg = np.cumsum(
            np.concatenate([np.zeros((N, 1, 3)),
                            rng.normal(size=(N, K - 1, 3)) * (swb * np.sqrt(dt))],
                           axis=1), axis=1)
        ba = np.cumsum(
            np.concatenate([np.zeros((N, 1, 3)),
                            rng.normal(size=(N, K - 1, 3)) * (sab * np.sqrt(dt))],
                           axis=1), axis=1)
        R_n, al_n, be_n = pre(jnp.asarray(w_true + ng + bg),
                              jnp.asarray(a_true + na + ba))
        R_n, al_n, be_n = np.array(R_n), np.array(al_n), np.array(be_n)

        errs = np.zeros((N, 9))
        for i in range(N):
            errs[i, :3] = -np.array(lie.log_so3(jnp.asarray(R_n[i] @ R_c.T)))
            errs[i, 3:6] = be_n[i] - be_c
            errs[i, 6:9] = al_n[i] - al_c
        nees = np.einsum("ni,ij,nj->n", errs,
                         np.linalg.inv(P9 + 1e-18 * np.eye(9)), errs)
        m = float(nees.mean())
        # dof 9; 500 samples → tight-ish band.  Catches wrong signs on the
        # bias columns (cross terms flip → NEES far from dof).
        assert 7.0 < m < 11.5, f"preint MC NEES {m:.2f} (dof 9)"
        # per-block variance ratio sanity
        emp = errs.T @ errs / N
        for blk in (slice(0, 3), slice(3, 6), slice(6, 9)):
            r = np.trace(emp[blk, blk]) / np.trace(P9[blk, blk])
            assert 0.75 < r < 1.3, f"block {blk} variance ratio {r:.2f}"


class TestDegenerateGeometry:
    """Stress cases where the |g| = 9.81 constraint BINDS (VERDICT r03 #8):
    near-constant acceleration and short windows — the geometries the
    reference solves with the Dongsi companion-matrix quartic
    (ov_init/src/utils/helper.h:183) and this build with alternating
    projection + a stiff norm prior.  Requirement: the initializer either
    recovers v/|g-direction| within bounds, or REFUSES (success=False) —
    it must never hand back a confidently-wrong state."""

    @staticmethod
    def _const_accel_traj(duration=8.0, dt=0.05):
        """Constant-acceleration, constant-orientation trajectory: the
        accelerometer reads a CONSTANT vector, so only |g| separates the
        gravity/acceleration split (the classic degenerate case)."""
        n = int(duration / dt) + 8
        t = np.arange(n) * dt
        a = np.array([0.35, -0.25, 0.15])
        p = 0.5 * a[None, :] * (t**2)[:, None]
        R = np.tile(np.eye(3), (n, 1, 1))
        return (jnp.asarray(t, jnp.float32), jnp.asarray(R, jnp.float32),
                jnp.asarray(p, jnp.float32))

    def _check(self, res, sim, params, t_last, v_tol, dir_tol):
        ok = bool(res.success)
        if not ok:
            return "refused"
        q_gt, p_gt, v_gt, bg_gt, ba_gt = simulator.get_state(
            sim, params, jnp.asarray(t_last))
        g_body_est = np.array(lie.quat_2_rot(res.q_GtoI)) @ np.array([0, 0, 1.0])
        g_body_true = np.array(lie.quat_2_rot(q_gt)) @ np.array([0, 0, 1.0])
        cosg = float(np.dot(g_body_est, g_body_true))
        v_err = abs(float(np.linalg.norm(np.array(res.v)))
                    - float(np.linalg.norm(np.array(v_gt))))
        assert cosg > dir_tol, (
            f"accepted init with wrong gravity dir (cos {cosg:.4f})")
        # accepted => covariance must be finite PSD
        c = np.array(res.cov15)
        assert np.all(np.isfinite(c))
        assert np.linalg.eigvalsh(c).min() > 0
        # velocity: small error OR an honest covariance that covers it.
        # Constant acceleration leaves the monocular scale (and hence |v|)
        # weakly observable — the requirement is that a large error MUST
        # be accompanied by a large reported sigma, never a confident lie.
        sigma_v = float(np.sqrt(np.trace(c[6:9, 6:9])))
        assert v_err < max(v_tol, 4.0 * sigma_v), (
            f"accepted init with |v| error {v_err:.3f} while reporting "
            f"sigma_v {sigma_v:.3f} — a confidently-wrong velocity")
        return "accepted"

    def test_constant_acceleration(self):
        params = PARAMS._replace(duration=6.0)
        traj = self._const_accel_traj()
        sim = simulator.build(params, seed=5, traj=traj)
        inp = build_input(sim, params, n_pose=6, window=2.0)
        opts = dynamic_init.DynamicInitOptions()
        res = jax.jit(lambda i: dynamic_init.initialize(i, opts))(inp)
        out = self._check(res, sim, params, float(inp.t_pose[-1]),
                          v_tol=0.35, dir_tol=0.995)
        # constant-acceleration with the norm constraint IS solvable —
        # a refusal here would be over-conservative but safe; log either way
        print(f"const-accel init: {out}")

    def test_short_window(self):
        """0.75 s / 4-pose window: barely-excited, the covariance must be
        honest (large) or the init must refuse."""
        sim = simulator.build(PARAMS, seed=11)
        inp = build_input(sim, PARAMS, n_pose=4, window=0.75)
        opts = dynamic_init.DynamicInitOptions()
        res = jax.jit(lambda i: dynamic_init.initialize(i, opts))(inp)
        out = self._check(res, sim, PARAMS, float(inp.t_pose[-1]),
                          v_tol=0.5, dir_tol=0.99)
        print(f"short-window init: {out}")

    def test_short_window_and_const_accel(self):
        """The compound worst case: short window AND constant acceleration.
        Acceptance with a wrong gravity direction is the failure mode the
        constraint exists to prevent."""
        params = PARAMS._replace(duration=6.0)
        traj = self._const_accel_traj()
        sim = simulator.build(params, seed=7, traj=traj)
        inp = build_input(sim, params, n_pose=4, window=1.0)
        opts = dynamic_init.DynamicInitOptions()
        res = jax.jit(lambda i: dynamic_init.initialize(i, opts))(inp)
        out = self._check(res, sim, params, float(inp.t_pose[-1]),
                          v_tol=0.6, dir_tol=0.99)
        print(f"short+const-accel init: {out}")
