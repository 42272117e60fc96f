"""Distributed tests on the 8-device CPU mesh: distributed BA vs dense,
sharded ensemble stepping (SURVEY.md §4 multi-host test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_vins_tpu.ops import lie
from open_vins_tpu.parallel import distributed_ba as dba
from open_vins_tpu.parallel import mesh as meshlib


def make_ba_problem(K=6, L=32, O=6, noise=1e-3, perturb=0.05, seed=0):
    rng = np.random.default_rng(seed)
    # camera ring around a point cloud
    Rs, ps = [], []
    for k in range(K):
        w = rng.normal(size=3) * 0.1
        Rs.append(np.array(lie.exp_so3(jnp.asarray(w))))
        ps.append(np.array([0.5 * k, 0.05 * k, 0.0]))
    Rs, ps = np.stack(Rs), np.stack(ps)
    lms = rng.uniform(-2, 2, size=(L, 3)) + np.array([1.5, 0, 6.0])
    obs_pose = np.tile(np.arange(O) % K, (L, 1)).astype(np.int32)
    obs_uvn = np.zeros((L, O, 2), np.float32)
    obs_mask = np.ones((L, O), bool)
    for l in range(L):
        for o in range(O):
            k = obs_pose[l, o]
            pC = Rs[k] @ (lms[l] - ps[k])
            if pC[2] < 0.5:
                obs_mask[l, o] = False
                continue
            obs_uvn[l, o] = pC[:2] / pC[2] + rng.normal(size=2) * noise
    # perturb initial guess
    Rs_n, ps_n = [Rs[0]], [ps[0]]
    for k in range(1, K):
        dw = rng.normal(size=3) * perturb * 0.2
        Rs_n.append(np.array(lie.exp_so3(jnp.asarray(-dw))) @ Rs[k])
        ps_n.append(ps[k] + rng.normal(size=3) * perturb)
    lms_n = lms + rng.normal(size=lms.shape) * perturb
    prob = dba.BAProblem(
        R=jnp.asarray(np.stack(Rs_n), jnp.float32),
        p=jnp.asarray(np.stack(ps_n), jnp.float32),
        landmarks=jnp.asarray(lms_n, jnp.float32),
        obs_pose=jnp.asarray(obs_pose),
        obs_uvn=jnp.asarray(obs_uvn),
        obs_mask=jnp.asarray(obs_mask),
        R_ItoC=jnp.eye(3, dtype=jnp.float32),
        p_IinC=jnp.zeros(3, dtype=jnp.float32),
    )
    return prob, (Rs, ps, lms)


class TestDistributedBA:
    def test_single_device_converges(self):
        prob, (Rs, ps, lms) = make_ba_problem()
        e0 = float(dba.reprojection_rmse(prob))
        prob2, norms = dba.refine(prob, iters=6)
        e1 = float(dba.reprojection_rmse(prob2))
        assert e1 < 0.2 * e0, f"BA did not converge: {e0} -> {e1}"
        # poses should approach truth (gauge-fixed at pose 0)
        perr = np.abs(np.array(prob2.p) - ps).max()
        assert perr < 0.02, f"pose error after BA {perr}"

    def test_distributed_matches_single(self):
        """8-way landmark sharding must give the same reduced system/update."""
        prob, _ = make_ba_problem(L=32)
        mesh = meshlib.make_mesh((8,), ("ba",))
        single, _ = dba.ba_step(prob)
        dist, _ = dba.ba_step(prob, mesh=mesh)
        np.testing.assert_allclose(
            np.array(single.p), np.array(dist.p), atol=1e-4
        )
        np.testing.assert_allclose(
            np.array(single.landmarks), np.array(dist.landmarks), atol=1e-3
        )

    def test_distributed_refine_converges(self):
        prob, _ = make_ba_problem(L=64, seed=3)
        mesh = meshlib.make_mesh((8,), ("ba",))
        e0 = float(dba.reprojection_rmse(prob))
        prob2, _ = dba.refine(prob, iters=6, mesh=mesh)
        e1 = float(dba.reprojection_rmse(prob2))
        assert e1 < 0.2 * e0


class TestEnsemble:
    def test_graft_dryrun(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
