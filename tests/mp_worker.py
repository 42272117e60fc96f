"""Worker for the 2-process jax.distributed test (run by
tests/test_multiprocess.py, one instance per process).

Covers the ≥2-host axis of BASELINE.json's scaling ladder on a CPU mesh:
jax.distributed.initialize + gloo collectives, a global 2-process×4-device
mesh, the row-sharded EKF update, and the distributed Schur BA — each
checked against the dense single-process math on this process's shards.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid = int(sys.argv[1])
    coord = sys.argv[2]
    jax.distributed.initialize(coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    n_global = jax.device_count()
    assert n_global == 8, f"expected 8 global devices, got {n_global}"

    import jax.numpy as jnp

    import open_vins_tpu  # noqa: F401
    from open_vins_tpu.core import ekf
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.core.state import init_state
    from open_vins_tpu.parallel import mesh as meshlib
    from open_vins_tpu.parallel import sharded_ekf

    # ---- sharded EKF update across the process boundary ----
    cfg = FilterConfig(max_clones=5, max_slam=4, num_cams=1)
    D = cfg.state_dim
    rng = np.random.default_rng(0)  # identical data on both processes
    A = rng.normal(size=(D, D)) * 0.1
    P0 = (A @ A.T + 0.1 * np.eye(D)).astype(np.float32)
    H = (rng.normal(size=(24, D)) * 0.2).astype(np.float32)
    res = (rng.normal(size=(24,)) * 0.01).astype(np.float32)
    r = np.full((24,), 0.01, np.float32)

    mesh = meshlib.make_mesh((n_global,), ("x",))
    st = init_state(cfg)._replace(cov=jnp.asarray(P0))
    st_s = sharded_ekf.shard_state(st, mesh)
    upd = sharded_ekf.sharded_ekf_update(mesh, cfg)
    out = upd(st_s, jnp.asarray(H), jnp.asarray(res), jnp.asarray(r))
    jax.block_until_ready(out.cov)

    # dense single-process reference (same math, no mesh)
    _, cov_ref = ekf.kalman_update_math(
        jnp.asarray(P0), jnp.asarray(H), jnp.asarray(res), jnp.asarray(r),
        fuse_downdate=False)
    cov_ref = np.array(cov_ref)
    Dp = out.cov.shape[0]  # padded
    checked = 0
    for shard in out.cov.addressable_shards:
        rows = shard.index[0]
        got = np.asarray(shard.data)
        lo, hi = rows.start or 0, min(rows.stop or Dp, D)
        for i, gi in enumerate(range(lo, hi)):
            np.testing.assert_allclose(got[i, :D], cov_ref[gi], atol=2e-4,
                                       rtol=1e-3)
            checked += 1
    assert checked > 0, "no addressable covariance rows on this process"
    print(f"proc {pid}: sharded EKF update rows OK ({checked} rows)",
          flush=True)

    # ---- distributed Schur BA across the process boundary ----
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from tests.test_parallel import make_ba_problem
    from open_vins_tpu.parallel import distributed_ba as dba

    prob, _ = make_ba_problem(L=n_global * 4)
    dense_prob, dense_norms = dba.refine(prob, iters=2, mesh=None)
    mesh_ba = meshlib.make_mesh((n_global,), ("ba",))
    dist_prob, dist_norms = dba.refine(prob, iters=2, mesh=mesh_ba)
    jax.block_until_ready(dist_prob.p)
    np.testing.assert_allclose(np.array(dist_prob.p), np.array(dense_prob.p),
                               atol=1e-4, rtol=1e-3)
    print(f"proc {pid}: distributed Schur BA == dense OK", flush=True)
    print(f"proc {pid}: MULTIPROCESS_OK", flush=True)


if __name__ == "__main__":
    main()
