#!/usr/bin/env python
"""Detailed benchmarks: single-stream frames/s, ensemble throughput, and
EKF-update p50 latency (the north-star per-kernel metric).

Usage: python examples/bench_detail.py [--cpu] [--ensemble 8] [--duration 10]
Prints one JSON object per line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# per-platform compile cache set in main() — never share a dir between CPU
# and the remote tunnel backend (SIGILL-poisoned AOT artifacts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ensemble", type=int, default=8)
    ap.add_argument("--duration", type=float, default=10.0)
    args = ap.parse_args()

    os.environ.setdefault(
        "OVT_JAX_CACHE",
        os.path.expanduser("~/.cache/ovt_cpu_test_cache" if args.cpu
                           else "~/.cache/ovt_tpu_cache"))
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import open_vins_tpu  # noqa: F401
    from open_vins_tpu.core import ekf
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.models import feature_table as ft
    from open_vins_tpu.models import manager, runner
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.ops import lie
    from open_vins_tpu.sim import simulator

    params = simulator.SimParams(imu_rate=200.0, cam_rate=20.0, num_cams=1,
                                 num_pts=100, map_size=2048,
                                 duration=args.duration)
    cfg = FilterConfig(max_clones=11, max_slam=0, num_cams=1,
                       max_msckf_in_update=40)
    tri_opts = tri.TriangulationOptions()
    sim = simulator.build(params, seed=0)
    run = runner.stage_run(sim, params)
    jax.block_until_ready(run.frames.uv)
    n_frames = simulator.n_cam_frames(params) - 1

    # --- single stream
    fil = jax.jit(lambda r: runner.run_filter(cfg, tri_opts, sim, params, r))
    state, outs = fil(run)
    jax.block_until_ready(state.cov)
    t0 = time.time()
    for _ in range(3):
        state, outs = fil(run)
    jax.block_until_ready(state.cov)
    fps1 = n_frames / ((time.time() - t0) / 3)
    print(json.dumps({"metric": "frames_per_sec_single", "value": round(fps1, 1)}))

    # --- ensemble throughput: E independent filters, one vmapped scan
    E = args.ensemble
    def one(seed):
        st = manager.initialize_from_gt(
            cfg, run.gt_q[0], run.gt_p[0], run.gt_v[0],
            sim.bias_g_traj[0], sim.bias_a_traj[0], 0.0,
            jax.vmap(lie.rot_2_quat)(sim.cam_R_ItoC), sim.cam_p_IinC,
            sim.cam_intr,
        )
        tb = ft.init_table(cfg, 256)
        return st, tb

    st0, tb0 = one(0)
    sts = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (E,) + a.shape).copy(), st0)
    tbs = jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (E,) + a.shape).copy(), tb0)

    @jax.jit
    def ens(sts, tbs):
        def body(carry, frame):
            s, t = carry
            s, t, d = jax.vmap(
                lambda ss, tt: manager.step_frame(ss, tt, cfg, tri_opts, frame)
            )(s, t)
            return (s, t), d.n_msckf

        (s, t), _ = jax.lax.scan(body, (sts, tbs), run.frames)
        return s

    s = ens(sts, tbs)
    jax.block_until_ready(s.cov)
    t0 = time.time()
    s = ens(sts, tbs)
    jax.block_until_ready(s.cov)
    fpsE = E * n_frames / (time.time() - t0)
    print(json.dumps({"metric": "frames_per_sec_ensemble",
                      "value": round(fpsE, 1), "ensemble": E}))

    # --- EKF update p50 latency (compressed system, realistic shapes)
    D = cfg.state_dim
    rng = np.random.default_rng(0)
    H = jnp.asarray(rng.normal(size=(D, D)) * 0.3, jnp.float32)
    res = jnp.asarray(rng.normal(size=D) * 0.01, jnp.float32)
    r = jnp.ones(D, jnp.float32)
    upd = jax.jit(lambda st, H, res, r: ekf.ekf_update(st, cfg, H, res, r))
    out = upd(state, H, res, r)
    jax.block_until_ready(out.cov)
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = upd(state, H, res, r)
        jax.block_until_ready(out.cov)
        lat.append(time.perf_counter() - t0)
    print(json.dumps({"metric": "ekf_update_p50_latency_us",
                      "value": round(float(np.percentile(lat, 50)) * 1e6, 1),
                      "state_dim": D}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
