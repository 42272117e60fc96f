#!/usr/bin/env python
"""Headline benchmark: closed-loop sim VIO frames/s on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference runs real-time on a desktop
CPU with 20 Hz cameras — i.e. ~20 frames/s sustained, with faster-than-
realtime serial replay (no published fps; we take 20 fps real-time as the
reference operating point).  vs_baseline is therefore frames_per_sec / 20.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# TPU-scoped persistent compile cache (first driver run pays the compile,
# reruns start in seconds); safe because bench always runs on the same
# platform.
os.environ.setdefault("OVT_JAX_CACHE", os.path.expanduser("~/.cache/ovt_tpu_cache"))


def main():
    import jax
    import numpy as np

    import open_vins_tpu  # noqa: F401  (forces f32 matmul precision)
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.models import runner
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.sim import simulator, trajectories

    # reference real-time operating point: 200 pts, 11 clones, 20 Hz cam,
    # on the reference's own flagship sim trajectory when available
    params = simulator.SimParams(
        imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=100,
        map_size=2048, duration=20.0, sigma_pix=1.0, start_offset=3.0,
    )
    cfg = FilterConfig(max_clones=11, max_slam=0, num_cams=1,
                       max_msckf_in_update=40)
    tri_opts = tri.TriangulationOptions()

    traj = None
    gore = os.path.join(trajectories.REFERENCE_SIM_DIR, "udel_gore.txt")
    if os.path.exists(gore):
        traj = trajectories.load_trajectory_file(gore)
    sim = simulator.build(params, seed=0, traj=traj)
    run = runner.stage_run(sim, params)
    jax.block_until_ready(run.frames.uv)

    fil = jax.jit(lambda r: runner.run_filter(cfg, tri_opts, sim, params, r))
    state, outs = fil(run)
    jax.block_until_ready(state.cov)  # compile + warmup

    n_frames = simulator.n_cam_frames(params) - 1
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        state, outs = fil(run)
    jax.block_until_ready(state.cov)
    dt = (time.time() - t0) / reps
    fps = n_frames / dt

    # sanity: the run must actually be a working filter
    ps = np.array(outs[1])
    gt_p = np.array(run.gt_p)[1:]
    rmse = float(np.sqrt(((ps - gt_p) ** 2).sum(1).mean()))
    healthy = np.isfinite(np.array(state.cov)).all() and rmse < 0.3

    print(json.dumps({
        "metric": "sim_vio_frames_per_sec_1chip",
        "value": round(fps, 1) if healthy else 0.0,
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 2) if healthy else 0.0,
    }))


if __name__ == "__main__":
    main()
