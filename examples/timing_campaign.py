#!/usr/bin/env python
"""Honest-timing campaign: separate DEVICE time from TUNNEL/DISPATCH time.

Context (VERDICT r04 #1): commit 1bd4c16 discovered `jax.block_until_ready`
through the axon tunnel can return WITHOUT waiting; with forced per-rep
host syncs the B=8 ensemble measured BELOW single-stream (1620 agg fps vs
1970) — either a real device-side serialization (a custom call under vmap)
or per-invocation dispatch overhead polluting wall clock.  This tool
answers which, with three independent measurements per batch size B:

  wall    — median wall time per invocation, forced tiny host transfer
            per rep (unfakeable sync; same harness as bench.py).
  in-jit  — a `lax.fori_loop` over R repetitions INSIDE one jit, with a
            loop-carried f32 perturbation (`uv + acc`, acc ~ 1e-30: exact
            f32 no-op numerically, but data-dependent so XLA cannot CSE
            the iterations).  The loop bound is a traced scalar, so ONE
            compile serves every R.  device_per_rep = (T(R2)-T(R1))/(R2-R1)
            cancels dispatch overhead AND transfer cost exactly.
  xplane  — device leaf-op time + busy/span from a jax.profiler capture
            of one invocation (when the backend exposes device events).

Prints one JSON line per (B, measurement) and a final summary table; use
--json OUT to save the full record (bench.py embeds the result in
BENCH_r05 device/wall columns).

Usage: python examples/timing_campaign.py [--batches 1,8,32] [--reps 5]
         [--injit 1,5] [--xplane] [--json results/TIMING_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# per-platform compile cache set in main() — never share a dir between CPU
# and the remote tunnel backend (SIGILL-poisoned AOT artifacts)


def device_time_from_xplane(trace_dir):
    """Sum leaf XLA-op durations + busy/span from the newest xplane.pb."""
    import glob
    from collections import defaultdict
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        return None
    hits = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        return None
    xs = xplane_pb2.XSpace()
    with open(hits[-1], "rb") as f:
        xs.ParseFromString(f.read())
    skip = ("%while", "%cond", "%conditional", "jit_", "%call")
    for plane in xs.planes:
        if "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = defaultdict(float)
            t_min, t_max = float("inf"), 0.0
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                t0 = ev.offset_ps
                t_min = min(t_min, t0)
                t_max = max(t_max, t0 + ev.duration_ps)
                if name.startswith(skip):
                    continue
                tot[name] += ev.duration_ps / 1e12
            if tot:
                return {"leaf_s": sum(tot.values()),
                        "span_s": (t_max - t_min) / 1e12,
                        "top": sorted(tot.items(), key=lambda kv: -kv[1])[:8]}
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--injit", default="1,5",
                    help="two in-jit rep counts R1,R2 for differencing")
    ap.add_argument("--xplane", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (smoke test)")
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
    from open_vins_tpu.core.layout import FilterConfig
    from open_vins_tpu.models import runner
    from open_vins_tpu.models import triangulation as tri
    from open_vins_tpu.sim import simulator, trajectories
    from open_vins_tpu.utils import profiling

    params = simulator.SimParams(
        imu_rate=200.0, cam_rate=20.0, num_cams=1, num_pts=200,
        map_size=2048, duration=args.duration, sigma_pix=1.0,
        start_offset=3.0,
    )
    cfg = FilterConfig(max_clones=11, max_slam=50, num_cams=1,
                       max_msckf_in_update=40, integration="analytical",
                       newton_iters=14)
    tri_opts = tri.TriangulationOptions()
    traj = None
    gore = os.path.join(trajectories.REFERENCE_SIM_DIR, "udel_gore.txt")
    if os.path.exists(gore):
        traj = trajectories.load_trajectory_file(gore)
    sim = simulator.build(params, seed=0, traj=traj)
    run = runner.stage_run(sim, params)
    np.asarray(run.frames.uv[0, 0, 0])  # staged (forced sync)
    n_frames = simulator.n_cam_frames(params) - 1

    R1, R2 = (int(x) for x in args.injit.split(","))
    records = []

    for B in (int(x) for x in args.batches.split(",")):
        if B == 1:
            fil = jax.jit(lambda r: runner.run_filter(
                cfg, tri_opts, sim, params, r, max_tracks=384))
            brun = run
        else:
            fil = jax.jit(jax.vmap(lambda r: runner.run_filter(
                cfg, tri_opts, sim, params, r, max_tracks=384)))
            brun = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape), run)

        # -- wall (forced per-rep host sync)
        t_c = time.time()
        state, outs = fil(brun)
        _ = np.asarray(outs[1]).ravel()[-1]
        compile_s = time.time() - t_c
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, outs = fil(brun)
            _ = np.asarray(outs[1]).ravel()[-1]  # unfakeable sync
            walls.append(time.perf_counter() - t0)
        wall_med = float(np.median(walls))

        # -- in-jit fori differencing (traced bound: one compile, any R)
        def run_reps(r, reps):
            def body(i, acc):
                ri = r._replace(frames=r.frames._replace(
                    uv=r.frames.uv + acc))
                _, o = (runner.run_filter(cfg, tri_opts, sim, params, ri,
                                          max_tracks=384)
                        if B == 1 else
                        jax.vmap(lambda rr: runner.run_filter(
                            cfg, tri_opts, sim, params, rr,
                            max_tracks=384))(ri))
                # value ~ |p|*1e-30: adding it to pixel coords is an exact
                # f32 no-op, but the data dependence defeats CSE/DCE
                return jnp.asarray(o[1]).ravel()[-1] * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        rep_fn = jax.jit(run_reps)
        _ = np.asarray(rep_fn(brun, jnp.int32(1)))  # compile
        t_injit = {}
        for R in (R1, R2):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(rep_fn(brun, jnp.int32(R)))
                ts.append(time.perf_counter() - t0)
            t_injit[R] = float(np.median(ts))
        dev_per_rep = (t_injit[R2] - t_injit[R1]) / (R2 - R1)
        overhead = t_injit[R1] - dev_per_rep * R1

        rec = {
            "B": B, "n_frames": n_frames, "compile_s": round(compile_s, 1),
            "wall_s_median": round(wall_med, 4),
            "wall_agg_fps": round(B * n_frames / wall_med, 1),
            "injit_device_s_per_rep": round(dev_per_rep, 4),
            "injit_agg_fps": round(B * n_frames / max(dev_per_rep, 1e-9), 1),
            "dispatch_overhead_s": round(overhead, 4),
            "walls": [round(w, 4) for w in walls],
        }

        if args.xplane:
            tdir = f"/tmp/ovt_campaign_b{B}"
            with profiling.trace(tdir):
                state, outs = fil(brun)
                _ = np.asarray(outs[1]).ravel()[-1]
            xp = device_time_from_xplane(tdir)
            if xp:
                rec["xplane_leaf_s"] = round(xp["leaf_s"], 4)
                rec["xplane_span_s"] = round(xp["span_s"], 4)
                rec["xplane_top"] = [[n, round(t * 1e3, 2)]
                                     for n, t in xp["top"]]

        print(json.dumps(rec), flush=True)
        records.append(rec)

    # summary: scaling of the DEVICE time vs the WALL time
    base = next((r for r in records if r["B"] == 1), None)
    if base:
        for r in records:
            r["device_scaling_vs_b1"] = round(
                r["injit_agg_fps"] / max(base["injit_agg_fps"], 1e-9), 2)
            r["wall_scaling_vs_b1"] = round(
                r["wall_agg_fps"] / max(base["wall_agg_fps"], 1e-9), 2)
        print(json.dumps({"summary": [
            {k: r[k] for k in ("B", "wall_agg_fps", "injit_agg_fps",
                               "dispatch_overhead_s", "device_scaling_vs_b1",
                               "wall_scaling_vs_b1")} for r in records]}))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
