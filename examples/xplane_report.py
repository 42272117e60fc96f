#!/usr/bin/env python
"""Rank HLO ops by device time from a jax.profiler xplane capture.

The device-level companion of the timing-CSV tools (`timing_report.py`
etc.): point it at the directory written by `run_sim.py --profile <dir>`
(or any jax.profiler.trace output) and it prints the TPU ops ranked by
total duration — the workflow that found the while-loop-ized vmaps and
custom-call launch tax during round-2 optimization.

Usage:
  python examples/xplane_report.py <trace_dir_or_xplane.pb> [--top N]
      [--containers]   # include while/cond/call container ops

Requires the tensorflow wheel (for the xplane protobuf); exits with a
clear message when unavailable.
"""

import argparse
import glob
import os
import sys
from collections import defaultdict


def find_xplane(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                            recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {path}")
    return hits[-1]  # newest capture


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir (from --profile) or xplane.pb")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--containers", action="store_true",
                    help="include while/cond/call container ops")
    ap.add_argument("--gaps", action="store_true",
                    help="device-idle analysis: busy vs span, and total "
                         "idle attributed to the op that FOLLOWS each gap")
    args = ap.parse_args()

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        raise SystemExit(
            "xplane parsing needs the tensorflow wheel "
            "(tensorflow.tsl.profiler.protobuf.xplane_pb2)")

    path = find_xplane(args.trace)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    skip = ("%while", "%cond", "%conditional", "jit_", "%call")
    printed = False
    for plane in xs.planes:
        if "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            printed = True
            tot = defaultdict(float)
            cnt = defaultdict(int)
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                if not args.containers and name.startswith(skip):
                    continue
                tot[name] += ev.duration_ps / 1e12
                cnt[name] += 1
            total = sum(tot.values())
            kind = "all" if args.containers else "leaf"
            print(f"== {plane.name}: {kind} ops total {total*1e3:.1f} ms "
                  f"({len(tot)} distinct) ==")
            for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]:
                print(f"{t*1e3:9.2f} ms {100*t/max(total,1e-12):5.1f}% "
                      f"x{cnt[name]:7d}  {name[:120]}")
            if args.gaps:
                # idle = span minus busy over the LEAF op timeline; each
                # inter-op gap is charged to the op that follows it (i.e.
                # "what the device was waiting to start") — the TPU
                # equivalent of a stall-attribution profile
                evs = sorted(
                    ((ev.offset_ps, ev.duration_ps,
                      plane.event_metadata[ev.metadata_id].name)
                     for ev in line.events
                     if not plane.event_metadata[
                         ev.metadata_id].name.startswith(skip)),
                    key=lambda e: e[0])
                if evs:
                    span = (evs[-1][0] + evs[-1][1] - evs[0][0]) / 1e12
                    busy = sum(d for _, d, _ in evs) / 1e12
                    gap_by = defaultdict(float)
                    gap_n = defaultdict(int)
                    end = evs[0][0]
                    for off, dur, name in evs:
                        if off > end:
                            gap_by[name] += (off - end) / 1e12
                            gap_n[name] += 1
                        end = max(end, off + dur)
                    idle = span - busy
                    print(f"-- gaps: span {span*1e3:.1f} ms, busy "
                          f"{busy*1e3:.1f} ms, idle {idle*1e3:.1f} ms "
                          f"({100*idle/max(span,1e-12):.1f}%) --")
                    for name, t in sorted(gap_by.items(),
                                          key=lambda kv: -kv[1])[:args.top]:
                        print(f"{t*1e3:9.2f} ms idle x{gap_n[name]:7d}  "
                              f"before {name[:110]}")
    if not printed:
        # CPU/host-only captures carry no device op line — summarize the
        # host event lines instead so the tool is still informative
        for plane in xs.planes:
            for line in plane.lines:
                if not line.events:
                    continue
                tot = defaultdict(float)
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    tot[name] += ev.duration_ps / 1e12
                total = sum(tot.values())
                print(f"== host plane {plane.name} / line '{line.name}': "
                      f"total {total*1e3:.1f} ms ==")
                for name, t in sorted(tot.items(),
                                      key=lambda kv: -kv[1])[:args.top]:
                    print(f"{t*1e3:9.2f} ms  {name[:120]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
