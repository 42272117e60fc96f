#!/usr/bin/env python
"""Record a pose stream to an evaluation-format trajectory file.

ov_eval pose_to_file parity (/root/reference/ov_eval/src/pose_to_file.cpp):
the reference subscribes to a ROS pose topic and appends TUM-format rows via
ov_eval::Recorder.  The non-ROS equivalent consumes a line stream (stdin or
a file/FIFO) of ``t x y z qx qy qz qw [cov...]`` rows — e.g. piped from a
live run — and writes the same TUM text file incrementally (flushed per
pose, so the file is usable while the producer is still running).

Usage:
  <producer> | python examples/pose_to_file.py --output out.txt
  python examples/pose_to_file.py --input poses.fifo --output out.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def record(stream, out_path):
    n = 0
    with open(out_path, "w") as out:
        out.write("# timestamp(s) tx ty tz qx qy qz qw\n")
        for line in stream:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            if len(parts) < 8:
                continue
            try:
                vals = [float(x) for x in parts[:8]]
            except ValueError:
                continue
            out.write(" ".join(f"{v:.9f}" for v in vals) + "\n")
            out.flush()  # live-usable, like the reference's per-msg append
            n += 1
    print(f"[pose_to_file]: wrote {n} poses to {out_path}")
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="-",
                    help="pose line stream ('-' = stdin)")
    ap.add_argument("--output", required=True, help="TUM output file")
    args = ap.parse_args()
    if args.input == "-":
        return 0 if record(sys.stdin, args.output) >= 0 else 1
    with open(args.input) as f:
        record(f, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
