"""Collect the round-4 chip-queue artifacts into one markdown table.

Run after ``tools/chip_queue.sh`` completes (or partially) to get the
BASELINE.md-ready summary: every bench JSON line found under runs/r4/,
the profile_vit stage table, and the minibatch-sweep winner.

Usage: python tools/summarize_r4.py [--dir runs/r4]
"""

import argparse
import glob
import json
import os
import re


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="runs/r4")
    args = p.parse_args()

    print("## Round-4 hardware numbers (chip queue artifacts)\n")
    print("| artifact | metric | value | unit | vs_baseline |")
    print("|---|---|---|---|---|")
    for f in sorted(glob.glob(os.path.join(args.dir, "*.txt"))):
        for line in open(f, errors="replace"):
            line = line.strip()
            if not line.startswith('{"metric"'):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            err = f" ERROR: {d['error']}" if "error" in d else ""
            print(f"| `{os.path.basename(f)}` | {d['metric']} | "
                  f"{d['value']:,.0f} | {d['unit']} | "
                  f"{d.get('vs_baseline', '')}{err} |")

    prof = os.path.join(args.dir, "profile_vit.txt")
    if os.path.exists(prof):
        print("\n### profile_vit stages\n```")
        for line in open(prof, errors="replace"):
            if re.match(r"^(#|\w+\s+[\d.]+ ms)", line.strip()):
                print(line.rstrip())
        print("```")

    best, best_mb = -1.0, None
    for f in glob.glob(os.path.join(args.dir, "mb_*.txt")):
        m = re.search(r"mb_(\d+)", f)
        hits = re.findall(r"throughput: ([\d.]+) env-steps/s",
                          open(f, errors="replace").read())
        if m and hits and float(hits[-1]) > best:
            best, best_mb = float(hits[-1]), int(m.group(1))
    if best_mb is not None:
        print(f"\nminibatch sweep winner: NUM_MINIBATCHES={best_mb} "
              f"({best:,.0f} env-steps/s incl. compile)")


if __name__ == "__main__":
    main()
