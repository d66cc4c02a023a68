"""Committed product-path SLAM evidence (VERDICT r3 missing #1).

The reference's product is NETWORK depth feeding downstream consumers
(/root/reference/stereonet_infer/src/stereonet_node.cpp:657-818); the
composition that matters is therefore

    trained stereo net -> tracker -> windowed BA (-> loop closure)

— BASELINE config 5 — not the --gt-disparity path that bypasses the
network.  This script runs `stereod slam` on the synthetic trajectory at
the crowned flagship, on chip, across:

  * disparity source: GT vs network (the gap quantifies what network
    noise costs the tracker);
  * >=2 trajectory lengths;
  * loop closure on/off;
  * confidence gate on/off on the network path (VERDICT r3 #9: the
    soft-argmin confidence must have a measured consumer effect).

Each config runs in a FRESH process (tunnel clients retain host mirrors
of transfers; long multi-config sweeps in one process OOM the host —
CLAUDE.md).  Writes slam_report.json.

Usage: python scripts/slam_report.py [--quick]
"""

import argparse
import json
import subprocess
import sys

REPO = "/root/repo"


def run_cfg(extra, timeout=900):
    cmd = [sys.executable, "-m", "hobot_stereonet_tpu.cli", "slam"] + extra
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=timeout)
    for line in reversed((p.stdout or "").strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return {"error": (p.stderr or "no output").strip()[-400:]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="short trajectory only (smoke)")
    ap.add_argument("--gate", type=float, default=0.3)
    ap.add_argument("--out", default="slam_report.json")
    args = ap.parse_args()

    lengths = [12] if args.quick else [12, 40]
    rows = []
    for frames in lengths:
        base = ["--frames", str(frames)]
        configs = [
            ("gt", base + ["--gt-disparity"]),
            ("network", base),
            ("network+loop", base + ["--loop-closure"]),
            (f"network+gate{args.gate}",
             base + ["--confidence-gate", str(args.gate)]),
            (f"network+gate{args.gate}+loop",
             base + ["--confidence-gate", str(args.gate), "--loop-closure"]),
        ]
        for name, extra in configs:
            r = run_cfg(extra)
            row = {"config": name, "frames": frames, **r}
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = {"rows": rows, "checkpoint": "checkpoints/flagship (default)",
           "trajectory": "synthetic 0.6 m sweep (cli.py cmd_slam)",
           "note": ("ATE in meters; 'gt' rows bypass the network and bound "
                    "the tracker alone; network rows are the product path")}
    # Headline deltas at the longest trajectory.
    last = max(lengths)
    by = {r["config"]: r for r in rows if r["frames"] == last and "ate_m" in r}
    if "gt" in by and "network" in by:
        out["network_vs_gt_ate_delta_m"] = round(
            by["network"]["ate_m"] - by["gt"]["ate_m"], 4)
    gate_key = f"network+gate{args.gate}"
    if "network" in by and gate_key in by:
        out["gate_ate_effect_m"] = round(
            by[gate_key]["ate_m"] - by["network"]["ate_m"], 4)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
