"""Committed product-path SLAM evidence (VERDICT r3 missing #1).

The reference's product is NETWORK depth feeding downstream consumers
(/root/reference/stereonet_infer/src/stereonet_node.cpp:657-818); the
composition that matters is therefore

    trained stereo net -> tracker -> windowed BA (-> loop closure)

— BASELINE config 5 — not the --gt-disparity path that bypasses the
network.  This script runs that composition on the synthetic trajectory
at the crowned flagship, on chip, across:

  * disparity source: GT vs network (the gap quantifies what network
    noise costs the tracker);
  * >=2 trajectory lengths;
  * loop closure on/off;
  * confidence gate on/off on the network path (VERDICT r3 #9: the
    soft-argmin confidence must have a measured consumer effect).

Everything runs IN ONE PROCESS with ONE engine (the tunnel allows one
TPU client; per-config subprocesses contend on the device lock, and the
flagship infer program compiles once here and is reused by every
config).  Writes slam_report.json after every row.

Usage: timeout 3000 python scripts/slam_report.py [--quick]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def run_trajectory(frames, seed, cam, disparity_source, engine, gate,
                   loop_closure):
    import numpy as np

    from hobot_stereonet_tpu.config import SLAMConfig
    from hobot_stereonet_tpu.data.synthetic import LayeredScene
    from hobot_stereonet_tpu.slam.tracker import (
        StereoSLAM, absolute_trajectory_error)

    rng = np.random.default_rng(seed)
    scene = LayeredScene(rng, cam.height, cam.width, cam.focal_px,
                         cam.baseline_m)
    slam = StereoSLAM(cam, SLAMConfig(keyframe_translation_m=0.08,
                                      min_confidence=gate))
    ts = np.linspace(0, 1, frames)
    gt_centers = np.stack(
        [0.6 * ts, 0.12 * np.sin(2 * np.pi * ts), np.zeros_like(ts)],
        axis=-1)
    tracked = 0
    t0 = time.perf_counter()
    for tx, ty, _ in gt_centers:
        l, r, d = scene.render(float(tx), float(ty))
        conf = None
        if disparity_source == "network":
            if gate > 0:
                d, conf = engine.infer_with_confidence(l, r)
            else:
                d = engine.infer(l, r)
        out = slam.process(l, d, confidence=conf)
        tracked += int(out["tracked"])
    slam.refine_window(window=4)
    loops = 0
    if loop_closure:
        from hobot_stereonet_tpu.slam.pose_graph import close_loops

        res = close_loops(slam)
        loops = len(res["loops"]) if res is not None else 0
    est = np.stack(slam.state.trajectory)
    ate = absolute_trajectory_error(est, gt_centers)
    return {
        "ate_m": round(float(ate), 4),
        "tracked": tracked,
        "keyframes": len(slam.state.keyframes),
        "wall_s": round(time.perf_counter() - t0, 1),
        **({"loops_closed": loops} if loop_closure else {}),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--gate", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", default="slam_report.json")
    args = ap.parse_args()

    from types import SimpleNamespace

    import jax

    from hobot_stereonet_tpu.cli import _build_engine
    from hobot_stereonet_tpu.config import CameraConfig

    cam = CameraConfig(width=320, height=240)
    eng_args = SimpleNamespace(config=None, model="fast", checkpoint=None,
                               int8=False)
    engine = _build_engine(eng_args, h=cam.height, w=cam.width)

    lengths = [12] if args.quick else [12, 40]
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "partial": True}, f, indent=2)

    for frames in lengths:
        for name, src, gate, loop in (
            ("gt", "gt", 0.0, False),
            ("network", "network", 0.0, False),
            ("network+loop", "network", 0.0, True),
            (f"network+gate{args.gate}", "network", args.gate, False),
            (f"network+gate{args.gate}+loop", "network", args.gate, True),
        ):
            r = run_trajectory(frames, args.seed, cam, src, engine, gate,
                               loop)
            emit({"config": name, "frames": frames, **r})

    out = {
        "rows": rows,
        "backend": jax.default_backend(),
        "checkpoint": "checkpoints/flagship (default)",
        "resolution": f"{cam.width}x{cam.height}",
        "trajectory": "synthetic 0.6 m sweep, 0.12 m sinusoid (seed "
                      f"{args.seed})",
        "note": ("ATE in meters; 'gt' rows bypass the network and bound "
                 "the tracker alone; network rows are the product path"),
    }
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
