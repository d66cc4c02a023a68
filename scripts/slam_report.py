"""Committed product-path SLAM evidence, v2 (VERDICT r3 missing #1, r4 #4).

The reference's product is NETWORK depth feeding downstream consumers
(/root/reference/stereonet_infer/src/stereonet_node.cpp:657-818); the
composition that matters is trained stereo net -> tracker -> windowed BA
(-> loop closure) — BASELINE config 5.  Round 4 committed it at 320x240
over <=40 synthetic frames, one seed.  v2 scales the evidence to
deployment conditions:

  A. product-path ATE at the deployment geometry (1280x720);
  B. >=100-frame trajectories, >=3 seeds, with spread;
  C. ATE through the ACTUAL ``slam --odometry-root`` sequence-runner path
     (slam/run.py) on a generated KITTI-layout sequence on disk —
     PNG decode -> engine.infer -> tracker -> periodic BA, the loaders'
     product path, not a bespoke loop;
  D. wall-clock attribution of the SLAM layer: per-stage seconds
     (scene render / network infer / track+PnP / BA) + the measured RPC
     dispatch floor, and the achievable fps once the floor is gone
     (every per-frame stage is 1-3 tiny dispatches through a ~25 ms/RPC
     tunnel — the layer is dispatch-floor-bound on this rig, not
     compute-bound).

Everything runs IN ONE PROCESS with shared engines (the tunnel allows
one TPU client; per-config subprocesses contend on the device lock).
Writes slam_report.json after every row.

Usage: timeout 3600 python scripts/slam_report.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def run_trajectory(frames, seed, cam, disparity_source, engine, gate,
                   loop_closure, timers=None):
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

    def clock(key, fn, *a, **kw):
        if timers is None:
            return fn(*a, **kw)
        s = time.perf_counter()
        out = fn(*a, **kw)
        timers[key] = timers.get(key, 0.0) + (time.perf_counter() - s)
        return out

    for tx, ty, _ in gt_centers:
        l, r, d = clock("render", scene.render, float(tx), float(ty))
        conf = None
        if disparity_source == "network":
            if gate > 0:
                d, conf = clock("infer", engine.infer_with_confidence, l, r)
            else:
                d = clock("infer", engine.infer, l, r)
        out = clock("track", slam.process, l, d, confidence=conf)
        tracked += int(out["tracked"])
    clock("ba", slam.refine_window, window=4)
    loops = 0
    if loop_closure:
        from hobot_stereonet_tpu.slam.pose_graph import close_loops

        res = clock("loop", close_loops, slam)
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


def make_kitti_layout(root, cam, frames, seed):
    """Render a LayeredScene trajectory into a KITTI-odometry directory
    (image_2/image_3 PNGs, calib.txt, poses/00.txt) so the sequence-runner
    path (slam/run.py open_sequence -> KittiOdometrySequence) is exercised
    end to end from disk."""
    import numpy as np
    from PIL import Image

    from hobot_stereonet_tpu.data.synthetic import LayeredScene

    rng = np.random.default_rng(seed)
    scene = LayeredScene(rng, cam.height, cam.width, cam.focal_px,
                         cam.baseline_m)
    seq = os.path.join(root, "sequences", "00")
    os.makedirs(os.path.join(seq, "image_2"), exist_ok=True)
    os.makedirs(os.path.join(seq, "image_3"), exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    ts = np.linspace(0, 1, frames)
    centers = np.stack(
        [0.6 * ts, 0.12 * np.sin(2 * np.pi * ts), np.zeros_like(ts)],
        axis=-1).astype(np.float64)
    poses = np.tile(np.eye(3, 4), (frames, 1, 1))
    poses[:, :, 3] = centers  # cam-to-world, translation = camera center
    for i, (tx, ty, _) in enumerate(centers):
        l, r, _ = scene.render(float(tx), float(ty))
        Image.fromarray(l).save(os.path.join(seq, "image_2", f"{i:06d}.png"))
        Image.fromarray(r).save(os.path.join(seq, "image_3", f"{i:06d}.png"))
    f, b = cam.focal_px, cam.baseline_m
    with open(os.path.join(seq, "calib.txt"), "w") as fh:
        p2 = f"{f} 0 {cam.width/2} 0  0 {f} {cam.height/2} 0  0 0 1 0"
        p3 = f"{f} 0 {cam.width/2} {-f*b}  0 {f} {cam.height/2} 0  0 0 1 0"
        fh.write(f"P0: {p2}\nP1: {p3}\nP2: {p2}\nP3: {p3}\n")
    np.savetxt(os.path.join(root, "poses", "00.txt"),
               poses.reshape(frames, 12))
    return centers


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--gate", type=float, default=0.3)
    ap.add_argument("--seeds", default="11,12,13")
    ap.add_argument("--frames-720p", type=int, default=100)
    ap.add_argument("--runner-only", action="store_true",
                    help="re-run only the odometry sequence-runner leg "
                         "and merge it into an existing report")
    ap.add_argument("--out", default="slam_report.json")
    args = ap.parse_args()

    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from hobot_stereonet_tpu.cli import _build_engine
    from hobot_stereonet_tpu.config import CameraConfig

    seeds = [int(s) for s in args.seeds.split(",")]
    rows = []
    out = {"rows": rows}
    if args.runner_only and os.path.isfile(args.out):
        with open(args.out) as f:
            out = json.load(f)
        out.pop("partial", None)
        rows = out.setdefault("rows", [])

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "w") as f:
            json.dump({**out, "partial": True}, f, indent=2)

    # --- RPC dispatch floor (context for the attribution).
    if args.runner_only:
        return _runner_leg(args, emit, out, seeds)

    @jax.jit
    def nop(x):
        return jnp.mean(x) + 1.0

    z = jnp.zeros((8, 8), jnp.float32)
    float(nop(z))
    t0 = time.perf_counter()
    for _ in range(10):
        float(nop(z))
    nop_ms = (time.perf_counter() - t0) / 10 * 1e3
    out["nop_dispatch_ms"] = round(nop_ms, 1)

    # --- A+B: deployment geometry, long trajectories, multiple seeds.
    cam_hd = CameraConfig(width=1280, height=720)
    eng_args = SimpleNamespace(config=None, model="fast", checkpoint=None,
                               int8=False)
    engine_hd = _build_engine(eng_args, h=cam_hd.height, w=cam_hd.width)
    frames_hd = 24 if args.quick else args.frames_720p
    hd_ates = {"gt": [], "network": []}
    for seed in (seeds[:1] if args.quick else seeds):
        for name in ("gt", "network"):
            r = run_trajectory(frames_hd, seed, cam_hd, name, engine_hd,
                               0.0, False)
            hd_ates[name].append(r["ate_m"])
            emit({"config": name, "geometry": "1280x720",
                  "frames": frames_hd, "seed": seed, **r})
    import numpy as np

    out["deployment_geometry"] = {
        name: {"ate_m_per_seed": v,
               "ate_m_mean": round(float(np.mean(v)), 4),
               "ate_m_std": round(float(np.std(v)), 4)}
        for name, v in hd_ates.items() if v
    }

    # --- D: wall-clock attribution at the deployment geometry.
    timers = {}
    r = run_trajectory(24 if args.quick else 40, seeds[0], cam_hd,
                       "network", engine_hd, 0.0, False, timers=timers)
    total = sum(timers.values())
    per_frame_ms = {k: round(v / r["tracked"] * 1e3, 1)
                    for k, v in timers.items()}
    # Dispatches per frame on the network path: infer(1) + detect(1) +
    # match(1) + pnp(1) >= 4 small RPCs through the tunnel floor.
    est_floor_ms = 4 * nop_ms
    device_ms = per_frame_ms.get("infer", 0) + per_frame_ms.get("track", 0)
    # Host->device transfer of one 720p uint8 pair (the tunnel moves
    # ~11 MB/s; engine.infer ships both eyes per frame).
    import numpy as _np
    pair = _np.zeros((2, cam_hd.height, cam_hd.width, 3), _np.uint8)
    t0 = time.perf_counter()
    for _ in range(3):
        d = jax.device_put(pair)
        jax.block_until_ready(d)
        float(jnp.sum(d[:1, :2, :2, 0].astype(jnp.int32)))
    transfer_ms = (time.perf_counter() - t0) / 3 * 1e3
    out["wall_clock_attribution"] = {
        "geometry": "1280x720", "frames": r["tracked"],
        "stage_s": {k: round(v, 2) for k, v in timers.items()},
        "stage_ms_per_frame": per_frame_ms,
        "fps": round(r["tracked"] / total, 2) if total else None,
        "rpc_floor_ms_per_dispatch": round(nop_ms, 1),
        "est_dispatch_floor_ms_per_frame": round(est_floor_ms, 1),
        "pair_transfer_ms_720p": round(transfer_ms, 1),
        "note": (
            "render is host-side scene synthesis (absent in a real "
            "deployment, the camera provides frames); infer is dominated "
            "by shipping the 5.5 MB uint8 pair through the ~11 MB/s "
            "tunnel (pair_transfer_ms_720p), and track is >=3 tiny "
            "dispatches/frame through the ~25 ms RPC floor — the layer "
            "is tunnel-bound on this rig, not compute-bound. On a "
            "directly-attached host (floor ~0.1 ms, DMA transfer) the "
            "same dispatch sequence bounds SLAM at >= "
            f"{round(1e3 / max(device_ms - est_floor_ms - transfer_ms + 4 * 0.5, 1.0), 0)}"
            " fps before any batching of the per-frame kernels."
        ),
    }
    print(json.dumps(out["wall_clock_attribution"], indent=1), flush=True)

    # --- C: the sequence-runner product path from disk (KITTI layout).
    engine_seq = _runner_leg(args, emit, out, seeds, ret_engine=True)

    # --- 320x240 continuity rows (v1 grid: loop closure + confidence
    # gate consumers at the original regime).
    cam_seq = CameraConfig(width=320, height=240)
    lengths = [12] if args.quick else [40]
    for frames in lengths:
        for name, src, gate, loop in (
            ("gt", "gt", 0.0, False),
            ("network", "network", 0.0, False),
            ("network+loop", "network", 0.0, True),
            (f"network+gate{args.gate}", "network", args.gate, False),
            (f"network+gate{args.gate}+loop", "network", args.gate, True),
        ):
            r = run_trajectory(frames, seeds[0], cam_seq, src, engine_seq,
                               gate, loop)
            emit({"config": name, "geometry": "320x240", "frames": frames,
                  **r})

    out.update({
        "backend": jax.default_backend(),
        "checkpoint": "checkpoints/flagship (default)",
        "trajectory": "synthetic 0.6 m sweep, 0.12 m sinusoid",
        "note": ("ATE in meters; 'gt' rows bypass the network and bound "
                 "the tracker alone; network rows are the product path"),
    })
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


def _runner_leg(args, emit, out, seeds, ret_engine=False):
    """The `slam --odometry-root` product path from disk (KITTI layout).

    Keyframe spacing is configured for the trajectory scale
    (keyframe_translation_m=0.08 over a 0.6 m sweep) exactly as the
    direct rows do — the 0.3 m default is room-scale; leaving it there
    gives 2-3 keyframes over the whole run and PnP against stale
    references (first committed run measured ATE 0.64 m that way)."""
    import json as _json
    import tempfile

    from types import SimpleNamespace

    from hobot_stereonet_tpu.cli import _build_engine
    from hobot_stereonet_tpu.config import CameraConfig, SLAMConfig
    from hobot_stereonet_tpu.slam.run import (open_sequence,
                                              run_odometry_sequence)

    eng_args = SimpleNamespace(config=None, model="fast", checkpoint=None,
                               int8=False)
    cam_seq = CameraConfig(width=320, height=240)
    engine_seq = _build_engine(eng_args, h=cam_seq.height, w=cam_seq.width)
    # Runner-only re-run: drop the superseded runner row before emitting.
    out["rows"][:] = [row for row in out["rows"]
                      if row.get("config") != "odometry_runner"]
    with tempfile.TemporaryDirectory() as td:
        n_seq = 24 if args.quick else 60
        make_kitti_layout(td, cam_seq, n_seq, seed=seeds[0])
        seq = open_sequence(td, "00")
        r = run_odometry_sequence(
            seq, engine=engine_seq,
            slam_cfg=SLAMConfig(keyframe_translation_m=0.08), ba_window=4)
        r["ate_m"] = round(float(r.get("ate_m", float("nan"))), 4)
        out["odometry_runner"] = {
            "layout": "KITTI (generated LayeredScene renders)",
            "resolution": f"{cam_seq.width}x{cam_seq.height}", **r}
        emit({"config": "odometry_runner", **out["odometry_runner"]})
    if ret_engine:
        return engine_seq
    out.pop("partial", None)
    with open(args.out, "w") as f:
        _json.dump(out, f, indent=2)
    print(f"updated {args.out} (runner leg)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
