"""Measured HBM argument for the cost-volume memory strategy (SURVEY §5
"long-context analog"; VERDICT r1 Missing #4).

Three questions, answered with on-chip numbers:

1. How big are the cost-volume + activation footprints at the resolutions
   the design chose (1/8) vs. the one it rejected (full res)?  -> analytic
   table (exact byte math, no model needed).
2. At the serving batch sizes the engine actually dispatches (target:
   max_batch=128 @ 720p), does the monolithic pipeline fit HBM, and where
   is the ceiling?  -> walk the batch ladder (128/256/512) and record the
   largest rung that compiles+runs.
3. What does blockwise serving (EngineConfig.device_microbatch — lax.map
   chunking inside ONE compiled program) cost in throughput and buy in
   capacity?  -> fps + max-batch with chunking on.

Why there is no D-axis blockwise aggregation kernel (the ring-attention
shape): the aggregation stack normalizes with GroupNorm whose statistics
reduce over (D, H, W) globally, so disparity-chunking is either inexact or
needs one full re-pass per layer (O(L^2) compute).  The design instead keeps
the volume at 1/8 res — 512x smaller than full res (8x8 spatial x 8 fewer
disparity candidates) — which moves the HBM ceiling to the batch axis,
where chunking IS exact
(every op is per-sample).  That is what device_microbatch implements.

Usage: python scripts/hbm_analysis.py [--full] [--out hbm_analysis.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def analytic_table():
    """Exact activation byte math at 720p for the design points."""
    H, W = 720, 1280
    rows = []
    for name, (h, w, d, c, bytes_per) in {
        # full-res difference volume the classic design REJECTS:
        "full-res 4D volume [H,W,D,C] bf16": (H, W, 192, 32, 2),
        # 1/8-res difference volume the classic build uses:
        "1/8-res 4D volume [H/8,W/8,D/8,C] bf16": (H // 8, W // 8, 24, 32, 2),
        # FastStereoNet correlation volume (C collapses to 1):
        "1/8-res correlation volume [H/8,W/8,D/8] f32": (H // 8, W // 8, 24, 1, 4),
        # the real full-res tensor on the fast path (convex upsample weights):
        "full-res convex-upsample weights [H,W,9] f32": (H, W, 9, 1, 4),
    }.items():
        per_frame = h * w * d * c * bytes_per
        rows.append(
            {
                "tensor": name,
                "mb_per_frame": round(per_frame / 2**20, 2),
                "gb_at_batch_128": round(128 * per_frame / 2**30, 2),
            }
        )
    return rows


def fps_at(batch: int, micro: int) -> float:
    from hobot_stereonet_tpu.config import Config, EngineConfig
    from hobot_stereonet_tpu.data.stream import DeviceFrameRing
    from hobot_stereonet_tpu.runtime.engine import StereoEngine

    cfg = Config(
        engine=EngineConfig(
            max_batch=batch,
            batch_buckets=(1, batch),
            feed_queue_depth=batch * 4,
            drop_on_full=False,
            fetch_results=False,
            device_microbatch=micro,
        )
    )
    eng = StereoEngine(cfg, compute_depth=False)
    ring = DeviceFrameRing(
        height=cfg.camera.height, width=cfg.camera.width, ring_size=4
    )
    eng.warmup(buckets=[batch], ring=ring)
    frames = list(ring.frames(batch * 4))
    for f in frames:
        eng.feed(f)
    t0 = time.perf_counter()
    eng.start(warmup=False)
    eng.drain()
    dt = time.perf_counter() - t0
    eng.stop()
    return len(frames) / dt


def run_rung(batch: int, micro: int) -> dict:
    """One fps measurement in a FRESH process.  In-process, device buffers
    accumulated by earlier engines (tunnel-retained transfers, undrained
    device-resident result queues) make later rungs fail for reasons that
    have nothing to do with the rung itself — a first in-process walk
    reported max_batch_micro32=0 while the same rung had measured 503 fps
    minutes earlier in the same process."""
    import os
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--rung",
             f"{batch},{micro}"],
            capture_output=True, text=True, timeout=1200,
        )
    except subprocess.TimeoutExpired:
        # One hung rung (e.g. a stuck remote compile) must record as a
        # FAIL rung, not crash the whole capacity walk.
        return {"error": "timeout after 1200s"}
    for line in reversed((p.stdout or "").strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return {"error": (p.stderr or "no output").strip()[-300:]}


def measured(run_full: bool):
    out = {}

    def record(batch: int, micro: int) -> bool:
        key = f"fps_batch{batch}_micro{micro or 'off'}"
        if key in out:
            return not isinstance(out[key], str)
        r = run_rung(batch, micro)
        if r.get("platform") is not None:
            # Failed rungs return no 'platform'; only let a real value pin
            # the device field (a None from rung 1 must not stick).
            out.setdefault("device", r["platform"])
        if "fps" in r:
            out[key] = r["fps"]
            return True
        out[key] = "FAIL: " + r.get("error", "")[:200]
        return False

    # 3. blockwise cost/benefit at the target dispatch size.
    for micro in (0, 32):
        record(128, micro)

    if run_full:
        # 2. capacity ceiling: largest monolithic batch vs. chunked batch.
        # fps per rung is recorded too — whether a bigger dispatch beats
        # the batch-128 headline is a question this walk answers for free.
        for micro in (0, 32):
            hi_ok = 0
            for b in (128, 256, 512):
                if not record(b, micro):
                    break
                hi_ok = b
            out[f"max_batch_micro{micro or 'off'}"] = hi_ok
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also walk the batch ladder for the capacity ceiling")
    ap.add_argument("--out", default=None,
                    help="write the full result as committable JSON")
    ap.add_argument("--rung", default=None, metavar="B,MICRO",
                    help="internal: measure one (batch, microbatch) point "
                         "and print one JSON line (fresh-process worker)")
    args = ap.parse_args()
    if args.rung:
        b, micro = (int(x) for x in args.rung.split(","))
        import jax

        try:
            fps = fps_at(b, micro)
            print(json.dumps({"fps": round(fps, 1),
                              "platform": jax.devices()[0].platform}))
        except Exception as e:  # pragma: no cover - device-dependent
            msg = f"{type(e).__name__}: {e}"
            if e.__cause__ is not None:  # e.g. drain() wraps the OOM
                msg += f" <- {type(e.__cause__).__name__}: {e.__cause__}"
            print(json.dumps({"error": msg[:300]}))
        sys.exit(0)
    result = {"analytic": analytic_table(), "measured": measured(args.full)}
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {args.out}", file=sys.stderr)
