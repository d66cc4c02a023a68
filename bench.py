"""Headline benchmark: stereo frames/sec/chip at 1280x720, THROUGH the
serving engine (StereoEngine feed -> micro-batched dispatch -> results).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 15 fps (ZED 2i real-time, the reference's live camera rate —
BASELINE.md north star: >=10x => >=150 fps/chip).

Methodology (measured constraints of this rig, see CLAUDE.md):
  * the RPC tunnel adds a ~25 ms floor per dispatch: the engine's adaptive
    micro-batching (EngineConfig.max_batch) amortizes it — the serving
    generalization of the reference's 4-in-flight BPU task pool
    (stereonet_node.cpp:144);
  * host<->device over the tunnel moves ~11 MB/s, so frames are pre-staged
    device buffers (data.stream.DeviceFrameRing — the hbmem zero-copy
    camera-transport analog, stereonet_node.h:95-97) and results stay
    device-resident for device-side consumers (EngineConfig.fetch_results
    =False; completion is confirmed by a scalar probe per batch).  On a
    directly-attached TPU host both transfers ride PCIe/DMA and neither
    staging trick is load-bearing.
  * this is the max-throughput (offline/batch) regime.  The streaming
    regime (camera-paced, batch ~32 to stay under a 66 ms frame budget)
    measures lower — see README's two-regime table.
"""

from __future__ import annotations

import json
import sys
import time


def main(int8: bool = False, streaming: bool = False) -> None:
    from hobot_stereonet_tpu.config import Config, EngineConfig
    from hobot_stereonet_tpu.data.stream import DeviceFrameRing
    from hobot_stereonet_tpu.runtime.engine import StereoEngine

    # Two regimes (ADVICE r1): default is max-throughput (offline/batch,
    # the headline).  --streaming caps the dispatch batch so per-batch
    # latency stays inside a live camera's 66 ms frame budget
    # (32 x ~1.2 ms marginal + ~25 ms RPC floor ~= 63 ms) — the number a
    # camera-paced deployment actually sees.
    BATCH = 32 if streaming else 128
    N_FRAMES = BATCH * 12

    cfg = Config(
        engine=EngineConfig(
            max_batch=BATCH,
            batch_buckets=(1, BATCH),
            feed_queue_depth=N_FRAMES,
            drop_on_full=False,
            inflight=4,
            fetch_results=False,  # device-side consumers; see module doc
        )
    )
    eng = StereoEngine(cfg, compute_depth=False, int8=int8)
    ring = DeviceFrameRing(
        height=cfg.camera.height, width=cfg.camera.width, ring_size=4
    )
    # Compile exactly the one shape the dispatcher hits: the feed queue is
    # pre-filled and N_FRAMES is a multiple of BATCH, so every dispatch is a
    # full bucket.  First-call remote compiles must not land in the measured
    # steady-state window.
    t_w = time.perf_counter()
    eng.warmup(buckets=[BATCH], ring=ring)
    print(f"warmup/compile: {time.perf_counter() - t_w:.1f}s", file=sys.stderr)

    # Pre-fill the feed queue so the dispatcher sees a sustained backlog
    # (steady-state serving), then time feed->completion of all frames.
    frames = list(ring.frames(N_FRAMES))
    for f in frames:
        eng.feed(f)
    t0 = time.perf_counter()
    eng.start(warmup=False)
    eng.drain()
    dt = time.perf_counter() - t0
    eng.stop()

    snap = eng.metrics.snapshot()
    assert snap["frames_out"] == N_FRAMES, snap
    assert snap["dispatch_batch"]["mean"] > 1, (
        "micro-batching inactive: " + json.dumps(snap["dispatch_batch"])
    )
    print(
        f"engine: {snap['frames_out']} frames, "
        f"mean dispatch batch {snap['dispatch_batch']['mean']:.1f}, "
        f"infer latency {snap['infer_latency']['mean_ms']:.1f} ms/batch",
        file=sys.stderr,
    )

    fps = N_FRAMES / dt
    baseline_fps = 15.0
    print(
        json.dumps(
            {
                "metric": "stereo_fps_per_chip_1280x720"
                + ("_int8" if int8 else "")
                + ("_streaming" if streaming else ""),
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main(int8="--int8" in sys.argv, streaming="--streaming" in sys.argv)
