"""Attribute the opt-in confidence output's serving cost (VERDICT r4 #5/#8).

Round 4 measured -15% fps (+110 ms/batch-32) for emitting one
[B,90,160] f32 tensor (~1.8 MB/batch) — wildly out of proportion to its
compute, and consistent with this rig's ~11 MB/s tunnel fetch path.  But
the committed JSON didn't separate TRANSFER from COMPUTE, so the
README's "leave emit_confidence off" advice could be tunnel pathology
masquerading as deployment guidance.

This script splits it: the 2x2 grid of {emit_confidence} x
{fetch_results} through the engine at the batch-32 streaming regime,
plus a direct measurement of fetching a [32,90,160] f32 buffer through
the tunnel.  Device-resident (fetch_results=False) runs isolate the
in-program compute cost; the fetch delta isolates the transfer, which on
a directly-attached host is a DMA readback of 1.8 MB (~'free').

Run on chip:  timeout 2400 python scripts/confidence_cost.py
Writes confidence_cost.json (v2, attribution fields).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.benchmark import measure_engine_fps

    flag = "checkpoints/flagship"
    cfg = Config.from_json(os.path.join(flag, "config.json"))
    params = ckpt.load_params(os.path.join(flag, "params"))
    model = FastStereoNet(cfg.model)

    out = {"regime": "batch 32 streaming, flagship",
           "grid": {}}

    import dataclasses

    from hobot_stereonet_tpu.runtime.engine import StereoEngine  # noqa: F401

    for emit in (False, True):
        for fetch in (False, True):
            # measure_engine_fps has no emit_confidence hook; run the
            # engine directly with the benchmark's methodology.
            res = _measure(model, params, cfg, emit=emit, fetch=fetch)
            key = f"conf={emit}/fetch={fetch}"
            out["grid"][key] = res
            print(json.dumps({key: res}), flush=True)

    g = out["grid"]
    base = g["conf=False/fetch=False"]["fps"]
    out["attribution"] = {
        "compute_cost_fps_pct": round(
            100.0 * (1 - g["conf=True/fetch=False"]["fps"] / base), 1),
        "fetch_cost_fps_pct_without_conf": round(
            100.0 * (1 - g["conf=False/fetch=True"]["fps"]
                     / base), 1),
        "fetch_cost_fps_pct_with_conf": round(
            100.0 * (1 - g["conf=True/fetch=True"]["fps"] / base), 1),
    }

    # Direct tunnel-fetch cost of the confidence tensor itself.
    conf = jnp.zeros((32, 90, 160), jnp.float32)
    jax.block_until_ready(conf)
    t0 = time.perf_counter()
    for _ in range(4):
        _ = jax.device_get(conf)
    t_fetch = (time.perf_counter() - t0) / 4
    out["direct_fetch_of_conf_tensor_ms"] = round(t_fetch * 1e3, 1)
    out["conf_tensor_mb"] = round(conf.size * 4 / 1e6, 2)
    out["note"] = (
        "device-resident (fetch=False) runs isolate the IN-PROGRAM "
        "compute cost of emitting confidence; any extra loss in "
        "fetch=True runs is host-transfer, which on this rig rides a "
        "~11 MB/s RPC tunnel and on a directly-attached TPU host is a "
        "PCIe DMA readback (~free at 1.8 MB/batch). Deployment advice "
        "derives from the fetch=False column only."
    )
    with open("confidence_cost.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote confidence_cost.json", file=sys.stderr)
    return 0


def _measure(model, params, cfg, emit: bool, fetch: bool,
             batch: int = 32, n_batches: int = 10) -> dict:
    import dataclasses
    import time

    from hobot_stereonet_tpu.config import (CameraConfig, Config,
                                            EngineConfig)
    from hobot_stereonet_tpu.data.stream import DeviceFrameRing
    from hobot_stereonet_tpu.runtime.engine import StereoEngine

    n_frames = batch * n_batches
    ecfg = dataclasses.replace(
        cfg,
        camera=CameraConfig(height=720, width=1280),
        engine=EngineConfig(
            max_batch=batch, batch_buckets=(1, batch),
            feed_queue_depth=n_frames, drop_on_full=False, inflight=4,
            fetch_results=fetch,
        ),
    )
    eng = StereoEngine(ecfg, model=model, params=params,
                       compute_depth=False, emit_confidence=emit)
    ring = DeviceFrameRing(height=720, width=1280, ring_size=4)
    t0 = time.perf_counter()
    eng.warmup(buckets=[batch], ring=ring)
    warmup_s = time.perf_counter() - t0
    frames = list(ring.frames(n_frames))
    for f in frames:
        eng.feed(f)
    t0 = time.perf_counter()
    eng.start(warmup=False)
    eng.drain()
    dt = time.perf_counter() - t0
    eng.stop()
    snap = eng.metrics.snapshot()
    return {"fps": round(snap["frames_out"] / dt, 1),
            "frames_out": snap["frames_out"],
            "infer_latency_ms": round(snap["infer_latency"]["mean_ms"], 1),
            "warmup_s": round(warmup_s, 1)}


if __name__ == "__main__":
    raise SystemExit(main())
