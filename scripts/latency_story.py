"""Per-frame e2e latency distributions at the serving operating points
(VERDICT r4 #3).

The reference is a live-camera product whose primary runtime observable
is per-frame preprocess/infer latency on every stat tick
(``stereonet_node.cpp:1071-1085``).  This repo recorded per-frame
``e2e_latency`` all along (``runtime/engine.py:568``) but committed only
throughput and mean batch latency.  This script commits the deployment
trade-off a real operator picks on: for each operating point, the fps it
sustains AND the per-frame e2e latency distribution (p50/p95/p99).

Regimes:
  * sustained batch 8/16/32 — closed-loop serving at a fixed in-flight
    population of 2 batches (Little's-law steady state: e2e ~=
    population / throughput; feeding deeper buys no throughput and only
    adds queueing latency);
  * camera-paced 30 fps — frames arrive on a live-camera clock, the
    dispatcher batches whatever is queued (mostly 1): the latency a
    single live camera sees.

Environment note carried into the JSON: this rig dispatches through an
RPC tunnel with a measured ~25 ms floor per dispatch (the script
re-measures it as ``nop_dispatch_ms``).  On a directly-attached TPU
host, subtract the floor from every regime's latency; throughput is
floor-amortized at batch >= 8 either way.

Run on chip:  timeout 3000 python scripts/latency_story.py
Writes latency_story.json.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def pct(xs, q):
    s = sorted(xs)
    return s[min(len(s) - 1, max(0, round(q * (len(s) - 1))))]


def dist_ms(lat_s):
    ms = [x * 1e3 for x in lat_s]
    return {"p50_ms": round(pct(ms, 0.5), 1), "p95_ms": round(pct(ms, 0.95), 1),
            "p99_ms": round(pct(ms, 0.99), 1), "mean_ms": round(sum(ms) / len(ms), 1),
            "max_ms": round(max(ms), 1), "n": len(ms)}


def build_engine(batch, flagship, stage_timing=False):
    import dataclasses
    import os

    from hobot_stereonet_tpu.config import (CameraConfig, Config,
                                            EngineConfig)
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.engine import StereoEngine

    cfg = Config.from_json(os.path.join(flagship, "config.json"))
    params = ckpt.load_params(os.path.join(flagship, "params"))
    model = FastStereoNet(cfg.model)
    cfg = dataclasses.replace(
        cfg,
        camera=CameraConfig(height=720, width=1280),
        engine=EngineConfig(
            max_batch=batch, batch_buckets=(1, batch),
            feed_queue_depth=4 * batch, drop_on_full=False, inflight=4,
            fetch_results=False, stage_timing=stage_timing,
        ),
    )
    return StereoEngine(cfg, model=model, params=params, compute_depth=False)


def fresh_frames(ring):
    """Generator of ring-slot frames whose timestamps are taken at NEXT
    time (feed time), so e2e latency starts the clock when the frame
    'arrives', not when the ring was built."""
    from hobot_stereonet_tpu.data.stream import Frame, RingSlot

    k = ring.data.shape[0]
    i = 0
    while True:
        yield Frame(time.monotonic(), RingSlot(ring, i % k), ring.height,
                    2 * ring.width, None, i)
        i += 1


def run_sustained(eng, ring, batch, n_batches=12):
    gen = fresh_frames(ring)
    population = 2 * batch
    total = n_batches * batch
    lat = []
    fed = 0
    for _ in range(population):
        assert eng.feed(next(gen)); fed += 1
    t0 = time.perf_counter()
    eng.start(warmup=False)
    done = 0
    while done < total:
        r = eng.poll(timeout=10.0)
        if r is None:
            break
        lat.append(r.e2e_latency_s)
        done += 1
        if fed < total:
            assert eng.feed(next(gen)); fed += 1
    dt = time.perf_counter() - t0
    eng.stop()
    return {"fps": round(done / dt, 1), "frames": done,
            "in_flight_population": population, **dist_ms(lat)}


def run_paced(eng, ring, fps_pace, n_frames=150):
    gen = fresh_frames(ring)
    period = 1.0 / fps_pace
    lat = []
    eng.start(warmup=False)
    t_next = time.monotonic()
    done = 0
    for i in range(n_frames):
        now = time.monotonic()
        if now < t_next:
            time.sleep(t_next - now)
        t_next += period
        assert eng.feed(next(gen))
        while True:
            r = eng.poll(timeout=0.0)
            if r is None:
                break
            lat.append(r.e2e_latency_s); done += 1
    eng.drain()
    while done < n_frames:
        r = eng.poll(timeout=5.0)
        if r is None:
            break
        lat.append(r.e2e_latency_s); done += 1
    eng.stop()
    return {"pace_fps": fps_pace, "frames": done, **dist_ms(lat)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", default="checkpoints/flagship")
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--out", default="latency_story.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hobot_stereonet_tpu.data.stream import DeviceFrameRing

    # Tunnel RPC floor: an empty jitted dispatch, timed.
    @jax.jit
    def nop(x):
        return jnp.mean(x) + 1.0

    z = jnp.zeros((8, 8), jnp.float32)
    float(nop(z))
    t0 = time.perf_counter()
    for _ in range(10):
        float(nop(z))
    nop_ms = (time.perf_counter() - t0) / 10 * 1e3

    ring = DeviceFrameRing(height=720, width=1280, ring_size=4)
    out = {"geometry": "1280x720", "nop_dispatch_ms": round(nop_ms, 1),
           "note": ("e2e = frame feed -> result complete, device-resident "
                    "results (fetch_results=False).  Subtract "
                    "nop_dispatch_ms (tunnel RPC floor) per dispatch for "
                    "directly-attached-host latencies."),
           "operating_points": {}}

    for b in [int(x) for x in args.batches.split(",")]:
        eng = build_engine(b, args.flagship)
        t0 = time.perf_counter()
        eng.warmup(buckets=[b], ring=ring)
        w = time.perf_counter() - t0
        print(f"batch {b}: warmup {w:.1f}s", file=sys.stderr, flush=True)
        res = run_sustained(eng, ring, b)
        res["warmup_s"] = round(w, 1)
        out["operating_points"][f"sustained_b{b}"] = res
        print(json.dumps({f"sustained_b{b}": res}), flush=True)

    # Live-camera pace: batch-1 dispatches dominate; bucket 1 compiled.
    eng = build_engine(1, args.flagship)
    t0 = time.perf_counter()
    eng.warmup(buckets=[1], ring=ring)
    w = time.perf_counter() - t0
    res = run_paced(eng, ring, fps_pace=30.0)
    res["warmup_s"] = round(w, 1)
    out["operating_points"]["paced_30fps_b1"] = res
    print(json.dumps({"paced_30fps_b1": res}), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
