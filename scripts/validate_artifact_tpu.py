"""On-chip .stereoblob validation (VERDICT r2 Next #4).

Exports the flagship serving pipeline as a TPU-only artifact at 720p (the
``platforms=("tpu",)`` path keeps the fused Pallas NV12 ingest), loads it
back, and records committable evidence:

  * artifact-vs-engine parity: max |disparity delta| on real frames between
    the deserialized artifact and the live engine pipeline (same params,
    same NV12 bytes);
  * per-batch latency of the loaded artifact at the exported buckets;
  * a NaN/finite check on the artifact's depth output.

Writes artifact_tpu_validation.json.

Usage: python scripts/validate_artifact_tpu.py [--checkpoint DIR]
           [--buckets 1,32] [--out artifact_tpu_validation.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/flagship",
                    help="flagship dir (config.json + params/) or a bare "
                         "orbax params dir")
    ap.add_argument("--buckets", default="1,32")
    ap.add_argument("--blob", default="/tmp/flagship_tpu.stereoblob")
    ap.add_argument("--int8-calib", default=None,
                    help="activation-scale JSON for the int8-static "
                         "section (default: <checkpoint>/calib.json when "
                         "present; the reference's deployment artifact is "
                         "a statically-calibrated int8 blob)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="artifact_tpu_validation.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.data.stream import DeviceFrameRing
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.artifact import (
        CompiledStereoArtifact, export_artifact)
    from hobot_stereonet_tpu.runtime.engine import StereoEngine

    if os.path.isfile(os.path.join(args.checkpoint, "config.json")):
        cfg = Config.from_json(os.path.join(args.checkpoint, "config.json"))
        params = ckpt.load_params(os.path.join(args.checkpoint, "params"))
    else:
        cfg = Config()
        params = ckpt.load_params(args.checkpoint)
    model = FastStereoNet(cfg.model)
    buckets = tuple(int(b) for b in args.buckets.split(","))

    t0 = time.perf_counter()
    manifest = export_artifact(args.blob, model, params, cfg,
                               buckets=buckets, platforms=("tpu",))
    export_s = time.perf_counter() - t0
    print(f"exported {args.blob} ({os.path.getsize(args.blob)} bytes) "
          f"in {export_s:.1f}s", file=sys.stderr)

    b = max(buckets)
    ring = DeviceFrameRing(height=cfg.camera.height, width=cfg.camera.width,
                           ring_size=4)
    batch = np.asarray(ring.data)[np.arange(b) % ring.data.shape[0]]

    # Live-engine reference on the SAME bytes (fused Pallas ingest path).
    eng = StereoEngine(cfg, model=model, params=params, compute_depth=True)
    import jax.numpy as jnp

    disp_eng = eng._pipeline(eng.params, jnp.asarray(batch))[0]
    disp_eng = np.asarray(disp_eng)

    art = CompiledStereoArtifact(args.blob)
    t0 = time.perf_counter()
    disp_art, depth_art = art.run_nv12(batch)
    first_s = time.perf_counter() - t0
    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        disp_art, depth_art = art.run_nv12(batch)
        lat.append(time.perf_counter() - t0)

    # Device-resident latency: the artifact's own cost.  run_nv12 above
    # streams host bytes in and fetches two full-res f32 maps out — on this
    # rig that measures the RPC tunnel (~11 MB/s host->device), not the
    # program; on a directly-attached host it's the PCIe camera path.
    batch_dev = jnp.asarray(batch)
    float(jnp.mean(art.call_nv12_async(batch_dev)[0]))  # warm path
    lat_dev = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        d_dev, _z = art.call_nv12_async(batch_dev)
        float(jnp.mean(d_dev))  # true sync, scalar-sized fetch
        lat_dev.append(time.perf_counter() - t0)

    d = np.abs(disp_art - disp_eng)
    delta = float(d.max())
    out = {
        "blob_bytes": os.path.getsize(args.blob),
        "platforms": manifest["platforms"],
        "buckets": manifest["buckets"],
        "geometry": f"{cfg.camera.width}x{cfg.camera.height}",
        "export_s": round(export_s, 1),
        "parity_max_disparity_delta_px": delta,
        "parity_mean_delta_px": float(d.mean()),
        "parity_p99_delta_px": float(np.percentile(d, 99)),
        "parity_frac_gt_1px": float((d > 1.0).mean()),
        "artifact_latency_ms_per_batch": round(
            1e3 * sum(lat_dev) / len(lat_dev), 1),
        "artifact_ms_per_frame": round(
            1e3 * sum(lat_dev) / len(lat_dev) / b, 2),
        "host_roundtrip_ms_per_batch": round(1e3 * sum(lat) / len(lat), 1),
        "batch": b,
        "first_call_s": round(first_s, 1),
        "depth_finite": bool(np.isfinite(depth_art).all()),
        "checkpoint": args.checkpoint,
    }
    print(json.dumps(out, indent=2))

    # --- int8-static section (VERDICT r4 #5): the reference's deployment
    # artifact IS a statically-calibrated int8 blob (preprocess.h:236-240,
    # parser.cpp:84).  Export with the committed flagship calibration
    # baked, validate parity against the live int8-static ENGINE (same
    # scheme, the apples-to-apples reference) and record the delta vs the
    # bf16 engine as deployment context.
    calib_path = args.int8_calib or os.path.join(args.checkpoint,
                                                 "calib.json")
    if os.path.isfile(calib_path):
        from hobot_stereonet_tpu.ops.quant import make_static_quant

        sq = make_static_quant(model, params, calib_path,
                               cfg.camera.height, cfg.camera.width)
        blob8 = args.blob.replace(".stereoblob", "_int8.stereoblob")
        t0 = time.perf_counter()
        manifest8 = export_artifact(blob8, model, params, cfg,
                                    buckets=buckets, platforms=("tpu",),
                                    static_quant=sq)
        export8_s = time.perf_counter() - t0
        print(f"exported {blob8} ({os.path.getsize(blob8)} bytes) in "
              f"{export8_s:.1f}s", file=sys.stderr)

        eng8 = StereoEngine(cfg, model=model, params=params,
                            compute_depth=True, static_quant=sq)
        disp_eng8 = np.asarray(eng8._pipeline(eng8.params,
                                              jnp.asarray(batch))[0])

        art8 = CompiledStereoArtifact(blob8)
        disp_art8, depth_art8 = art8.run_nv12(batch)
        float(jnp.mean(art8.call_nv12_async(batch_dev)[0]))  # warm path
        lat8 = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            d_dev, _z = art8.call_nv12_async(batch_dev)
            float(jnp.mean(d_dev))
            lat8.append(time.perf_counter() - t0)

        d8 = np.abs(disp_art8 - disp_eng8)
        d8_vs_bf16 = np.abs(disp_art8 - disp_eng)
        out["int8_static"] = {
            "calib": calib_path,
            "blob_bytes": os.path.getsize(blob8),
            "export_s": round(export8_s, 1),
            "parity_vs_int8_engine_mean_px": float(d8.mean()),
            "parity_vs_int8_engine_p99_px": float(np.percentile(d8, 99)),
            "parity_vs_int8_engine_frac_gt_1px": float((d8 > 1.0).mean()),
            "delta_vs_bf16_engine_mean_px": float(d8_vs_bf16.mean()),
            "delta_vs_bf16_engine_p99_px": float(
                np.percentile(d8_vs_bf16, 99)),
            "artifact_latency_ms_per_batch": round(
                1e3 * sum(lat8) / len(lat8), 1),
            "artifact_ms_per_frame": round(
                1e3 * sum(lat8) / len(lat8) / b, 2),
            "depth_finite": bool(np.isfinite(depth_art8).all()),
        }
        print(json.dumps({"int8_static": out["int8_static"]}, indent=2))

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    # The artifact is the SAME traced program serialized, but XLA compiles
    # the deserialized StableHLO independently of the live jit — different
    # fusion order means different bf16 rounding, and at pixels where the
    # cost curve is near-flat the soft-argmin mode can flip (measured:
    # mean 0.007 px, p99 0.049 px, 0.006% of pixels >1 px on 32 synthetic
    # 720p frames).  Max-delta is therefore the wrong parity metric;
    # assert on robust statistics instead.
    assert out["parity_mean_delta_px"] < 0.02, out
    assert out["parity_p99_delta_px"] < 0.2, out
    # Measured mode-flip rate is 6e-5 of pixels; 3e-4 keeps 5x margin
    # without admitting the ~920 px/frame a 1e-3 bound would have
    # (ADVICE r3: keep the gate near the measurement, not 15x looser).
    assert out["parity_frac_gt_1px"] < 3e-4, out
    assert out["depth_finite"]
    if "int8_static" in out:
        i8 = out["int8_static"]
        # Same robust-parity philosophy; int8 rounding amplifies the
        # near-flat-cost mode flips, so the gates are the int8-vs-int8
        # measurement's own scale, not the bf16 gates.
        assert i8["parity_vs_int8_engine_mean_px"] < 0.05, out
        assert i8["parity_vs_int8_engine_frac_gt_1px"] < 3e-3, out
        assert i8["depth_finite"]
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
