"""Committed int8 evidence (VERDICT r2 Weak #3): the w8a8 network path's
accuracy delta and on-chip serving throughput, as JSON — not commit-message
folklore.

Measures, for the flagship checkpoint:
  * held-out + cross EPE at bf16, dynamic w8a8 int8, and CALIBRATED
    static-scale int8 (same params, convs swapped at apply time —
    ops/quant.py; static scheme = the reference's, scales fixed offline,
    no runtime reductions) — at the repo's statistical bar (VERDICT r4
    #6): 120 paired scenes, per-scene quantization deltas with 95% CIs
    (the accuracy_stats.py methodology; deltas are paired by
    construction since every mode evaluates the identical scene set);
  * engine fps for each path at the headline batch.

Writes int8_report.json.

Usage: python scripts/int8_report.py [--checkpoint checkpoints/flagship]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/flagship")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--no-fps", action="store_true")
    ap.add_argument("--out", default="int8_report.json")
    args = ap.parse_args()

    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.data.loader import (
        LayeredSceneDataset, SyntheticStereoDataset)
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.evaluate import evaluate_dataset

    if os.path.isfile(os.path.join(args.checkpoint, "config.json")):
        cfg = Config.from_json(os.path.join(args.checkpoint, "config.json"))
        params = ckpt.load_params(os.path.join(args.checkpoint, "params"))
    else:
        cfg = Config()
        params = ckpt.load_params(args.checkpoint)
    model = FastStereoNet(cfg.model)

    # Calibrate static scales offline on a seed disjoint from train/eval
    # (the vendor toolchain's calibration step).
    from hobot_stereonet_tpu.ops import preprocess as pp
    from hobot_stereonet_tpu.ops.quant import (
        bake_weights, calibrate_activation_scales)

    calib_ds = SyntheticStereoDataset(size=8, seed=4242, height=256,
                                      width=512)

    def calib_batches():
        for i in range(len(calib_ds)):
            s = calib_ds[i]
            x = pp.rgb_pair_to_model_input(s.left, s.right, cfg.preprocess)
            yield pp.split_model_input(x)

    calib = calibrate_activation_scales(model, params, calib_batches())
    import jax.numpy as jnp
    dummy = jnp.zeros((1, 256, 512, 3), jnp.float32)
    baked = bake_weights(model, params, dummy, dummy)
    static_quant = (calib, baked)
    print(json.dumps({"calibrated_convs": len(calib)}), flush=True)

    ds_in = SyntheticStereoDataset(size=args.frames, seed=777,
                                   height=256, width=512)
    ds_x = LayeredSceneDataset(size=args.frames)
    out = {"checkpoint": args.checkpoint, "eval_frames": args.frames,
           "note": ("per-scene EPEs are paired across modes (identical "
                    "scene sets); delta CIs are over per-scene "
                    "quantization deltas, the accuracy_stats.py bar")}
    modes = (("bf16", False, None), ("int8", True, None),
             ("int8_static", False, static_quant))
    per_scene = {}
    for name, int8, sq in modes:
        r_in = evaluate_dataset(model, params, ds_in, cfg, int8=int8,
                                static_quant=sq)
        r_x = evaluate_dataset(model, params, ds_x, cfg, int8=int8,
                               static_quant=sq)
        per_scene[name] = {"heldout": r_in.per_frame_epe,
                           "cross": r_x.per_frame_epe}
        out[name] = {"heldout_epe_px": r_in.to_dict()["epe_px"],
                     "heldout_d1": r_in.to_dict()["d1_all"],
                     "cross_epe_px": r_x.to_dict()["epe_px"],
                     "cross_d1": r_x.to_dict()["d1_all"]}
        print(json.dumps({name: out[name]}), flush=True)

    # Paired per-scene quantization deltas with 95% CIs.
    import math

    import numpy as np

    def delta_stats(a, b):
        d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
        n = len(d)
        std = float(d.std(ddof=1)) if n > 1 else 0.0
        sem = std / math.sqrt(n) if n > 1 else 0.0
        return {"mean": round(float(d.mean()), 4), "std": round(std, 4),
                "ci95": round(1.96 * sem, 4), "n": n,
                "resolved": bool(abs(d.mean()) > 1.96 * sem)}

    out["paired_deltas"] = {}
    for name in ("int8", "int8_static"):
        for split in ("heldout", "cross"):
            out["paired_deltas"][f"{name}-bf16/{split}"] = delta_stats(
                per_scene[name][split], per_scene["bf16"][split])
    print(json.dumps(out["paired_deltas"], indent=1), flush=True)
    out["epe_delta_px"] = out["paired_deltas"]["int8-bf16/heldout"]["mean"]
    out["epe_delta_static_px"] = \
        out["paired_deltas"]["int8_static-bf16/heldout"]["mean"]

    if not args.no_fps:
        from hobot_stereonet_tpu.runtime.benchmark import measure_engine_fps

        for name, int8, sq in modes:
            r = measure_engine_fps(model=model, params=params,
                                   model_cfg=cfg.model,
                                   preprocess_cfg=cfg.preprocess,
                                   batch=128,
                                   n_batches=6, int8=int8, static_quant=sq,
                                   verbose_to=sys.stderr)
            out[name]["engine_fps"] = r["fps"]
            print(json.dumps({f"{name}_fps": r["fps"]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
