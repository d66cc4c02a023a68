"""Committed int8 evidence (VERDICT r2 Weak #3): the w8a8 network path's
accuracy delta and on-chip serving throughput, as JSON — not commit-message
folklore.

Measures, for the flagship checkpoint:
  * held-out + cross EPE at bf16 and at w8a8 int8 (same params, convs
    swapped at apply time — ops/quant.py);
  * engine fps with the int8 network path at the headline batch.

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
    ap.add_argument("--frames", type=int, default=24)
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

    ds_in = SyntheticStereoDataset(size=args.frames, seed=777,
                                   height=256, width=512)
    ds_x = LayeredSceneDataset(size=args.frames)
    out = {"checkpoint": args.checkpoint, "eval_frames": args.frames}
    for name, int8 in (("bf16", False), ("int8", True)):
        r_in = evaluate_dataset(model, params, ds_in, cfg, int8=int8)
        r_x = evaluate_dataset(model, params, ds_x, cfg, int8=int8)
        out[name] = {"heldout_epe_px": r_in.to_dict()["epe_px"],
                     "heldout_d1": r_in.to_dict()["d1_all"],
                     "cross_epe_px": r_x.to_dict()["epe_px"],
                     "cross_d1": r_x.to_dict()["d1_all"]}
        print(json.dumps({name: out[name]}), flush=True)
    out["epe_delta_px"] = round(
        out["int8"]["heldout_epe_px"] - out["bf16"]["heldout_epe_px"], 4)

    if not args.no_fps:
        from hobot_stereonet_tpu.runtime.benchmark import measure_engine_fps

        for name, int8 in (("bf16", False), ("int8", True)):
            r = measure_engine_fps(model=model, params=params,
                                   model_cfg=cfg.model, batch=128,
                                   n_batches=6, int8=int8,
                                   verbose_to=sys.stderr)
            out[name]["engine_fps"] = r["fps"]
            print(json.dumps({f"{name}_fps": r["fps"]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
