"""YUV444-native flagship fine-tune + measured verdict (VERDICT r3 #3).

`preprocess_attribution.json` prices the RGB epilogue (un-normalize ->
YUV->RGB -> re-normalize, needed because the flagship trains on RGB while
the camera contract — and the Pallas ingest's native output — is YUV444,
reference `preprocess.cpp:975-1003`) at ~10.7 ms per 32-frame batch at
720p (~5% of device time).  This script settles "train YUV-native or
justify RGB" with measurements:

  1. fine-tune the flagship architecture from the A_ft checkpoint with
     YUV444 inputs (same recipe as the A_ft continuation: lr 3e-4,
     batch 8, crop 128x256 of 256x512 scenes);
  2. eval held-out + cross EPE with the YUV input path;
  3. measure engine fps at the streaming batch with color_space="yuv"
     (no epilogue) vs the RGB flagship.

Writes yuv_report.json + checkpoints/yuv_ft.  Run on chip:
    timeout 5400 python scripts/yuv_finetune.py
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--resume", default="checkpoints/frontier_A_ft")
    ap.add_argument("--ckpt", default="checkpoints/yuv_ft")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--no-fps", action="store_true")
    ap.add_argument("--out", default="yuv_report.json")
    args = ap.parse_args()

    import frontier as frontier_mod
    from hobot_stereonet_tpu.config import Config, PreprocessConfig
    from hobot_stereonet_tpu.data.loader import (
        LayeredSceneDataset, SyntheticStereoDataset)
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.evaluate import evaluate_dataset
    from hobot_stereonet_tpu.runtime.train_loop import train_synthetic

    frontier_mod._build_candidates()
    mcfg = frontier_mod.CANDIDATES["A_ft"]
    pre_yuv = PreprocessConfig(color_space="yuv")
    cfg_yuv = dataclasses.replace(Config(), model=mcfg, preprocess=pre_yuv)
    model = FastStereoNet(mcfg)

    out = {"steps": args.steps, "lr": args.lr, "resume_from": args.resume}

    metrics = train_synthetic(
        steps=args.steps, batch_size=args.batch, crop_hw=(128, 256),
        checkpoint_dir=args.ckpt, log_every=max(args.steps // 10, 1),
        lr=args.lr, resume_from=args.resume, model=model, model_cfg=mcfg,
        color_space="yuv",
    )
    out["train"] = {k: metrics[k] for k in
                    ("steps", "final_loss", "final_epe", "steps_per_sec")}
    print(json.dumps(out["train"]), flush=True)

    params = ckpt.load_params(args.ckpt)
    ds_in = SyntheticStereoDataset(size=args.frames, seed=777,
                                   height=256, width=512)
    ds_x = LayeredSceneDataset(size=args.frames)
    r_in = evaluate_dataset(model, params, ds_in, cfg_yuv)
    r_x = evaluate_dataset(model, params, ds_x, cfg_yuv)
    out["yuv_ft"] = {"heldout_epe_px": r_in.to_dict()["epe_px"],
                     "heldout_d1": r_in.to_dict()["d1_all"],
                     "cross_epe_px": r_x.to_dict()["epe_px"],
                     "cross_d1": r_x.to_dict()["d1_all"]}
    print(json.dumps({"yuv_ft": out["yuv_ft"]}), flush=True)
    with open(args.out, "w") as f:
        json.dump({**out, "partial": True}, f, indent=2)

    if not args.no_fps:
        from hobot_stereonet_tpu.runtime.benchmark import measure_engine_fps

        # Streaming regime comparison (batch 32, where ingest cost is the
        # biggest slice of the loop) AND the headline batch.
        for name, b in (("streaming_b32", 32), ("headline_b128", 128)):
            r_yuv = measure_engine_fps(
                model=model, params=params, model_cfg=mcfg,
                preprocess_cfg=pre_yuv, batch=b, n_batches=6,
                verbose_to=sys.stderr)
            out[f"fps_yuv_{name}"] = r_yuv["fps"]
            print(json.dumps({f"fps_yuv_{name}": r_yuv["fps"]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
