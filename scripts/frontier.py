"""Quality/fps frontier: train candidate configs on the hard synthetic
distribution at EQUAL step budgets, evaluate in-distribution (held-out
seed) AND cross-distribution (hard layered family), measure serving fps
THROUGH the engine per candidate, and emit ONE results JSON.

Round-3 items (VERDICT r2 Next #1/#2 + Weak #2): finish the sweep (CLASSIC
and C_big were defined but never trained), equal budgets for every
candidate, and per-candidate fps as committed JSON instead of code
comments.  The flagship is the best-held-out-EPE candidate whose engine
fps >= 300 (scripts/crown.py applies the choice to config defaults).

Usage:
  python scripts/frontier.py [--steps 8000] [--only A_base,C_big] \
      [--out frontier_results.json] [--no-fps]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


CANDIDATES = {}
# Serving-measurement overrides: CLASSIC's hierarchical full-res refinement
# can't hold batch-128 activations in HBM at 720p, so it serves blockwise
# (device_microbatch: lax.map chunks inside ONE dispatch — activation
# memory bounded by the chunk, RPC amortization kept at the full bucket).
# CLASSIC serving config: batch 32 + micro 8 compiles in ~32 s and holds
# the same ~45 fps; the old batch 128 + micro 16 paid a 2102 s compile for
# nothing (classic_diagnosis.json).
FPS_OPTS = {"CLASSIC": {"batch": 32, "device_microbatch": 8}}


def _build_candidates():
    from hobot_stereonet_tpu.config import StereoNetConfig

    # Explicit literals, NOT StereoNetConfig() defaults: crowning a flagship
    # rewrites the defaults (scripts/crown.py), and candidate identities
    # must not drift with them.
    base = dict(
        downsample_factor=3, feature_channels=32, num_feature_res_blocks=6,
        max_disparity=192, num_aggregation_layers=4, aggregation_channels=32,
    )
    CANDIDATES.update(
        {
            "A_base": StereoNetConfig(**base),
            "B_wider": StereoNetConfig(**{**base,
                                          "feature_channels": 48,
                                          "aggregation_channels": 96,
                                          "num_aggregation_layers": 6}),
            "C_big": StereoNetConfig(**{**base,
                                        "feature_channels": 64,
                                        "aggregation_channels": 128,
                                        "num_aggregation_layers": 8,
                                        "num_feature_res_blocks": 8}),
            # Classic StereoNet-paper build (3D-conv aggregation +
            # hierarchical refinement) — the reference-parity model
            # (/root/reference/README.md:5).
            "CLASSIC": StereoNetConfig(**{**base, "upsample_mode": "refine"}),
            # Flagship continuation: A_base architecture fine-tuned past the
            # equal-budget frontier (seed its checkpoint dir from
            # frontier_A_base and run with --resume --lr 3e-4).  NOT part of
            # the equal-budget comparison — provenance lives in
            # FLAGSHIP.json when crowned.
            "A_ft": StereoNetConfig(**base),
            # YUV444-native continuation of A_ft (scripts/yuv_finetune.py):
            # same architecture, input contract = the reference's native
            # YUV444 (preprocess.cpp:975-1003) — crowning it flips the
            # flagship config's preprocess.color_space to "yuv".
            "YUV_ft": StereoNetConfig(**base),
        }
    )


def run_one(name: str, steps: int, out_dir: str, batch: int, lr: float,
            resume: bool = False, measure_fps: bool = True) -> dict:
    import dataclasses
    import os

    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.data.loader import (
        LayeredSceneDataset, SyntheticStereoDataset)
    from hobot_stereonet_tpu.models import FastStereoNet, StereoNet
    from hobot_stereonet_tpu.runtime.evaluate import evaluate_dataset
    from hobot_stereonet_tpu.runtime.train_loop import train_synthetic
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt

    mcfg = CANDIDATES[name]
    model_cls = StereoNet if name == "CLASSIC" else FastStereoNet
    model = model_cls(mcfg)
    ckpt_dir = f"{out_dir}/frontier_{name}"

    resume_from = ckpt_dir if (resume and os.path.isdir(ckpt_dir)) else None
    if resume_from:
        print(f"# resuming {name} params from {ckpt_dir}", file=sys.stderr)
    t0 = time.time()
    metrics = train_synthetic(
        steps=steps, batch_size=batch, crop_hw=(128, 256),
        checkpoint_dir=ckpt_dir, log_every=max(steps // 10, 1), lr=lr,
        seed=0, model=model, model_cfg=mcfg, save_every=2000,
        resume_from=resume_from,
    )
    train_s = time.time() - t0

    params = ckpt.load_params(ckpt_dir)
    cfg = dataclasses.replace(Config(), model=mcfg)
    ds_in = SyntheticStereoDataset(size=24, seed=777, height=256, width=512)
    ds_x = LayeredSceneDataset(size=24)  # hard family (slants + gamma)
    res_in = evaluate_dataset(model, params, ds_in, cfg)
    res_x = evaluate_dataset(model, params, ds_x, cfg)
    out = {
        "name": name,
        "steps": steps,
        "train_final_epe": metrics["final_epe"],
        "train_steps_per_sec": metrics["steps_per_sec"],
        "train_wall_s": round(train_s, 1),
        "heldout_epe_px": res_in.to_dict()["epe_px"],
        "heldout_d1": res_in.to_dict()["d1_all"],
        "cross_epe_px": res_x.to_dict()["epe_px"],
        "cross_d1": res_x.to_dict()["d1_all"],
        "checkpoint": ckpt_dir,
    }
    if measure_fps:
        from hobot_stereonet_tpu.runtime.benchmark import measure_engine_fps

        fps = measure_engine_fps(
            model=model, params=params, model_cfg=mcfg,
            n_batches=6, verbose_to=sys.stderr,
            **FPS_OPTS.get(name, {"batch": 128}),
        )
        out["engine_fps"] = fps["fps"]
        out["fps_detail"] = fps
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000,
                    help="EQUAL training budget for every candidate")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="frontier_results.json")
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--resume", action="store_true",
                    help="resume each candidate's params from its checkpoint "
                         "dir if present (fresh optimizer/schedule)")
    ap.add_argument("--no-fps", action="store_true",
                    help="skip the per-candidate engine fps measurement "
                         "(e.g. when running on CPU)")
    args = ap.parse_args()

    _build_candidates()
    # A_ft is the post-frontier fine-tune alias, never part of the default
    # equal-budget sweep.
    names = (args.only.split(",") if args.only
             else [n for n in CANDIDATES if n not in ("A_ft", "YUV_ft")])
    results = []
    for n in names:
        results.append(run_one(n, args.steps, args.ckpt_dir, args.batch,
                               args.lr, resume=args.resume,
                               measure_fps=not args.no_fps))
        # Flush partial results so an interrupted sweep still leaves data.
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
