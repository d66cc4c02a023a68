"""Quality/fps frontier: train candidate FastStereoNet configs on the hard
synthetic distribution, evaluate in-distribution (held-out seed) AND
cross-distribution (LayeredScene family), and emit one JSON per config.

Round-2 items (VERDICT.md Next #2/#8): break the circular accuracy story
and spend the perf headroom on the best-EPE config that holds fps >= 300.

Usage:
  python scripts/frontier.py [--steps 12000] [--only A_base,C_big] \
      [--out frontier_results.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


CANDIDATES = {}


def _build_candidates():
    from hobot_stereonet_tpu.config import StereoNetConfig

    CANDIDATES.update(
        {
            # round-1 flagship size (fps 628 @ batch-32-amortized, measured)
            "A_base": StereoNetConfig(),
            # fps 462 measured
            "B_wider": StereoNetConfig(feature_channels=48,
                                       aggregation_channels=96,
                                       num_aggregation_layers=6),
            # fps 385 measured — largest config clearing the 300 fps floor
            "C_big": StereoNetConfig(feature_channels=64,
                                     aggregation_channels=128,
                                     num_aggregation_layers=8,
                                     num_feature_res_blocks=8),
            # classic StereoNet-paper build (3D-conv aggregation +
            # hierarchical refinement) — VERDICT r1 Missing #2: the parity
            # model had no trained weights and no measured EPE.
            "CLASSIC": StereoNetConfig(),
        }
    )


def run_one(name: str, steps: int, out_dir: str, batch: int, lr: float,
            resume: bool = False) -> dict:
    import dataclasses

    import jax

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
    import os

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
    ds_x = LayeredSceneDataset(size=24)
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
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="frontier_results.json")
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--resume", action="store_true",
                    help="resume each candidate's params from its checkpoint "
                         "dir if present (fresh optimizer/schedule)")
    ap.add_argument("--steps-override", default="",
                    help="per-candidate step override, e.g. A_base=6000")
    args = ap.parse_args()

    _build_candidates()
    names = args.only.split(",") if args.only else list(CANDIDATES)
    overrides = dict(
        kv.split("=") for kv in args.steps_override.split(",") if kv
    )
    results = []
    for n in names:
        steps = int(overrides.get(n, args.steps))
        results.append(run_one(n, steps, args.ckpt_dir, args.batch, args.lr,
                               resume=args.resume))
        # Flush partial results so an interrupted sweep still leaves data.
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
