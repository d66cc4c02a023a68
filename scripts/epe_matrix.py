"""Symmetric train x eval EPE matrix (VERDICT r2 Next #5).

The frontier sweep (scripts/frontier.py) covers the train-on-v2-synth row
for every candidate.  This script adds the REVERSE direction: train the
flagship config and CLASSIC on the hard layered family, evaluate both
models on both families, and assemble the full 2x2 matrix per model.

Eval seeds are disjoint from training seeds in both families:
  v2-synth     train seed 0 (size 512)     eval seed 777  (size 24)
  layered-hard train seed 3000 (size 512)  eval seed 1000 (size 24 — the
               same set the frontier uses for its cross column, so numbers
               are comparable across the two scripts)

Usage:
  python scripts/epe_matrix.py [--steps 8000] \
      [--frontier frontier_results.json] [--out epe_matrix.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def pick_flagship(frontier: list, min_fps: float = 300.0,
                  epe_tie_px: float = 0.03) -> dict:
    """Same rule as scripts/crown.py: min held-out EPE among candidates
    holding >= min_fps through the engine, fastest within the EPE tie band
    (falls back to the whole list if none carries an fps figure)."""
    pool = [r for r in frontier if r.get("engine_fps", 0) >= min_fps] or frontier
    best = min(r["heldout_epe_px"] for r in pool)
    tied = [r for r in pool if r["heldout_epe_px"] <= best + epe_tie_px]
    return max(tied, key=lambda r: r.get("engine_fps", 0))


def train_on_layered(name: str, mcfg, model_cls, steps: int, batch: int,
                     lr: float, ckpt_dir: str) -> dict:
    import dataclasses

    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.data.loader import (
        LayeredSceneDataset, SyntheticStereoDataset)
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.evaluate import evaluate_dataset
    from hobot_stereonet_tpu.runtime.train_loop import train_synthetic

    model = model_cls(mcfg)
    train_ds = LayeredSceneDataset(size=512, seed=3000, height=256, width=512,
                                   cache_items=512)
    t0 = time.time()
    metrics = train_synthetic(
        steps=steps, batch_size=batch, crop_hw=(128, 256),
        checkpoint_dir=ckpt_dir, log_every=max(steps // 10, 1), lr=lr,
        seed=0, model=model, model_cfg=mcfg, save_every=2000,
        dataset=train_ds,
    )
    train_s = time.time() - t0
    params = ckpt.load_params(ckpt_dir)
    cfg = dataclasses.replace(Config(), model=mcfg)
    ds_held = LayeredSceneDataset(size=24, seed=1000)
    ds_cross = SyntheticStereoDataset(size=24, seed=777, height=256, width=512)
    held = evaluate_dataset(model, params, ds_held, cfg).to_dict()
    cross = evaluate_dataset(model, params, ds_cross, cfg).to_dict()
    return {
        "train_family": "layered_hard",
        "steps": steps,
        "train_wall_s": round(train_s, 1),
        "train_final_epe": metrics["final_epe"],
        "heldout_epe_px": held["epe_px"],
        "heldout_d1": held["d1_all"],
        "cross_epe_px": cross["epe_px"],
        "cross_d1": cross["d1_all"],
        "checkpoint": ckpt_dir,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000,
                    help="same budget as the frontier sweep")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--frontier", default="frontier_results.json")
    ap.add_argument("--out", default="epe_matrix.json")
    ap.add_argument("--ckpt-dir", default="checkpoints")
    args = ap.parse_args()

    from hobot_stereonet_tpu.models import FastStereoNet, StereoNet

    sys.path.insert(0, "/root/repo/scripts")
    import frontier as frontier_mod

    frontier_mod._build_candidates()
    with open(args.frontier) as f:
        frontier = json.load(f)

    flagship = pick_flagship(frontier)
    targets = [(flagship["name"],
                FastStereoNet if flagship["name"] != "CLASSIC" else StereoNet)]
    if flagship["name"] != "CLASSIC":
        targets.append(("CLASSIC", StereoNet))

    matrix = {"step_budget": args.steps, "models": {}}
    for name, model_cls in targets:
        mcfg = frontier_mod.CANDIDATES[name]
        fr = next(r for r in frontier if r["name"] == name)
        row_v2 = {
            "train_family": "v2_synth",
            "steps": fr["steps"],
            "heldout_epe_px": fr["heldout_epe_px"],
            "heldout_d1": fr["heldout_d1"],
            "cross_epe_px": fr["cross_epe_px"],
            "cross_d1": fr["cross_d1"],
            "checkpoint": fr["checkpoint"],
        }
        row_layered = train_on_layered(
            name, mcfg, model_cls, args.steps, args.batch, args.lr,
            ckpt_dir=f"{args.ckpt_dir}/matrix_{name}_layered",
        )
        matrix["models"][name] = {
            "trained_on_v2_synth": row_v2,
            "trained_on_layered_hard": row_layered,
        }
        # A direction where the cross family is HARDER than training
        # (cross EPE > held-out EPE) — the round-2 verdict's acceptance bar.
        matrix["models"][name]["has_harder_cross_direction"] = bool(
            row_v2["cross_epe_px"] > row_v2["heldout_epe_px"]
            or row_layered["cross_epe_px"] > row_layered["heldout_epe_px"]
        )
        with open(args.out, "w") as f:
            json.dump(matrix, f, indent=2)
        print(json.dumps({name: matrix["models"][name]}), flush=True)
    print(f"wrote {args.out}", file=sys.stderr)
