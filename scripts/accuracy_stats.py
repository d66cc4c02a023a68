"""Statistics under the accuracy story (VERDICT r3 weak #1 / next #5).

Round 3's accuracy claims rode a 24-scene eval with +/-0.03 px admitted
noise and no committed uncertainty — frontier deltas of 0.02-0.04 px were
INSIDE the noise band, stated as if resolved.  This script evaluates the
flagship (A_ft), its base (A_base), and CLASSIC on >=100 held-out and
>=100 cross-distribution scenes and commits per-candidate mean +/- std
with a 95% CI, plus PAIRED per-scene deltas between candidates (paired
CIs resolve far smaller differences than independent ones).

All evals share the same scene set, so deltas are paired by construction.
The eval sets are internal procedural benchmarks — NOT SceneFlow; no
cross-corpus parity claim is made (zero-egress rig).

Run on chip: timeout 3000 python scripts/accuracy_stats.py
Writes accuracy_stats.json.
"""

import argparse
import json
import math
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def stats(xs):
    import numpy as np

    a = np.asarray(xs, dtype=np.float64)
    n = len(a)
    mean = float(a.mean())
    std = float(a.std(ddof=1)) if n > 1 else 0.0
    sem = std / math.sqrt(n) if n > 1 else 0.0
    return {"mean": round(mean, 4), "std": round(std, 4),
            "sem": round(sem, 4), "ci95": round(1.96 * sem, 4),
            "median": round(float(np.median(a)), 4), "n": n}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--out", default="accuracy_stats.json")
    args = ap.parse_args()

    import numpy as np

    import frontier as frontier_mod
    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.data.loader import (
        LayeredSceneDataset, SyntheticStereoDataset)
    from hobot_stereonet_tpu.models import FastStereoNet, StereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.evaluate import evaluate_dataset

    frontier_mod._build_candidates()

    candidates = {
        "A_ft": ("checkpoints/frontier_A_ft", FastStereoNet,
                 frontier_mod.CANDIDATES["A_ft"]),
        "A_base": ("checkpoints/frontier_A_base", FastStereoNet,
                   frontier_mod.CANDIDATES["A_base"]),
        "CLASSIC": ("checkpoints/frontier_CLASSIC", StereoNet,
                    frontier_mod.CANDIDATES["CLASSIC"]),
    }
    # YUV444-native fine-tune (VERDICT r4 #1): same architecture, YUV
    # input contract (preprocess.color_space="yuv") — included at the
    # same statistical bar once its checkpoint exists.
    import os
    if os.path.isdir("checkpoints/yuv_ft"):
        candidates["YUV_ft"] = ("checkpoints/yuv_ft", FastStereoNet,
                                frontier_mod.CANDIDATES["A_ft"])

    ds_in = SyntheticStereoDataset(size=args.frames, seed=777,
                                   height=256, width=512)
    ds_x = LayeredSceneDataset(size=args.frames)

    out = {"eval_frames": args.frames,
           "note": ("internal procedural benchmarks, not SceneFlow; "
                    "per-scene EPE lists are paired across candidates "
                    "(identical scene sets)")}
    per_scene = {}
    for name, (path, cls, mcfg) in candidates.items():
        import dataclasses

        cfg = dataclasses.replace(Config(), model=mcfg)
        if name == "YUV_ft":
            from hobot_stereonet_tpu.config import PreprocessConfig

            cfg = dataclasses.replace(
                cfg, preprocess=PreprocessConfig(color_space="yuv"))
        params = ckpt.load_params(path)
        model = cls(mcfg)
        r_in = evaluate_dataset(model, params, ds_in, cfg)
        r_x = evaluate_dataset(model, params, ds_x, cfg)
        per_scene[name] = {"heldout": r_in.per_frame_epe,
                           "cross": r_x.per_frame_epe}
        out[name] = {
            "heldout": stats(r_in.per_frame_epe),
            "cross": stats(r_x.per_frame_epe),
            "heldout_d1": round(r_in.d1_all, 4),
            "cross_d1": round(r_x.d1_all, 4),
        }
        print(json.dumps({name: out[name]}), flush=True)

    # Paired deltas (same scenes => per-scene difference CIs).
    pairs = [("A_ft", "A_base"), ("A_ft", "CLASSIC"), ("A_base", "CLASSIC")]
    if "YUV_ft" in per_scene:
        pairs.append(("YUV_ft", "A_ft"))
    out["paired_deltas"] = {}
    for a, b in pairs:
        for split in ("heldout", "cross"):
            da = np.asarray(per_scene[a][split])
            db = np.asarray(per_scene[b][split])
            if len(da) != len(db):
                continue
            d = stats(da - db)
            d["resolved"] = bool(abs(d["mean"]) > d["ci95"])
            out["paired_deltas"][f"{a}-{b}/{split}"] = d
    print(json.dumps(out["paired_deltas"], indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
