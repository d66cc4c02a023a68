"""Crown the flagship: pick the best frontier candidate and install it as
``checkpoints/flagship`` (params + full Config JSON), the checkpoint every
CLI entry loads by default.

Selection rule (VERDICT r2 Next #1): among candidates holding >= 300 fps
THROUGH the engine, lowest held-out EPE wins — with a 0.03 px tie band
inside which the fastest candidate is preferred (eval noise on 24 scenes
is that large; paying 300 fps for 0.002 px is not a trade).  The
reference's model is the whole
product (``/root/reference/README.md:5`` — one .hbm blob IS hobot_stereonet);
our analog of "shipping the blob" is this directory:

  checkpoints/flagship/
    config.json   full Config whose model section is the winner's arch
    params/       orbax checkpoint (copied from the winner's frontier dir)
    FLAGSHIP.json provenance: which candidate, when, with what evidence

Usage: python scripts/crown.py [--frontier frontier_results.json]
                               [--min-fps 300] [--dest checkpoints/flagship]
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frontier", default="frontier_results.json",
                    help="comma-separated result files; rows are pooled "
                         "(e.g. the equal-budget sweep plus the A_ft "
                         "post-frontier fine-tune)")
    ap.add_argument("--min-fps", type=float, default=300.0)
    ap.add_argument("--dest", default="checkpoints/flagship")
    ap.add_argument("--name", default=None,
                    help="crown this candidate directly (bypasses the "
                         "fps/EPE row selection; use when the decision "
                         "evidence is paired-CI accuracy + deterministic "
                         "cost measurements rather than same-day engine "
                         "fps rows, which are rig-noise-bound)")
    ap.add_argument("--checkpoint", default=None,
                    help="with --name: the checkpoint dir to install")
    ap.add_argument("--why", default="",
                    help="with --name: provenance note for FLAGSHIP.json")
    args = ap.parse_args()

    from hobot_stereonet_tpu.config import Config

    sys.path.insert(0, "/root/repo/scripts")
    import frontier as frontier_mod

    frontier_mod._build_candidates()
    if args.name:
        if not args.checkpoint:
            print("--name requires --checkpoint", file=sys.stderr)
            return 1
        winner = {"name": args.name, "checkpoint": args.checkpoint,
                  "why": args.why}
        return _install(args, frontier_mod, winner,
                        rule=f"direct crown (--name): {args.why}")
    rows = []
    for path in args.frontier.split(","):
        with open(path) as f:
            rows.extend(json.load(f))
    # Dedupe by candidate name, last-seen wins: a stale duplicate row left
    # in an earlier frontier file must not outrank the re-measured one
    # (file order is the measurement order — later files supersede).
    by_name = {}
    for r in rows:
        if r["name"] in by_name:
            print(f"note: duplicate frontier row for {r['name']!r}; "
                  f"keeping the later one", file=sys.stderr)
        by_name[r["name"]] = r
    rows = list(by_name.values())

    eligible = [r for r in rows if r.get("engine_fps", 0) >= args.min_fps]
    if not eligible:
        print(f"no candidate holds >= {args.min_fps} fps; have "
              f"{[(r['name'], r.get('engine_fps')) for r in rows]}",
              file=sys.stderr)
        return 1
    # Min held-out EPE wins, with a tie band: run-to-run EPE noise on the
    # 24-scene eval is a few hundredths of a px, so any candidate within
    # EPE_TIE_PX of the best is statistically the same model quality — take
    # the fastest of those rather than paying fps for noise.
    EPE_TIE_PX = 0.03
    best_epe = min(r["heldout_epe_px"] for r in eligible)
    tied = [r for r in eligible if r["heldout_epe_px"] <= best_epe + EPE_TIE_PX]
    winner = max(tied, key=lambda r: r["engine_fps"])
    return _install(
        args, frontier_mod, winner,
        rule=f"min heldout_epe_px with engine_fps >= {args.min_fps}; "
             f"fastest within a {EPE_TIE_PX} px tie band")


def _install(args, frontier_mod, winner, rule):
    from hobot_stereonet_tpu.config import Config

    mcfg = frontier_mod.CANDIDATES[winner["name"]]
    cfg = dataclasses.replace(Config(), model=mcfg)
    if winner["name"] == "YUV_ft":
        # YUV444-native flagship: the serving/eval input contract rides
        # the config (datasets convert RGB->YUV, the NV12 ingest skips
        # the RGB epilogue entirely — ~8.2 ms/batch-32 measured,
        # yuv_report.json ingest_cost).
        from hobot_stereonet_tpu.config import PreprocessConfig

        cfg = dataclasses.replace(
            cfg, preprocess=PreprocessConfig(color_space="yuv"))

    dest = args.dest
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    shutil.copytree(winner["checkpoint"], os.path.join(dest, "params"))
    cfg.save_json(os.path.join(dest, "config.json"))
    with open(os.path.join(dest, "FLAGSHIP.json"), "w") as f:
        json.dump({"candidate": winner,
                   "model_class": "classic" if winner["name"] == "CLASSIC"
                   else "fast",
                   "selection_rule": rule},
                  f, indent=2)
    print(json.dumps({"flagship": winner["name"],
                      "heldout_epe_px": winner.get("heldout_epe_px"),
                      "engine_fps": winner.get("engine_fps"),
                      "installed": dest}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
