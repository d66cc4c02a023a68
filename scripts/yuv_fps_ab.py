"""Clean YUV-native vs RGB-flagship serving A/B (VERDICT r4 #1, fps leg).

The fps legs inside scripts/yuv_finetune.py ran concurrently with the
19-minute CPU test suite (host contention: infer latency 1130 ms/batch-32
vs the normal ~200 ms), so those numbers measure a loaded host, not the
serving path.  This re-measures BOTH input contracts in one idle-host
process: the YUV444-native checkpoint with color_space="yuv" (Pallas
ingest emits YUV444 directly, NO epilogue) against the RGB flagship
(ingest pays the un-normalize->YUV->RGB->re-normalize epilogue,
preprocess_attribution.json: ~10.7 ms/batch-32).

Run on chip:  timeout 3000 python scripts/yuv_fps_ab.py
Updates yuv_report.json in place (fps_* keys + control rows).
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main() -> int:
    import frontier as frontier_mod
    from hobot_stereonet_tpu.config import Config, PreprocessConfig
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.benchmark import measure_engine_fps

    frontier_mod._build_candidates()
    mcfg = frontier_mod.CANDIDATES["A_ft"]
    model = FastStereoNet(mcfg)
    params_yuv = ckpt.load_params("checkpoints/yuv_ft")

    flag_cfg = Config.from_json("checkpoints/flagship/config.json")
    params_rgb = ckpt.load_params("checkpoints/flagship/params")

    report = {}
    if os.path.isfile("yuv_report.json"):
        with open("yuv_report.json") as f:
            report = json.load(f)
    report.pop("fps_yuv_streaming_b32", None)   # contended-host numbers
    report.pop("fps_yuv_headline_b128", None)

    grid = [
        ("yuv", params_yuv, PreprocessConfig(color_space="yuv")),
        ("rgb_control", params_rgb, None),
    ]
    for b, n in ((32, 10), (128, 8)):
        for name, params, pre in grid:
            r = measure_engine_fps(
                model=model, params=params, model_cfg=mcfg,
                preprocess_cfg=pre, batch=b, n_batches=n,
                verbose_to=sys.stderr)
            key = f"fps_{name}_b{b}"
            report[key] = r["fps"]
            print(json.dumps({key: r["fps"],
                              "infer_ms": r["infer_latency_ms"]}),
                  flush=True)

    report["fps_note"] = (
        "one-process A/B; yuv = color_space='yuv' ingest (no RGB "
        "epilogue), rgb_control = the same architecture served through "
        "the RGB-epilogue ingest (throughput is weight-independent, so "
        "the delta isolates the ingest contract; post-crowning both "
        "rows load checkpoints/flagship params). Same-day absolute fps "
        "is tunnel-state-bound; the deterministic epilogue price is "
        "ingest_cost below."
    )
    with open("yuv_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print("updated yuv_report.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
