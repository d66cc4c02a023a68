"""Roofline-guided serving experiment (VERDICT r4 #2, second half).

hbm_analysis.json already measured that chunked serving at micro 32
LOSES (batch 256/512 @ micro 32 -> ~512 fps vs 808 at batch 128 flat):
small chunks trade MXU efficiency for memory.  But micro=128 — chunking
at the proven-efficient batch — was never tried.  A batch-256/micro-128
program runs the SAME per-chunk math as the headline regime while
halving the number of RPC dispatches (~25 ms floor each), and
batch-512/micro-128 quarters it.

Expected gain if dispatch overhead is the binding constraint at the
headline: ~25 ms / 256 frames ~= 0.1 ms/frame against a ~1.2 ms/frame
total -> up to ~8%.  If fps does NOT move, the headline is chip-bound,
not dispatch-bound — either way the number decides.

Run on chip:  timeout 3000 python scripts/dispatch_amortization.py
Writes dispatch_amortization.json.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime.benchmark import measure_engine_fps

    flag = "checkpoints/flagship"
    cfg = Config.from_json(os.path.join(flag, "config.json"))
    params = ckpt.load_params(os.path.join(flag, "params"))
    model = FastStereoNet(cfg.model)

    out = {}
    grid = [
        ("b128_flat", 128, 0, 12, 4),   # control: the headline regime
        # inflight=2: at batch 256 the 4-deep in-flight pipeline holds
        # 4x708 MB of input buffers alone and OOMs (first attempt
        # recorded below); halving the depth trades overlap for fit.
        ("b256_micro128_inflight2", 256, 128, 6, 2),
    ]
    for name, batch, micro, n_batches, inflight in grid:
        try:
            r = measure_engine_fps(
                model=model, params=params, model_cfg=cfg.model,
                preprocess_cfg=cfg.preprocess, batch=batch,
                n_batches=n_batches, device_microbatch=micro,
                inflight=inflight, verbose_to=sys.stderr)
            out[name] = {"fps": r["fps"], "warmup_s": r["warmup_s"],
                         "batch": batch, "micro": micro,
                         "inflight": inflight, "frames": r["frames_out"]}
        except RuntimeError as e:
            out[name] = {"batch": batch, "micro": micro,
                         "inflight": inflight, "fail": str(e)}
        print(json.dumps({name: out[name]}), flush=True)
    out["b256_micro128_inflight4"] = {
        "batch": 256, "micro": 128, "inflight": 4,
        "fail": "RESOURCE_EXHAUSTED: 4-deep in-flight at batch 256 "
                "exceeds HBM (4x708 MB uint8 inputs + outputs + "
                "chunk activations)"}

    with open("dispatch_amortization.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote dispatch_amortization.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
