"""On-chip ingest cost: YUV444-native vs RGB epilogue (VERDICT r4 #1).

Engine-level fps A/B on this rig is +/-50% noisy today (external tunnel
load), far above the ~10% effect being measured.  This prices the two
ingest contracts directly: the fused NV12 ingest with
color_space="yuv" (kernel output used as-is) vs "rgb" (kernel output
un-normalized -> YUV->RGB -> re-normalized, the epilogue the RGB-trained
flagship forces), each timed by chaining dependent iterations inside one
lax.scan dispatch — deterministic on-chip numbers, no RPC floor, no
engine machinery.

Run on chip:  timeout 1200 python scripts/ingest_cost_ab.py
Updates yuv_report.json (ingest_cost section).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hobot_stereonet_tpu.config import PreprocessConfig
    from hobot_stereonet_tpu.ops import preprocess as pp

    B, H, W = 32, 720, 1280
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (B, H * 2 * W * 3 // 2), dtype=np.uint8))
    jax.block_until_ready(frames)
    iters = 16

    out = {}
    for name in ("yuv", "rgb"):
        cfg = PreprocessConfig(color_space=name)

        def ingest(fr):
            return jax.vmap(lambda f: pp.nv12_ingest(f, H, 2 * W, cfg)[0])(fr)

        def body(carry, _):
            x = ingest(carry)
            s = jnp.mean(x.astype(jnp.float32))
            # Output-derived epsilon keeps iterations dependent without
            # changing the uint8 input values (isnan is 0 at runtime but
            # not foldable at compile time, so nothing hoists).
            eps = jnp.isnan(s).astype(jnp.uint8)
            return carry + eps, s

        @jax.jit
        def run(fr):
            _, ss = jax.lax.scan(body, fr, None, length=iters)
            return jnp.sum(ss)

        float(run(frames))
        t0 = time.perf_counter()
        for _ in range(3):
            float(run(frames))
        ms = (time.perf_counter() - t0) / 3 / iters * 1e3
        out[f"ingest_{name}_ms_per_batch{B}"] = round(ms, 2)
        print(json.dumps({name: round(ms, 2)}), flush=True)

    out["epilogue_ms_per_batch"] = round(
        out[f"ingest_rgb_ms_per_batch{B}"]
        - out[f"ingest_yuv_ms_per_batch{B}"], 2)
    out["note"] = ("scan-chained on-chip timing; the delta is the RGB "
                   "epilogue the YUV444-native flagship removes from "
                   "every served batch")

    report = {}
    if os.path.isfile("yuv_report.json"):
        with open("yuv_report.json") as f:
            report = json.load(f)
    report["ingest_cost"] = out
    with open("yuv_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print("updated yuv_report.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
