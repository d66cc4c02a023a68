"""Headline benchmark: stereo frames/sec/chip at 1280x720.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 15 fps (ZED 2i real-time, the reference's live camera rate —
BASELINE.md north star: >=10x => >=150 fps/chip).

Runs the streaming-flagship model (FastStereoNet, bf16) end to end: fused
NV12 preprocess + network forward, steady-state, donated I/O.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.ops import preprocess as pp

    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    model = FastStereoNet(cfg.model)

    rng = np.random.default_rng(0)
    sbs = jnp.asarray(rng.integers(0, 256, size=(H * 2 * W * 3 // 2,), dtype=np.uint8))

    # NOTE on methodology: through the remote-execution tunnel
    # ``block_until_ready`` can return before device work completes, so we
    # force a true sync by fetching a scalar reduction of the output each
    # frame.  Frames are pipelined (launch all, then fetch) to overlap
    # dispatch with compute, mirroring the streaming engine's >=2 in-flight
    # batches (the reference's task_num=4 analog).
    @jax.jit
    def pipeline(params, sbs_frame):
        x = pp.side_by_side_nv12_to_model_input(sbs_frame, H, 2 * W)
        left, right = pp.split_model_input(x)
        disp = model.apply(params, left, right)["disparity"]
        return disp, jnp.mean(disp)

    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)

    frames = [
        jnp.asarray(rng.integers(0, 256, size=(H * 2 * W * 3 // 2,), dtype=np.uint8))
        for _ in range(8)
    ]
    jax.block_until_ready(frames)

    # Warmup / compile.
    float(pipeline(params, frames[0])[1])

    iters = 24
    t0 = time.perf_counter()
    outs = [pipeline(params, frames[i % len(frames)])[1] for i in range(iters)]
    _ = [float(o) for o in outs]  # true sync: scalar fetch per frame
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    baseline_fps = 15.0
    print(
        json.dumps(
            {
                "metric": "stereo_fps_per_chip_1280x720",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
