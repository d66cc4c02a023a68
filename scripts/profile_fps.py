"""One-off: break down bench.py time into transfer / ingest / network, and
sweep per-dispatch batch size. Run on the real TPU chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.config import Config
from hobot_stereonet_tpu.models import FastStereoNet
from hobot_stereonet_tpu.ops import preprocess as pp


def timed(fn, *args, iters=8):
    float(jnp.sum(fn(*args)[1] if isinstance(fn(*args), tuple) else jnp.mean(fn(*args))))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        v = o[1] if isinstance(o, tuple) else jnp.mean(o)
        float(v)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = Config()
    H, W = cfg.camera.height, cfg.camera.width
    model = FastStereoNet(cfg.model)
    rng = np.random.default_rng(0)
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)

    for BATCH in (8, 16, 32):
        sbs_np = rng.integers(0, 256, (BATCH, H * 2 * W * 3 // 2), dtype=np.uint8)
        sbs = jnp.asarray(sbs_np)
        jax.block_until_ready(sbs)

        @jax.jit
        def full(params, frames):
            x = jax.vmap(lambda f: pp.nv12_ingest(f, H, 2 * W)[0])(frames)
            left, right = pp.split_model_input(x)
            disp = model.apply(params, left, right)["disparity"]
            return disp, jnp.mean(disp)

        @jax.jit
        def ingest_only(frames):
            x = jax.vmap(lambda f: pp.nv12_ingest(f, H, 2 * W)[0])(frames)
            return jnp.mean(x)

        @jax.jit
        def net_only(params, left, right):
            return jnp.mean(model.apply(params, left, right)["disparity"])

        left = jnp.zeros((BATCH, H, W, 3), jnp.bfloat16)
        right = jnp.zeros((BATCH, H, W, 3), jnp.bfloat16)
        jax.block_until_ready((left, right))

        t_full = timed(full, params, sbs)
        t_ing = timed(ingest_only, sbs)
        t_net = timed(net_only, params, left, right)

        # Host->device transfer cost of one batch of NV12 bytes.
        t0 = time.perf_counter()
        for _ in range(4):
            d = jax.device_put(sbs_np)
            jax.block_until_ready(d)
            float(jnp.sum(d[:1, :4].astype(jnp.int32)))
        t_put = (time.perf_counter() - t0) / 4

        # Empty dispatch (RPC floor).
        @jax.jit
        def nop(x):
            return jnp.mean(x) + 1.0

        t_nop = timed(nop, jnp.zeros((8, 8), jnp.float32))

        print(
            f"BATCH={BATCH}: full={t_full*1e3:.1f}ms ({BATCH/t_full:.0f} fps) "
            f"ingest={t_ing*1e3:.1f}ms net={t_net*1e3:.1f}ms "
            f"device_put={t_put*1e3:.1f}ms nop={t_nop*1e3:.1f}ms"
        )


if __name__ == "__main__":
    main()
