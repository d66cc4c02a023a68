"""Tower-internal time split + the polyphase-conv1 negative result.

roofline.json shows the feature tower is the network's biggest block
(~29 ms/batch-32 of ~48).  This script attributes it layer-by-layer with
scan-chained staged programs, and measures the one promising rewrite:
conv1 (5x5 stride-2 on the full-res 3-channel input) re-expressed as an
EXACT polyphase space-to-depth conv (3x3 stride-1 on [H/2,W/2,12] with
the same weights scattered — max|delta| ~1e-6).

Measured verdict (committed in tower_split.json): conv1 is ~63% of the
tower, but the polyphase form is only ~1.02x faster — XLA's TPU conv
lowering already handles C_in=3 stride-2 as well as the polyphase
formulation, so the cost is the intrinsic full-resolution input touch,
not a layout miss.  Kept as a measured negative (like
ops/pallas/correlation.py's).  Round-5 follow-ups closed the remaining
hypotheses (conv_layout_ab.json, u8_input_ab.json): NCHW layout is a
wash (1.01-1.03x — XLA's assignment already good) and the uint8-input
fused first layer is 1.17x on conv1 standalone but only 1.009x on the
full forward — the full-res input read is too small a byte fraction to
move the network.

Run on chip:  timeout 1500 python scripts/tower_split.py
Writes tower_split.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from jax import lax

    import frontier as frontier_mod
    from hobot_stereonet_tpu.models.layers import ConvBlock, ResBlock2D
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt

    frontier_mod._build_candidates()
    mcfg = frontier_mod.CANDIDATES["A_ft"]
    params = ckpt.load_params("checkpoints/flagship/params")
    tp = params["params"]["FeatureTower_0"]
    B, H, W = 32, 720, 1280
    dt = mcfg.compute_dtype

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2 * B, H, W, 3)).astype(np.float32))
    jax.block_until_ready(x0)

    def staged(n_convs, n_res, final=False):
        def f(x):
            x = x.astype(dt)
            c = mcfg.feature_channels
            for i in range(n_convs):
                x = ConvBlock(c, kernel=(5, 5), strides=(2, 2),
                              dtype=dt).apply(
                    {"params": tp[f"ConvBlock_{i}"]}, x)
            for i in range(n_res):
                x = ResBlock2D(c, dtype=dt).apply(
                    {"params": tp[f"ResBlock2D_{i}"]}, x)
            if final:
                x = nn.Conv(c, (3, 3), padding="SAME", dtype=dt,
                            param_dtype=jnp.float32).apply(
                    {"params": tp["Conv_0"]}, x)
            return jnp.mean(x.astype(jnp.float32))
        return f

    def timed(fn, carry0, iters=8):
        def body(carry, _):
            s = fn(carry)
            eps = (1e-30 * s).astype(carry.dtype)
            return carry + eps, s

        @jax.jit
        def run(x):
            _, ss = jax.lax.scan(body, x, None, length=iters)
            return jnp.sum(ss)

        float(run(carry0))
        t0 = time.perf_counter()
        for _ in range(3):
            float(run(carry0))
        return (time.perf_counter() - t0) / 3 / iters * 1e3

    out = {"batch_pairs": B, "geometry": f"{W}x{H}",
           "stages_ms_per_batch": {}}
    stages = [("conv1", staged(1, 0)), ("conv1-2", staged(2, 0)),
              ("conv1-3", staged(3, 0)), ("conv1-3+res6", staged(3, 6)),
              ("full_tower", staged(3, 6, final=True))]
    prev = 0.0
    for name, fn in stages:
        t = timed(fn, x0)
        out["stages_ms_per_batch"][name] = {
            "cum": round(t, 2), "delta": round(t - prev, 2)}
        print(json.dumps({name: out["stages_ms_per_batch"][name]}),
              flush=True)
        prev = t

    # Polyphase conv1: exact space-to-depth reformulation, measured.
    k = jnp.asarray(
        rng.standard_normal((5, 5, 3, 32)).astype(np.float32) * 0.1)

    def conv_ref(x, k):
        return lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def poly_kernel(k):
        kp = jnp.zeros((3, 3, 12, k.shape[3]), k.dtype)
        m = {0: (-1, 1), 1: (0, 0), 2: (0, 1), 3: (1, 0), 4: (1, 1)}
        for ky in range(5):
            ay, py = m[ky]
            for kx in range(5):
                ax, px = m[kx]
                ch0 = (py * 2 + px) * 3
                kp = kp.at[ay + 1, ax + 1, ch0:ch0 + 3, :].set(k[ky, kx])
        return kp

    def s2d(x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

    def conv_poly(x, kp):
        return lax.conv_general_dilated(
            s2d(x), kp, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xs = x0[:8]
    kp = poly_kernel(k)
    d = float(jnp.max(jnp.abs(jax.jit(conv_ref)(xs, k)
                              - jax.jit(conv_poly)(xs, kp))))
    xb, kb, kpb = (xs.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                   kp.astype(jnp.bfloat16))
    t_ref = timed(lambda c: jnp.mean(conv_ref(c, kb).astype(jnp.float32)),
                  xb, iters=12)
    t_poly = timed(lambda c: jnp.mean(conv_poly(c, kpb).astype(jnp.float32)),
                   xb, iters=12)
    out["polyphase_conv1"] = {
        "exactness_max_abs_delta": d,
        "conv_ref_ms_b8": round(t_ref, 2),
        "conv_poly_ms_b8": round(t_poly, 2),
        "speedup": round(t_ref / t_poly, 2),
        "verdict": "negative — XLA's strided-conv lowering already "
                   "matches the polyphase form; conv1's cost is the "
                   "intrinsic full-res input touch",
    }
    print(json.dumps(out["polyphase_conv1"]), flush=True)

    with open("tower_split.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote tower_split.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
