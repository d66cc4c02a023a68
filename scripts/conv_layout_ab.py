"""Layout A/B for the tower's convs: is the cost C-minor tile padding?

Hypothesis (round 5, after the polyphase negative): conv1's 19.5 ms/b32
matches the byte cost of reading a C=3-minor (8,128)-tiled layout almost
exactly (~42x pad blowup on the input tile lanes), and every tower
activation at C=32 would pad 32->128 (4x) if XLA keeps C-minor layouts.
If true, expressing the same convs channels-first (lanes = W, dense
128-tiles) should approach the dense-traffic bound; if XLA already
assigns good layouts internally, the A/B is ~1.0x and the committed
"intrinsic full-res input touch" verdict stands.

Variants (all bf16, b8 pairs = 16 images, scan-chained timing):
  conv1_nhwc      5x5 s2 C3->32, logical NHWC in/out     (baseline)
  conv1_nchw      same weights, logical NCHW in/out
  conv1_nchw_u8   NCHW uint8 input, (x-128)/128 fused in-graph
  conv32_nhwc     3x3 C32->32 at 360x640 (mid-tower shape), NHWC
  conv32_nchw     same, NCHW
Exactness is asserted for the reformulations (max|delta| reported).

Run on chip:  timeout 1500 python scripts/conv_layout_ab.py
Writes conv_layout_ab.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    B, H, W, C = 8, 720, 1280, 32
    rng = np.random.default_rng(0)
    k1 = jnp.asarray(rng.standard_normal((5, 5, 3, C)).astype(np.float32) * 0.1)
    k3 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)

    x_u8 = jnp.asarray(rng.integers(0, 256, (2 * B, H, W, 3), dtype=np.uint8))
    x_nhwc = ((x_u8.astype(jnp.float32) - 128.0) / 128.0).astype(jnp.bfloat16)
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    x_nchw_u8 = jnp.transpose(x_u8, (0, 3, 1, 2))
    k1b = k1.astype(jnp.bfloat16)
    k3b = k3.astype(jnp.bfloat16)
    y_nhwc = jnp.asarray(
        rng.standard_normal((2 * B, 360, 640, C)).astype(np.float32)
    ).astype(jnp.bfloat16)
    y_nchw = jnp.transpose(y_nhwc, (0, 3, 1, 2))
    for a in (x_nhwc, x_nchw, x_nchw_u8, y_nhwc, y_nchw):
        jax.block_until_ready(a)

    def conv1_nhwc(x):
        return lax.conv_general_dilated(
            x, k1b, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv1_nchw(x):
        return lax.conv_general_dilated(
            x, k1b, (2, 2), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))

    def conv1_nchw_u8(x):
        # (u-128)/128 as a fused elementwise producer ahead of the conv;
        # uint8 -> bf16 hops via int32 (Mosaic/TPU cast constraint).
        xf = x.astype(jnp.int32).astype(jnp.bfloat16)
        xf = (xf - 128.0) * jnp.bfloat16(1.0 / 128.0)
        return lax.conv_general_dilated(
            xf, k1b, (2, 2), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))

    def conv32_nhwc(y):
        return lax.conv_general_dilated(
            y, k3b, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv32_nchw(y):
        return lax.conv_general_dilated(
            y, k3b, (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))

    # Exactness (small slice, f32 on one frame): NCHW == NHWC^T.
    a = jax.jit(conv1_nhwc)(x_nhwc[:2])
    b = jnp.transpose(jax.jit(conv1_nchw)(x_nchw[:2]), (0, 2, 3, 1))
    c = jnp.transpose(jax.jit(conv1_nchw_u8)(x_nchw_u8[:2]), (0, 2, 3, 1))
    d_nchw = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    d_u8 = float(jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32))))

    def timed(fn, carry0, iters=12):
        def body(carry, _):
            s = jnp.mean(fn(carry).astype(jnp.float32))
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

    def timed_u8(fn, carry0, iters=12):
        # uint8 carry can't take the eps perturbation; flip the low bit of
        # one element instead so the conv can't be hoisted out of the scan.
        def body(carry, i):
            s = jnp.mean(fn(carry).astype(jnp.float32))
            flip = jnp.zeros_like(carry).at[0, 0, 0, 0].set(
                (i % 2).astype(jnp.uint8))
            return carry ^ flip, s

        @jax.jit
        def run(x):
            _, ss = jax.lax.scan(body, x, jnp.arange(iters, dtype=jnp.uint8))
            return jnp.sum(ss)

        float(run(carry0))
        t0 = time.perf_counter()
        for _ in range(3):
            float(run(carry0))
        return (time.perf_counter() - t0) / 3 / iters * 1e3

    out = {"batch_pairs": B, "geometry": f"{W}x{H}", "channels": C,
           "exactness": {"conv1_nchw_vs_nhwc": d_nchw,
                         "conv1_nchw_u8_vs_nhwc": d_u8},
           "ms_per_call_b8": {}}
    for name, fn, x0, tm in [
        ("conv1_nhwc", conv1_nhwc, x_nhwc, timed),
        ("conv1_nchw", conv1_nchw, x_nchw, timed),
        ("conv1_nchw_u8", conv1_nchw_u8, x_nchw_u8, timed_u8),
        ("conv32_nhwc", conv32_nhwc, y_nhwc, timed),
        ("conv32_nchw", conv32_nchw, y_nchw, timed),
    ]:
        t = tm(fn, x0)
        out["ms_per_call_b8"][name] = round(t, 3)
        print(json.dumps({name: round(t, 3)}), flush=True)

    r = out["ms_per_call_b8"]
    out["speedups"] = {
        "conv1_nchw_vs_nhwc": round(r["conv1_nhwc"] / r["conv1_nchw"], 2),
        "conv1_u8_vs_nhwc": round(r["conv1_nhwc"] / r["conv1_nchw_u8"], 2),
        "conv32_nchw_vs_nhwc": round(r["conv32_nhwc"] / r["conv32_nchw"], 2),
    }
    print(json.dumps(out["speedups"]), flush=True)
    with open("conv_layout_ab.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote conv_layout_ab.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
