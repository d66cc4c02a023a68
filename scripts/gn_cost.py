"""What does GroupNorm cost the network in HBM round-trips?

The network is bandwidth-bound (roofline.json), and every ConvBlock is
conv -> GroupNorm -> leaky: GN needs the full activation written, read
for stats, and read+written again to normalize — touches XLA cannot fuse
into the conv epilogue because the stats are a global reduction over the
conv's entire output.  This script bounds what a fused conv+GN Pallas
kernel (or a training-time switch to a weight-foldable norm) could
recover, by timing the full flagship forward with nn.GroupNorm patched
to identity (timing-only: random init params, different function — the
delta is a byte-traffic bound, not a shippable model).

Run on chip:  timeout 1500 python scripts/gn_cost.py
Writes gn_cost.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, H, W = 32, 720, 1280
    rng = np.random.default_rng(0)
    lr = jnp.asarray(
        rng.standard_normal((2, B, H, W, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    jax.block_until_ready(lr)

    def build_and_time(patch_gn: bool) -> float:
        # Import the model fresh under the (possibly) patched GroupNorm.
        for m in list(sys.modules):
            if m.startswith("hobot_stereonet_tpu"):
                del sys.modules[m]
        orig = nn.GroupNorm
        if patch_gn:
            class _IdGN(nn.Module):
                num_groups: int = 1
                dtype: object = None

                @nn.compact
                def __call__(self, x):
                    return x

            nn.GroupNorm = _IdGN
        try:
            from hobot_stereonet_tpu.config import Config
            from hobot_stereonet_tpu.models import FastStereoNet

            mcfg = Config.from_json("checkpoints/flagship/config.json").model
            model = FastStereoNet(mcfg)
            params = jax.eval_shape(
                lambda k: model.init(k, lr[0, :1], lr[1, :1]),
                jax.random.PRNGKey(0))
            params = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), params)
            # Non-degenerate weights so nothing constant-folds.
            params = jax.tree_util.tree_map(
                lambda a: a + 0.01 if a.ndim > 0 else a, params)

            def fwd(x):
                return model.apply(params, x[0], x[1])["disparity"]

            def body(carry, _):
                disp = fwd(carry)
                eps = (1e-30 * jnp.mean(disp)).astype(carry.dtype)
                return carry + eps, jnp.mean(disp)

            @jax.jit
            def run(x):
                _, ss = jax.lax.scan(body, x, None, length=8)
                return jnp.sum(ss)

            float(run(lr))
            t0 = time.perf_counter()
            for _ in range(3):
                float(run(lr))
            return (time.perf_counter() - t0) / 3 / 8 * 1e3
        finally:
            nn.GroupNorm = orig

    t_gn = build_and_time(patch_gn=False)
    print(json.dumps({"full_fwd_with_gn_ms": round(t_gn, 2)}), flush=True)
    t_nogn = build_and_time(patch_gn=True)
    print(json.dumps({"full_fwd_no_gn_ms": round(t_nogn, 2)}), flush=True)

    out = {
        "batch_pairs": B, "geometry": f"{W}x{H}",
        "full_fwd_with_gn_ms_per_batch": round(t_gn, 2),
        "full_fwd_identity_gn_ms_per_batch": round(t_nogn, 2),
        "gn_cost_ms_per_batch": round(t_gn - t_nogn, 2),
        "gn_share_pct": round(100.0 * (t_gn - t_nogn) / t_gn, 1),
        "note": ("upper bound for a fused conv+GN kernel or a "
                 "weight-foldable norm; identity-GN is timing-only "
                 "(random params, not a shippable model)"),
    }
    print(json.dumps(out), flush=True)
    with open("gn_cost.json", "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
