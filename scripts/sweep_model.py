"""Model-capacity sweep on the real chip: fps/frame at 720p, batch 32.

Round-2 quality/fps frontier (VERDICT.md Next #8): marginal compute was
~1.2 ms/frame vs a 6.7 ms budget at 150 fps — this measures candidate
configs so the flagship can spend that headroom on accuracy while holding
fps >= 300 through a batched engine dispatch (32/(0.025 s RPC + 32*t) >=
300 fps  =>  t <= 2.55 ms/frame).

Per-candidate ENGINE fps (the decision-grade numbers) are measured and
committed by scripts/frontier.py; this is the quick raw-forward probe.

Usage: python scripts/sweep_model.py [batch] [--out sweep.json]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.config import StereoNetConfig
from hobot_stereonet_tpu.models import FastStereoNet

H, W = 720, 1280
_args = [a for a in sys.argv[1:] if a != "--out" and not a.endswith(".json")]
OUT = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else None
BATCH = int(_args[0]) if _args else 32

CANDIDATES = {
    # round-1 flagship (agg channels floor to 64 inside the model)
    "A_base": StereoNetConfig(),
    "B_wider": StereoNetConfig(feature_channels=48, aggregation_channels=96,
                               num_aggregation_layers=6),
    "C_big": StereoNetConfig(feature_channels=64, aggregation_channels=128,
                             num_aggregation_layers=8, num_feature_res_blocks=8),
    "D_deepfeat": StereoNetConfig(feature_channels=48, aggregation_channels=96,
                                  num_aggregation_layers=6,
                                  num_feature_res_blocks=8),
}


def measure(cfg: StereoNetConfig) -> dict:
    model = FastStereoNet(cfg)
    rng = np.random.default_rng(0)
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
    left = jnp.asarray(rng.standard_normal((BATCH, H, W, 3)).astype(np.float32))
    right = jnp.asarray(rng.standard_normal((BATCH, H, W, 3)).astype(np.float32))

    @jax.jit
    def fwd(p, l, r):
        return jnp.mean(model.apply(p, l, r)["disparity"])

    t0 = time.perf_counter()
    float(fwd(params, left, right))
    compile_s = time.perf_counter() - t0

    iters = 6
    t0 = time.perf_counter()
    outs = [fwd(params, left, right) for _ in range(iters)]
    _ = [float(o) for o in outs]  # true sync through the tunnel
    dt = (time.perf_counter() - t0) / (iters * BATCH)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {"ms_per_frame": dt * 1000, "fps": 1 / dt, "params_m": nparams / 1e6,
            "compile_s": compile_s}


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} batch={BATCH} res={W}x{H}")
    results = {"backend": jax.default_backend(), "batch": BATCH,
               "geometry": f"{W}x{H}", "candidates": {}}
    for name, cfg in CANDIDATES.items():
        r = measure(cfg)
        results["candidates"][name] = {k: round(v, 3) for k, v in r.items()}
        print(
            f"{name:12s} {r['ms_per_frame']:.2f} ms/frame  {r['fps']:7.1f} fps "
            f"(batch-amortized)  {r['params_m']:.2f}M params  "
            f"compile {r['compile_s']:.0f}s",
            flush=True,
        )
    if OUT:
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {OUT}", file=sys.stderr)
