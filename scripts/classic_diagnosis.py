"""CLASSIC compile/throughput diagnosis (VERDICT r3 weak #5).

Round 3 measured CLASSIC (the StereoNet-paper parity model, full
hierarchical refinement) at 42 fps with a 2102-second warmup compile
(`frontier_results.json` fps_detail), served at batch=128 with
``device_microbatch=16`` (a ``lax.map`` over 8 chunks).  Nobody diagnosed
which ingredient explodes the compile.  This script times *compilation*
(lower+compile, no execution) of the serving forward across a variant
matrix that isolates each suspect:

  * lax.map micro-batching on/off
  * batch size 16 vs 128
  * hierarchical refinement vs single full-res refinement
  * per-scale slim refinement (the config's refinement_scale_* knobs)
  * remat

Run on the chip (the remote compile service is the thing being measured):
    timeout 3000 python scripts/classic_diagnosis.py
Writes classic_diagnosis.json.  --full adds the original 35-minute
b128+micro16 configuration.
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def compile_time(model_cfg, batch, micro, h=720, w=1280):
    import jax
    import jax.numpy as jnp

    from hobot_stereonet_tpu.models import StereoNet

    model = StereoNet(model_cfg)
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
    init_s = time.perf_counter() - t0

    def fwd(params, l, r):
        if micro and batch > micro and batch % micro == 0:
            ls = l.reshape(batch // micro, micro, *l.shape[1:])
            rs = r.reshape(batch // micro, micro, *r.shape[1:])
            d = jax.lax.map(
                lambda xs: model.apply(params, xs[0], xs[1])["disparity"],
                (ls, rs),
            )
            return d.reshape(batch, *d.shape[2:])
        return model.apply(params, l, r)["disparity"]

    shape = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    t0 = time.perf_counter()
    lowered = jax.jit(fwd).lower(params, shape, shape)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    return {"init_s": round(init_s, 1), "lower_s": round(lower_s, 1),
            "compile_s": round(compile_s, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="include the original b128+micro16 (35 min!)")
    ap.add_argument("--out", default="classic_diagnosis.json")
    args = ap.parse_args()

    import jax

    from hobot_stereonet_tpu.config import StereoNetConfig

    # Exact CLASSIC candidate config (scripts/frontier.py _build_candidates
    # — literals, not defaults, so this diagnoses the measured model).
    classic = StereoNetConfig(
        downsample_factor=3, feature_channels=32, num_feature_res_blocks=6,
        max_disparity=192, num_aggregation_layers=4, aggregation_channels=32,
        upsample_mode="refine",
    )
    variants = [
        ("b16", classic, 16, 0),
        ("b16_micro4", classic, 16, 4),
        ("b16_hier_off",
         dataclasses.replace(classic, hierarchical_refinement=False), 16, 0),
        ("b16_slim_scales",
         dataclasses.replace(classic,
                             refinement_scale_channels=(32, 24, 16, 8),
                             refinement_scale_blocks=(6, 4, 2, 2)), 16, 0),
        ("b16_remat", dataclasses.replace(classic, remat=True), 16, 0),
        ("b32", classic, 32, 0),
    ]
    if args.full:
        variants.append(("b128_micro16", classic, 128, 16))

    out = {"backend": jax.default_backend(), "resolution": "1280x720"}
    for name, cfg, batch, micro in variants:
        try:
            r = compile_time(cfg, batch, micro)
        except Exception as e:  # OOM etc: record, keep walking
            r = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        out[name] = {"batch": batch, "micro": micro, **r}
        print(json.dumps({name: out[name]}), flush=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
