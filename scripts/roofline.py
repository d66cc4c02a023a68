"""FLOPs/MFU/roofline attribution of the flagship network (VERDICT r4 #2).

The headline has been flat at ~846 fps for four rounds and attribution
stops at "network: 166 ms of 201 ms/batch-32".  This script answers "is
the network actually fast, or just correct?" with numbers:

  * FLOPs/frame and bytes/frame from the compiled executable's
    ``cost_analysis()`` (XLA's own counters for the optimized HLO);
  * achieved TFLOP/s and %-of-peak (MFU) against v5e bf16 peak
    (197 TFLOP/s) and achieved GB/s against HBM peak (819 GB/s) —
    whichever ratio is higher is the wall the network sits against;
  * a per-block time split (tower / correlation / aggregation+argmin /
    upsample) from STAGED programs, each timed by chaining K dependent
    iterations inside one ``lax.scan`` dispatch (loop-invariant code
    motion defeated by feeding an output-derived epsilon back into the
    input; one dispatch per measurement amortizes the ~25 ms RPC floor).

Block boundaries mirror models/fast_stereonet.py: FeatureTower_0 ->
build_correlation_volume -> CorrelationAggregation2D_0 + soft_argmin ->
upsample_mask head + convex_upsample.

Run on chip:  timeout 3000 python scripts/roofline.py
Writes roofline.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", default="checkpoints/flagship")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="roofline.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.models.fast_stereonet import (
        CorrelationAggregation2D)
    from hobot_stereonet_tpu.models.stereonet import FeatureTower
    from hobot_stereonet_tpu.ops.cost_volume import build_correlation_volume
    from hobot_stereonet_tpu.ops.soft_argmin import (disparity_confidence,
                                                     soft_argmin)
    from hobot_stereonet_tpu.ops.upsample import convex_upsample
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt

    flag = args.flagship
    cfg = Config.from_json(os.path.join(flag, "config.json"))
    params = ckpt.load_params(os.path.join(flag, "params"))
    mcfg = cfg.model
    model = FastStereoNet(mcfg)
    B, H, W = args.batch, 720, 1280
    k = mcfg.cost_resolution_divisor

    p = params["params"]
    tower = FeatureTower(mcfg)
    agg = CorrelationAggregation2D(mcfg)

    # Staged forwards.  Each returns a scalar probe; the scan harness
    # feeds an output-derived epsilon back into the input so iteration
    # i+1 depends on iteration i (nothing hoists, nothing deadcodes).
    def s_tower(l, r):
        feats = tower.apply({"params": p["FeatureTower_0"]},
                            jnp.concatenate([l, r], axis=0))
        return jnp.mean(feats.astype(jnp.float32))

    def s_corr(l, r):
        feats = tower.apply({"params": p["FeatureTower_0"]},
                            jnp.concatenate([l, r], axis=0))
        fl, fr = feats[:B], feats[B:]
        corr = jnp.transpose(
            build_correlation_volume(fl, fr, mcfg.num_disparities_coarse),
            (0, 2, 3, 1))
        return jnp.mean(corr.astype(jnp.float32))

    def s_agg(l, r):
        feats = tower.apply({"params": p["FeatureTower_0"]},
                            jnp.concatenate([l, r], axis=0))
        fl, fr = feats[:B], feats[B:]
        corr = jnp.transpose(
            build_correlation_volume(fl, fr, mcfg.num_disparities_coarse),
            (0, 2, 3, 1))
        logits, _ = agg.apply(
            {"params": p["CorrelationAggregation2D_0"]}, corr, fl)
        cost = -logits
        disp_c = soft_argmin(cost, axis=-1) * float(k)
        conf = disparity_confidence(cost, axis=-1)
        return (jnp.mean(disp_c.astype(jnp.float32))
                + 0.0 * jnp.mean(conf.astype(jnp.float32)))

    def s_full(l, r):
        out = model.apply(params, l, r)
        return jnp.mean(out["disparity"])

    stages = [("tower", s_tower), ("tower+corr", s_corr),
              ("tower+corr+agg", s_agg), ("full", s_full)]

    rng = np.random.default_rng(0)
    l0 = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    r0 = jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))
    jax.block_until_ready((l0, r0))

    def timed_scan(stage_fn):
        def body(carry, _):
            l, r = carry
            s = stage_fn(l, r)
            eps = (1e-30 * s).astype(l.dtype)
            return (l + eps, r + eps), s

        @jax.jit
        def run(l, r):
            (_, _), ss = jax.lax.scan(body, (l, r), None, length=args.iters)
            return jnp.sum(ss)

        float(run(l0, r0))  # compile + first dispatch
        t0 = time.perf_counter()
        n_disp = 3
        for _ in range(n_disp):
            float(run(l0, r0))
        per_iter = (time.perf_counter() - t0) / n_disp / args.iters
        return per_iter

    out = {"batch": B, "geometry": f"{W}x{H}", "iters_per_dispatch": args.iters,
           "stages_ms_per_batch": {}, "blocks_ms_per_batch": {}}
    prev = 0.0
    prev_name = None
    times = {}
    for name, fn in stages:
        t = timed_scan(fn) * 1e3
        times[name] = t
        out["stages_ms_per_batch"][name] = round(t, 2)
        print(json.dumps({name: round(t, 2)}), flush=True)
    blocks = [("tower", times["tower"]),
              ("correlation", times["tower+corr"] - times["tower"]),
              ("aggregation+softargmin",
               times["tower+corr+agg"] - times["tower+corr"]),
              ("upsample_head", times["full"] - times["tower+corr+agg"])]
    for name, t in blocks:
        out["blocks_ms_per_batch"][name] = round(t, 2)

    # Per-stage FLOPs/bytes: localize WHERE the bandwidth goes (each
    # staged program compiled standalone; deltas attribute per block).
    def stage_cost(fn):
        try:
            c = jax.jit(fn).lower(l0, r0).compile()
            ca = c.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return {"gflops_per_frame": round(
                        float(ca.get("flops", 0.0)) / B / 1e9, 2),
                    "mb_per_frame": round(
                        float(ca.get("bytes accessed", 0.0)) / B / 1e6, 1)}
        except Exception as e:  # pragma: no cover
            return {"error": str(e)}

    out["stage_cost_analysis"] = {}
    for name, fn in stages:
        out["stage_cost_analysis"][name] = stage_cost(fn)
        print(json.dumps({f"cost_{name}":
                          out["stage_cost_analysis"][name]}), flush=True)

    # XLA cost analysis of the full compiled program.
    def fwd(params, l, r):
        return model.apply(params, l, r)["disparity"]

    lowered = jax.jit(fwd).lower(params, l0, r0)
    compiled = lowered.compile()
    source = "device"
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover
        print(f"device cost_analysis failed ({e}); no fallback on-rig",
              file=sys.stderr)
        flops, byts, source = 0.0, 0.0, "unavailable"

    t_full_s = times["full"] / 1e3
    out["cost_analysis"] = {
        "source": source,
        "flops_per_batch": flops,
        "gflops_per_frame": round(flops / B / 1e9, 2),
        "bytes_per_batch": byts,
        "mb_per_frame": round(byts / B / 1e6, 2),
    }
    if flops:
        achieved_tflops = flops / t_full_s / 1e12
        achieved_gbps = byts / t_full_s / 1e9
        mfu = achieved_tflops / V5E_BF16_TFLOPS
        bwu = achieved_gbps / V5E_HBM_GBPS
        out["roofline"] = {
            "v5e_bf16_peak_tflops": V5E_BF16_TFLOPS,
            "v5e_hbm_peak_gbps": V5E_HBM_GBPS,
            "achieved_tflops": round(achieved_tflops, 2),
            "achieved_gbps": round(achieved_gbps, 1),
            "mfu_pct": round(100 * mfu, 1),
            "hbm_utilization_pct": round(100 * bwu, 1),
            "arithmetic_intensity_flops_per_byte": round(flops / byts, 1)
            if byts else None,
            "ridge_intensity_flops_per_byte": round(
                V5E_BF16_TFLOPS * 1e12 / (V5E_HBM_GBPS * 1e9), 1),
            "bound": ("compute" if mfu >= bwu else "bandwidth"),
        }
        print(json.dumps(out["roofline"], indent=1), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
