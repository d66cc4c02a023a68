"""Diagnose the YUV fine-tune's >35-minute train-step compile (VERDICT r4 #1).

Round 4's scripts/yuv_finetune.py died inside its first train-step
compile.  The RGB train step at the same shapes (batch 8, 128x256 crops)
compiled in ~1-2 min in every previous round; the YUV variant only adds a
3x3 colorspace matmul on the inputs, so a 35-min compile would be
anomalous.  The classic_diagnosis.json methodology: isolate each leg in
one process and time lower() (host tracing) and compile() (remote
service) separately for
  * rgb train step  (the known-good baseline),
  * yuv train step  (the round-4 casualty),
  * yuv eval leg    (evaluate_dataset's jitted forward at 256x512),
so the slow leg is identified by measurement, not guess.

Run on chip:  timeout 3000 python scripts/yuv_compile_diag.py
Writes yuv_compile_diag.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main() -> int:
    import jax
    import jax.numpy as jnp

    import frontier as frontier_mod
    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.ops import colorspace as cs
    from hobot_stereonet_tpu.runtime import training

    frontier_mod._build_candidates()
    mcfg = frontier_mod.CANDIDATES["A_ft"]
    model = FastStereoNet(mcfg)

    b, h, w = 8, 128, 256
    optimizer = training.make_optimizer()
    sample = jnp.zeros((1, h, w, 3), jnp.float32)
    t0 = time.perf_counter()
    state = training.create_train_state(
        model, jax.random.PRNGKey(0), optimizer, sample, sample)
    init_s = time.perf_counter() - t0
    raw_step = training.make_train_step(model, optimizer,
                                        max_disparity=mcfg.max_disparity)

    out = {"batch": b, "crop": f"{w}x{h}", "init_s": round(init_s, 1)}

    def step_u8(color_space):
        def f(state, l_u8, r_u8, d):
            def to_in(u):
                x = u.astype(jnp.float32)
                if color_space == "yuv":
                    x = jnp.clip(cs.rgb_to_yuv(x), 0.0, 255.0)
                return (x - 128.0) / 128.0

            return raw_step(state, to_in(l_u8), to_in(r_u8), d)

        return f

    img = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    dmap = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    state_aval = jax.eval_shape(lambda s: s, state)

    for space in ("rgb", "yuv"):
        # NOTE: no donate_argnums here — donation needs real arrays at
        # execute time, and lowering from avals is identical either way.
        fn = jax.jit(step_u8(space))
        t0 = time.perf_counter()
        lowered = fn.lower(state_aval, img, img, dmap)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_compile = time.perf_counter() - t0
        out[f"train_{space}"] = {"lower_s": round(t_lower, 1),
                                 "compile_s": round(t_compile, 1)}
        print(json.dumps({f"train_{space}": out[f"train_{space}"]}),
              flush=True)

    # Eval leg: evaluate_dataset jits the full-res forward at 256x512.
    eh, ew = 256, 512
    left = jax.ShapeDtypeStruct((1, eh, ew, 3), jnp.float32)

    def fwd(params, l, r):
        return model.apply(params, l, r)["disparity"]

    t0 = time.perf_counter()
    lowered = jax.jit(fwd).lower(
        jax.eval_shape(lambda s: s.params, state), left, left)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    out["eval_forward_256x512"] = {"lower_s": round(t_lower, 1),
                                   "compile_s": round(t_compile, 1)}
    print(json.dumps({"eval_forward_256x512":
                      out["eval_forward_256x512"]}), flush=True)

    with open("yuv_compile_diag.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote yuv_compile_diag.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
