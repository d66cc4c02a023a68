"""End-to-end training loop on the synthetic dataset.

The trainable path in this environment (no SceneFlow download; zero
egress): procedural scenes with exact GT (data/synthetic.py).  The same
loop accepts any BatchIterator-compatible source, so a SceneFlow root can
be swapped in unchanged where the dataset exists.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np


def train_synthetic(
    steps: int = 100,
    batch_size: int = 4,
    crop_hw=(128, 256),
    checkpoint_dir: Optional[str] = None,
    log_every: int = 20,
    lr: float = 1e-3,
    seed: int = 0,
    model=None,
    dataset=None,
    eval_every: int = 0,
    resume_from: Optional[str] = None,
    save_every: int = 500,
    model_cfg=None,
    color_space: str = "rgb",
) -> Dict:
    """Train a stereo model (default FastStereoNet) on procedural scenes;
    returns final metrics."""
    import jax
    import jax.numpy as jnp

    from ..config import StereoNetConfig
    from ..data.loader import BatchIterator, SyntheticStereoDataset
    from ..models import FastStereoNet
    from . import checkpoint as ckpt
    from . import training

    cfg = model_cfg if model_cfg is not None else StereoNetConfig()
    if model is None:
        model = FastStereoNet(cfg)
    if dataset is None:
        dataset = SyntheticStereoDataset(
            size=512, seed=seed, height=crop_hw[0] * 2, width=crop_hw[1] * 2
        )
    it = iter(
        BatchIterator(dataset, batch_size=batch_size, crop_hw=crop_hw, seed=seed)
    )

    optimizer = training.make_optimizer(lr=lr, warmup_steps=min(100, steps // 10 + 1),
                                        total_steps=max(steps, 2))
    l0, r0, _ = next(it)
    sample = jnp.asarray(l0[:1], jnp.float32)
    state = training.create_train_state(
        model, jax.random.PRNGKey(seed), optimizer, sample, sample
    )
    if resume_from:
        # Continuation run: restore params, keep a fresh optimizer/schedule
        # (the saved opt_state belongs to the previous run's schedule).
        params = ckpt.load_params(resume_from, like=state.params)
        state = training.TrainState(params, state.opt_state, state.step)
    raw_step = training.make_train_step(model, optimizer,
                                        max_disparity=cfg.max_disparity)

    def step_u8(state, l_u8, r_u8, d):
        # Normalize ON DEVICE: the host->device path ships uint8, 4x less
        # than pre-converted float32.  Through the tunnel backend this is
        # load-bearing twice over: (a) per-step transfer time, and (b) the
        # client retains a host mirror of every transferred buffer for the
        # process lifetime (measured ~6 MB/step leak with f32 batches —
        # ~45 GB over an 8000-step run; the three-candidate round-3 sweep
        # OOM'd a 125 GB host before this fix).
        def to_in(u):
            x = u.astype(jnp.float32)
            if color_space == "yuv":
                # YUV444-native training (the reference's input contract,
                # preprocess.cpp:975-1003): the serving path then skips
                # the RGB epilogue entirely (preprocess_attribution.json
                # prices it at ~10.7 ms/32-batch @720p).
                from ..ops import colorspace as cs

                x = jnp.clip(cs.rgb_to_yuv(x), 0.0, 255.0)
            return (x - 128.0) / 128.0

        return raw_step(state, to_in(l_u8), to_in(r_u8), d)

    # Donate the state: params/opt buffers update in place in HBM instead
    # of doubling per step.
    step_fn = jax.jit(step_u8, donate_argnums=(0,))

    history = []
    t0 = time.perf_counter()
    for i in range(steps):
        l, r, d = next(it)
        state, metrics = step_fn(state, jnp.asarray(l), jnp.asarray(r),
                                 jnp.asarray(d))
        if (i + 1) % 25 == 0:
            # Bound in-flight async work: through the tunnel backend a
            # dispatch-only loop queues arbitrarily far ahead, keeping every
            # intermediate TrainState + host batch alive (measured: ~130 GB
            # RSS and an OOM kill at ~15k dispatched steps).  A tiny scalar
            # fetch is the only true sync on this backend (CLAUDE.md); at
            # one per 25 steps it costs ~1 ms/step against ~120 ms step time.
            float(metrics["loss"])
        if log_every and (i + 1) % log_every == 0:
            loss = float(metrics["loss"])
            epe = float(metrics["epe"])
            history.append({"step": i + 1, "loss": loss, "epe": epe})
            print(f"step {i+1}/{steps} loss={loss:.4f} epe={epe:.3f}px", flush=True)
        if checkpoint_dir and save_every and (i + 1) % save_every == 0 \
                and (i + 1) < steps:
            # Periodic snapshot: a bounded/killed run still leaves a usable
            # checkpoint (SURVEY.md §5 failure-recovery plan).
            ckpt.save_train_state(checkpoint_dir, state)
    dt = time.perf_counter() - t0

    if checkpoint_dir:
        ckpt.save_train_state(checkpoint_dir, state)

    final = {
        "steps": steps,
        "final_loss": float(metrics["loss"]),
        "final_epe": float(metrics["epe"]),
        "steps_per_sec": round(steps / dt, 3),
        "history": history,
    }
    return final
