"""Soft-argmin disparity regression (GC-Net / StereoNet).

disparity = sum_d d * softmax(-cost)_d over the disparity axis.

The reference's BPU blob performs this internally and emits int32 disparity
with a x192 (=16*12) subpixel multiplier (``parser.cpp:84-86``); our output
is float disparity in pixels directly, so the dequant step (SURVEY.md C8)
becomes a no-op on the native path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_argmin(cost: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """[B, D, H, W] cost -> [B, H, W] expected disparity (float32).

    Lower cost = better match, hence softmax over -cost.  Numerically
    stabilized; computed in float32 regardless of input dtype (bf16 softmax
    over ~24 bins loses subpixel precision).
    """
    cost = cost.astype(jnp.float32)
    d = cost.shape[axis]
    probs = jax.nn.softmax(-cost, axis=axis)
    shape = [1] * cost.ndim
    shape[axis] = d
    disp_values = jnp.arange(d, dtype=jnp.float32).reshape(shape)
    return jnp.sum(probs * disp_values, axis=axis)


def disparity_confidence(cost: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Peak softmax probability as a per-pixel match confidence in [0, 1]."""
    probs = jax.nn.softmax(-cost.astype(jnp.float32), axis=axis)
    return jnp.max(probs, axis=axis)
