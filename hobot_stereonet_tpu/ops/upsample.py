"""Resolution-change ops tuned for TPU.

``jax.image.resize`` lowers to gather-heavy HLO that costs about as much as
a full 3x3 conv at 720p (measured ~1.8 ms/frame on v5e), so the models use:

  * :func:`upsample2x_bilinear` — fixed-factor 2x bilinear as a pad+stencil
    (exactly matches ``jax.image.resize(..., "bilinear")`` half-pixel
    convention; pure VPU ops, fusable).
  * :func:`downsample2x_avg` — 2x2 average pool via strided adds.
  * :func:`convex_upsample` — RAFT-style learned KxK upsampling: full-res
    disparity as a softmax-convex combination of the 3x3 coarse
    neighborhood.  Keeps ALL heavy compute at coarse resolution; the only
    full-res work is the weighted sum (~0.3 ms/frame at 720p).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 2H, 2W, C], half-pixel-centers bilinear."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    r_even = 0.25 * xp[:, :-2] + 0.75 * xp[:, 1:-1]
    r_odd = 0.75 * xp[:, 1:-1] + 0.25 * xp[:, 2:]
    rows = jnp.stack([r_even, r_odd], axis=2).reshape(b, 2 * h, w, c)
    rp = jnp.pad(rows, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    c_even = 0.25 * rp[:, :, :-2] + 0.75 * rp[:, :, 1:-1]
    c_odd = 0.75 * rp[:, :, 1:-1] + 0.25 * rp[:, :, 2:]
    return jnp.stack([c_even, c_odd], axis=3).reshape(b, 2 * h, 2 * w, c)


def upsample_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Power-of-two upsampling via repeated 2x stencils; falls back to
    jax.image.resize for non-2^k factors."""
    while x.shape[1] * 2 <= h and x.shape[2] * 2 <= w:
        x = upsample2x_bilinear(x)
    if x.shape[1] != h or x.shape[2] != w:
        x = jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")
    return x


def downsample2x_avg(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, C] 2x2 average pooling."""
    return 0.25 * (
        x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]
    )


def downsample_avg(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    while factor > 1:
        x = downsample2x_avg(x)
        factor //= 2
    return x


def convex_upsample(disp: jnp.ndarray, mask_logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Learned k-x upsampling (RAFT-style convex combination).

    disp:        [B, h, w] coarse disparity (already in full-res px units)
    mask_logits: [B, h, w, 9*k*k] from a conv head at coarse resolution
    returns      [B, h*k, w*k] full-res disparity

    Each fine pixel is a softmax-weighted combination of the 3x3 coarse
    neighborhood, so edges upsample sharply where the mask selects across
    the discontinuity — the role the reference network's edge-aware
    refinement plays, at ~2% of the cost on TPU.
    """
    b, h, w = disp.shape
    # Softmax in the mask's own dtype: over 9 logits bf16 is ample, and
    # materializing the [b,h,w,9,k*k] weights in f32 doubled the
    # upsample head's traffic (roofline.json: bandwidth-bound).  The
    # einsum below still accumulates against f32 disparity.
    m = jax.nn.softmax(mask_logits.reshape(b, h, w, 9, k * k), axis=3)
    dp = jnp.pad(disp, ((0, 0), (1, 1), (1, 1)))
    neighborhood = jnp.stack(
        [dp[:, i : i + h, j : j + w] for i in range(3) for j in range(3)], axis=3
    )  # [B, h, w, 9]
    fine = jnp.einsum("bhwn,bhwnk->bhwk", neighborhood, m)  # [B, h, w, k*k]
    fine = fine.reshape(b, h, w, k, k).transpose(0, 1, 3, 2, 4)
    return fine.reshape(b, h * k, w * k)
