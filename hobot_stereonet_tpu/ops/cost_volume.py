"""Cost-volume construction.

The reference's cost volume lives inside the opaque BPU blob (SURVEY.md C13);
this is our from-scratch TPU formulation.  StereoNet builds the volume at
coarse (1/8) resolution over D/8 disparity candidates, which is what keeps the
4D volume small enough — the "long-context" analog of this domain
(SURVEY.md §5).

Layout choice: ``[B, D, H, W, C]`` for the volume — D leads so the 3D conv
aggregation is NDHWC (XLA's native 3D conv layout) and soft-argmin reduces a
leading axis.  Feature maps are NHWC.

Two variants:
  * ``difference`` (StereoNet's choice): cost[d] = F_l - shift(F_r, d)
  * ``concat`` (GC-Net style): cost[d] = concat(F_l, shift(F_r, d))

The shift is a static roll+mask per candidate — D is a compile-time constant
so the loop unrolls into D slices, which XLA fuses into a single gather-free
kernel; no dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp


def shift_right_features(feat_r: jnp.ndarray, d: int) -> jnp.ndarray:
    """Shift right-image features d pixels to the right along W, zero-filling
    the left margin: out[..., x, :] = feat_r[..., x - d, :].

    A pixel at x in the left image matches x - d in the right image for
    disparity d, so after this shift left/right features align elementwise.
    """
    if d == 0:
        return feat_r
    pad = [(0, 0)] * feat_r.ndim
    pad[-2] = (d, 0)
    return jnp.pad(feat_r, pad)[..., : feat_r.shape[-2], :]


def build_cost_volume(
    feat_l: jnp.ndarray,
    feat_r: jnp.ndarray,
    num_disparities: int,
    mode: Literal["difference", "concat"] = "difference",
) -> jnp.ndarray:
    """[B,H,W,C] x2 -> [B, D, H, W, C] (or 2C for concat) cost volume."""
    slices = []
    for d in range(num_disparities):
        shifted = shift_right_features(feat_r, d)
        if mode == "difference":
            slices.append(feat_l - shifted)
        elif mode == "concat":
            slices.append(jnp.concatenate([feat_l, shifted], axis=-1))
        else:
            raise ValueError(f"unknown cost mode {mode!r}")
    return jnp.stack(slices, axis=1)


def build_correlation_volume(
    feat_l: jnp.ndarray, feat_r: jnp.ndarray, num_disparities: int
) -> jnp.ndarray:
    """Dot-product correlation volume [B, D, H, W] (DispNetC-style).

    Cheaper alternative when aggregation is 2D; used by the fast path.
    """
    c = feat_l.shape[-1]
    slices = []
    for d in range(num_disparities):
        shifted = shift_right_features(feat_r, d)
        slices.append(jnp.sum(feat_l * shifted, axis=-1) / jnp.sqrt(float(c)))
    return jnp.stack(slices, axis=1)
