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

    MXU formulation (roofline.json, round 5): the original
    shift-multiply-reduce loop materialized ~200 MB/frame of shifted
    feature copies for only 0.02 GFLOP/frame — pure bandwidth on a chip
    whose compute:bandwidth ridge is ~240 flops/byte.  Instead compute
    each row's Gram matrix L_row @ R_row^T on the MXU (one dense
    [W,W,C] contraction, ~0.15 GFLOP/frame) and gather the D diagonal
    bands corr[x, d] = G[x, x-d].  ~40x less HBM traffic for 7x more
    (nearly free) FLOPs; accumulation is f32 in the matmul, slightly
    MORE accurate than the old bf16 elementwise reduce.
    """
    w = feat_l.shape[-2]
    c = feat_l.shape[-1]
    # Accumulate f32 on the MXU, but MATERIALIZE G in the feature dtype:
    # downstream casts the volume to the compute dtype anyway, and a bf16
    # G halves this block's dominant buffer on a bandwidth-bound program.
    g = jnp.einsum("bhxc,bhyc->bhxy", feat_l, feat_r,
                   preferred_element_type=jnp.float32).astype(feat_l.dtype)
    x = jnp.arange(w)[:, None]
    d = jnp.arange(num_disparities)[None, :]
    idx = x - d                       # match position in the right image
    valid = idx >= 0                  # left margin: no candidate -> 0
    corr = jnp.take_along_axis(
        g, jnp.clip(idx, 0, w - 1)[None, None], axis=-1
    )                                 # [B, H, W, D]
    corr = jnp.where(valid[None, None], corr, 0.0) / jnp.sqrt(float(c))
    return jnp.transpose(corr, (0, 3, 1, 2))


def build_correlation_volume_ref(
    feat_l: jnp.ndarray, feat_r: jnp.ndarray, num_disparities: int
) -> jnp.ndarray:
    """Reference formulation (shift + elementwise reduce) — kept as the
    correctness oracle for the MXU path's parity test."""
    c = feat_l.shape[-1]
    slices = []
    for d in range(num_disparities):
        shifted = shift_right_features(feat_r, d)
        slices.append(jnp.sum(feat_l * shifted, axis=-1) / jnp.sqrt(float(c)))
    return jnp.stack(slices, axis=1)
