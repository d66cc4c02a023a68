"""Shared flax building blocks for the stereo models.

Design notes (TPU-first, not reference-derived — the reference network is an
opaque BPU blob, SURVEY.md C13):
  * NHWC / NDHWC layouts throughout — XLA's native conv layouts on TPU.
  * GroupNorm instead of BatchNorm: no mutable batch statistics, so the
    whole forward pass stays a pure function (jit/pjit/scan friendly) and
    normalization is independent of the per-device batch under data
    parallelism — no cross-device stat syncs on the hot path.
  * Params are float32; activations run in ``dtype`` (bf16 by default) so
    convs hit the MXU at full rate.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    """Conv2D + GroupNorm + LeakyReLU."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.features), dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class ResBlock2D(nn.Module):
    """Two 3x3 convs with a skip connection; optional dilation for the
    edge-aware refinement context (StereoNet refinement uses dilated
    residual blocks)."""

    features: int
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = ConvBlock(self.features, dilation=self.dilation, dtype=self.dtype)(x)
        h = nn.Conv(
            self.features,
            (3, 3),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(h)
        h = nn.GroupNorm(num_groups=_num_groups(self.features), dtype=self.dtype)(h)
        return nn.leaky_relu(x + h, negative_slope=0.2)


class ConvBlock3D(nn.Module):
    """Conv3D (over D,H,W) + GroupNorm + LeakyReLU, NDHWC layout."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.features), dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


def _num_groups(features: int) -> int:
    for g in (8, 4, 2, 1):
        if features % g == 0:
            return g
    return 1
