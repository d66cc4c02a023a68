"""FastStereoNet — throughput-oriented variant for the streaming path.

The reference's headline use is live 1280x720 streaming (SURVEY.md §3.2);
our target is >=150 fps/chip (BASELINE.md).  This variant trades the 4D
feature volume + 3D convs for a correlation volume whose D axis is treated
as the *channel* axis of 2D convs:

  * correlation volume [B, H/8, W/8, D] (dot-product, DispNetC-style)
  * 2D conv aggregation over it — on TPU a 2D conv over a D-channel image
    is a dense MXU matmul per pixel neighborhood, far better utilized than
    small-channel 3D convs.
  * soft-argmin over the channel axis, same hierarchical refinement.

Same I/O contract as :class:`~..models.stereonet.StereoNet` so the engine,
eval, and SLAM layers are model-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import StereoNetConfig
from ..ops.cost_volume import build_correlation_volume
from ..ops.soft_argmin import soft_argmin, disparity_confidence
from .layers import ConvBlock, ResBlock2D
from .stereonet import FeatureTower, RefinementNet, _resize_bilinear


class CorrelationAggregation2D(nn.Module):
    """2D-conv aggregation of a [B,H,W,D] correlation volume -> [B,H,W,D]."""

    cfg: StereoNetConfig

    @nn.compact
    def __call__(self, corr):
        dt = self.cfg.compute_dtype
        d = corr.shape[-1]
        c = max(self.cfg.aggregation_channels, d)
        x = corr.astype(dt)
        x = ConvBlock(c, dtype=dt)(x)
        for _ in range(self.cfg.num_aggregation_layers):
            x = ResBlock2D(c, dtype=dt)(x)
        x = nn.Conv(d, (3, 3), padding="SAME", dtype=dt, param_dtype=jnp.float32)(x)
        return x


class FastStereoNet(nn.Module):
    cfg: StereoNetConfig = StereoNetConfig()

    @nn.compact
    def __call__(self, left, right) -> Dict[str, Any]:
        cfg = self.cfg
        b, h, w = left.shape[0], left.shape[1], left.shape[2]
        k = cfg.cost_resolution_divisor

        feats = FeatureTower(cfg)(jnp.concatenate([left, right], axis=0))
        feat_l, feat_r = feats[:b], feats[b:]

        # [B, D, h/k, w/k] -> channel-last [B, h/k, w/k, D]
        corr = jnp.transpose(
            build_correlation_volume(feat_l, feat_r, cfg.num_disparities_coarse),
            (0, 2, 3, 1),
        )
        # Correlation = similarity: high is better, so cost = -corr.
        cost = -CorrelationAggregation2D(cfg)(corr)

        disp_coarse = soft_argmin(cost, axis=-1) * float(k)
        conf = disparity_confidence(cost, axis=-1)

        pyramid: List[jnp.ndarray] = [disp_coarse]
        disp = disp_coarse[..., None]
        scales = (
            [2 ** i for i in range(cfg.downsample_factor - 1, -1, -1)]
            if cfg.hierarchical_refinement
            else [1]
        )
        for s in scales:
            th, tw = h // s, w // s
            disp = _resize_bilinear(disp, th, tw)
            guide = left if s == 1 else _resize_bilinear(left, th, tw)
            disp = RefinementNet(cfg)(disp, guide)
            pyramid.append(disp[..., 0])

        return {
            "disparity": disp[..., 0].astype(jnp.float32),
            "pyramid": pyramid,
            "confidence": conf,
        }
