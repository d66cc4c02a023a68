"""FastStereoNet — throughput-oriented variant for the streaming path.

The reference's headline use is live 1280x720 streaming (SURVEY.md §3.2);
our target is >=150 fps/chip (BASELINE.md).  Design, driven by v5e
measurements (full-res 3x3 convs cost ~1.3 ms each regardless of channel
width; convs only reach peak MXU rates at C>=64; jax.image.resize costs a
conv's worth of time):

  * correlation volume [B, H/8, W/8, D] (dot-product, DispNetC-style) whose
    D axis is the *channel* axis of 2D convs — dense MXU matmuls per pixel
    neighborhood instead of small-channel 3D convs.
  * aggregation at 1/8 resolution with wide (64+) channels — where a conv
    costs ~0.05 ms, not 1.3 ms.
  * soft-argmin, then a learned convex upsampling (RAFT-style) straight to
    full resolution: the ONLY full-res work is a 3x3 convex combination
    (~0.3 ms).  ``cfg.upsample_mode="refine"`` switches back to classic
    hierarchical refinement convs for parity experiments.

Same I/O contract as :class:`~..models.stereonet.StereoNet` so the engine,
eval, and SLAM layers are model-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import StereoNetConfig
from ..ops.cost_volume import build_correlation_volume
from ..ops.soft_argmin import soft_argmin, disparity_confidence
from ..ops.upsample import convex_upsample, downsample_avg, upsample2x_bilinear
from .layers import ConvBlock, ResBlock2D
from .stereonet import FeatureTower, RefinementNet, _refine_size


class CorrelationAggregation2D(nn.Module):
    """2D-conv aggregation of a [B,H,W,D] correlation volume.

    Returns (cost [B,H,W,D], features [B,H,W,C]) — the features feed the
    convex-upsample mask head.
    """

    cfg: StereoNetConfig

    @nn.compact
    def __call__(self, corr, feat_l):
        dt = self.cfg.compute_dtype
        d = corr.shape[-1]
        # Wide channels: MXU efficiency on v5e ramps sharply up to C=64+.
        c = max(self.cfg.aggregation_channels, 64)
        x = jnp.concatenate([corr.astype(dt), feat_l.astype(dt)], axis=-1)
        x = ConvBlock(c, dtype=dt)(x)
        for _ in range(self.cfg.num_aggregation_layers):
            x = ResBlock2D(c, dtype=dt)(x)
        cost = nn.Conv(d, (3, 3), padding="SAME", dtype=dt, param_dtype=jnp.float32)(x)
        return cost, x


class FastStereoNet(nn.Module):
    cfg: StereoNetConfig = StereoNetConfig()

    @nn.compact
    def __call__(self, left, right) -> Dict[str, Any]:
        cfg = self.cfg
        b, h, w = left.shape[0], left.shape[1], left.shape[2]
        k = cfg.cost_resolution_divisor

        # Pinned name: nn.remat renames the class, which would break
        # checkpoint compatibility between remat on/off.
        tower_cls = nn.remat(FeatureTower) if cfg.remat else FeatureTower
        feats = tower_cls(cfg, name="FeatureTower_0")(
            jnp.concatenate([left, right], axis=0)
        )
        feat_l, feat_r = feats[:b], feats[b:]

        # [B, D, h/k, w/k] -> channel-last [B, h/k, w/k, D]
        corr = jnp.transpose(
            build_correlation_volume(feat_l, feat_r, cfg.num_disparities_coarse),
            (0, 2, 3, 1),
        )
        # Correlation = similarity: high is better, so cost = -logits.
        logits, agg_feats = CorrelationAggregation2D(cfg)(corr, feat_l)
        cost = -logits

        disp_coarse = soft_argmin(cost, axis=-1) * float(k)
        conf = disparity_confidence(cost, axis=-1)
        pyramid: List[jnp.ndarray] = [disp_coarse]

        if cfg.upsample_mode == "convex":
            dt = cfg.compute_dtype
            mask = nn.Conv(
                9 * k * k, (3, 3), padding="SAME", dtype=dt, param_dtype=jnp.float32,
                name="upsample_mask",
            )(ConvBlock(64, dtype=dt, name="upsample_mask_hidden")(agg_feats))
            disp_full = convex_upsample(disp_coarse, mask, k)
            pyramid.append(disp_full)
            disp = disp_full[..., None]
        else:
            disp = disp_coarse[..., None]
            scales = (
                [2 ** i for i in range(cfg.downsample_factor - 1, -1, -1)]
                if cfg.hierarchical_refinement
                else [1]
            )
            for i, s in enumerate(scales):
                th, tw = h // s, w // s
                while disp.shape[1] < th:
                    disp = upsample2x_bilinear(disp)
                guide = left if s == 1 else downsample_avg(left, s)
                rc, rb = _refine_size(cfg, i)
                disp = RefinementNet(cfg, channels=rc, blocks=rb)(disp, guide)
                pyramid.append(disp[..., 0])

        return {
            "disparity": disp[..., 0].astype(jnp.float32),
            "pyramid": pyramid,
            "confidence": conf,
        }
