"""StereoNet (Khamis et al., ECCV 2018) — from-scratch TPU-native flax build.

This is the network the reference ships as an opaque compiled BPU blob
(``config/hobot_stereonet.hbm``; provenance "OpenExplorer HAT StereoNet on
SceneFlow", ``README.md:5``; I/O contract [1,6,720,1280] int8 -> [1,1,720,1280]
int32 derived in SURVEY.md C13).  We reimplement the architecture family,
not the blob:

  1. Siamese feature tower: K stride-2 convs to 1/2^K resolution, residual
     blocks, 32-ch output (shared weights over both eyes — run as a single
     batched call, batch = 2B, instead of two calls).
  2. Difference cost volume over max_disparity / 2^K candidates.
  3. 3D-conv cost aggregation (NDHWC) -> 1-channel volume.
  4. Soft-argmin disparity regression (float, subpixel).
  5. Hierarchical edge-aware refinement: bilinear 2x upsample + dilated
     residual refinement conditioned on the (resized) left image, repeated
     back to full resolution.

All shapes are static; the disparity loop unrolls at trace time.  Activations
run in bf16 (MXU-native), disparity regression and outputs in float32.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import StereoNetConfig
from ..ops.cost_volume import build_cost_volume
from ..ops.soft_argmin import soft_argmin, disparity_confidence
from ..ops.upsample import downsample_avg, upsample2x_bilinear
from .layers import ConvBlock, ConvBlock3D, ResBlock2D, _num_groups


class FeatureTower(nn.Module):
    """Shared-weight feature extractor -> [B, H/2^K, W/2^K, C] features."""

    cfg: StereoNetConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg.feature_channels
        dt = self.cfg.compute_dtype
        x = x.astype(dt)
        for _ in range(self.cfg.downsample_factor):
            x = ConvBlock(c, kernel=(5, 5), strides=(2, 2), dtype=dt)(x)
        for _ in range(self.cfg.num_feature_res_blocks):
            x = ResBlock2D(c, dtype=dt)(x)
        # Final projection, no activation (raw matching features).
        x = nn.Conv(c, (3, 3), padding="SAME", dtype=dt, param_dtype=jnp.float32)(x)
        return x


class CostAggregation(nn.Module):
    """3D-conv aggregation over [B, D, H, W, C] -> [B, D, H, W] cost."""

    cfg: StereoNetConfig

    @nn.compact
    def __call__(self, volume):
        dt = self.cfg.compute_dtype
        x = volume.astype(dt)
        for _ in range(self.cfg.num_aggregation_layers):
            x = ConvBlock3D(self.cfg.aggregation_channels, dtype=dt)(x)
        x = nn.Conv(1, (3, 3, 3), padding="SAME", dtype=dt, param_dtype=jnp.float32)(x)
        return x[..., 0]  # drop channel


class RefinementNet(nn.Module):
    """Edge-aware residual disparity refinement at one scale.

    Input: current disparity [B,H,W,1] + guide image [B,H,W,3]; output:
    refined disparity (non-negative).  Dilated residual blocks give a large
    receptive field without extra downsampling (StereoNet's refinement
    design; dilations 1,2,4,8,1,1).
    """

    cfg: StereoNetConfig
    channels: int = 0  # 0 => cfg.refinement_channels
    blocks: int = 0  # 0 => cfg.num_refinement_res_blocks

    @nn.compact
    def __call__(self, disparity, guide):
        dt = self.cfg.compute_dtype
        c = self.channels or self.cfg.refinement_channels
        nb = self.blocks or self.cfg.num_refinement_res_blocks
        x = jnp.concatenate([disparity.astype(dt), guide.astype(dt)], axis=-1)
        x = ConvBlock(c, dtype=dt)(x)
        dilations = [1, 2, 4, 8, 1, 1]
        for i in range(nb):
            x = ResBlock2D(c, dilation=dilations[i % len(dilations)], dtype=dt)(x)
        delta = nn.Conv(1, (3, 3), padding="SAME", dtype=dt, param_dtype=jnp.float32)(x)
        refined = disparity + delta.astype(jnp.float32)
        return jax.nn.relu(refined)


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(x, (x.shape[0], h, w) + x.shape[3:], method="bilinear")


def _refine_size(cfg: StereoNetConfig, stage: int):
    """(channels, blocks) for refinement stage ``stage`` (coarse -> fine)."""
    rc = cfg.refinement_channels
    rb = cfg.num_refinement_res_blocks
    if cfg.refinement_scale_channels:
        rc = cfg.refinement_scale_channels[min(stage, len(cfg.refinement_scale_channels) - 1)]
    if cfg.refinement_scale_blocks:
        rb = cfg.refinement_scale_blocks[min(stage, len(cfg.refinement_scale_blocks) - 1)]
    return rc, rb


class StereoNet(nn.Module):
    """Full disparity network: (left, right) [B,H,W,3] -> outputs dict.

    Returns:
      ``disparity``  [B,H,W]  full-resolution float32 disparity (px)
      ``pyramid``    list of [B,h,w] disparities, coarse -> fine (for
                     multi-scale supervision during training)
      ``confidence`` [B,h/8,w/8] peak-probability match confidence
    """

    cfg: StereoNetConfig = StereoNetConfig()

    @nn.compact
    def __call__(self, left, right) -> Dict[str, Any]:
        cfg = self.cfg
        b, h, w = left.shape[0], left.shape[1], left.shape[2]
        k = cfg.cost_resolution_divisor

        # 1. Siamese tower — one batched call over both eyes (2B batch keeps
        # the MXU fed and halves kernel launches vs. two calls).
        # Pin the name: nn.remat renames the class (Checkpoint<X>), which
        # would make remat on/off checkpoints incompatible.
        tower_cls = nn.remat(FeatureTower) if cfg.remat else FeatureTower
        tower = tower_cls(cfg, name="FeatureTower_0")
        feats = tower(jnp.concatenate([left, right], axis=0))
        feat_l, feat_r = feats[:b], feats[b:]

        # 2-3. Cost volume + aggregation at 1/k resolution.
        volume = build_cost_volume(feat_l, feat_r, cfg.num_disparities_coarse)
        agg_cls = nn.remat(CostAggregation) if cfg.remat else CostAggregation
        cost = agg_cls(cfg, name="CostAggregation_0")(volume)  # [B, D/k, h/k, w/k]

        # 4. Soft-argmin -> coarse disparity in *coarse-pixel* units; scale
        # to full-res pixel units so refinement residuals are in px.
        disp_coarse = soft_argmin(cost) * float(k)  # [B, h/k, w/k]
        conf = disparity_confidence(cost)

        # 5. Hierarchical refinement back to full resolution.
        pyramid: List[jnp.ndarray] = [disp_coarse]
        disp = disp_coarse[..., None]  # [B, h/k, w/k, 1]
        scales = (
            [2 ** i for i in range(cfg.downsample_factor - 1, -1, -1)]
            if cfg.hierarchical_refinement
            else [1]
        )
        for i, s in enumerate(scales):
            th, tw = h // s, w // s
            # Disparity values are already in full-res px units (scaled by k
            # above), so upsampling interpolates positions only.  Fixed 2x
            # stencil upsample / avg-pool downsample instead of
            # jax.image.resize (which costs a full conv's time at 720p).
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


def create_stereonet(cfg: StereoNetConfig = StereoNetConfig()):
    return StereoNet(cfg)


def init_params(rng, cfg: StereoNetConfig = StereoNetConfig(),
                height: int = 64, width: int = 128, batch: int = 1):
    """Initialize parameters with a small dummy pair (shapes don't bind)."""
    model = StereoNet(cfg)
    dummy = jnp.zeros((batch, height, width, 3), jnp.float32)
    return model.init(rng, dummy, dummy)
