"""On-device input preprocessing.

TPU-native replacement for the reference's CPU ``PreProcess``
(``stereonet_infer/src/preprocess.cpp:913-1059``): the reference runs
per-pixel scalar loops on the host for YUV420->YUV444 upsample, 6-channel
merge, and fused normalize+quantize (its own timers show these dominate —
``preprocess.cpp:989-996,1017-1024,1042-1049``).  Here the whole chain is a
single fused jitted function on device: the host only ships the raw NV12
bytes (one small uint8 transfer) and XLA fuses upsample+normalize into the
first conv's input pipeline.

Contract parity (SURVEY.md C6):
  * normalize: (x - 128) / 128                (``preprocess.cpp:1032-1050``)
  * optional int8 quantize: floor(x/scale + zp), scale=0.0078125, zp=0.5,
    clamp [-128, 127]                         (``preprocess.cpp:1131-1136``)
  * output: left/right YUV444 stacked -> 6 channels
            (we keep NHWC [B,H,W,6]; reference used NCHW [1,6,720,1280])
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import PreprocessConfig
from . import colorspace as cs


def normalize(x: jnp.ndarray, cfg: PreprocessConfig = PreprocessConfig()) -> jnp.ndarray:
    """(x - mean) / std, matching ``NormalizeImage`` (``preprocess.cpp:1116-1125``)."""
    return (x.astype(jnp.float32) - cfg.mean) / cfg.std


def quantize_int8(x: jnp.ndarray, cfg: PreprocessConfig = PreprocessConfig()) -> jnp.ndarray:
    """Floor-based int8 quantization matching ``Quantize``
    (``preprocess.cpp:1131-1136``; defaults ``preprocess.h:236-240``)."""
    q = jnp.floor(x / cfg.quant_scale + cfg.quant_zero_point)
    return jnp.clip(q, cfg.quant_min, cfg.quant_max).astype(jnp.int8)


def dequantize_int8(q: jnp.ndarray, cfg: PreprocessConfig = PreprocessConfig()) -> jnp.ndarray:
    return q.astype(jnp.float32) * cfg.quant_scale


@partial(jax.jit, static_argnames=("height", "width", "cfg"))
def nv12_pair_to_model_input(
    left_nv12: jnp.ndarray,
    right_nv12: jnp.ndarray,
    height: int,
    width: int,
    cfg: PreprocessConfig = PreprocessConfig(),
) -> jnp.ndarray:
    """Fused device preprocess: 2x flat NV12 uint8 -> [1,H,W,6] normalized.

    Replaces ``CvtNV12Data2Tensors`` (``preprocess.cpp:913-1059``) end to
    end.  Channels 0..2 are left YUV444, 3..5 right YUV444 (reference merge
    order at ``preprocess.cpp:998-1003``).
    """
    left = cs.nv12_to_yuv444(left_nv12, height, width)
    right = cs.nv12_to_yuv444(right_nv12, height, width)
    if cfg.color_space == "rgb":
        # Match the dataset/training input contract (RGB): convert on
        # device so streaming and eval run the same distribution.
        left = jnp.clip(cs.yuv_to_rgb(left), 0.0, 255.0)
        right = jnp.clip(cs.yuv_to_rgb(right), 0.0, 255.0)
    stacked = jnp.concatenate([left, right], axis=-1)  # [H, W, 6]
    out = normalize(stacked, cfg)
    if cfg.quantize:
        out = dequantize_int8(quantize_int8(out, cfg), cfg)
    return out[None]


@partial(jax.jit, static_argnames=("height", "full_width", "cfg"))
def side_by_side_nv12_to_model_input(
    sbs_nv12: jnp.ndarray,
    height: int,
    full_width: int,
    cfg: PreprocessConfig = PreprocessConfig(),
) -> jnp.ndarray:
    """Full live-stream ingest on device: one side-by-side NV12 frame (as
    published by the stereo camera, ``stereonet_node.cpp:682-690``) ->
    [1,H,W,6] normalized model input.  The reference does the split with
    per-row CPU memcpys (``:705-738``); here it is part of the fused graph.
    """
    left, right = cs.split_side_by_side_nv12(sbs_nv12, height, full_width)
    return nv12_pair_to_model_input(left, right, height, full_width // 2, cfg)


def nv12_ingest(
    sbs_nv12: jnp.ndarray,
    height: int,
    full_width: int,
    cfg: PreprocessConfig = PreprocessConfig(),
    use_pallas: "bool | None" = None,
) -> jnp.ndarray:
    """Backend-dispatching live-stream ingest.

    On TPU (and when the geometry tiles) this uses the fused Pallas kernel
    (ops/pallas/preprocess_kernel.py) — measured 1.3 ms/frame faster than
    the XLA gather-based NV12 path at 720p.  Elsewhere, or for odd
    geometries or the int8 parity path, it falls back to the jnp version.

    ``use_pallas=False`` forces the portable XLA path regardless of
    backend — required when the program is lowered for platforms the
    Mosaic kernel can't target (multi-platform jax.export artifacts).
    """
    width = full_width // 2
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    use_pallas = (
        use_pallas
        and not cfg.quantize
        and cfg.mean == 128.0
        and cfg.std == 128.0
        and height % 16 == 0
        and width % 128 == 0
    )
    if use_pallas:
        from .pallas.preprocess_kernel import nv12_sbs_preprocess_pallas

        out = nv12_sbs_preprocess_pallas(sbs_nv12, height, width)  # YUV444
        if cfg.color_space == "rgb":
            # Undo normalize, convert YUV->RGB per eye, re-normalize —
            # XLA fuses this into the kernel's output epilogue.
            yuv = out * cfg.std + cfg.mean
            l = jnp.clip(cs.yuv_to_rgb(yuv[..., :3]), 0.0, 255.0)
            r = jnp.clip(cs.yuv_to_rgb(yuv[..., 3:]), 0.0, 255.0)
            out = (jnp.concatenate([l, r], axis=-1) - cfg.mean) / cfg.std
        return out
    return side_by_side_nv12_to_model_input(sbs_nv12, height, full_width, cfg)


def rgb_pair_to_model_input(
    left_rgb: jnp.ndarray,
    right_rgb: jnp.ndarray,
    cfg: PreprocessConfig = PreprocessConfig(),
) -> jnp.ndarray:
    """Dataset path (SceneFlow/KITTI store RGB): [H,W,3] uint8 pair ->
    [1,H,W,6] normalized.  Mirrors the reference's JPEG-file path
    ``CvtImgData2Tensors`` (``preprocess.cpp:38-404``), which converts
    file images INTO the model's colorspace before normalizing — so when
    ``cfg.color_space == "yuv"`` (the reference's native input contract,
    ``preprocess.cpp:975-1003``) the RGB pair converts to YUV444 here,
    keeping datasets, training, and the NV12 stream on one distribution."""
    left = jnp.asarray(left_rgb)
    right = jnp.asarray(right_rgb)
    if cfg.color_space == "yuv":
        left = jnp.clip(cs.rgb_to_yuv(left), 0.0, 255.0)
        right = jnp.clip(cs.rgb_to_yuv(right), 0.0, 255.0)
    stacked = jnp.concatenate([left, right], axis=-1)
    return normalize(stacked, cfg)[None]


def split_model_input(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B,H,W,6] -> ([B,H,W,3] left, [B,H,W,3] right)."""
    return x[..., :3], x[..., 3:]
