"""Colorspace and layout ops — vectorized JAX equivalents of the reference's
header-only CPU ``Tools`` (``stereonet_infer/include/preprocess.h:54-185``).

Reference ops reimplemented (semantics, not code):
  * ``YUV420TOYUV444`` (``preprocess.h:128-155``) — nearest-neighbor chroma
    upsample of an NV12 frame to planar YUV444.
  * ``YUV444TOYUV420`` (``preprocess.h:157-184``) — chroma decimation.
  * ``BGRToNv12`` (``preprocess.h:56-96``) — BT.601 RGB->YUV + NV12 packing.
  * ``nhwc2nchw`` / ``ncwh2nhwc`` (``preprocess.h:98-126``) — layout moves.

All ops are pure functions on arrays, trace-safe under ``jit``, with no
Python per-pixel loops (the reference's scalar CPU loops are the #1 hot spot
it measures — ``preprocess.cpp:989-996``).  The TPU-native layout is NHWC;
NCHW converters exist only for parity with the reference's tensor dumps.

NV12 memory layout: ``[H*W]`` Y plane followed by ``[H/2 * W/2 * 2]``
interleaved UV plane, as produced by the reference's camera transport
(``hbm_img_msgs::msg::HbmMsg1080P``, validated nv12 at
``stereonet_node.cpp:672-679``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# BT.601 full-range (matches OpenCV COLOR_BGR2YUV / COLOR_YUV2BGR family).
_KR, _KG, _KB = 0.299, 0.587, 0.114
_U_SCALE = 0.492  # = 0.872 / (2*(1-Kb)) style constant, OpenCV's delta-128 form
_V_SCALE = 0.877


def nv12_to_planes(nv12: jnp.ndarray, height: int, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a flat NV12 buffer into (Y [H,W], UV [H/2, W/2, 2]) planes."""
    y = nv12[: height * width].reshape(height, width)
    uv = nv12[height * width :].reshape(height // 2, width // 2, 2)
    return y, uv


def planes_to_nv12(y: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pack (Y [H,W], UV [H/2,W/2,2]) planes into a flat NV12 buffer."""
    return jnp.concatenate([y.reshape(-1), uv.reshape(-1)]).astype(y.dtype)


def yuv420_to_yuv444(y: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor chroma upsample: NV12 planes -> HWC YUV444.

    Semantics of ``Tools::YUV420TOYUV444`` (``preprocess.h:128-155``): each
    4:2:0 chroma sample is replicated to its 2x2 pixel quad.
    """
    h, w = y.shape
    # [H/2, W/2, 2] -> [H, W, 2] by 2x nearest-neighbor replication.
    uv_full = jnp.repeat(jnp.repeat(uv, 2, axis=0), 2, axis=1)
    return jnp.concatenate([y[..., None], uv_full], axis=-1)


def yuv444_to_yuv420(yuv444: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chroma decimation: HWC YUV444 -> NV12 planes (Y, interleaved UV).

    Semantics of ``Tools::YUV444TOYUV420`` (``preprocess.h:157-184``): keep
    the top-left chroma sample of each 2x2 quad.
    """
    y = yuv444[..., 0]
    uv = yuv444[::2, ::2, 1:]
    return y, uv


def nv12_to_yuv444(nv12: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Flat NV12 buffer -> HWC YUV444 (uint8 in, same dtype out)."""
    y, uv = nv12_to_planes(nv12, height, width)
    return yuv420_to_yuv444(y, uv)


def bgr_to_yuv(bgr: jnp.ndarray) -> jnp.ndarray:
    """HWC BGR (uint8 or float) -> HWC YUV444 float32, BT.601 full-range."""
    bgr = bgr.astype(jnp.float32)
    b, g, r = bgr[..., 0], bgr[..., 1], bgr[..., 2]
    y = _KR * r + _KG * g + _KB * b
    u = (b - y) * _U_SCALE + 128.0
    v = (r - y) * _V_SCALE + 128.0
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_bgr(yuv: jnp.ndarray) -> jnp.ndarray:
    """HWC YUV444 float -> HWC BGR float32, inverse of :func:`bgr_to_yuv`."""
    yuv = yuv.astype(jnp.float32)
    y, u, v = yuv[..., 0], yuv[..., 1], yuv[..., 2]
    b = y + (u - 128.0) / _U_SCALE
    r = y + (v - 128.0) / _V_SCALE
    g = (y - _KR * r - _KB * b) / _KG
    return jnp.stack([b, g, r], axis=-1)


def yuv_to_rgb(yuv: jnp.ndarray) -> jnp.ndarray:
    """HWC (or ...HWC) YUV444 float -> RGB float32."""
    bgr = yuv_to_bgr(yuv)
    return bgr[..., ::-1]


def rgb_to_yuv(rgb: jnp.ndarray) -> jnp.ndarray:
    """HWC (or ...HWC) RGB (uint8 or float) -> YUV444 float32, BT.601
    full-range — inverse of :func:`yuv_to_rgb`."""
    return bgr_to_yuv(rgb[..., ::-1])


def bgr_to_nv12(bgr: jnp.ndarray) -> jnp.ndarray:
    """HWC BGR uint8 -> flat NV12 uint8 (``Tools::BGRToNv12`` semantics,
    ``preprocess.h:56-96``): BT.601 conversion, chroma averaged over each
    2x2 quad, packed as Y plane + interleaved UV."""
    yuv = bgr_to_yuv(bgr)
    y = yuv[..., 0]
    h, w = y.shape
    # Average chroma over 2x2 quads (higher-quality decimation than
    # top-left sampling; downstream upsample is still nearest-neighbor).
    uvs = yuv[..., 1:].reshape(h // 2, 2, w // 2, 2, 2).mean(axis=(1, 3))
    y8 = jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
    uv8 = jnp.clip(jnp.round(uvs), 0, 255).astype(jnp.uint8)
    return planes_to_nv12(y8, uv8)


def split_side_by_side_nv12(
    nv12: jnp.ndarray, height: int, full_width: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a side-by-side stereo NV12 frame into (left, right) NV12 buffers.

    The reference camera publishes one 2560x720 NV12 frame holding both eyes
    side by side and splits it row-wise on the CPU
    (``stereonet_node.cpp:705-738``).  Here it's two strided gathers.
    """
    half = full_width // 2
    y, uv = nv12_to_planes(nv12, height, full_width)
    left = planes_to_nv12(y[:, :half], uv[:, : half // 2, :])
    right = planes_to_nv12(y[:, half:], uv[:, half // 2 :, :])
    return left, right


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """Layout move matching ``Tools::nhwc2nchw`` (``preprocess.h:98-111``)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """Layout move matching ``Tools::ncwh2nhwc`` (``preprocess.h:113-126``)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def align_up(x: int, m: int = 16) -> int:
    """``ALIGN_16``-style helper (``preprocess.h:27-31``)."""
    return (x + m - 1) // m * m
