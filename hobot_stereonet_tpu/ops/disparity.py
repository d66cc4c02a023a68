"""Disparity post-processing: dequantization parity + depth conversion.

TPU-native replacement for the reference output parser (SURVEY.md C8,
``stereonet_infer/src/parser.cpp``) and the render node's duplicate math
(``publisher_member_function.py:73-81``).  On the native path the network
already emits float disparity in pixels, so only depth conversion applies;
the dequant ops exist for parity against reference tensor dumps.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraConfig

# Reference BPU output dequantization constants (``parser.cpp:84-86``,
# ``publisher_member_function.py:29,73-75``).
REFERENCE_DEQUANT_SCALE = 2.60443857769133e-6
REFERENCE_DISPARITY_MULTIPLIER = 16 * 12  # = 192


def dequantize_reference_output(raw_int32: jnp.ndarray,
                                scale: float = REFERENCE_DEQUANT_SCALE) -> jnp.ndarray:
    """int32 BPU tensor -> float disparity in pixels.

    Mirrors ``parser.cpp:84`` (``dis = data * scale``) followed by the x192
    subpixel/scale multiplier applied at ``parser.cpp:86`` /
    ``publisher_member_function.py:75``.
    """
    return raw_int32.astype(jnp.float32) * scale * REFERENCE_DISPARITY_MULTIPLIER


def disparity_to_depth_m(disparity_px: jnp.ndarray,
                         camera: CameraConfig = CameraConfig()) -> jnp.ndarray:
    """Float disparity (px) -> metric depth (m): Z = f*B/disp/1000 with B in
    mm (``parser.cpp:86``, ``publisher_member_function.py:81``)."""
    return camera.depth_from_disparity(disparity_px)


def depth_to_disparity_px(depth_m: jnp.ndarray,
                          camera: CameraConfig = CameraConfig()) -> jnp.ndarray:
    depth_m = jnp.maximum(depth_m, 1e-6)
    return camera.focal_px * camera.baseline_mm / depth_m / 1000.0


def end_point_error(pred_px: jnp.ndarray, gt_px: jnp.ndarray,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean absolute disparity error (SceneFlow EPE metric)."""
    err = jnp.abs(pred_px - gt_px)
    if valid is None:
        return jnp.mean(err)
    valid = valid.astype(jnp.float32)
    return jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def d1_all(pred_px: jnp.ndarray, gt_px: jnp.ndarray,
           valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """KITTI D1-all: fraction of pixels with error > 3 px AND > 5% of GT."""
    err = jnp.abs(pred_px - gt_px)
    bad = jnp.logical_and(err > 3.0, err > 0.05 * jnp.abs(gt_px)).astype(jnp.float32)
    if valid is None:
        return jnp.mean(bad)
    valid = valid.astype(jnp.float32)
    return jnp.sum(bad * valid) / jnp.maximum(jnp.sum(valid), 1.0)
