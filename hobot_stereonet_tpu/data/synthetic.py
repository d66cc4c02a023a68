"""Procedural stereo scene generator with exact ground-truth disparity.

The environment has no SceneFlow/KITTI data (zero egress), and the reference
itself ships only two fixture JPEGs (``preprocess.h:45-48``).  This module
generates layered fronto-parallel scenes — textured background plane plus
textured rectangles at nearer depths — and renders the right view by
compositing each layer shifted LEFT by its disparity (back-to-front), which
yields pixel-exact GT disparity with physically correct occlusion: exactly
what's needed to train and to regression-test EPE end to end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class SyntheticConfig:
    height: int = 256
    width: int = 512
    num_layers: int = 6
    min_disparity: float = 2.0
    max_disparity: float = 48.0
    texture_scales: Tuple[int, ...] = (4, 8, 16, 32)
    noise_std: float = 2.0  # sensor noise (uint8 counts)


def _texture(rng: np.random.Generator, h: int, w: int, scales) -> np.ndarray:
    """Multi-scale random RGB texture in [0,255] — enough structure for
    matching to be well-posed at every scale."""
    img = np.zeros((h, w, 3), np.float32)
    for s in scales:
        coarse = rng.uniform(0, 1, size=(-(-h // s), -(-w // s), 3))
        up = np.kron(coarse, np.ones((s, s, 1)))[:h, :w, :]
        img += up.astype(np.float32)
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img * 255.0


def generate_pair(
    rng: np.random.Generator, cfg: SyntheticConfig = SyntheticConfig()
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (left_rgb uint8 [H,W,3], right_rgb uint8, disparity float32 [H,W]).

    Disparity is defined on the left image; occluded-in-right regions keep
    their left-layer disparity (standard GT convention — SceneFlow GT is
    also defined on the left view including occlusions).
    """
    h, w = cfg.height, cfg.width

    # Background layer: farthest (smallest disparity).
    bg_disp = float(rng.uniform(cfg.min_disparity, cfg.min_disparity + 4.0))
    # Pad background texture on the right so the right view's shift has data.
    pad = int(np.ceil(cfg.max_disparity)) + 1
    bg_tex = _texture(rng, h, w + pad, cfg.texture_scales)

    left = bg_tex[:, :w].copy()
    # right view of a layer with disparity d: right[x] = layer[x + d]
    right = _sample_shift(bg_tex, bg_disp)[:, :w]
    disp = np.full((h, w), bg_disp, np.float32)

    # Foreground layers, far to near.
    disps = np.sort(
        rng.uniform(cfg.min_disparity + 4.0, cfg.max_disparity, size=cfg.num_layers)
    )
    for d in disps:
        lw = int(rng.integers(w // 8, w // 2))
        lh = int(rng.integers(h // 8, h // 2))
        x0 = int(rng.integers(0, w - 8))
        y0 = int(rng.integers(0, h - 8))
        tex = _texture(rng, lh, lw + pad, cfg.texture_scales)

        # Left view: place rect at (y0, x0).
        x1 = min(x0 + lw, w)
        y1 = min(y0 + lh, h)
        left[y0:y1, x0:x1] = tex[: y1 - y0, : x1 - x0]
        disp[y0:y1, x0:x1] = d

        # Right view: the same rect appears shifted left by d.  With the
        # rect spanning left columns [x0, x0+lw), right[x] = tex[x - x0 + d],
        # so placing at integer start xr0 = ceil(x0 - d) samples tex at the
        # fractional offset frac = xr0 - (x0 - d) in [0, 1).
        rx0 = x0 - d
        xr0 = int(np.ceil(rx0))
        frac = xr0 - rx0
        tex_rs = _sample_shift(tex, frac)
        rx1 = min(xr0 + lw, w)
        if rx1 > 0:
            cs = max(0, -xr0)
            right[y0:y1, max(xr0, 0) : rx1] = tex_rs[: y1 - y0, cs : cs + rx1 - max(xr0, 0)]

    if cfg.noise_std > 0:
        left += rng.normal(0, cfg.noise_std, left.shape)
        right += rng.normal(0, cfg.noise_std, right.shape)

    left = np.clip(left, 0, 255).astype(np.uint8)
    right = np.clip(right, 0, 255).astype(np.uint8)
    return left, right, disp


def _sample_shift(img: np.ndarray, d: float) -> np.ndarray:
    """out[:, x] = img[:, x + d] with linear interpolation (d >= 0)."""
    h, w = img.shape[:2]
    x = np.arange(w, dtype=np.float32) + d
    x0 = np.floor(x).astype(np.int64)
    frac = (x - x0)[None, :, None]
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    return img[:, x0c] * (1 - frac) + img[:, x1c] * frac


def generate_batch(rng: np.random.Generator, batch: int,
                   cfg: SyntheticConfig = SyntheticConfig()):
    """(left [B,H,W,3] u8, right [B,H,W,3] u8, disp [B,H,W] f32)."""
    ls, rs, ds = [], [], []
    for _ in range(batch):
        l, r, d = generate_pair(rng, cfg)
        ls.append(l)
        rs.append(r)
        ds.append(d)
    return np.stack(ls), np.stack(rs), np.stack(ds)
