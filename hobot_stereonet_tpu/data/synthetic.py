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


class LayeredScene:
    """A fixed layered 3D scene renderable from a translating camera — the
    ground-truth world for visual-odometry tests.

    Layers are fronto-parallel textured planes at metric depths Z_i.  For a
    camera translated by (tx, ty) meters (no rotation), layer i's image
    shifts by (-f*tx/Z_i, -f*ty/Z_i) px; the right eye adds the stereo
    baseline.  Rendering composites back to front, giving exact GT
    disparity and exact GT poses for ATE evaluation.
    """

    def __init__(self, rng: np.random.Generator, height: int, width: int,
                 focal_px: float, baseline_m: float,
                 depths_m: Tuple[float, ...] = (12.0, 7.0, 4.5, 3.0),
                 texture_scales: Tuple[int, ...] = (4, 8, 16, 32)):
        self.h, self.w = height, width
        self.f = focal_px
        self.baseline_m = baseline_m
        self.depths = sorted(depths_m, reverse=True)  # far -> near
        pad = 256  # margin for camera motion
        self.pad = pad
        self.layers = []
        for li, z in enumerate(self.depths):
            if li == 0:
                tex = _texture(rng, height + 2 * pad, width + 2 * pad, texture_scales)
                tex += rng.uniform(-12, 12, tex.shape)  # per-pixel detail
                mask = np.ones(tex.shape[:2], bool)
            else:
                tex = np.zeros((height + 2 * pad, width + 2 * pad, 3), np.float32)
                mask = np.zeros(tex.shape[:2], bool)
                for _ in range(3):
                    lh = int(rng.integers(height // 6, height // 2))
                    lw = int(rng.integers(width // 6, width // 2))
                    y0 = int(rng.integers(pad // 2, height + pad))
                    x0 = int(rng.integers(pad // 2, width + pad))
                    patch = _texture(rng, lh, lw, texture_scales)
                    patch += rng.uniform(-12, 12, patch.shape)
                    tex[y0 : y0 + lh, x0 : x0 + lw] = patch
                    mask[y0 : y0 + lh, x0 : x0 + lw] = True
            self.layers.append((z, tex, mask))

    def render(self, tx_m: float = 0.0, ty_m: float = 0.0):
        """Returns (left u8 [H,W,3], right u8, disparity f32 [H,W]) for a
        camera at (tx, ty, 0) with identity rotation."""
        h, w, pad = self.h, self.w, self.pad
        left = np.zeros((h, w, 3), np.float32)
        right = np.zeros((h, w, 3), np.float32)
        disp = np.zeros((h, w), np.float32)
        for z, tex, mask in self.layers:
            d_px = self.f * self.baseline_m / z
            ox = self.f * tx_m / z
            oy = self.f * ty_m / z
            lx, ly = pad + ox, pad + oy
            tl, ml = _bilinear_crop(tex, mask, ly, lx, h, w)
            tr, mr = _bilinear_crop(tex, mask, ly, lx + d_px, h, w)
            left = np.where(ml[..., None], tl, left)
            right = np.where(mr[..., None], tr, right)
            disp = np.where(ml, d_px, disp)
        return (
            np.clip(left, 0, 255).astype(np.uint8),
            np.clip(right, 0, 255).astype(np.uint8),
            disp,
        )

    def gt_center(self, tx_m: float, ty_m: float) -> np.ndarray:
        return np.array([tx_m, ty_m, 0.0], np.float32)


def _bilinear_crop(tex: np.ndarray, mask: np.ndarray, y0: float, x0: float,
                   h: int, w: int):
    """Sample tex[y0:y0+h, x0:x0+w] with bilinear interpolation; mask is
    AND-ed over the 4 corners (conservative)."""
    yi = np.arange(h, dtype=np.float64) + y0
    xi = np.arange(w, dtype=np.float64) + x0
    yf = np.floor(yi).astype(np.int64)
    xf = np.floor(xi).astype(np.int64)
    wy = (yi - yf)[:, None, None]
    wx = (xi - xf)[None, :, None]
    H, W = tex.shape[:2]
    yf0 = np.clip(yf, 0, H - 2)
    xf0 = np.clip(xf, 0, W - 2)
    t00 = tex[yf0[:, None], xf0[None, :]]
    t01 = tex[yf0[:, None], xf0[None, :] + 1]
    t10 = tex[yf0[:, None] + 1, xf0[None, :]]
    t11 = tex[yf0[:, None] + 1, xf0[None, :] + 1]
    out = (
        t00 * (1 - wy) * (1 - wx)
        + t01 * (1 - wy) * wx
        + t10 * wy * (1 - wx)
        + t11 * wy * wx
    )
    m = (
        mask[yf0[:, None], xf0[None, :]]
        & mask[yf0[:, None], xf0[None, :] + 1]
        & mask[yf0[:, None] + 1, xf0[None, :]]
        & mask[yf0[:, None] + 1, xf0[None, :] + 1]
    )
    return out.astype(np.float32), m
