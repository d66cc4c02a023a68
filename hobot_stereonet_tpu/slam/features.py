"""Feature detection, description, and matching — all on device, static
shapes.

TPU-first formulation (no OpenCV ORB/FAST): Harris corner response computed
densely with stencil ops, top-K selection with ``jax.lax.top_k`` (fixed K
so shapes stay static), normalized image-patch descriptors, and matching as
one descriptor-matrix matmul on the MXU with mutual-nearest + ratio-test
filtering.  Invalid/padded keypoints carry a validity mask instead of
dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .se3 import f32_matmuls as _f32_matmuls


class Keypoints(NamedTuple):
    xy: jnp.ndarray      # [K, 2] float32 (x, y) pixel coords
    score: jnp.ndarray   # [K] Harris response
    desc: jnp.ndarray    # [K, D] L2-normalized descriptors
    valid: jnp.ndarray   # [K] bool


def _gray(img: jnp.ndarray) -> jnp.ndarray:
    if img.ndim == 3 and img.shape[-1] == 3:
        return (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        ).astype(jnp.float32)
    return img.astype(jnp.float32)


def _box3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 box filter via separable shifts (VPU-friendly)."""
    xp = jnp.pad(x, 1, mode="edge")
    h = xp[:-2] + xp[1:-1] + xp[2:]
    hp = h[:, :]  # rows filtered
    v = hp[:, :-2] + hp[:, 1:-1] + hp[:, 2:]
    return v / 9.0


def harris_response(img: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Dense Harris corner response, [H, W]."""
    g = _gray(img)
    gp = jnp.pad(g, 1, mode="edge")
    ix = (gp[1:-1, 2:] - gp[1:-1, :-2]) * 0.5
    iy = (gp[2:, 1:-1] - gp[:-2, 1:-1]) * 0.5
    sxx = _box3(ix * ix)
    syy = _box3(iy * iy)
    sxy = _box3(ix * iy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def _nms3(resp: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression mask."""
    rp = jnp.pad(resp, 1, mode="constant", constant_values=-jnp.inf)
    stack = jnp.stack(
        [rp[i : i + resp.shape[0], j : j + resp.shape[1]] for i in range(3) for j in range(3)]
    )
    return resp >= jnp.max(stack, axis=0)


def _patch_descriptors(g: jnp.ndarray, xy: jnp.ndarray, patch: int = 16) -> jnp.ndarray:
    """Normalized patch descriptors: [K, patch*patch] from integer coords."""
    half = patch // 2
    gp = jnp.pad(g, half, mode="edge")
    x = xy[:, 0].astype(jnp.int32)
    y = xy[:, 1].astype(jnp.int32)

    offs = jnp.arange(patch) - half

    def grab(cy, cx):
        rows = cy + half + offs  # into padded image
        cols = cx + half + offs
        return gp[rows[:, None], cols[None, :]].reshape(-1)

    d = jax.vmap(grab)(y, x)  # [K, patch*patch]
    d = d - jnp.mean(d, axis=1, keepdims=True)
    n = jnp.linalg.norm(d, axis=1, keepdims=True)
    return d / jnp.maximum(n, 1e-6)


@partial(jax.jit, static_argnames=("num_keypoints", "patch", "border"))
def detect_and_describe(
    img: jnp.ndarray,
    num_keypoints: int = 512,
    patch: int = 16,
    border: int = 8,
    min_score: float = 1e-7,
) -> Keypoints:
    """[H, W(, 3)] image -> K keypoints with descriptors (static K)."""
    g = _gray(img) / 255.0
    resp = harris_response(g)
    h, w = resp.shape
    # Suppress non-maxima and borders.
    resp = jnp.where(_nms3(resp), resp, -jnp.inf)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = (
        (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
    )
    resp = jnp.where(in_border, resp, -jnp.inf)

    flat = resp.reshape(-1)
    score, idx = jax.lax.top_k(flat, num_keypoints)
    ky = (idx // w).astype(jnp.float32)
    kx = (idx % w).astype(jnp.float32)
    xy = jnp.stack([kx, ky], axis=-1)
    valid = score > min_score
    desc = _patch_descriptors(g, xy, patch)
    return Keypoints(xy=xy, score=score, desc=desc, valid=valid)


class Matches(NamedTuple):
    idx_a: jnp.ndarray   # [M] indices into keypoints A (fixed M = K)
    idx_b: jnp.ndarray   # [M] indices into keypoints B
    valid: jnp.ndarray   # [M] bool — mutual NN + ratio test + validity


@jax.jit
@_f32_matmuls
def match(
    a: Keypoints, b: Keypoints, ratio: float = 0.9, min_sim: float = 0.5
) -> Matches:
    """Mutual-nearest-neighbor matching on the MXU: similarity = desc_a @
    desc_b^T (descriptors are L2-normalized, so this is cosine
    similarity)."""
    sim = a.desc @ b.desc.T  # [K, K]
    neg = -jnp.inf
    sim = jnp.where(a.valid[:, None] & b.valid[None, :], sim, neg)

    best_b = jnp.argmax(sim, axis=1)  # for each a
    top2 = jax.lax.top_k(sim, 2)[0]  # [K, 2]
    best_a_of_b = jnp.argmax(sim, axis=0)  # for each b

    k = sim.shape[0]
    mutual = best_a_of_b[best_b] == jnp.arange(k)
    passes_ratio = top2[:, 1] < ratio * top2[:, 0]
    strong = top2[:, 0] > min_sim
    valid = mutual & passes_ratio & strong & a.valid & b.valid[best_b]
    return Matches(idx_a=jnp.arange(k), idx_b=best_b, valid=valid)
