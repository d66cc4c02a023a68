"""Stereo visual odometry: triangulation, robust PnP, frame-to-keyframe
tracking.

Static-shape, batched design: RANSAC is a *batch* of M minimal-solver
hypotheses refined in parallel (vmapped Gauss-Newton), scored vectorized,
best-by-inliers refined on all inliers — no data-dependent loops, so the
whole tracker jits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig
from . import se3


def triangulate(
    xy: jnp.ndarray, disparity: jnp.ndarray, camera: CameraConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel coords [K, 2] + disparity [K] -> camera-frame 3D points [K, 3].

    Standard rectified-stereo back-projection: Z = f*B/d, X = (u-cx)Z/f,
    Y = (v-cy)Z/f.  Principal point defaults to the image center (the
    reference hard-codes only f and B — ``parser.cpp:70-71``).
    Returns (points, valid) where valid requires positive finite depth.
    """
    f = camera.focal_px
    cx, cy = camera.width / 2.0, camera.height / 2.0
    d = jnp.maximum(disparity, 1e-6)
    z = f * camera.baseline_m / d
    x = (xy[:, 0] - cx) * z / f
    y = (xy[:, 1] - cy) * z / f
    pts = jnp.stack([x, y, z], axis=-1)
    valid = (disparity > 0.5) & (z > 0.1) & (z < 200.0)
    return pts, valid


def project(points_cam: jnp.ndarray, camera: CameraConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame [_, 3] -> pixel [_, 2]; valid = in front of camera."""
    f = camera.focal_px
    cx, cy = camera.width / 2.0, camera.height / 2.0
    z = jnp.maximum(points_cam[..., 2], 1e-6)
    u = points_cam[..., 0] / z * f + cx
    v = points_cam[..., 1] / z * f + cy
    return jnp.stack([u, v], axis=-1), points_cam[..., 2] > 0.1


def _huber_weight(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(r <= delta, 1.0, delta / r)


@se3.f32_matmuls
def pnp_gauss_newton(
    points_w: jnp.ndarray,
    obs_px: jnp.ndarray,
    weights: jnp.ndarray,
    camera: CameraConfig,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    iters: int = 8,
    huber_px: float = 3.0,
    damping: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted robust PnP: minimize reprojection of world points under
    pose (R, t) (world->cam).  Fixed iteration count; left-multiplied
    increments (xi in se3)."""
    f = camera.focal_px

    def step(carry, _):
        R, t = carry
        pc = se3.transform(R, t, points_w)  # [K, 3]
        z = jnp.maximum(pc[:, 2], 1e-6)
        proj, _ = project(pc, camera)
        r = proj - obs_px  # [K, 2]

        # Jacobian of projection wrt left-perturbation xi = [rho, phi].
        x, y = pc[:, 0], pc[:, 1]
        inv_z = 1.0 / z
        fx = f
        # d(proj)/d(pc):
        J_pc = jnp.stack(
            [
                jnp.stack([fx * inv_z, jnp.zeros_like(z), -fx * x * inv_z ** 2], -1),
                jnp.stack([jnp.zeros_like(z), fx * inv_z, -fx * y * inv_z ** 2], -1),
            ],
            axis=1,
        )  # [K, 2, 3]
        # d(pc)/d(xi): [I | -hat(pc)]
        J_xi = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(3), (pc.shape[0], 3, 3)),
                -se3.hat(pc),
            ],
            axis=-1,
        )  # [K, 3, 6]
        J = jnp.einsum("kij,kjl->kil", J_pc, J_xi)  # [K, 2, 6]

        r2 = jnp.sum(r * r, axis=-1)
        w = weights * _huber_weight(r2, huber_px)
        Jw = J * w[:, None, None]
        H = jnp.einsum("kil,kim->lm", Jw, J) + damping * jnp.eye(6)
        g = jnp.einsum("kil,ki->l", Jw, r)
        xi = -jnp.linalg.solve(H, g)
        dR, dt = se3.exp_se3(xi)
        R_new, t_new = se3.compose(dR, dt, R, t)
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    return R, t


def reprojection_inliers(
    R, t, points_w, obs_px, camera: CameraConfig, thresh_px: float = 3.0
) -> jnp.ndarray:
    pc = se3.transform(R, t, points_w)
    proj, in_front = project(pc, camera)
    err = jnp.linalg.norm(proj - obs_px, axis=-1)
    return (err < thresh_px) & in_front


class TrackResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray  # [K] bool
    num_inliers: jnp.ndarray


@partial(jax.jit, static_argnames=("camera", "num_hypotheses", "sample_size"))
@se3.f32_matmuls
def robust_pnp(
    key: jax.Array,
    points_w: jnp.ndarray,   # [K, 3] world points
    obs_px: jnp.ndarray,     # [K, 2] observations in new frame
    valid: jnp.ndarray,      # [K] bool
    camera: CameraConfig,
    num_hypotheses: int = 64,
    sample_size: int = 6,
    thresh_px: float = 3.0,
) -> TrackResult:
    """Vectorized RANSAC + Gauss-Ewton PnP.

    M minimal samples are drawn and refined in parallel (vmap over
    hypotheses = one batched linear-algebra kernel), scored by inlier
    count, and the winner re-refined on all inliers.
    """
    k = points_w.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)

    keys = jax.random.split(key, num_hypotheses)

    def hypothesis(hk):
        idx = jax.random.choice(hk, k, shape=(sample_size,), p=p, replace=False)
        w = jnp.zeros((k,)).at[idx].set(1.0)
        R0, t0 = se3.identity()
        R, t = pnp_gauss_newton(points_w, obs_px, w, camera, R0, t0, iters=6)
        inl = reprojection_inliers(R, t, points_w, obs_px, camera, thresh_px) & valid
        return R, t, jnp.sum(inl)

    Rs, ts, scores = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    R_best, t_best = Rs[best], ts[best]

    # Final polish on all inliers of the winner.
    inl = reprojection_inliers(R_best, t_best, points_w, obs_px, camera, thresh_px) & valid
    R_f, t_f = pnp_gauss_newton(
        points_w, obs_px, inl.astype(jnp.float32), camera, R_best, t_best, iters=8
    )
    inl_f = reprojection_inliers(R_f, t_f, points_w, obs_px, camera, thresh_px) & valid
    return TrackResult(R=R_f, t=t_f, inliers=inl_f, num_inliers=jnp.sum(inl_f))
