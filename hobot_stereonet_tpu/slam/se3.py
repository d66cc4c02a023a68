"""SE(3) Lie-group utilities in JAX (batched, jit/grad-safe).

No analog exists in the reference (it is a per-frame depth node); this is
the geometric foundation for the stereo-VO / pose-graph / BA extension
(BASELINE.json config 5).  Conventions:

  * Pose T = (R, t) maps points from *world* to *camera*: x_cam = R x_w + t.
  * Tangent vectors xi = [rho (3), phi (3)] (translation first), with
    exp/log via Rodrigues; all ops broadcast over leading batch dims.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]  # [...,1,1]
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    # Taylor-safe coefficients.
    t2 = theta * theta
    a = jnp.where(theta < 1e-4, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.where(theta < 1e-4, 1.0, theta))
    b = jnp.where(theta < 1e-4, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(theta < 1e-4, 1.0, t2))
    return I + a * K + b * (K @ K)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    s = jnp.where(theta[..., None] < 1e-4, 0.5 + theta[..., None] ** 2 / 12.0,
                  theta[..., None] / (2.0 * jnp.sin(jnp.maximum(theta[..., None], 1e-8))))
    return s * w


def exp_se3(xi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 6] twist -> (R [..., 3, 3], t [..., 3])."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    t2 = theta * theta
    b = jnp.where(theta < 1e-4, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(theta < 1e-4, 1.0, t2))
    c = jnp.where(theta < 1e-4, 1.0 / 6.0 - t2 / 120.0,
                  (jnp.where(theta < 1e-4, 1.0, theta) - jnp.sin(theta)) / jnp.where(theta < 1e-4, 1.0, t2 * theta))
    V = I + b * K + c * (K @ K)
    t = (V @ rho[..., None])[..., 0]
    return R, t


def log_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> [..., 6] twist."""
    phi = log_so3(R)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    t2 = theta * theta
    b = jnp.where(theta < 1e-4, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(theta < 1e-4, 1.0, t2))
    c = jnp.where(theta < 1e-4, 1.0 / 6.0 - t2 / 120.0,
                  (jnp.where(theta < 1e-4, 1.0, theta) - jnp.sin(theta)) / jnp.where(theta < 1e-4, 1.0, t2 * theta))
    V = I + b * K + c * (K @ K)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def compose(Ra, ta, Rb, tb) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """T_a * T_b (apply b first, then a)."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def inverse(R, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform(R, t, points: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to [..., N, 3] points."""
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def identity(batch_shape=()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    R = jnp.broadcast_to(jnp.eye(3), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3))
    return R, t


def relative_pose_error(R_est, t_est, R_gt, t_gt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rotation error rad, translation error) between two poses."""
    dR = jnp.swapaxes(R_gt, -1, -2) @ R_est
    rot_err = jnp.linalg.norm(log_so3(dR), axis=-1)
    trans_err = jnp.linalg.norm(t_est - t_gt, axis=-1)
    return rot_err, trans_err
