"""SE(3) Lie-group utilities in JAX (batched, jit/grad-safe).

No analog exists in the reference (it is a per-frame depth node); this is
the geometric foundation for the stereo-VO / pose-graph / BA extension
(BASELINE.json config 5).  Conventions:

  * Pose T = (R, t) maps points from *world* to *camera*: x_cam = R x_w + t.
  * Tangent vectors xi = [rho (3), phi (3)] (translation first), with
    exp/log via Rodrigues; all ops broadcast over leading batch dims.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def f32_matmuls(fn):
    """Force full-float32 matmul precision while tracing ``fn``.

    TPU matmuls/einsums default to single-pass bf16 on the MXU.  An 8-bit
    mantissa is fine for network activations but catastrophic for chained
    3x3 pose algebra and Gauss-Newton normal equations (measured: the
    synthetic-trajectory ATE degrades from millimeters on CPU to >2 m on
    the chip without this).  Every geometry entry point opts into
    ``highest`` precision explicitly; the stereo network keeps the fast
    bf16 path.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


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


def _theta_coeffs(phi: jnp.ndarray):
    """(small-mask, t2, theta) with AD-safe theta: the derivative of
    ``norm(phi)`` is NaN at phi = 0, which poisons any jacobian taken at the
    identity (exactly where pose-graph/BA linearize).  The double-``where``
    keeps both forward values and gradients finite: the dangerous sqrt only
    ever sees a sanitized operand."""
    t2 = jnp.sum(phi * phi, axis=-1)[..., None, None]  # [...,1,1]
    small = t2 < 1e-8
    theta = jnp.sqrt(jnp.where(small, 1.0, t2))
    return small, t2, theta


@f32_matmuls
def exp_so3(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    small, t2, theta = _theta_coeffs(phi)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    # Taylor-safe coefficients (safe denominators: small branch uses the
    # polynomial, the trig branch never sees theta ~ 0).
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    return I + a * K + b * (K @ K)


@f32_matmuls
def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # arccos has infinite slope at 1 (the identity), so sanitize its operand
    # and take the small-angle branch there: log ~ 0.5 * vee(R - R^T), whose
    # own derivative is exact to first order.
    near0 = cos_theta > 1.0 - 1e-7
    theta = jnp.where(near0, 0.0, jnp.arccos(jnp.where(near0, 0.0, cos_theta)))
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    th = theta[..., None]
    sin_theta = jnp.sin(jnp.where(near0[..., None], 1.0, th))
    s = jnp.where(near0[..., None], 0.5 + th * th / 12.0,
                  th / (2.0 * jnp.maximum(sin_theta, 1e-8)))
    return s * w


@f32_matmuls
def exp_se3(xi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 6] twist -> (R [..., 3, 3], t [..., 3])."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    small, t2, theta = _theta_coeffs(phi)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    safe_t2 = jnp.where(small, 1.0, t2)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / (safe_t2 * theta))
    V = I + b * K + c * (K @ K)
    t = (V @ rho[..., None])[..., 0]
    return R, t


@f32_matmuls
def log_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> [..., 6] twist."""
    phi = log_so3(R)
    small, t2, theta = _theta_coeffs(phi)
    K = hat(phi)
    I = jnp.broadcast_to(jnp.eye(3), K.shape)
    safe_t2 = jnp.where(small, 1.0, t2)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / (safe_t2 * theta))
    V = I + b * K + c * (K @ K)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


@f32_matmuls
def compose(Ra, ta, Rb, tb) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """T_a * T_b (apply b first, then a)."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


@f32_matmuls
def inverse(R, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


@f32_matmuls
def transform(R, t, points: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to [..., N, 3] points."""
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def identity(batch_shape=()) -> Tuple[jnp.ndarray, jnp.ndarray]:
    R = jnp.broadcast_to(jnp.eye(3), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3))
    return R, t


@f32_matmuls
def relative_pose_error(R_est, t_est, R_gt, t_gt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rotation error rad, translation error) between two poses."""
    dR = jnp.swapaxes(R_gt, -1, -2) @ R_est
    rot_err = jnp.linalg.norm(log_so3(dR), axis=-1)
    trans_err = jnp.linalg.norm(t_est - t_gt, axis=-1)
    return rot_err, trans_err
