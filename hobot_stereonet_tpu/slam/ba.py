"""Bundle adjustment: dense-block Schur-complement Gauss-Newton, with a
landmark-sharded distributed variant.

TPU-first formulation (BASELINE.json config 5): instead of sparse CRS
matrices + sparse Cholesky (the CPU way), the problem is laid out as dense
fixed-shape blocks that map onto batched einsums:

  * window of N keyframe poses (twist parameterization, pose 0 gauge-fixed)
  * M landmarks, observation grid obs[N, M, 2] with valid mask (static
    shapes — missing observations are masked, not absent)
  * Hll is [M, 3, 3] block-diagonal -> batched 3x3 inverse
  * Schur complement S = Hpp - Hpl Hll^-1 Hlp via einsum (MXU)
  * landmark back-substitution batched over M

Distribution: landmarks shard over the ``data`` mesh axis via shard_map;
each device reduces its landmarks' contribution to (S, g) and a ``psum``
over ICI combines them — the Schur reduction *is* the collective.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig
from . import se3
from .odometry import _huber_weight


class BAProblem(NamedTuple):
    poses: Tuple[jnp.ndarray, jnp.ndarray]  # (R [N,3,3], t [N,3]) world->cam
    landmarks: jnp.ndarray                  # [M, 3] world points
    obs: jnp.ndarray                        # [N, M, 2] pixel observations
    valid: jnp.ndarray                      # [N, M] bool


def _residuals_and_jacobians(R, t, landmarks, obs, valid, camera: CameraConfig,
                             huber_px: float):
    """Per-observation residuals r [N,M,2], pose Jacobians Jp [N,M,2,6],
    landmark Jacobians Jl [N,M,2,3], and robust weights w [N,M]."""
    f = camera.focal_px
    cx, cy = camera.width / 2.0, camera.height / 2.0

    pc = jnp.einsum("nij,mj->nmi", R, landmarks) + t[:, None, :]  # [N,M,3]
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = pc[..., 0] / z * f + cx
    v = pc[..., 1] / z * f + cy
    r = jnp.stack([u, v], axis=-1) - obs  # [N,M,2]

    inv_z = 1.0 / z
    x, y = pc[..., 0], pc[..., 1]
    zero = jnp.zeros_like(z)
    J_pc = jnp.stack(
        [
            jnp.stack([f * inv_z, zero, -f * x * inv_z ** 2], -1),
            jnp.stack([zero, f * inv_z, -f * y * inv_z ** 2], -1),
        ],
        axis=-2,
    )  # [N,M,2,3]

    # Pose (left-perturbation): d(pc)/dxi = [I | -hat(pc)]
    eye = jnp.broadcast_to(jnp.eye(3), pc.shape[:-1] + (3, 3))
    J_xi = jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # [N,M,3,6]
    Jp = jnp.einsum("nmij,nmjk->nmik", J_pc, J_xi)  # [N,M,2,6]

    # Landmark: d(pc)/dX = R
    Jl = jnp.einsum("nmij,njk->nmik", J_pc, R)  # [N,M,2,3]

    r2 = jnp.sum(r * r, axis=-1)
    w = valid.astype(jnp.float32) * _huber_weight(r2, huber_px)
    # Gate out behind-camera points.
    w = w * (pc[..., 2] > 0.05)
    return r, Jp, Jl, w


def _build_normal_blocks(r, Jp, Jl, w, damping: float):
    """Weighted normal-equation blocks."""
    Jp_w = Jp * w[..., None, None]
    Jl_w = Jl * w[..., None, None]
    # Hpp: [N,6,6] block-diagonal over poses.
    Hpp = jnp.einsum("nmik,nmil->nkl", Jp_w, Jp)
    # Hll: [M,3,3] block-diagonal over landmarks.
    Hll = jnp.einsum("nmik,nmil->mkl", Jl_w, Jl)
    # Hpl: [N,M,6,3] coupling blocks.
    Hpl = jnp.einsum("nmik,nmil->nmkl", Jp_w, Jl)
    gp = jnp.einsum("nmik,nmi->nk", Jp_w, r)  # [N,6]
    gl = jnp.einsum("nmik,nmi->mk", Jl_w, r)  # [M,3]
    # Levenberg-style damping: absolute + multiplicative.  The diagonal
    # term keeps under-constrained landmark blocks (e.g. observed in a
    # single frame: rank-2 Hll) from exploding along their null direction.
    Hpp = Hpp + damping * jnp.eye(6) + damping * _diagonal_only(Hpp)
    Hll = Hll + damping * jnp.eye(3) + 10.0 * damping * _diagonal_only(Hll)
    return Hpp, Hll, Hpl, gp, gl


def _diagonal_only(H: jnp.ndarray) -> jnp.ndarray:
    eye = jnp.eye(H.shape[-1])
    return H * eye


def _schur_solve(Hpp, Hll, Hpl, gp, gl, gauge_fix_first: bool = True):
    """Solve the reduced camera system and back-substitute landmarks."""
    n = Hpp.shape[0]
    Hll_inv = jnp.linalg.inv(Hll)  # [M,3,3] batched

    # S = blockdiag(Hpp) - Hpl Hll^-1 Hlp  (dense [6N, 6N])
    A = jnp.einsum("nmkl,mlo->nmko", Hpl, Hll_inv)  # [N,M,6,3]
    S_off = jnp.einsum("nmko,pmlo->npkl", A, Hpl)  # [N,N,6,6]
    S = -S_off
    S = S.at[jnp.arange(n), jnp.arange(n)].add(Hpp)
    b = gp - jnp.einsum("nmko,mo->nk", A, gl)  # [N,6]

    S_flat = S.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
    b_flat = b.reshape(6 * n)

    if gauge_fix_first:
        # Clamp pose 0 by a stiff prior instead of resizing (static shapes).
        prior = jnp.zeros(6 * n).at[:6].set(1e8)
        S_flat = S_flat + jnp.diag(prior)

    dx_p = -jnp.linalg.solve(S_flat, b_flat).reshape(n, 6)
    # Back-substitute landmarks: dl = -Hll^-1 (gl + Hlp dx_p)
    rhs = gl + jnp.einsum("nmkl,nk->ml", Hpl, dx_p)
    dx_l = -jnp.einsum("mkl,ml->mk", Hll_inv, rhs)
    return dx_p, dx_l


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    landmarks: jnp.ndarray
    cost_history: jnp.ndarray


@partial(jax.jit, static_argnames=("camera", "iters"))
@se3.f32_matmuls
def bundle_adjust(
    problem: BAProblem,
    camera: CameraConfig,
    iters: int = 10,
    huber_px: float = 3.0,
    damping: float = 1e-3,
) -> BAResult:
    """Single-device dense-block BA."""

    def step(carry, _):
        R, t, lm = carry
        r, Jp, Jl, w = _residuals_and_jacobians(
            R, t, lm, problem.obs, problem.valid, camera, huber_px
        )
        cost = jnp.sum(w * jnp.sum(r * r, axis=-1))
        Hpp, Hll, Hpl, gp, gl = _build_normal_blocks(r, Jp, Jl, w, damping)
        dx_p, dx_l = _schur_solve(Hpp, Hll, Hpl, gp, gl)
        dR, dt = se3.exp_se3(dx_p)
        R_new, t_new = se3.compose(dR, dt, R, t)
        return (R_new, t_new, lm + dx_l), cost

    R0, t0 = problem.poses
    (R, t, lm), costs = jax.lax.scan(
        step, (R0, t0, problem.landmarks), None, length=iters
    )
    return BAResult(R=R, t=t, landmarks=lm, cost_history=costs)


def make_distributed_bundle_adjust(mesh, camera: CameraConfig, iters: int = 10,
                                   huber_px: float = 3.0, damping: float = 1e-3):
    """Landmark-sharded BA over the ``data`` mesh axis.

    Landmarks / observation columns shard across devices; each device builds
    its local (partial) Schur complement and ``psum`` over ICI produces the
    global reduced camera system.  The pose solve is tiny ([6N,6N]) and is
    computed redundantly on every device; landmark back-substitution stays
    local to each shard.  M must be divisible by the mesh's data-axis size.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = "data"

    @se3.f32_matmuls
    def local_ba(R0, t0, lm, obs, valid):
        def step(carry, _):
            R, t, lm = carry
            r, Jp, Jl, w = _residuals_and_jacobians(
                R, t, lm, obs, valid, camera, huber_px
            )
            cost = jax.lax.psum(jnp.sum(w * jnp.sum(r * r, axis=-1)), axis)
            Hpp_l, Hll, Hpl, gp_l, gl = _build_normal_blocks(r, Jp, Jl, w, damping)
            # Local partial Schur pieces -> global via psum (the collective
            # Schur reduction).
            n = Hpp_l.shape[0]
            Hll_inv = jnp.linalg.inv(Hll)
            A = jnp.einsum("nmkl,mlo->nmko", Hpl, Hll_inv)
            S_off = jnp.einsum("nmko,pmlo->npkl", A, Hpl)
            b_l = gp_l - jnp.einsum("nmko,mo->nk", A, gl)
            # NOTE: damping*I was added to Hpp on every shard; correct the
            # overcount so the psum'd Hpp carries exactly one damping term.
            nshards = jax.lax.psum(jnp.ones(()), axis)
            Hpp_corr = Hpp_l - damping * jnp.eye(6) * (1.0 - 1.0 / nshards)
            S = -S_off
            S = S.at[jnp.arange(n), jnp.arange(n)].add(Hpp_corr)
            S = jax.lax.psum(S, axis)
            b = jax.lax.psum(b_l, axis)

            S_flat = S.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
            prior = jnp.zeros(6 * n).at[:6].set(1e8)
            S_flat = S_flat + jnp.diag(prior)
            dx_p = -jnp.linalg.solve(S_flat, b.reshape(-1)).reshape(n, 6)

            rhs = gl + jnp.einsum("nmkl,nk->ml", Hpl, dx_p)
            dx_l = -jnp.einsum("mkl,ml->mk", Hll_inv, rhs)

            dR, dt = se3.exp_se3(dx_p)
            R_new, t_new = se3.compose(dR, dt, R, t)
            return (R_new, t_new, lm + dx_l), cost

        (R, t, lm), costs = jax.lax.scan(step, (R0, t0, lm), None, length=iters)
        return R, t, lm, costs

    sharded = shard_map(
        local_ba,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(None, axis, None), P(None, axis)),
        out_specs=(P(), P(), P(axis), P()),
    )

    def run(problem: BAProblem) -> BAResult:
        R0, t0 = problem.poses
        R, t, lm, costs = jax.jit(sharded)(
            R0, t0, problem.landmarks, problem.obs, problem.valid
        )
        return BAResult(R=R, t=t, landmarks=lm, cost_history=costs)

    return run
