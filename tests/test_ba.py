"""Bundle adjustment tests: synthetic multi-view problems with known
ground truth, single-device and landmark-sharded distributed variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobot_stereonet_tpu.config import CameraConfig, MeshConfig
from hobot_stereonet_tpu.parallel import mesh as mesh_mod
from hobot_stereonet_tpu.slam import se3
from hobot_stereonet_tpu.slam.ba import (
    BAProblem,
    bundle_adjust,
    make_distributed_bundle_adjust,
)
from hobot_stereonet_tpu.slam.odometry import project

CAM = CameraConfig(width=640, height=480, focal_px=500.0, baseline_mm=120.0)


def _make_problem(rng, n_poses=4, n_landmarks=64, pose_noise=0.02,
                  lm_noise=0.05, px_noise=0.0):
    lm_gt = np.stack(
        [rng.uniform(-4, 4, n_landmarks), rng.uniform(-3, 3, n_landmarks),
         rng.uniform(6, 20, n_landmarks)], axis=-1
    ).astype(np.float32)
    xi_gt = np.zeros((n_poses, 6), np.float32)
    for i in range(1, n_poses):
        xi_gt[i] = xi_gt[i - 1] + np.r_[
            rng.uniform(-0.15, 0.15, 3), rng.uniform(-0.04, 0.04, 3)
        ].astype(np.float32)
    R_gt, t_gt = se3.exp_se3(jnp.asarray(xi_gt))

    pc = jnp.einsum("nij,mj->nmi", R_gt, jnp.asarray(lm_gt)) + t_gt[:, None, :]
    obs, _ = project(pc, CAM)
    obs = np.array(obs)  # writable copy
    if px_noise > 0:
        obs = obs + rng.normal(0, px_noise, obs.shape).astype(np.float32)
    valid = (
        (obs[..., 0] > 0) & (obs[..., 0] < CAM.width)
        & (obs[..., 1] > 0) & (obs[..., 1] < CAM.height)
        & (np.asarray(pc)[..., 2] > 0.1)
    )

    # Perturbed initialization (pose 0 exact: it is the gauge).
    xi0 = xi_gt.copy()
    xi0[1:] += rng.normal(0, pose_noise, (n_poses - 1, 6)).astype(np.float32)
    R0, t0 = se3.exp_se3(jnp.asarray(xi0))
    lm0 = lm_gt + rng.normal(0, lm_noise, lm_gt.shape).astype(np.float32)

    problem = BAProblem(
        poses=(R0, t0),
        landmarks=jnp.asarray(lm0),
        obs=jnp.asarray(obs),
        valid=jnp.asarray(valid),
    )
    return problem, (R_gt, t_gt), jnp.asarray(lm_gt)


def test_ba_reduces_cost_and_recovers_poses(rng):
    problem, (R_gt, t_gt), lm_gt = _make_problem(rng)
    res = bundle_adjust(problem, CAM, iters=12)
    costs = np.asarray(res.cost_history)
    assert costs[-1] < costs[0] * 1e-3
    rot_err, trans_err = se3.relative_pose_error(res.R, res.t, R_gt, t_gt)
    assert float(jnp.max(rot_err)) < 1e-3
    assert float(jnp.max(trans_err)) < 5e-3
    lm_err = jnp.linalg.norm(res.landmarks - lm_gt, axis=-1)
    assert float(jnp.median(lm_err)) < 2e-2  # damping biases landmarks slightly


def test_ba_noisy_observations(rng):
    problem, (R_gt, t_gt), _ = _make_problem(rng, px_noise=0.5)
    res = bundle_adjust(problem, CAM, iters=12)
    rot_err, trans_err = se3.relative_pose_error(res.R, res.t, R_gt, t_gt)
    assert float(jnp.max(rot_err)) < 0.01
    assert float(jnp.max(trans_err)) < 0.05


def test_ba_gauge_fixed(rng):
    problem, (R_gt, t_gt), _ = _make_problem(rng)
    res = bundle_adjust(problem, CAM, iters=8)
    # Pose 0 must stay at its initialization (the gauge).
    np.testing.assert_allclose(
        np.asarray(res.R[0]), np.asarray(problem.poses[0][0]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res.t[0]), np.asarray(problem.poses[1][0]), atol=1e-4
    )


def test_distributed_ba_matches_single_device(eight_devices, rng):
    """Landmark-sharded BA over 8 devices == single-device BA."""
    problem, (R_gt, t_gt), lm_gt = _make_problem(rng, n_landmarks=64)
    res_single = bundle_adjust(problem, CAM, iters=8)

    mesh = mesh_mod.make_mesh(MeshConfig(data=8, tile=1))
    run = make_distributed_bundle_adjust(mesh, CAM, iters=8)
    res_dist = run(problem)

    np.testing.assert_allclose(
        np.asarray(res_dist.R), np.asarray(res_single.R), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(res_dist.t), np.asarray(res_single.t), atol=1e-4
    )
    # Landmarks see float32 psum-ordering noise amplified over GN
    # iterations; compare at 1e-2 relative (poses above pin 1e-4 absolute).
    np.testing.assert_allclose(
        np.asarray(res_dist.landmarks), np.asarray(res_single.landmarks),
        rtol=1e-2, atol=1e-2,
    )
    # And it solves the problem.
    rot_err, trans_err = se3.relative_pose_error(res_dist.R, res_dist.t, R_gt, t_gt)
    assert float(jnp.max(rot_err)) < 1e-3
