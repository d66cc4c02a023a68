"""End-to-end stereo SLAM test: track a translating camera through a
layered synthetic world using ground-truth disparity, evaluate ATE.

(The network-in-the-loop variant runs in the CLI's ``slam`` command; here
GT disparity isolates tracker correctness from network accuracy.)
"""

import numpy as np
import pytest

from hobot_stereonet_tpu.config import CameraConfig, SLAMConfig
from hobot_stereonet_tpu.data.synthetic import LayeredScene
from hobot_stereonet_tpu.slam.tracker import StereoSLAM, absolute_trajectory_error

CAM = CameraConfig(width=320, height=240, focal_px=300.0, baseline_mm=120.0)


@pytest.fixture(scope="module")
def trajectory_run():
    rng = np.random.default_rng(11)
    scene = LayeredScene(rng, CAM.height, CAM.width, CAM.focal_px, CAM.baseline_m)
    slam = StereoSLAM(
        CAM,
        SLAMConfig(keyframe_translation_m=0.08, ba_iterations=6),
        num_keypoints=256,
    )
    # Smooth sideways + vertical drift trajectory, ~1.2 m total.
    ts = np.linspace(0, 1, 12)
    gt_centers = np.stack(
        [0.6 * ts, 0.12 * np.sin(2 * np.pi * ts), np.zeros_like(ts)], axis=-1
    )
    results = []
    for tx, ty, _ in gt_centers:
        l, r, d = scene.render(float(tx), float(ty))
        results.append(slam.process(l, d))
    return slam, gt_centers, results


def test_tracking_never_lost(trajectory_run):
    slam, gt, results = trajectory_run
    assert all(r["tracked"] for r in results)
    assert slam.state.frames_lost == 0
    # Inliers should be plentiful on clean synthetic frames.
    assert np.median([r["num_inliers"] for r in results[1:]]) > 40


def test_ate_within_bound(trajectory_run):
    slam, gt, results = trajectory_run
    est = np.stack(slam.state.trajectory)
    ate = absolute_trajectory_error(est, gt)
    # 1.2 m trajectory, fronto-parallel world, GT disparity: centimeter-level.
    assert ate < 0.05, f"ATE {ate:.4f} m"


def test_keyframes_created(trajectory_run):
    slam, gt, results = trajectory_run
    assert len(slam.state.keyframes) >= 3


def test_windowed_ba_runs_and_does_not_diverge(trajectory_run):
    slam, gt, results = trajectory_run
    est_before = np.stack(slam.state.trajectory)
    ate_before = absolute_trajectory_error(est_before, gt)
    out = slam.refine_window(window=3)
    assert out is not None
    costs = np.asarray(out["cost"])
    assert costs[-1] <= costs[0] * 1.01
    # Keyframe poses remain finite.
    for kf in slam.state.keyframes:
        assert np.all(np.isfinite(kf.R)) and np.all(np.isfinite(kf.t))
