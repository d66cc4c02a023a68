"""Dataset loader tests against synthesized on-disk layouts (no real
datasets in this environment — the layouts themselves are the contract)."""

import os

import numpy as np
import pytest
from PIL import Image

from hobot_stereonet_tpu.data.kitti import Kitti2015Dataset, read_kitti_disparity
from hobot_stereonet_tpu.data.kitti_odometry import (
    KittiOdometrySequence,
    read_calib,
    read_poses,
)
from hobot_stereonet_tpu.data.sceneflow import SceneFlowDataset, write_pfm


def _save(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_sceneflow_layout(tmp_path, rng):
    root = str(tmp_path / "sf")
    img = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
    disp = rng.uniform(1, 40, (32, 64)).astype(np.float32)
    scene = "frames_cleanpass/TRAIN/A/0001"
    _save(f"{root}/{scene}/left/0006.png", img)
    _save(f"{root}/{scene}/right/0006.png", img)
    os.makedirs(f"{root}/disparity/TRAIN/A/0001/left", exist_ok=True)
    write_pfm(f"{root}/disparity/TRAIN/A/0001/left/0006.pfm", disp)

    ds = SceneFlowDataset(root)
    assert len(ds) == 1
    s = ds[0]
    np.testing.assert_array_equal(s.left, img)
    np.testing.assert_allclose(s.disparity, disp, rtol=1e-6)


def test_sceneflow_missing_root(tmp_path):
    with pytest.raises(FileNotFoundError):
        SceneFlowDataset(str(tmp_path / "nope"))


def test_kitti2015_layout(tmp_path, rng):
    root = str(tmp_path / "kitti")
    img = rng.integers(0, 255, (24, 48, 3), dtype=np.uint8)
    disp_px = rng.uniform(1, 60, (24, 48)).astype(np.float32)
    raw = (disp_px * 256).astype(np.uint16)
    raw[0, :5] = 0  # invalid pixels
    _save(f"{root}/training/image_2/000000_10.png", img)
    _save(f"{root}/training/image_3/000000_10.png", img)
    os.makedirs(f"{root}/training/disp_occ_0", exist_ok=True)
    Image.fromarray(raw).save(f"{root}/training/disp_occ_0/000000_10.png")

    d, valid = read_kitti_disparity(f"{root}/training/disp_occ_0/000000_10.png")
    np.testing.assert_allclose(d[valid], disp_px[valid], atol=1 / 256)
    assert not valid[0, :5].any()

    ds = Kitti2015Dataset(root)
    assert len(ds) == 1
    s = ds[0]
    assert s.disparity[0, 0] == 0.0  # invalid -> 0
    np.testing.assert_array_equal(s.left, img)


def test_kitti_odometry_layout(tmp_path, rng):
    root = str(tmp_path / "odo")
    img = rng.integers(0, 255, (24, 48, 3), dtype=np.uint8)
    for i in range(3):
        _save(f"{root}/sequences/00/image_2/{i:06d}.png", img)
        _save(f"{root}/sequences/00/image_3/{i:06d}.png", img)
    f, b = 718.856, 0.5371657
    with open(f"{root}/sequences/00/calib.txt", "w") as fh:
        p2 = f"{f} 0 607.19 0  0 {f} 185.2 0  0 0 1 0"
        p3 = f"{f} 0 607.19 {-f*b}  0 {f} 185.2 0  0 0 1 0"
        fh.write(f"P0: {p2}\nP1: {p3}\nP2: {p2}\nP3: {p3}\n")
    os.makedirs(f"{root}/poses", exist_ok=True)
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1))
    poses[:, 0, 3] = [0.0, 1.0, 2.0]  # moving in x
    np.savetxt(f"{root}/poses/00.txt", poses.reshape(3, 12))

    seq = KittiOdometrySequence(root, "00")
    assert len(seq) == 3
    assert abs(seq.camera.focal_px - f) < 1e-3
    assert abs(seq.camera.baseline_m - b) < 1e-5
    fr = seq[1]
    assert fr.gt_pose is not None
    centers = seq.gt_centers()
    np.testing.assert_allclose(centers[:, 0], [0, 1, 2], atol=1e-6)
