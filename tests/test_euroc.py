"""EuRoC ASL loader: sensor.yaml parsing, Bouguet rectification geometry,
and the on-disk layout contract (synthesized tree — no real dataset here)."""

import os

import numpy as np
from PIL import Image

from hobot_stereonet_tpu.data.euroc import (
    EurocCamera,
    EurocSequence,
    read_sensor_yaml,
    rectify_map,
    remap_bilinear,
    stereo_rectify,
)


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def _cam(t_bs, intr, res=(64, 48), dist=(0.0, 0.0, 0.0, 0.0)):
    return EurocCamera(
        T_BS=np.asarray(t_bs, np.float64),
        intrinsics=np.asarray(intr, np.float64),
        distortion=np.asarray(dist, np.float64),
        resolution=res,
    )


def test_rectify_geometry_epipolar_and_disparity(rng):
    """After rectification of a converged (rotated) rig, any 3D point must
    land on the SAME row in both views with disparity f*B/z."""
    t0 = np.eye(4)
    t1 = np.eye(4)
    t1[:3, :3] = _roty(0.03) @ _rotz(0.01)  # slightly converged right camera
    t1[:3, 3] = [0.11, 0.002, -0.001]
    cam0 = _cam(t0, [100.0, 100.0, 31.5, 23.5])
    cam1 = _cam(t1, [102.0, 101.0, 30.0, 24.0])

    r0, r1, k, baseline = stereo_rectify(cam0, cam1)
    assert abs(baseline - np.linalg.norm(t1[:3, 3])) < 1e-12
    # Rectifying rotations are orthonormal.
    np.testing.assert_allclose(r0 @ r0.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(r1 @ r1.T, np.eye(3), atol=1e-12)
    # Baseline maps onto +x of the rectified frame.
    np.testing.assert_allclose(r0 @ t1[:3, 3], [baseline, 0, 0], atol=1e-12)

    t_10 = np.linalg.inv(t1) @ t0  # cam1-from-cam0
    pts = rng.uniform([-0.5, -0.4, 1.0], [0.5, 0.4, 6.0], size=(64, 3))
    for p in pts:
        pr0 = r0 @ p
        pr1 = r1 @ (t_10[:3, :3] @ p + t_10[:3, 3])
        u0 = k[0] * pr0[0] / pr0[2] + k[2]
        v0 = k[1] * pr0[1] / pr0[2] + k[3]
        u1 = k[0] * pr1[0] / pr1[2] + k[2]
        v1 = k[1] * pr1[1] / pr1[2] + k[3]
        assert abs(v0 - v1) < 1e-9  # epipolar-aligned rows
        assert abs((u0 - u1) - k[0] * baseline / pr0[2]) < 1e-9
        assert u0 - u1 > 0  # left-camera disparity is positive


def test_rectify_map_identity_rig(rng):
    """For an already-rectified, distortion-free rig whose principal point is
    the image center, the remap is the identity."""
    t1 = np.eye(4)
    t1[0, 3] = 0.11
    cam0 = _cam(np.eye(4), [100.0, 100.0, 31.5, 23.5])
    cam1 = _cam(t1, [100.0, 100.0, 31.5, 23.5])
    r0, r1, k, _ = stereo_rectify(cam0, cam1)
    mx, my = rectify_map(cam0, r0, k)
    u, v = np.meshgrid(np.arange(64, dtype=np.float32), np.arange(48, dtype=np.float32))
    np.testing.assert_allclose(mx, u, atol=1e-4)
    np.testing.assert_allclose(my, v, atol=1e-4)

    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    np.testing.assert_array_equal(remap_bilinear(img, mx, my), img)


def _write_sensor_yaml(path, t_bs, intr, res, dist):
    rows = ",\n         ".join(
        ", ".join(f"{v}" for v in t_bs[r]) for r in range(4)
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(
            "sensor_type: camera\n"
            "T_BS:\n  cols: 4\n  rows: 4\n"
            f"  data: [{rows}]\n"
            "rate_hz: 20\n"
            f"resolution: [{res[0]}, {res[1]}]\n"
            "camera_model: pinhole\n"
            f"intrinsics: [{', '.join(map(str, intr))}]\n"
            "distortion_model: radial-tangential\n"
            f"distortion_coefficients: [{', '.join(map(str, dist))}]\n"
        )


def test_euroc_sequence_layout(tmp_path, rng):
    root = str(tmp_path / "MH_01_easy")
    mav = os.path.join(root, "mav0")
    res, intr = (64, 48), [100.0, 100.0, 31.5, 23.5]
    t1 = np.eye(4)
    t1[0, 3] = 0.11
    _write_sensor_yaml(f"{mav}/cam0/sensor.yaml", np.eye(4), intr, res, [0.0] * 4)
    _write_sensor_yaml(f"{mav}/cam1/sensor.yaml", t1, intr, res, [0.0] * 4)

    ts = [1403636579763555584, 1403636579813555456, 1403636579863555584]
    imgs = []
    for t in ts:
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        imgs.append(img)
        for cam in ("cam0", "cam1"):
            os.makedirs(f"{mav}/{cam}/data", exist_ok=True)
            Image.fromarray(img).save(f"{mav}/{cam}/data/{t}.png")

    # GT at 200 Hz around the first two frames only; third frame uncovered.
    os.makedirs(f"{mav}/state_groundtruth_estimate0", exist_ok=True)
    with open(f"{mav}/state_groundtruth_estimate0/data.csv", "w") as f:
        f.write("#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
                "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []\n")
        for i, t in enumerate(ts[:2]):
            f.write(f"{t + 1000000},{0.1 * i},{0.2 * i},0.0,1.0,0.0,0.0,0.0\n")

    seq = EurocSequence(str(tmp_path), "MH_01_easy")
    assert len(seq) == 3
    assert abs(seq.camera.focal_px - 100.0) < 1e-9
    assert abs(seq.camera.baseline_m - 0.11) < 1e-9
    assert (seq.camera.width, seq.camera.height) == res

    fr = seq[0]
    # Identity rig + center principal point => rectified frame == raw frame.
    np.testing.assert_array_equal(fr.left[..., 0], imgs[0])
    np.testing.assert_array_equal(fr.right[..., 0], imgs[0])
    assert fr.gt_pose is not None and np.isfinite(fr.gt_pose).all()
    np.testing.assert_allclose(seq[1].gt_pose[:3, 3], [0.1, 0.2, 0.0], atol=1e-6)
    assert seq[2].gt_pose is None  # outside GT tolerance window

    centers = seq.gt_centers()
    assert np.isfinite(centers[:2]).all() and not np.isfinite(centers[2]).any()


def test_open_sequence_autodetect(tmp_path):
    from hobot_stereonet_tpu.slam.run import open_sequence

    root = str(tmp_path / "V1_01")
    mav = os.path.join(root, "mav0")
    res, intr = (16, 16), [10.0, 10.0, 7.5, 7.5]
    t1 = np.eye(4)
    t1[0, 3] = 0.11
    _write_sensor_yaml(f"{mav}/cam0/sensor.yaml", np.eye(4), intr, res, [0.0] * 4)
    _write_sensor_yaml(f"{mav}/cam1/sensor.yaml", t1, intr, res, [0.0] * 4)
    img = np.zeros((16, 16), dtype=np.uint8)
    for cam in ("cam0", "cam1"):
        os.makedirs(f"{mav}/{cam}/data", exist_ok=True)
        Image.fromarray(img).save(f"{mav}/{cam}/data/100.png")

    seq = open_sequence(str(tmp_path), "V1_01")
    assert isinstance(seq, EurocSequence)
    seq2 = open_sequence(root)  # root IS the sequence dir
    assert isinstance(seq2, EurocSequence) and len(seq2) == 1


def test_sensor_yaml_roundtrip(tmp_path):
    t_bs = np.eye(4)
    t_bs[:3, 3] = [0.01, -0.02, 0.03]
    path = str(tmp_path / "sensor.yaml")
    _write_sensor_yaml(path, t_bs, [458.654, 457.296, 367.215, 248.375],
                       (752, 480), [-0.28, 0.07, 0.00019, 1.76e-05])
    cam = read_sensor_yaml(path)
    np.testing.assert_allclose(cam.T_BS, t_bs)
    np.testing.assert_allclose(cam.intrinsics, [458.654, 457.296, 367.215, 248.375])
    np.testing.assert_allclose(cam.distortion, [-0.28, 0.07, 0.00019, 1.76e-05])
    assert cam.resolution == (752, 480)
