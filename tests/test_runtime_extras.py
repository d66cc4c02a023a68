"""Eval harness, checkpointing, viz, and CLI tests."""

import json
import os

import numpy as np
import pytest


def test_evaluate_dataset_perfect_model(rng):
    """A fake model that returns the GT must score EPE=0, D1=0."""
    import jax.numpy as jnp

    from hobot_stereonet_tpu.config import Config
    from hobot_stereonet_tpu.data.sceneflow import StereoSample
    from hobot_stereonet_tpu.runtime.evaluate import evaluate_dataset

    gt = rng.uniform(1, 30, size=(32, 64)).astype(np.float32)
    ds = [
        StereoSample(
            left=rng.integers(0, 255, (32, 64, 3), dtype=np.uint8),
            right=rng.integers(0, 255, (32, 64, 3), dtype=np.uint8),
            disparity=gt,
        )
    ]

    gt_dev = jnp.asarray(gt)

    class Oracle:
        def apply(self, params, l, r):
            b, h, w = l.shape[0], l.shape[1], l.shape[2]
            d = jnp.zeros((b, h, w)) + jnp.pad(
                gt_dev, ((0, h - 32), (0, w - 64))
            )
            return {"disparity": d}

    res = evaluate_dataset(Oracle(), {}, ds, Config())
    assert res.epe < 1e-5
    assert res.d1_all == 0.0
    assert res.n_frames == 1


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hobot_stereonet_tpu.runtime import checkpoint as ckpt

    params = {
        "dense": {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
                  "b": jnp.ones((4,))},
    }
    path = str(tmp_path / "ckpt")
    ckpt.save_params(path, params)
    back = ckpt.load_params(path, like=params)
    np.testing.assert_array_equal(np.asarray(back["dense"]["w"]),
                                  np.asarray(params["dense"]["w"]))


def test_train_state_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import checkpoint as ckpt
    from hobot_stereonet_tpu.runtime import training
    from tests.test_model import SMALL

    model = FastStereoNet(SMALL)
    opt = training.make_optimizer()
    x = jnp.zeros((1, 16, 32, 3))
    state = training.create_train_state(model, jax.random.PRNGKey(0), opt, x, x)
    path = str(tmp_path / "ts")
    ckpt.save_train_state(path, state)
    back = ckpt.load_train_state(path, like=state)
    assert int(back.step) == int(state.step)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(back.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_viz_colormap(rng):
    from hobot_stereonet_tpu.viz import colormap as cm

    disp = rng.uniform(0, 28, size=(16, 24)).astype(np.float32)
    rgb = cm.colorize_disparity(disp)
    assert rgb.shape == (16, 24, 3) and rgb.dtype == np.uint8
    # Low values -> blue dominant; high -> red dominant (JET ends).
    lo = cm.jet_colormap(np.zeros((1, 1), np.uint8))
    hi = cm.jet_colormap(np.full((1, 1), 255, np.uint8))
    assert lo[0, 0, 2] > lo[0, 0, 0]  # blue end
    assert hi[0, 0, 0] > hi[0, 0, 2]  # red end

    left = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    comp = cm.render_result(left, disp)
    assert comp.shape == (32, 24, 3)


def test_viz_save_png(tmp_path, rng):
    from hobot_stereonet_tpu.viz import colormap as cm

    rgb = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    cm.save_png(p, rgb)
    from PIL import Image

    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, rgb)


def test_cli_eval_synthetic(capsys):
    from hobot_stereonet_tpu.cli import main

    rc = main(["eval", "--dataset", "synthetic", "--frames", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "epe_px" in out and out["n_frames"] == 1


def test_cli_infer_roundtrip(tmp_path, capsys, rng):
    from PIL import Image

    from hobot_stereonet_tpu.cli import main

    l = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    r = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    lp, rp = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    Image.fromarray(l).save(lp)
    Image.fromarray(r).save(rp)
    out_png = str(tmp_path / "out.png")
    rc = main(["infer", "--left", lp, "--right", rp, "--out", out_png])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["shape"] == [64, 96]
    assert os.path.exists(out_png)


def test_cli_train_tiny(capsys):
    from hobot_stereonet_tpu.cli import main

    rc = main(["train", "--steps", "2", "--batch", "1", "--log-every", "1"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rep["steps"] == 2 and np.isfinite(rep["final_loss"])


def test_golden_dump_and_compare(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from hobot_stereonet_tpu.models import FastStereoNet
    from hobot_stereonet_tpu.runtime import golden
    from tests.test_model import SMALL

    model = FastStereoNet(SMALL)
    l = rng.integers(0, 255, (16, 32, 3), dtype=np.uint8)
    r = rng.integers(0, 255, (16, 32, 3), dtype=np.uint8)
    x = jnp.zeros((1, 16, 32, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)

    p1 = str(tmp_path / "a.npz")
    t1 = golden.dump_pipeline(model, params, l, r, path=p1)
    assert "disparity" in t1 and len(t1) > 5
    ok, report = golden.compare(golden.load_dump(p1), t1)
    assert ok, {k: v for k, v in report.items() if v["status"] != "ok"}
    # Perturb one tensor -> mismatch detected.
    t2 = dict(t1)
    t2["disparity"] = t1["disparity"] + 1.0
    ok2, report2 = golden.compare(t1, t2)
    assert not ok2
    assert report2["disparity"]["status"] == "mismatch"


def test_golden_compare_shape_semantics(rng):
    """Same-size shape mismatches (ADVICE r4): when BOTH sides carry
    authoritative multi-dim shapes, a layout bug (e.g. NCHW vs NHWC) is a
    hard shape error; flat fallback only applies against a 1-D raw-.bin
    side."""
    from hobot_stereonet_tpu.runtime import golden

    a = rng.standard_normal((2, 6)).astype(np.float32)
    # Both shaped, same size, different layout -> shape error.
    ok, rep = golden.compare({"t": a}, {"t": a.reshape(6, 2)})
    assert not ok and rep["t"]["status"] == "shape"
    # One side flat (raw .bin load) -> flat value compare still works.
    ok2, rep2 = golden.compare({"t": a}, {"t": a.ravel()})
    assert ok2 and rep2["t"].get("flat_compare") is True


def test_threaded_capture_stops_on_early_close():
    """Closing the feed iterator early must stop the capture thread
    promptly — an unbounded paced source would otherwise be decoded
    forever (ADVICE r4)."""
    import time

    from hobot_stereonet_tpu.data.stream import (SyntheticStreamSource,
                                                 ThreadedCaptureSource)

    src = ThreadedCaptureSource(
        SyntheticStreamSource(height=32, width=64, num_frames=0, paced=True,
                              fps=60),
        use_native=False,
    )
    it = iter(src)
    for _ in range(3):
        next(it)
    t0 = time.perf_counter()
    it.close()
    assert time.perf_counter() - t0 < 3.0


def test_slam_map_save_load(tmp_path, rng):
    from hobot_stereonet_tpu.config import CameraConfig, SLAMConfig
    from hobot_stereonet_tpu.data.synthetic import LayeredScene
    from hobot_stereonet_tpu.slam.tracker import StereoSLAM, load_map, save_map

    cam = CameraConfig(width=160, height=120, focal_px=150.0)
    scene = LayeredScene(np.random.default_rng(2), 120, 160, 150.0, cam.baseline_m)
    slam = StereoSLAM(cam, SLAMConfig(keyframe_translation_m=0.05), num_keypoints=128)
    for tx in [0.0, 0.06, 0.12]:
        l, _, d = scene.render(tx, 0.0)
        slam.process(l, d)
    path = str(tmp_path / "map.npz")
    save_map(path, slam)

    slam2 = StereoSLAM(cam, SLAMConfig(keyframe_translation_m=0.05), num_keypoints=128)
    load_map(path, slam2)
    assert len(slam2.state.keyframes) == len(slam.state.keyframes)
    np.testing.assert_allclose(
        slam2.state.keyframes[-1].points_w, slam.state.keyframes[-1].points_w
    )
    # Resumed tracker keeps tracking against the restored map.
    l, _, d = scene.render(0.15, 0.0)
    out = slam2.process(l, d)
    assert out["tracked"]


def test_stage_timer():
    import time as _t

    from hobot_stereonet_tpu.utils.profiling import StageTimer, device_trace

    t = StageTimer()
    with t.stage("a"):
        _t.sleep(0.01)
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_ms"] >= 10
    with device_trace(None):
        pass  # no-op path


def test_cli_infer_nv12_files(tmp_path, capsys, rng):
    """Raw .nv12 replay path (reference RunBinFeedInfer analog)."""
    import jax.numpy as jnp

    from hobot_stereonet_tpu.cli import main
    from hobot_stereonet_tpu.ops import colorspace as cs

    h, w = 64, 128
    l = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    r = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    lp, rp = str(tmp_path / "l.nv12"), str(tmp_path / "r.nv12")
    np.asarray(cs.bgr_to_nv12(jnp.asarray(l[..., ::-1]))).astype(np.uint8).tofile(lp)
    np.asarray(cs.bgr_to_nv12(jnp.asarray(r[..., ::-1]))).astype(np.uint8).tofile(rp)
    rc = main(["infer", "--left", lp, "--right", rp,
               "--nv12-width", str(w), "--nv12-height", str(h)])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["shape"] == [h, w]

    # Wrong geometry must fail loudly, not silently misparse.
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["infer", "--left", lp, "--right", rp,
              "--nv12-width", "640", "--nv12-height", "480"])
