"""CLI (`stereod`) end-to-end tests.

The reference drives everything through launch files + ros2 run with no
executed tests (SURVEY.md §4); here every subcommand is a plain function
returning an exit code, so the whole user surface is testable on the CPU
mesh.  Sizes are kept tiny via --config (Config JSON round-trip) so each
test compiles in seconds.
"""

import dataclasses
import json
import os

import numpy as np
import pytest
from PIL import Image

from hobot_stereonet_tpu.cli import main as cli_main
from hobot_stereonet_tpu.config import Config


@pytest.fixture(scope="module")
def small_cfg_json(tmp_path_factory):
    """A Config JSON with a tiny camera + fp32 compute (CPU-friendly)."""
    import jax.numpy as jnp

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, width=128, height=64),
        model=dataclasses.replace(cfg.model, compute_dtype=jnp.float32),
    )
    path = tmp_path_factory.mktemp("cfg") / "small.json"
    cfg.save_json(str(path))
    return str(path)


@pytest.fixture(scope="module")
def png_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, size=(64, 128, 3), dtype=np.uint8)
    lp, rp = str(d / "l.png"), str(d / "r.png")
    Image.fromarray(base).save(lp)
    # Right view: shift left view 4 px (a crude constant disparity).
    Image.fromarray(np.roll(base, -4, axis=1)).save(rp)
    return lp, rp


def test_infer_json_and_png(png_pair, small_cfg_json, tmp_path, capsys):
    lp, rp = png_pair
    out_png = str(tmp_path / "composite.png")
    rc = cli_main(["infer", "--left", lp, "--right", rp, "--out", out_png,
                   "--config", small_cfg_json])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["shape"] == [64, 128]
    assert payload["disparity_px"]["max"] >= payload["disparity_px"]["min"]
    # Render-node composite: left over depth, doubled height.
    img = np.asarray(Image.open(out_png))
    assert img.shape[0] == 2 * 64 and img.shape[2] == 3


def test_infer_missing_file_is_error_not_traceback(small_cfg_json, capsys):
    rc = cli_main(["infer", "--left", "/nonexistent/l.png",
                   "--right", "/nonexistent/r.png",
                   "--config", small_cfg_json])
    assert rc == 2
    assert "error" in capsys.readouterr().err


def test_eval_with_determinism_check(small_cfg_json, capsys):
    rc = cli_main(["eval", "--dataset", "synthetic", "--frames", "2",
                   "--config", small_cfg_json, "--check-determinism"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["deterministic"] is True
    assert payload["n_frames"] == 2
    assert payload["epe_px"] > 0


def test_eval_unknown_dataset_rc2(small_cfg_json, capsys):
    with pytest.raises(SystemExit):  # argparse choices reject it
        cli_main(["eval", "--dataset", "nope", "--config", small_cfg_json])
    capsys.readouterr()


def test_train_checkpoint_then_infer_with_it(png_pair, small_cfg_json,
                                             tmp_path, capsys):
    ck = str(tmp_path / "ck")
    rc = cli_main(["train", "--steps", "2", "--batch", "1", "--log-every", "1",
                   "--checkpoint", ck, "--config", small_cfg_json])
    assert rc == 0
    # Training logs progress lines before the final JSON — parse the last line.
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["steps"] == 2 and np.isfinite(metrics["final_loss"])
    assert os.path.isdir(ck)

    lp, rp = png_pair
    rc = cli_main(["infer", "--left", lp, "--right", rp,
                   "--checkpoint", ck, "--config", small_cfg_json])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["shape"] == [64, 128]


def test_dump_compare_roundtrip(png_pair, small_cfg_json, tmp_path, capsys):
    lp, rp = png_pair
    dump = str(tmp_path / "golden.npz")
    rc = cli_main(["dump", "--left", lp, "--right", rp, "--out", dump,
                   "--config", small_cfg_json])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["tensors"] > 0 and os.path.exists(dump)

    # Self-compare must match bit-exactly.
    rc = cli_main(["compare", dump, dump])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["match"] is True


def test_config_json_controls_engine_geometry(small_cfg_json, capsys):
    """--config is the SetNodePara analog: the camera geometry in the JSON
    must reach the engine (stream source inherits engine camera size)."""
    rc = cli_main(["stream", "--frames", "2", "--unpaced",
                   "--config", small_cfg_json])
    assert rc == 0
    snap = json.loads(capsys.readouterr().out)
    assert snap["frames_out"] >= 1


def test_stream_image_list_replay_through_ring(png_pair, small_cfg_json,
                                               tmp_path, capsys):
    """`stereod stream --left-list/--right-list` replays image pairs (the
    RunImglistFeedInfer analog) through the capture-thread frame ring."""
    lp, rp = png_pair
    llist = tmp_path / "left.list"
    rlist = tmp_path / "right.list"
    llist.write_text(f"{lp}\n{lp}\n{lp}\n")
    rlist.write_text(f"# comment\n{rp}\n{rp}\n{rp}\n")
    rc = cli_main(["stream", "--left-list", str(llist),
                   "--right-list", str(rlist), "--unpaced",
                   "--config", small_cfg_json, "--checkpoint", "none"])
    assert rc == 0
    snap = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert snap["frames_out"] == 3
