"""Compiled-artifact (.stereoblob) tests: the .hbm-analog deployment path.

The artifact must reproduce the in-process pipeline bit-for-bit on the
same platform (it is literally the same traced program, serialized), pad
partial batches to the exported bucket, and refuse wrong geometry.
"""

import dataclasses
import json
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobot_stereonet_tpu.config import Config
from hobot_stereonet_tpu.models import FastStereoNet
from hobot_stereonet_tpu.runtime.artifact import (
    CompiledStereoArtifact, export_artifact)


H, W = 64, 128


@pytest.fixture(scope="module")
def small():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, width=W, height=H),
        model=dataclasses.replace(cfg.model, compute_dtype=jnp.float32),
    )
    model = FastStereoNet(cfg.model)
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
    return cfg, model, params


@pytest.fixture(scope="module")
def blob_path(small, tmp_path_factory):
    cfg, model, params = small
    path = str(tmp_path_factory.mktemp("art") / "model.stereoblob")
    manifest = export_artifact(path, model, params, cfg, buckets=(1, 4),
                               platforms=("cpu",))
    assert manifest["buckets"] == [1, 4]
    return path


def test_manifest_is_inspectable(blob_path):
    # Plain zip + JSON manifest (unlike the reference's opaque .hbm).
    with zipfile.ZipFile(blob_path) as z:
        names = set(z.namelist())
        assert "manifest.json" in names
        assert {"nv12_b1.stablehlo", "nv12_b4.stablehlo",
                "rgb_b1.stablehlo", "rgb_b4.stablehlo"} <= names
        m = json.loads(z.read("manifest.json"))
    assert m["height"] == H and m["width"] == W
    assert m["config"]["camera"]["height"] == H


def test_rgb_matches_live_pipeline(small, blob_path, rng):
    cfg, model, params = small
    l = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    r = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)

    with CompiledStereoArtifact(blob_path) as art:
        got = art.infer(l, r)

    to_in = lambda u: (jnp.asarray(u, jnp.float32)[None] - 128.0) / 128.0
    want = np.asarray(
        jax.jit(model.apply)(params, to_in(l), to_in(r))["disparity"][0]
    )
    # Same math, but a separately-lowered program: XLA fusion order may
    # differ, so agreement is to f32 round-off, not bit-exact.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-3)


def test_nv12_entry_and_bucket_padding(small, blob_path, rng):
    cfg, _, _ = small
    frame_len = H * (2 * W) * 3 // 2
    batch = rng.integers(0, 256, (3, frame_len), dtype=np.uint8)  # pads to 4

    with CompiledStereoArtifact(blob_path) as art:
        disp, depth = art.run_nv12(batch)
    assert disp.shape == (3, H, W) and depth.shape == (3, H, W)
    assert np.isfinite(depth).all()

    # Padding must not perturb real frames: batch-1 entry on frame 0 agrees
    # (different lowered program => f32 round-off tolerance).
    with CompiledStereoArtifact(blob_path) as art:
        d0, _ = art.run_nv12(batch[:1])
    np.testing.assert_allclose(disp[0], d0[0], rtol=2e-4, atol=5e-3)


def test_oversize_batch_and_bad_geometry_rejected(small, blob_path, rng):
    frame_len = H * (2 * W) * 3 // 2
    with CompiledStereoArtifact(blob_path) as art:
        with pytest.raises(ValueError, match="exceeds largest"):
            art.run_nv12(np.zeros((5, frame_len), np.uint8))

    # CLI guards geometry before calling into the artifact.
    from hobot_stereonet_tpu.cli import main as cli_main
    from PIL import Image
    import tempfile, os

    d = tempfile.mkdtemp()
    bad = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    lp = os.path.join(d, "l.png")
    Image.fromarray(bad).save(lp)
    with pytest.raises(SystemExit, match="artifact geometry"):
        cli_main(["infer", "--left", lp, "--right", lp,
                  "--artifact", blob_path])
