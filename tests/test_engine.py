"""Streaming engine tests (CPU, small frames): geometry validation,
end-to-end stream processing, metrics, backpressure."""

import numpy as np
import pytest

from hobot_stereonet_tpu.config import (
    CameraConfig,
    Config,
    EngineConfig,
    StereoNetConfig,
)
from hobot_stereonet_tpu.data.stream import Frame, SyntheticStreamSource
from hobot_stereonet_tpu.runtime.engine import StereoEngine


def _small_config(h=64, w=128, **engine_kwargs):
    import jax.numpy as jnp

    return Config(
        camera=CameraConfig(width=w, height=h),
        model=StereoNetConfig(
            feature_channels=8,
            num_feature_res_blocks=1,
            num_aggregation_layers=1,
            aggregation_channels=8,
            num_refinement_res_blocks=1,
            refinement_channels=8,
            max_disparity=32,
            compute_dtype=jnp.float32,
        ),
        engine=EngineConfig(**engine_kwargs) if engine_kwargs else EngineConfig(),
    )


@pytest.fixture(scope="module")
def engine():
    return StereoEngine(_small_config())


def test_feed_rejects_bad_geometry(engine):
    # Wrong buffer size.
    bad = Frame(0.0, np.zeros(100, np.uint8), 64, 256)
    assert engine.feed(bad) is False
    # Wrong dtype.
    n = 64 * 256 * 3 // 2
    bad2 = Frame(0.0, np.zeros(n, np.float32), 64, 256)
    assert engine.feed(bad2) is False
    # Wrong full_width.
    bad3 = Frame(0.0, np.zeros(n, np.uint8), 64, 128)
    assert engine.feed(bad3) is False
    assert engine.metrics.invalid >= 3


def test_run_stream_end_to_end(engine):
    src = SyntheticStreamSource(height=64, width=128, num_frames=5, paced=False)
    results = engine.run_stream(src)
    assert len(results) == 5
    assert sorted(r.index for r in results) == [0, 1, 2, 3, 4]
    r = results[0]
    assert r.disparity.shape == (64, 128)
    assert r.disparity.dtype == np.float32
    assert np.all(r.disparity >= 0)
    assert r.depth_m is not None and np.all(np.isfinite(r.depth_m))
    assert r.gt_disparity is not None
    assert r.e2e_latency_s > 0

    snap = engine.metrics.snapshot()
    assert snap["frames_out"] >= 5
    assert snap["infer_latency"]["mean_ms"] > 0


def test_sync_infer_api(engine, rng):
    l = rng.integers(0, 255, size=(64, 128, 3), dtype=np.uint8)
    r = rng.integers(0, 255, size=(64, 128, 3), dtype=np.uint8)
    disp = engine.infer(l, r)
    assert disp.shape == (64, 128)


def test_drop_on_full():
    cfg = _small_config(feed_queue_depth=1, inflight=1, drop_on_full=True)
    eng = StereoEngine(cfg)
    n = 64 * 256 * 3 // 2
    frames = [
        Frame(0.0, np.zeros(n, np.uint8), 64, 256, index=i) for i in range(20)
    ]
    # Engine NOT started: queue fills, later feeds drop.
    accepted = [eng.feed(f) for f in frames]
    assert accepted[0] is True
    assert not all(accepted)
    assert eng.metrics.dropped > 0
