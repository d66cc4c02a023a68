"""Through-the-engine benchmark helper (runtime/benchmark.py) — the core
bench.py and scripts/frontier.py share.  Tiny geometry; CPU backend."""

import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.config import StereoNetConfig
from hobot_stereonet_tpu.runtime.benchmark import measure_engine_fps


def _tiny():
    return StereoNetConfig(
        feature_channels=8, num_feature_res_blocks=1,
        num_aggregation_layers=1, aggregation_channels=8,
        max_disparity=32, compute_dtype=jnp.float32,
    )


def test_measure_engine_fps_basic():
    r = measure_engine_fps(model_cfg=_tiny(), batch=4, n_batches=2,
                           height=64, width=128)
    assert r["frames_in"] == 8 and r["frames_out"] == 8
    assert r["fps"] > 0 and r["dispatch_batch_mean"] == 4.0
    assert r["nan_dropped"] == 0  # reported, never asserted away internally
    assert r["geometry"] == "128x64" and r["int8"] is False


def test_measure_engine_fps_stage_timing():
    r = measure_engine_fps(model_cfg=_tiny(), batch=4, n_batches=2,
                           height=64, width=128, stage_timing=True)
    # The rt_stat-analog split must be present and account for real time.
    assert "preprocess_ms" in r and "network_ms" in r
    assert r["preprocess_ms"] > 0 and r["network_ms"] > 0


def test_measure_engine_fps_microbatch_bitexact_frames():
    """device_microbatch serving must still emit every frame."""
    r = measure_engine_fps(model_cfg=_tiny(), batch=4, n_batches=2,
                           height=64, width=128, device_microbatch=2)
    assert r["frames_out"] == 8
