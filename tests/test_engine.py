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


def test_emit_confidence_ships_per_result():
    """emit_confidence=True rides the soft-argmin peak probability (already
    computed by the model) out through StereoResult at 1/8 res, in [0,1];
    default engines ship no confidence tensor."""
    eng = StereoEngine(_small_config(), emit_confidence=True)
    src = SyntheticStreamSource(height=64, width=128, num_frames=3, paced=False)
    results = eng.run_stream(src)
    assert len(results) == 3
    for r in results:
        c = np.asarray(r.confidence)
        assert c.shape == (64 // 8, 128 // 8)
        assert np.all((c >= 0.0) & (c <= 1.0))
    # Default: absent, not a zero-filled tensor.
    eng2 = StereoEngine(_small_config())
    src2 = SyntheticStreamSource(height=64, width=128, num_frames=1, paced=False)
    assert eng2.run_stream(src2)[0].confidence is None


def test_drain_raises_on_dead_worker():
    """A worker thread that dies (e.g. device OOM mid-dispatch) must surface
    as an exception from drain()/results(), not leave the caller spinning on
    a pipeline that can never go idle (found via a real on-chip OOM that
    hung the driver bench)."""
    cfg = _small_config()
    eng = StereoEngine(cfg)

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    eng._pipeline = boom
    eng._pipeline_ring = boom
    n = 64 * 256 * 3 // 2
    eng.feed(Frame(0.0, np.zeros(n, np.uint8), 64, 256, index=0))
    eng.start(warmup=False)
    try:
        with pytest.raises(RuntimeError, match="worker thread died"):
            eng.drain()
        # results() must also terminate with the error, not iterate forever.
        with pytest.raises(RuntimeError, match="worker thread died"):
            list(eng.results(timeout=0.1))
    finally:
        eng.stop()


def test_micro_batching_under_load():
    """When frames are queued faster than dispatches drain them, the
    dispatcher must coalesce >1 frame per device call (the round-2
    throughput fix: amortize the per-dispatch launch/RPC floor)."""
    cfg = _small_config(max_batch=8, batch_buckets=(1, 2, 4, 8),
                        feed_queue_depth=64)
    eng = StereoEngine(cfg)
    n = 64 * 256 * 3 // 2
    rng = np.random.default_rng(0)
    frames = [
        Frame(0.0, rng.integers(0, 255, n, dtype=np.uint8).astype(np.uint8),
              64, 256, index=i)
        for i in range(32)
    ]
    # Pre-fill the queue BEFORE starting workers: the first dispatch sees a
    # deep backlog and must batch.
    for f in frames:
        assert eng.feed(f) is True
    results = []
    with eng:
        eng.drain()
        while True:
            r = eng.poll(timeout=0.2)
            if r is None:
                break
            results.append(r)
    assert len(results) == 32
    assert sorted(r.index for r in results) == list(range(32))
    batch = eng.metrics.dispatch_batch.summary()
    assert batch["max"] > 1, f"never batched: {batch}"
    assert batch["n"] < 32, "one dispatch per frame defeats micro-batching"


def test_micro_batch_results_match_single(rng):
    """Batched dispatch must be numerically identical to one-at-a-time
    dispatch (same pipeline, vmapped)."""
    cfg1 = _small_config(max_batch=1, batch_buckets=(1,))
    cfg8 = _small_config(max_batch=8, batch_buckets=(1, 2, 4, 8))
    import jax

    eng1 = StereoEngine(cfg1)
    eng8 = StereoEngine(cfg8, params=jax.device_get(eng1.params))
    n = 64 * 256 * 3 // 2
    frames = [
        Frame(0.0, rng.integers(0, 255, n, dtype=np.uint8).astype(np.uint8),
              64, 256, index=i)
        for i in range(5)
    ]
    def run(eng):
        for f in frames:
            eng.feed(f)
        out = []
        with eng:
            eng.drain()
            while True:
                r = eng.poll(timeout=0.2)
                if r is None:
                    break
                out.append(r)
        return {r.index: r.disparity for r in out}

    d1, d8 = run(eng1), run(eng8)
    assert set(d1) == set(d8)
    for i in d1:
        np.testing.assert_allclose(d1[i], d8[i], rtol=1e-5, atol=1e-5)


def test_device_frame_ring_feed():
    """Device-resident frames (hbmem zero-copy analog) flow through feed ->
    batched dispatch -> results."""
    from hobot_stereonet_tpu.data.stream import DeviceFrameRing

    cfg = _small_config(max_batch=4, batch_buckets=(1, 2, 4))
    eng = StereoEngine(cfg)
    ring = DeviceFrameRing(height=64, width=128, ring_size=2, with_gt=True)
    for f in ring.frames(6):
        assert eng.feed(f) is True
    results = []
    with eng:
        eng.drain()
        while True:
            r = eng.poll(timeout=0.2)
            if r is None:
                break
            results.append(r)
    assert len(results) == 6
    assert results[0].gt_disparity is not None


def test_device_resident_results():
    """fetch_results=False: results are device arrays (for device-side
    consumers), completion still confirmed, values identical to the
    host-fetch mode."""
    import jax

    cfg = _small_config(max_batch=4, batch_buckets=(1, 2, 4),
                        fetch_results=False)
    eng = StereoEngine(cfg)
    src = SyntheticStreamSource(height=64, width=128, num_frames=3, paced=False)
    from hobot_stereonet_tpu.runtime.engine import DeviceBatchView

    results = eng.run_stream(src)
    assert len(results) == 3
    assert isinstance(results[0].disparity, DeviceBatchView)
    r0 = min(results, key=lambda r: r.index)
    assert r0.disparity.shape == (64, 128)
    assert isinstance(r0.disparity.device_array(), jax.Array)
    assert np.all(np.isfinite(np.asarray(r0.disparity)))


def test_engine_int8_parity_path(rng):
    """Engine with the int8 quantization parity path enabled (the
    reference's BPU input contract) still produces sane output close to
    the fp path (quant error <= 1/128 per channel pre-network)."""
    from hobot_stereonet_tpu.config import PreprocessConfig

    base = _small_config()
    cfg = Config(
        camera=base.camera,
        model=base.model,
        preprocess=PreprocessConfig(quantize=True),
        mesh=base.mesh,
        engine=base.engine,
        slam=base.slam,
    )
    eng_q = StereoEngine(cfg)
    src = SyntheticStreamSource(height=64, width=128, num_frames=2, paced=False)
    results = eng_q.run_stream(src)
    assert len(results) == 2
    assert np.all(np.isfinite(results[0].disparity))


def test_distributed_initialize_single_process():
    from hobot_stereonet_tpu.parallel.distributed import global_mesh, initialize

    info = initialize()
    assert info["multi_process"] is False
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1
    mesh = global_mesh(tile=1)
    assert mesh.shape["data"] * mesh.shape["tile"] == info["global_devices"]


def test_mesh_sharded_engine_matches_single(eight_devices, rng):
    """Multi-chip serving (VERDICT #4): the engine on a (data=4, tile=2)
    mesh must produce the same disparities as the single-device engine —
    the BASELINE '8 stereo pairs, tile-sharded' config, engine-level."""
    import dataclasses

    import jax

    from hobot_stereonet_tpu.config import MeshConfig

    base = _small_config(max_batch=8, batch_buckets=(1, 2, 4, 8))
    eng1 = StereoEngine(base)

    cfg_m = dataclasses.replace(base, mesh=MeshConfig(data=4, tile=2))
    eng_m = StereoEngine(cfg_m, params=jax.device_get(eng1.params))
    assert eng_m.mesh is not None
    assert eng_m._buckets == (4, 8)  # buckets not divisible by data=4 dropped

    n = 64 * 256 * 3 // 2
    frames = [
        Frame(0.0, rng.integers(0, 255, n, dtype=np.uint8).astype(np.uint8),
              64, 256, index=i)
        for i in range(8)
    ]

    def run(eng):
        for f in frames:
            assert eng.feed(f) is True
        out = {}
        with eng:
            eng.drain()
            while True:
                r = eng.poll(timeout=0.2)
                if r is None:
                    break
                out[r.index] = np.asarray(r.disparity)
        return out

    out1, out_m = run(eng1), run(eng_m)
    assert sorted(out_m) == list(range(8))
    for i in range(8):
        np.testing.assert_allclose(out_m[i], out1[i], atol=5e-2)
    # The sharded pipeline really ran on all 8 devices.
    assert eng_m.metrics.dispatch_batch.summary()["max"] >= 4


def test_mesh_device_microbatch_composes(eight_devices, rng):
    """Blockwise serving must COMPOSE with mesh serving (VERDICT r4 #7):
    a (data=4, tile=2) engine with device_microbatch=4 chunks the batch
    inside the sharded program (lax.map over data-sharded chunks) and
    matches the un-chunked mesh engine exactly; a microbatch the data
    axis can't split fails loudly at construction, never silently."""
    import dataclasses

    import jax

    from hobot_stereonet_tpu.config import MeshConfig

    base = _small_config(max_batch=8, batch_buckets=(8,))
    cfg_m = dataclasses.replace(base, mesh=MeshConfig(data=4, tile=2))
    eng_plain = StereoEngine(cfg_m)

    cfg_mb = dataclasses.replace(
        cfg_m, engine=dataclasses.replace(cfg_m.engine, device_microbatch=4)
    )
    eng_mb = StereoEngine(cfg_mb, params=jax.device_get(eng_plain.params))

    n = 64 * 256 * 3 // 2
    frames = [
        Frame(0.0, rng.integers(0, 255, n, dtype=np.uint8).astype(np.uint8),
              64, 256, index=i)
        for i in range(8)
    ]

    def run(eng):
        for f in frames:
            assert eng.feed(f) is True
        out = {}
        with eng:
            eng.drain()
            while True:
                r = eng.poll(timeout=0.2)
                if r is None:
                    break
                out[r.index] = np.asarray(r.disparity)
        return out

    out_plain, out_mb = run(eng_plain), run(eng_mb)
    assert sorted(out_mb) == list(range(8))
    for i in range(8):
        np.testing.assert_allclose(out_mb[i], out_plain[i], atol=1e-5)

    # m=2 does not split over data=4 -> loud construction-time error.
    cfg_bad = dataclasses.replace(
        cfg_m, engine=dataclasses.replace(cfg_m.engine, device_microbatch=2)
    )
    with pytest.raises(ValueError, match="device_microbatch"):
        StereoEngine(cfg_bad)


def _poison(params):
    """All-NaN copy of a parameter pytree."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.full_like(x, np.nan), params)


@pytest.mark.parametrize("fetch_results", [True, False])
def test_nan_guard_drops_bad_frames(fetch_results):
    """Failure detection (SURVEY §5): a frame whose output contains NaN/Inf
    is dropped, counted, and never published — in both the host-fetch and
    device-resident result modes (the flags ride the completion probe)."""
    cfg = _small_config(max_batch=4, batch_buckets=(1, 2, 4),
                        fetch_results=fetch_results)
    ref = StereoEngine(cfg)
    eng = StereoEngine(cfg, params=_poison(ref.params))
    n = 64 * 256 * 3 // 2
    for i in range(4):
        assert eng.feed(Frame(0.0, np.zeros(n, np.uint8), 64, 256, index=i))
    results = []
    with eng:
        eng.drain()
        while True:
            r = eng.poll(timeout=0.2)
            if r is None:
                break
            results.append(r)
    assert results == []
    snap = eng.metrics.snapshot()
    assert snap["nan_dropped"] == 4
    assert snap["frames_out"] == 0


def test_nan_guard_passes_good_frames():
    """Healthy frames flow untouched and the counter stays zero."""
    cfg = _small_config()
    eng = StereoEngine(cfg)
    src = SyntheticStreamSource(height=64, width=128, num_frames=3, paced=False)
    results = eng.run_stream(src)
    assert len(results) == 3
    assert eng.metrics.snapshot()["nan_dropped"] == 0


def test_device_microbatch_exactness(rng):
    """Blockwise serving (device_microbatch): chunked lax.map evaluation
    inside one compiled program must be bit-identical to the monolithic
    vmap — the memory-bounded large-batch dispatch mode."""
    import jax

    cfg0 = _small_config(max_batch=8, batch_buckets=(1, 2, 4, 8))
    cfgm = _small_config(max_batch=8, batch_buckets=(1, 2, 4, 8),
                         device_microbatch=2)
    eng0 = StereoEngine(cfg0)
    engm = StereoEngine(cfgm, params=jax.device_get(eng0.params))
    n = 64 * 256 * 3 // 2
    frames = [
        Frame(0.0, rng.integers(0, 255, n, dtype=np.uint8).astype(np.uint8),
              64, 256, index=i)
        for i in range(8)
    ]

    def run(eng):
        for f in frames:
            assert eng.feed(f) is True
        out = {}
        with eng:
            eng.drain()
            while True:
                r = eng.poll(timeout=0.2)
                if r is None:
                    break
                out[r.index] = np.asarray(r.disparity)
        return out

    d0, dm = run(eng0), run(engm)
    assert sorted(dm) == list(range(8))
    for i in d0:
        np.testing.assert_array_equal(d0[i], dm[i])


def test_device_microbatch_bucket_validation():
    with pytest.raises(ValueError, match="device_microbatch"):
        EngineConfig(max_batch=8, batch_buckets=(1, 2, 4, 8),
                     device_microbatch=3)
