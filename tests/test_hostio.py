"""Native host-IO tests: ring buffer semantics + colorspace parity with the
jnp ops."""

import numpy as np
import pytest

from hobot_stereonet_tpu.runtime import hostio

pytestmark = pytest.mark.skipif(
    not hostio.available(), reason="native hostio unavailable"
)


def test_ring_push_pop_order(rng):
    ring = hostio.FrameRing(frame_bytes=64, capacity=4)
    frames = [rng.integers(0, 255, 64, dtype=np.uint8) for _ in range(3)]
    for i, f in enumerate(frames):
        assert ring.push(f, timestamp=float(i), index=i)
    assert len(ring) == 3
    for i in range(3):
        out, ts, idx = ring.pop()
        np.testing.assert_array_equal(out, frames[i])
        assert ts == float(i) and idx == i
    assert ring.pop() is None
    ring.close()


def test_ring_drops_when_full(rng):
    ring = hostio.FrameRing(frame_bytes=16, capacity=2)
    f = rng.integers(0, 255, 16, dtype=np.uint8)
    assert ring.push(f) and ring.push(f)
    assert not ring.push(f)  # full -> dropped
    assert ring.dropped == 1
    ring.pop()
    assert ring.push(f)  # slot freed
    ring.close()


def test_nv12_split_matches_jnp(rng):
    import jax.numpy as jnp

    from hobot_stereonet_tpu.ops import colorspace as cs

    h, fw = 16, 32
    buf = rng.integers(0, 256, h * fw * 3 // 2, dtype=np.uint8)
    ln, rn = hostio.nv12_split_sbs(buf, h, fw)
    lj, rj = cs.split_side_by_side_nv12(jnp.asarray(buf), h, fw)
    np.testing.assert_array_equal(ln, np.asarray(lj))
    np.testing.assert_array_equal(rn, np.asarray(rj))


def test_nv12_to_yuv444_matches_jnp(rng):
    import jax.numpy as jnp

    from hobot_stereonet_tpu.ops import colorspace as cs

    h, w = 16, 24
    buf = rng.integers(0, 256, h * w * 3 // 2, dtype=np.uint8)
    out_n = hostio.nv12_to_yuv444(buf, h, w)
    out_j = np.asarray(cs.nv12_to_yuv444(jnp.asarray(buf), h, w))
    np.testing.assert_array_equal(out_n, out_j)


def test_bgr_to_nv12_matches_jnp(rng):
    import jax.numpy as jnp

    from hobot_stereonet_tpu.ops import colorspace as cs

    bgr = rng.integers(10, 240, (16, 16, 3), dtype=np.uint8)
    out_n = hostio.bgr_to_nv12(bgr)
    out_j = np.asarray(cs.bgr_to_nv12(jnp.asarray(bgr)))
    # Independent float implementations; rounding may differ by 1 count.
    assert np.abs(out_n.astype(int) - out_j.astype(int)).max() <= 1


def test_ring_threaded_stream(rng):
    """Producer/consumer threads across the ring — the capture->feed
    topology."""
    import threading

    n, fb = 50, 128
    ring = hostio.FrameRing(frame_bytes=fb, capacity=8)
    frames = [rng.integers(0, 255, fb, dtype=np.uint8) for _ in range(n)]
    got = []

    def producer():
        i = 0
        while i < n:
            if ring.push(frames[i], index=i):
                i += 1

    def consumer():
        while len(got) < n:
            item = ring.pop()
            if item is not None:
                got.append(item)

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=10); tc.join(timeout=10)
    assert len(got) == n
    for out, _ts, idx in got:
        np.testing.assert_array_equal(out, frames[idx])
    assert [g[2] for g in got] == list(range(n))
    ring.close()
