"""Colorspace/layout op tests vs independent numpy references.

Covers the reference ``Tools`` semantics (``preprocess.h:54-185``): NV12
round trips, nearest-neighbor chroma upsample, side-by-side splitting, and
layout converters.
"""

import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.ops import colorspace as cs


def _random_nv12(rng, h, w):
    return rng.integers(0, 256, size=(h * w * 3 // 2,), dtype=np.uint8)


def test_nv12_plane_roundtrip(rng):
    h, w = 16, 24
    buf = _random_nv12(rng, h, w)
    y, uv = cs.nv12_to_planes(jnp.asarray(buf), h, w)
    assert y.shape == (h, w) and uv.shape == (h // 2, w // 2, 2)
    back = cs.planes_to_nv12(y, uv)
    np.testing.assert_array_equal(np.asarray(back), buf)


def test_yuv420_to_yuv444_nearest_neighbor(rng):
    h, w = 8, 12
    buf = _random_nv12(rng, h, w)
    y, uv = cs.nv12_to_planes(jnp.asarray(buf), h, w)
    out = np.asarray(cs.yuv420_to_yuv444(y, uv))
    assert out.shape == (h, w, 3)
    # Numpy reference: each chroma sample replicated over its 2x2 quad.
    y_np, uv_np = np.asarray(y), np.asarray(uv)
    for i in range(h):
        for j in range(w):
            assert out[i, j, 0] == y_np[i, j]
            assert out[i, j, 1] == uv_np[i // 2, j // 2, 0]
            assert out[i, j, 2] == uv_np[i // 2, j // 2, 1]


def test_yuv444_to_yuv420_decimation(rng):
    h, w = 8, 12
    yuv = jnp.asarray(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
    y, uv = cs.yuv444_to_yuv420(yuv)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yuv)[..., 0])
    np.testing.assert_array_equal(np.asarray(uv), np.asarray(yuv)[::2, ::2, 1:])


def test_bgr_yuv_roundtrip(rng):
    bgr = rng.integers(20, 235, size=(8, 8, 3)).astype(np.float32)
    back = np.asarray(cs.yuv_to_bgr(cs.bgr_to_yuv(jnp.asarray(bgr))))
    np.testing.assert_allclose(back, bgr, atol=1e-3)


def test_bgr_to_nv12_shapes_and_gray(rng):
    # A uniform gray image must produce constant Y and neutral (128) chroma.
    bgr = np.full((16, 16, 3), 100, dtype=np.uint8)
    nv12 = np.asarray(cs.bgr_to_nv12(jnp.asarray(bgr)))
    assert nv12.shape == (16 * 16 * 3 // 2,)
    y, uv = cs.nv12_to_planes(jnp.asarray(nv12), 16, 16)
    assert np.all(np.asarray(y) == np.asarray(y)[0, 0])
    np.testing.assert_array_equal(np.asarray(uv), 128)


def test_split_side_by_side(rng):
    h, w = 8, 24  # full side-by-side width
    buf = _random_nv12(rng, h, w)
    left, right = cs.split_side_by_side_nv12(jnp.asarray(buf), h, w)
    y, uv = cs.nv12_to_planes(jnp.asarray(buf), h, w)
    ly, luv = cs.nv12_to_planes(left, h, w // 2)
    ry, ruv = cs.nv12_to_planes(right, h, w // 2)
    np.testing.assert_array_equal(np.asarray(ly), np.asarray(y)[:, : w // 2])
    np.testing.assert_array_equal(np.asarray(ry), np.asarray(y)[:, w // 2 :])
    np.testing.assert_array_equal(np.asarray(luv), np.asarray(uv)[:, : w // 4, :])
    np.testing.assert_array_equal(np.asarray(ruv), np.asarray(uv)[:, w // 4 :, :])


def test_layout_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 3)).astype(np.float32))
    back = cs.nchw_to_nhwc(cs.nhwc_to_nchw(x))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    assert cs.nhwc_to_nchw(x).shape == (2, 3, 4, 6)


def test_align_up():
    assert cs.align_up(1) == 16
    assert cs.align_up(16) == 16
    assert cs.align_up(17) == 32
    assert cs.align_up(1280, 64) == 1280


def test_rgb_to_yuv_roundtrip(rng):
    from hobot_stereonet_tpu.ops import colorspace as cs
    import jax.numpy as jnp

    rgb = jnp.asarray(rng.integers(20, 236, (8, 12, 3)).astype(np.float32))
    back = cs.yuv_to_rgb(cs.rgb_to_yuv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb),
                               atol=1e-3, rtol=0)
