"""Preprocess contract tests (reference ``CvtNV12Data2Tensors`` parity,
SURVEY.md C6: normalize (x-128)/128; int8 quant scale 0.0078125, zp 0.5,
floor, clamp [-128,127])."""

import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.config import PreprocessConfig
from hobot_stereonet_tpu.ops import preprocess as pp
from hobot_stereonet_tpu.ops import colorspace as cs


def test_normalize_matches_reference_formula(rng):
    x = jnp.asarray(rng.integers(0, 256, size=(4, 4), dtype=np.uint8))
    out = np.asarray(pp.normalize(x))
    np.testing.assert_allclose(out, (np.asarray(x).astype(np.float32) - 128.0) / 128.0)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_quantize_floor_semantics():
    cfg = PreprocessConfig()
    # q = floor(x/scale + 0.5) with scale = 1/128 => round(x*128) (half-up).
    x = jnp.asarray([-1.0, -0.5, 0.0, 0.251, 0.9999, 1.0, 2.0])
    q = np.asarray(pp.quantize_int8(x, cfg))
    expected = np.clip(np.floor(np.asarray(x) * 128.0 + 0.5), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(q, expected)


def test_quant_dequant_error_bound(rng):
    x = jnp.asarray(rng.uniform(-1, 0.992, size=(32,)).astype(np.float32))
    back = np.asarray(pp.dequantize_int8(pp.quantize_int8(x)))
    assert np.max(np.abs(back - np.asarray(x))) <= 1.0 / 128.0


def test_nv12_pair_to_model_input_yuv_parity(rng):
    """color_space='yuv' keeps the reference blob's stacked-YUV444 contract
    (merge order at preprocess.cpp:998-1003)."""
    h, w = 8, 16
    cfg = PreprocessConfig(color_space="yuv")
    l = jnp.asarray(rng.integers(0, 256, size=(h * w * 3 // 2,), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, size=(h * w * 3 // 2,), dtype=np.uint8))
    out = pp.nv12_pair_to_model_input(l, r, h, w, cfg)
    assert out.shape == (1, h, w, 6)
    left444 = np.asarray(cs.nv12_to_yuv444(l, h, w)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out)[0, ..., :3], (left444 - 128) / 128)


def test_nv12_pair_to_model_input_rgb_default(rng):
    """Default color_space='rgb': YUV444 -> RGB so streaming matches the
    RGB-trained checkpoints (train/serve skew guard)."""
    h, w = 8, 16
    l = jnp.asarray(rng.integers(0, 256, size=(h * w * 3 // 2,), dtype=np.uint8))
    out = pp.nv12_pair_to_model_input(l, l, h, w)
    assert out.shape == (1, h, w, 6)
    yuv = np.asarray(cs.nv12_to_yuv444(l, h, w)).astype(np.float32)
    rgb = np.clip(np.asarray(cs.yuv_to_rgb(jnp.asarray(yuv))), 0, 255)
    np.testing.assert_allclose(
        np.asarray(out)[0, ..., :3], (rgb - 128) / 128, atol=1e-5
    )


def test_side_by_side_ingest(rng):
    h, fw = 8, 32
    buf = jnp.asarray(rng.integers(0, 256, size=(h * fw * 3 // 2,), dtype=np.uint8))
    out = pp.side_by_side_nv12_to_model_input(buf, h, fw)
    assert out.shape == (1, h, fw // 2, 6)
    l, r = cs.split_side_by_side_nv12(buf, h, fw)
    ref = pp.nv12_pair_to_model_input(l, r, h, fw // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_nv12_ingest_matches_rgb_training_input(rng):
    """The serving ingest and the dataset/training path produce the SAME
    distribution for the same scene content (up to 4:2:0 chroma loss)."""
    from hobot_stereonet_tpu.data.stream import rgb_pair_to_sbs_nv12

    yy, xx = np.mgrid[0:16, 0:32]
    l = np.stack([30 + 5 * xx % 200, 40 + 3 * yy % 180, (xx + 2 * yy) % 150], -1).astype(np.uint8)
    r = np.roll(l, 3, axis=1)
    buf = jnp.asarray(rgb_pair_to_sbs_nv12(l, r))
    served = np.asarray(pp.nv12_ingest(buf, 16, 64))[0]
    trained = np.asarray(pp.rgb_pair_to_model_input(jnp.asarray(l), jnp.asarray(r)))[0]
    # 4:2:0 chroma decimation costs a few counts; distributions must agree.
    assert np.abs(served - trained).mean() < 0.05


def test_rgb_pair_and_split(rng):
    l = jnp.asarray(rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8))
    x = pp.rgb_pair_to_model_input(l, r)
    assert x.shape == (1, 4, 6, 6)
    lo, ro = pp.split_model_input(x)
    np.testing.assert_allclose(np.asarray(lo)[0], (np.asarray(l).astype(np.float32) - 128) / 128)
    np.testing.assert_allclose(np.asarray(ro)[0], (np.asarray(r).astype(np.float32) - 128) / 128)


def test_rgb_pair_honors_yuv_color_space(rng):
    """A YUV-native model config must see YUV444 from the DATASET path too
    (training/eval/serving on one distribution — the reference's input
    contract is YUV444, preprocess.cpp:975-1003)."""
    import dataclasses

    import jax.numpy as jnp

    from hobot_stereonet_tpu.config import PreprocessConfig
    from hobot_stereonet_tpu.ops import colorspace as cs
    from hobot_stereonet_tpu.ops import preprocess as pp

    l = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    r = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    cfg_yuv = PreprocessConfig(color_space="yuv")
    x = pp.rgb_pair_to_model_input(l, r, cfg_yuv)
    want_l = (np.clip(np.asarray(cs.rgb_to_yuv(jnp.asarray(l, jnp.float32))),
                      0, 255) - 128.0) / 128.0
    np.testing.assert_allclose(np.asarray(x[0, ..., :3]), want_l,
                               atol=1e-5)
    # And the NV12 stream path agrees with the dataset path for the same
    # underlying image (modulo 4:2:0 chroma subsampling).
    from hobot_stereonet_tpu.data.stream import rgb_pair_to_sbs_nv12

    sbs = rgb_pair_to_sbs_nv12(l, r)
    y = pp.nv12_ingest(jnp.asarray(sbs), 16, 48, cfg_yuv)[0]
    assert y.shape == (16, 24, 6)
    # Luma channel matches closely (chroma differs by subsampling).
    np.testing.assert_allclose(np.asarray(y[..., 0]),
                               np.asarray(x[0, ..., 0]), atol=0.02)
