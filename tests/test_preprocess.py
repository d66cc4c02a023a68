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


def test_nv12_pair_to_model_input(rng):
    h, w = 8, 16
    l = jnp.asarray(rng.integers(0, 256, size=(h * w * 3 // 2,), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, size=(h * w * 3 // 2,), dtype=np.uint8))
    out = pp.nv12_pair_to_model_input(l, r, h, w)
    assert out.shape == (1, h, w, 6)
    # Channel order: 0..2 left YUV, 3..5 right YUV (reference merge order).
    left444 = np.asarray(cs.nv12_to_yuv444(l, h, w)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out)[0, ..., :3], (left444 - 128) / 128)


def test_side_by_side_ingest(rng):
    h, fw = 8, 32
    buf = jnp.asarray(rng.integers(0, 256, size=(h * fw * 3 // 2,), dtype=np.uint8))
    out = pp.side_by_side_nv12_to_model_input(buf, h, fw)
    assert out.shape == (1, h, fw // 2, 6)
    l, r = cs.split_side_by_side_nv12(buf, h, fw)
    ref = pp.nv12_pair_to_model_input(l, r, h, fw // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_rgb_pair_and_split(rng):
    l = jnp.asarray(rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8))
    x = pp.rgb_pair_to_model_input(l, r)
    assert x.shape == (1, 4, 6, 6)
    lo, ro = pp.split_model_input(x)
    np.testing.assert_allclose(np.asarray(lo)[0], (np.asarray(l).astype(np.float32) - 128) / 128)
    np.testing.assert_allclose(np.asarray(ro)[0], (np.asarray(r).astype(np.float32) - 128) / 128)
