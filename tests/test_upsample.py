"""Upsample op tests: stencil 2x == jax.image.resize, convex upsample
semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.ops import upsample as up


def test_upsample2x_matches_jax_image_resize(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 3)).astype(np.float32))
    ours = np.asarray(up.upsample2x_bilinear(x))
    ref = np.asarray(jax.image.resize(x, (2, 12, 16, 3), method="bilinear"))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_upsample_pow2_chain(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32))
    out = up.upsample_bilinear(x, 16, 16)
    assert out.shape == (1, 16, 16, 1)


def test_downsample_avg(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    out = np.asarray(up.downsample2x_avg(x))
    ref = np.asarray(x).reshape(1, 4, 2, 4, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
    out4 = up.downsample_avg(x, 4)
    assert out4.shape == (1, 2, 2, 2)


def test_convex_upsample_uniform_mask_is_neighborhood_mean():
    """Zero logits => uniform softmax => every fine pixel = mean of the 3x3
    coarse neighborhood (with zero padding at edges)."""
    b, h, w, k = 1, 3, 4, 2
    disp = jnp.arange(h * w, dtype=jnp.float32).reshape(b, h, w)
    mask = jnp.zeros((b, h, w, 9 * k * k))
    out = np.asarray(up.convex_upsample(disp, mask, k))
    assert out.shape == (b, h * k, w * k)
    d = np.asarray(disp)[0]
    dp = np.pad(d, 1)
    # fine pixel (2,2) belongs to coarse (1,1): mean of its full 3x3 window
    expect = dp[1:4, 1:4].mean()
    np.testing.assert_allclose(out[0, 2, 2], expect, rtol=1e-5)


def test_convex_upsample_selective_mask():
    """A mask that puts all weight on the center neighbor reproduces
    nearest-neighbor upsampling exactly."""
    b, h, w, k = 1, 2, 3, 4
    disp = jnp.asarray([[[1.0, 5.0, 9.0], [2.0, 4.0, 8.0]]])
    mask = np.full((b, h, w, 9, k * k), -1e9, np.float32)
    mask[:, :, :, 4, :] = 0.0  # center of 3x3
    out = np.asarray(up.convex_upsample(disp, jnp.asarray(mask.reshape(b, h, w, -1)), k))
    expect = np.kron(np.asarray(disp)[0], np.ones((k, k)))
    np.testing.assert_allclose(out[0], expect, rtol=1e-5)


def test_fast_model_convex_output_contract(rng):
    import jax

    from hobot_stereonet_tpu.config import StereoNetConfig
    from hobot_stereonet_tpu.models import FastStereoNet

    cfg = StereoNetConfig(
        feature_channels=8,
        num_feature_res_blocks=1,
        num_aggregation_layers=1,
        aggregation_channels=8,
        max_disparity=32,
        compute_dtype=jnp.float32,
        upsample_mode="convex",
    )
    m = FastStereoNet(cfg)
    l = jnp.asarray(rng.standard_normal((1, 16, 32, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((1, 16, 32, 3)).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), l, r)
    out = jax.jit(m.apply)(params, l, r)
    assert out["disparity"].shape == (1, 16, 32)
    assert out["pyramid"][0].shape == (1, 2, 4)
    assert out["pyramid"][-1].shape == (1, 16, 32)
    # Convex combination of non-negative coarse disparities stays >= 0.
    assert float(out["disparity"].min()) >= 0.0
