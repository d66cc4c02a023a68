"""Pallas kernels vs their jnp oracles (interpret mode on CPU; the same
code path compiles on TPU — see bench/integration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobot_stereonet_tpu.ops.cost_volume import build_correlation_volume
from hobot_stereonet_tpu.ops.pallas.correlation import (
    correlation_volume_pallas,
    soft_argmin_pallas,
)
from hobot_stereonet_tpu.ops.pallas.preprocess_kernel import (
    nv12_sbs_preprocess_pallas,
)
from hobot_stereonet_tpu.ops.preprocess import side_by_side_nv12_to_model_input
from hobot_stereonet_tpu.ops.soft_argmin import disparity_confidence, soft_argmin


def test_correlation_kernel_matches_oracle(rng):
    b, h, w, c, D = 2, 16, 32, 8, 6
    fl = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    out = correlation_volume_pallas(fl, fr, D, row_tile=8, interpret=True)
    # Oracle emits [B, D, H, W]; kernel emits channel-last [B, H, W, D].
    ref = jnp.transpose(build_correlation_volume(fl, fr, D), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_softargmin_kernel_matches_oracle(rng):
    b, h, w, D = 1, 8, 16, 12
    cost = jnp.asarray(rng.standard_normal((b, h, w, D)).astype(np.float32))
    disp, conf = soft_argmin_pallas(cost, scale=8.0, row_tile=8, interpret=True)
    ref_disp = soft_argmin(cost, axis=-1) * 8.0
    ref_conf = disparity_confidence(cost, axis=-1)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref_disp), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf), rtol=1e-5, atol=1e-5)


def test_preprocess_kernel_matches_oracle(rng):
    from hobot_stereonet_tpu.config import PreprocessConfig

    h, w = 32, 64  # single-eye width
    buf = jnp.asarray(
        rng.integers(0, 256, size=(h * 2 * w * 3 // 2,), dtype=np.uint8)
    )
    # The kernel emits normalized YUV444; compare against the yuv oracle.
    out = nv12_sbs_preprocess_pallas(buf, h, w, row_tile=8, interpret=True)
    ref = side_by_side_nv12_to_model_input(
        buf, h, 2 * w, PreprocessConfig(color_space="yuv")
    )
    assert out.shape == ref.shape == (1, h, w, 6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_correlation_kernel_zero_margin(rng):
    """Disparity shifts beyond the left edge must contribute zero."""
    b, h, w, c, D = 1, 8, 16, 4, 5
    fl = jnp.ones((b, h, w, c))
    fr = jnp.ones((b, h, w, c))
    out = np.asarray(correlation_volume_pallas(fl, fr, D, row_tile=8, interpret=True))
    # At column x < d the shifted fr is zero-filled -> corr = 0.
    for d in range(D):
        np.testing.assert_allclose(out[0, :, :d, d], 0.0)
        np.testing.assert_allclose(out[0, :, d:, d], c / np.sqrt(c))
