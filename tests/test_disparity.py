"""Output-parser parity tests (reference ``parser.cpp`` / render-node math)."""

import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.config import CameraConfig
from hobot_stereonet_tpu.ops import disparity as dp


def test_reference_dequant_chain():
    """int32 -> px via scale * 192, matching parser.cpp:84-86."""
    raw = jnp.asarray([[0, 100000, 2000000]], dtype=jnp.int32)
    out = np.asarray(dp.dequantize_reference_output(raw))
    expected = np.asarray(raw, np.float32) * 2.60443857769133e-6 * 192
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_depth_formula_zed2i():
    """Z = f*B/disp/1000 with the ZED 2i constants (parser.cpp:70-71,86)."""
    cam = CameraConfig()
    disp = jnp.asarray([10.0, 63.2, 100.0])
    z = np.asarray(dp.disparity_to_depth_m(disp))
    expected = 527.1931762695312 * 119.89382172 / np.asarray(disp) / 1000.0
    np.testing.assert_allclose(z, expected, rtol=1e-6)
    # Round trip.
    back = np.asarray(dp.depth_to_disparity_px(jnp.asarray(z)))
    np.testing.assert_allclose(back, np.asarray(disp), rtol=1e-5)


def test_depth_clamps_nonpositive_disparity():
    z = np.asarray(dp.disparity_to_depth_m(jnp.asarray([0.0, -1.0])))
    assert np.all(np.isfinite(z))


def test_epe_and_d1(rng):
    gt = jnp.asarray(rng.uniform(1, 100, size=(4, 8)).astype(np.float32))
    pred = gt + 1.0
    np.testing.assert_allclose(float(dp.end_point_error(pred, gt)), 1.0, rtol=1e-6)
    # 1px error is never "bad" under D1 (needs >3px and >5%).
    assert float(dp.d1_all(pred, gt)) == 0.0
    pred2 = gt * 1.2 + 4.0  # always >3px and >5%
    assert float(dp.d1_all(pred2, gt)) == 1.0


def test_epe_with_validity_mask():
    gt = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    pred = gt + jnp.asarray([[1.0, 100.0], [1.0, 1.0]])
    valid = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
    np.testing.assert_allclose(float(dp.end_point_error(pred, gt, valid)), 1.0)
