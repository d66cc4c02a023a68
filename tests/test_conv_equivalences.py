"""Lock the algebra behind the round-5 conv experiments.

scripts/conv_layout_ab.py and scripts/u8_input_ab.py rest on two exact
rewrites (both measured on chip; layout was a wash, u8 input marginal —
see conv_layout_ab.json / u8_input_ab.json).  The rewrites themselves
must stay exact whether or not anyone re-runs the chip scripts:

  * an NCHW-expressed conv is the transpose of the NHWC conv, and
  * feeding uint8 with the ingest normalize (x-128)/128 applied in-graph
    (via the int32 cast hop the TPU requires) reproduces the bf16-input
    forward bit-exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _conv(x, k, dn, strides=(2, 2)):
    return lax.conv_general_dilated(x, k, strides, "SAME",
                                    dimension_numbers=dn)


def test_nchw_conv_matches_nhwc_transpose():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 40, 48, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((5, 5, 3, 8)).astype(np.float32))
    a = _conv(x, k, ("NHWC", "HWIO", "NHWC"))
    b = _conv(jnp.transpose(x, (0, 3, 1, 2)), k, ("NCHW", "HWIO", "NCHW"))
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(jnp.transpose(b, (0, 2, 3, 1))),
        rtol=1e-5, atol=1e-5)


def test_u8_input_normalize_fold_is_bit_exact():
    rng = np.random.default_rng(1)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 40, 48, 3), dtype=np.uint8))
    k = jnp.asarray(
        rng.standard_normal((5, 5, 3, 8)).astype(np.float32)).astype(
        jnp.bfloat16)

    bf = ((u8.astype(jnp.float32) - 128.0) / 128.0).astype(jnp.bfloat16)
    a = _conv(bf, k, ("NHWC", "HWIO", "NHWC"))

    # The in-graph form used by the experiments: int32 cast hop, then
    # (x - 128) * (1/128) in bf16.  (k-128)/128 has an exact bf16
    # representation for every k in [0, 255], so the two paths agree
    # bit for bit.
    xf = (u8.astype(jnp.int32).astype(jnp.bfloat16) - 128.0) * jnp.bfloat16(
        1.0 / 128.0)
    b = _conv(xf, k, ("NHWC", "HWIO", "NHWC"))
    assert jnp.array_equal(a, b)
