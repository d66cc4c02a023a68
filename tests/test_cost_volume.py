"""Cost volume + soft-argmin tests vs numpy references and analytic cases."""

import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.ops.cost_volume import (
    build_correlation_volume,
    build_cost_volume,
    shift_right_features,
)
from hobot_stereonet_tpu.ops.soft_argmin import disparity_confidence, soft_argmin


def test_shift_semantics(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 3)).astype(np.float32))
    s = np.asarray(shift_right_features(x, 3))
    np.testing.assert_array_equal(s[..., :3, :], 0.0)
    np.testing.assert_allclose(s[..., 3:, :], np.asarray(x)[..., :-3, :])
    np.testing.assert_array_equal(np.asarray(shift_right_features(x, 0)), np.asarray(x))


def test_difference_volume_exact_match_is_zero(rng):
    """If right is left shifted by d0, cost at disparity d0 is zero in the
    valid region."""
    b, h, w, c, D, d0 = 1, 4, 16, 3, 6, 2
    fl = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    # right image: each pixel x holds the left pixel at x + d0 shifted left,
    # i.e. fl[x] == fr[x - d0]  =>  fr[x] = fl[x + d0]
    fr = jnp.concatenate([fl[:, :, d0:, :], jnp.zeros((b, h, d0, c))], axis=2)
    vol = np.asarray(build_cost_volume(fl, fr, D))
    assert vol.shape == (b, D, h, w, c)
    np.testing.assert_allclose(vol[:, d0, :, d0 : w - d0, :], 0.0, atol=1e-6)


def test_concat_volume_shape(rng):
    fl = jnp.asarray(rng.standard_normal((2, 4, 8, 5)).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal((2, 4, 8, 5)).astype(np.float32))
    vol = build_cost_volume(fl, fr, 3, mode="concat")
    assert vol.shape == (2, 3, 4, 8, 10)
    np.testing.assert_allclose(np.asarray(vol[:, 0, ..., :5]), np.asarray(fl))


def test_correlation_volume_vs_numpy(rng):
    b, h, w, c, D = 1, 3, 10, 4, 5
    fl = rng.standard_normal((b, h, w, c)).astype(np.float32)
    fr = rng.standard_normal((b, h, w, c)).astype(np.float32)
    vol = np.asarray(build_correlation_volume(jnp.asarray(fl), jnp.asarray(fr), D))
    assert vol.shape == (b, D, h, w)
    for d in range(D):
        for x in range(w):
            if x - d >= 0:
                ref = (fl[0, :, x, :] * fr[0, :, x - d, :]).sum(-1) / np.sqrt(c)
            else:
                ref = np.zeros(h, np.float32)
            np.testing.assert_allclose(vol[0, d, :, x], ref, rtol=1e-5, atol=1e-5)


def test_correlation_mxu_matches_shift_reduce(rng):
    """The MXU Gram-band formulation (roofline r5 rewrite) must match the
    shift+reduce oracle at model-like shapes, including bf16 features
    (where the matmul's f32 accumulation may only differ by bf16
    rounding)."""
    from hobot_stereonet_tpu.ops.cost_volume import (
        build_correlation_volume_ref)

    b, h, w, c, D = 2, 12, 40, 32, 24
    fl = rng.standard_normal((b, h, w, c)).astype(np.float32)
    fr = rng.standard_normal((b, h, w, c)).astype(np.float32)
    got = np.asarray(build_correlation_volume(jnp.asarray(fl),
                                              jnp.asarray(fr), D))
    ref = np.asarray(build_correlation_volume_ref(jnp.asarray(fl),
                                                  jnp.asarray(fr), D))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    fl16 = jnp.asarray(fl, jnp.bfloat16)
    fr16 = jnp.asarray(fr, jnp.bfloat16)
    got16 = np.asarray(build_correlation_volume(fl16, fr16, D),
                       dtype=np.float32)
    ref16 = np.asarray(build_correlation_volume_ref(fl16, fr16, D),
                       dtype=np.float32)
    np.testing.assert_allclose(got16, ref16, rtol=5e-2, atol=5e-2)


def test_soft_argmin_peaked_cost():
    """A deep minimum at index d0 recovers d0."""
    D, d0 = 16, 5
    cost = np.full((1, D, 2, 2), 20.0, np.float32)
    cost[:, d0] = -20.0
    disp = np.asarray(soft_argmin(jnp.asarray(cost)))
    np.testing.assert_allclose(disp, d0, atol=1e-4)
    conf = np.asarray(disparity_confidence(jnp.asarray(cost)))
    assert np.all(conf > 0.99)


def test_soft_argmin_subpixel():
    """Two equal minima at d0, d0+1 -> expected value midway (subpixel)."""
    D = 8
    cost = np.full((1, D, 1, 1), 15.0, np.float32)
    cost[:, 3] = -15.0
    cost[:, 4] = -15.0
    disp = np.asarray(soft_argmin(jnp.asarray(cost)))
    np.testing.assert_allclose(disp, 3.5, atol=1e-4)


def test_soft_argmin_last_axis(rng):
    cost = rng.standard_normal((2, 4, 6, 10)).astype(np.float32)
    out = np.asarray(soft_argmin(jnp.asarray(cost), axis=-1))
    p = np.exp(-cost - (-cost).max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = (p * np.arange(10)).sum(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
