"""End-to-end model tests (small shapes, CPU): shape/dtype contract,
determinism, gradient flow, and a learnability smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobot_stereonet_tpu.config import StereoNetConfig
from hobot_stereonet_tpu.models import FastStereoNet, StereoNet

SMALL = StereoNetConfig(
    feature_channels=8,
    num_feature_res_blocks=1,
    num_aggregation_layers=1,
    aggregation_channels=8,
    num_refinement_res_blocks=1,
    refinement_channels=8,
    max_disparity=32,
    compute_dtype=jnp.float32,
)


def _pair(rng, b=1, h=16, w=32):
    l = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    return l, r


@pytest.mark.parametrize("model_cls", [StereoNet, FastStereoNet])
def test_output_contract(rng, model_cls):
    m = model_cls(SMALL)
    l, r = _pair(rng, b=2)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), l, r)
    out = jax.jit(m.apply)(params, l, r)
    assert out["disparity"].shape == (2, 16, 32)
    assert out["disparity"].dtype == jnp.float32
    # Non-negative disparities (final refinement applies relu).
    assert float(jnp.min(out["disparity"])) >= 0.0
    # Coarse-to-fine pyramid: first at 1/8 res, last at full res.
    assert out["pyramid"][0].shape == (2, 2, 4)
    assert out["pyramid"][-1].shape == (2, 16, 32)
    assert out["confidence"].shape == (2, 2, 4)


def test_deterministic(rng):
    m = StereoNet(SMALL)
    l, r = _pair(rng)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), l, r)
    f = jax.jit(lambda p: m.apply(p, l, r)["disparity"])
    o1 = f(params)
    o2 = f(params)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_gradients_flow(rng):
    m = StereoNet(SMALL)
    l, r = _pair(rng)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), l, r)

    def loss(p):
        return jnp.mean(m.apply(p, l, r)["disparity"])

    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(grads)
    assert leaves
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert np.isfinite(total) and total > 0.0


def test_jit_compiles_and_matches(rng):
    m = FastStereoNet(SMALL)
    l, r = _pair(rng, h=16, w=32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), l, r)
    eager = m.apply(params, l, r)["disparity"]
    jitted = jax.jit(lambda p, a, b: m.apply(p, a, b)["disparity"])(params, l, r)
    # jit fusion reassociates float ops and may pick different conv
    # algorithms; the softmax-argmin amplifies logit-level drift, so compare
    # at disparity resolution (0.05 px on a ~32 px range).
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=5e-2)


def test_learns_constant_shift(rng):
    """A couple of gradient steps on a synthetic constant-disparity pair
    should reduce the loss — catches dead gradients / sign errors."""
    import optax

    m = FastStereoNet(SMALL)
    base = rng.standard_normal((1, 16, 32, 3)).astype(np.float32)
    d0 = 4
    right = np.concatenate([base[:, :, d0:, :], base[:, :, :d0, :]], axis=2)
    l, r = jnp.asarray(base), jnp.asarray(right)
    gt = jnp.full((1, 16, 32), float(d0))

    params = jax.jit(m.init)(jax.random.PRNGKey(0), l, r)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    def loss_fn(p):
        out = m.apply(p, l, r)
        return jnp.mean(jnp.abs(out["disparity"] - gt))

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(5):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
