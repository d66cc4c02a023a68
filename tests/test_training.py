"""Training-step tests: loss semantics, single-device step, sharded step."""

import jax
import jax.numpy as jnp
import numpy as np

from hobot_stereonet_tpu.config import MeshConfig
from hobot_stereonet_tpu.models import FastStereoNet
from hobot_stereonet_tpu.parallel import mesh as mesh_mod
from hobot_stereonet_tpu.runtime import training
from tests.test_model import SMALL


def test_smooth_l1():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    out = np.asarray(training.smooth_l1(x))
    np.testing.assert_allclose(out, [1.5, 0.125, 0.0, 0.125, 1.5])


def test_multiscale_loss_zero_when_perfect(rng):
    gt = jnp.asarray(rng.uniform(1, 20, size=(1, 8, 16)).astype(np.float32))
    outputs = {
        "pyramid": [
            jax.image.resize(gt, (1, 2, 4), "bilinear"),
            jax.image.resize(gt, (1, 4, 8), "bilinear"),
            gt,
        ]
    }
    loss, metrics = training.multiscale_loss(outputs, gt)
    assert float(metrics["epe"]) == 0.0
    # Coarse levels resize, so tiny residuals remain; final level dominates.
    assert float(loss) < 0.5


def test_multiscale_loss_masks_invalid():
    gt = jnp.full((1, 4, 4), 5.0)
    bad_pred = jnp.full((1, 4, 4), 100.0)
    outputs = {"pyramid": [bad_pred]}
    valid = jnp.zeros((1, 4, 4))
    loss, metrics = training.multiscale_loss(outputs, gt, valid)
    assert float(loss) == 0.0 and float(metrics["epe"]) == 0.0


def test_train_step_decreases_loss(rng):
    model = FastStereoNet(SMALL)
    l = jnp.asarray(rng.standard_normal((2, 16, 32, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((2, 16, 32, 3)).astype(np.float32))
    gt = jnp.full((2, 16, 32), 4.0)

    opt = training.make_optimizer(lr=1e-3, warmup_steps=1, total_steps=100)
    state = training.create_train_state(model, jax.random.PRNGKey(0), opt, l[:1], r[:1])
    step = jax.jit(training.make_train_step(model, opt, max_disparity=32.0))

    losses = []
    for _ in range(5):
        state, metrics = step(state, l, r, gt)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    assert np.isfinite(float(metrics["grad_norm"]))


def test_sharded_train_step(eight_devices, rng):
    """Full DP+tile sharded step runs and matches the unsharded step's loss
    on the first iteration."""
    model = FastStereoNet(SMALL)
    b, h, w = 4, 16, 32
    l = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    gt = jnp.full((b, h, w), 4.0)
    valid = jnp.ones((b, h, w), jnp.float32)

    opt = training.make_optimizer(lr=1e-3, warmup_steps=1, total_steps=100)
    state0 = training.create_train_state(model, jax.random.PRNGKey(0), opt, l[:1], r[:1])

    # Unsharded reference loss.
    ref_step = jax.jit(training.make_train_step(model, opt, max_disparity=32.0))
    _, ref_metrics = ref_step(state0, l, r, gt, valid)

    mesh = mesh_mod.make_mesh(MeshConfig(data=4, tile=2))
    state = training.create_train_state(model, jax.random.PRNGKey(0), opt, l[:1], r[:1])
    state = mesh_mod.replicate(mesh, state)
    step = training.make_sharded_train_step(model, opt, mesh, max_disparity=32.0)
    state, metrics = step(
        state,
        mesh_mod.shard_batch(mesh, l),
        mesh_mod.shard_batch(mesh, r),
        mesh_mod.shard_batch(mesh, gt),
        mesh_mod.shard_batch(mesh, valid),
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    assert int(state.step) == 1


def test_train_resume_roundtrip(tmp_path):
    """Continuation training restores params from a prior checkpoint."""
    import numpy as np

    from hobot_stereonet_tpu.runtime.train_loop import train_synthetic

    ck1 = str(tmp_path / "ck1")
    m1 = train_synthetic(steps=2, batch_size=1, checkpoint_dir=ck1, log_every=0)
    ck2 = str(tmp_path / "ck2")
    m2 = train_synthetic(steps=2, batch_size=1, checkpoint_dir=ck2,
                         log_every=0, resume_from=ck1, seed=7)
    assert np.isfinite(m2["final_loss"])

    # Structure mismatch must fail loudly.
    import pytest

    from hobot_stereonet_tpu.runtime import checkpoint as ckpt

    with pytest.raises(ValueError):
        ckpt.load_params(ck1, like={"not": {"the": "structure"}})
