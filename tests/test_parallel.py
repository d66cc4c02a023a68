"""Mesh / sharding / halo-exchange tests on the virtual 8-device CPU mesh
(SURVEY.md §4: GSPMD tests with host-device-count faking)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hobot_stereonet_tpu.config import MeshConfig
from hobot_stereonet_tpu.parallel import halo as halo_mod
from hobot_stereonet_tpu.parallel import mesh as mesh_mod


def test_make_mesh_shapes(eight_devices):
    m = mesh_mod.make_mesh(MeshConfig(data=4, tile=2))
    assert m.shape == {"data": 4, "tile": 2}
    m1 = mesh_mod.make_mesh(MeshConfig(data=1, tile=1))
    assert m1.shape == {"data": 1, "tile": 1}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(MeshConfig(data=16, tile=1))


def test_shard_batch_and_replicate(eight_devices, rng):
    m = mesh_mod.make_mesh(MeshConfig(data=2, tile=4))
    x = jnp.asarray(rng.standard_normal((4, 16, 8, 3)).astype(np.float32))
    xs = mesh_mod.shard_batch(m, x)
    assert xs.sharding.spec == P("data", "tile", None, None)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))
    params = {"w": jnp.ones((3, 3))}
    ps = mesh_mod.replicate(m, params)
    assert ps["w"].sharding.spec == P()


def test_halo_exchange_matches_padded_reference(eight_devices, rng):
    """Row-sharded conv-like stencil via halo_map must equal the unsharded
    computation — the correctness property for sharded aggregation."""
    m = mesh_mod.make_mesh(MeshConfig(data=1, tile=8))
    b, h, w = 2, 32, 8
    halo = 1
    x = jnp.asarray(rng.standard_normal((b, h, w)).astype(np.float32))

    def stencil(p):
        # vertical 3-tap average with zero boundary (shape preserving)
        up = jnp.pad(p, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        down = jnp.pad(p, ((0, 0), (0, 1), (0, 0)))[:, 1:]
        return (up + p + down) / 3.0

    # Unsharded reference.
    ref = np.asarray(stencil(x))

    sharded_fn = halo_mod.halo_map(stencil, m, halo=halo)
    out = np.asarray(sharded_fn(x))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_halo_exchange_internal(eight_devices):
    """Each shard sees its neighbors' rows; edges see zeros."""
    from jax import shard_map

    m = mesh_mod.make_mesh(MeshConfig(data=1, tile=8))
    h = 16  # 2 rows per shard
    x = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1).repeat(4, axis=2)

    def local(p):
        return halo_mod.exchange_row_halos(p, halo=1)

    out = shard_map(
        local, mesh=m,
        in_specs=(P(None, "tile", None),),
        out_specs=P(None, "tile", None),
    )(x)
    out = np.asarray(out)  # [1, 8 * 4, 4] (each shard emits 2+2 halo rows)
    shard0 = out[0, :4, 0]
    np.testing.assert_array_equal(shard0, [0.0, 0.0, 1.0, 2.0])  # zero halo above
    shard1 = out[0, 4:8, 0]
    np.testing.assert_array_equal(shard1, [1.0, 2.0, 3.0, 4.0])
    shard7 = out[0, -4:, 0]
    np.testing.assert_array_equal(shard7, [13.0, 14.0, 15.0, 0.0])  # zero halo below


def test_data_parallel_forward_matches_single(eight_devices, rng):
    """DP-sharded jit forward == single-device forward (GSPMD correctness)."""
    from hobot_stereonet_tpu.models import FastStereoNet
    from tests.test_model import SMALL

    model = FastStereoNet(SMALL)
    l = jnp.asarray(rng.standard_normal((8, 16, 32, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((8, 16, 32, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), l[:1], r[:1])

    single = jax.jit(lambda p, a, b: model.apply(p, a, b)["disparity"])(params, l, r)

    m = mesh_mod.make_mesh(MeshConfig(data=8, tile=1))
    ls, rs = mesh_mod.shard_batch(m, l), mesh_mod.shard_batch(m, r)
    ps = mesh_mod.replicate(m, params)
    sharded = jax.jit(
        lambda p, a, b: model.apply(p, a, b)["disparity"],
        out_shardings=NamedSharding(m, mesh_mod.batch_map_spec()),
    )(ps, ls, rs)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded), atol=5e-2)


def test_tile_sharded_classic_forward_matches_single(eight_devices, rng):
    """Row-tiled (tile=4) classic StereoNet forward == unsharded — GSPMD
    halo handling for the stride-2 tower + 3D aggregation is correct."""
    from hobot_stereonet_tpu.models import StereoNet
    from tests.test_model import SMALL

    model = StereoNet(SMALL)
    l = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), l[:1], r[:1])
    single = jax.jit(lambda p, a, b: model.apply(p, a, b)["disparity"])(params, l, r)

    m = mesh_mod.make_mesh(MeshConfig(data=2, tile=4))
    ls = mesh_mod.shard_batch(m, l)
    rs = mesh_mod.shard_batch(m, r)
    ps = mesh_mod.replicate(m, params)
    sharded = jax.jit(
        lambda p, a, b: model.apply(p, a, b)["disparity"],
        out_shardings=NamedSharding(m, mesh_mod.batch_map_spec()),
    )(ps, ls, rs)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded), atol=5e-2)


def test_remat_gradients(rng):
    """remat=True computes identical gradients (checkpointing is
    numerics-preserving) while enabling memory savings."""
    import dataclasses

    from hobot_stereonet_tpu.models import FastStereoNet
    from tests.test_model import SMALL

    cfg_r = dataclasses.replace(SMALL, remat=True)
    l = jnp.asarray(rng.standard_normal((1, 16, 32, 3)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((1, 16, 32, 3)).astype(np.float32))

    m0, m1 = FastStereoNet(SMALL), FastStereoNet(cfg_r)
    params = jax.jit(m0.init)(jax.random.PRNGKey(0), l, r)

    g0 = jax.jit(jax.grad(lambda p: jnp.mean(m0.apply(p, l, r)["disparity"])))(params)
    g1 = jax.jit(jax.grad(lambda p: jnp.mean(m1.apply(p, l, r)["disparity"])))(params)
    a = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g0)])
    b = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g1)])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
