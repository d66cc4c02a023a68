"""Explicit halo exchange for row-tiled spatial computation.

When image rows are sharded over the ``tile`` mesh axis, any op with a
vertical receptive field (2D/3D convs in aggregation) needs ``halo`` rows
from the neighboring shards.  Under plain jit GSPMD inserts these
collective-permutes automatically; this module provides the *explicit*
shard_map building block for code that manages its own tiles (the Pallas
aggregation kernel, and tests that pin down boundary semantics).

Pattern: bidirectional ``lax.ppermute`` along ``tile`` — each shard sends
its top rows to the previous neighbor and its bottom rows to the next, then
concatenates [halo_from_prev | local | halo_from_next].  Edge shards get
zero padding (SAME-conv semantics at the true image boundary).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TILE_AXIS


def exchange_row_halos(x: jnp.ndarray, halo: int, axis_name: str = TILE_AXIS,
                       row_axis: int = 1) -> jnp.ndarray:
    """Inside shard_map over ``axis_name``: [B, H_local, ...] ->
    [B, H_local + 2*halo, ...] with neighbor rows (zeros at the image edge).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top = lax.slice_in_dim(x, 0, halo, axis=row_axis)
    bot = lax.slice_in_dim(x, x.shape[row_axis] - halo, x.shape[row_axis], axis=row_axis)

    # Send my bottom rows forward (i -> i+1): received block is the halo
    # *above* my local rows.  Send my top rows backward (i -> i-1): received
    # block is the halo *below*.
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    halo_above = lax.ppermute(bot, axis_name, perm=fwd)
    halo_below = lax.ppermute(top, axis_name, perm=bwd)

    # Zero out wrapped-around halos at the true image boundary.
    zeros = jnp.zeros_like(top)
    halo_above = jnp.where(idx == 0, zeros, halo_above)
    halo_below = jnp.where(idx == n - 1, zeros, halo_below)

    return jnp.concatenate([halo_above, x, halo_below], axis=row_axis)


def halo_map(fn: Callable, mesh: Mesh, halo: int, row_axis: int = 1):
    """Wrap ``fn`` (local [B, H_local + 2*halo, ...] -> [B, H_local + 2*halo, ...])
    into a row-sharded global function via shard_map: exchange halos, apply
    fn, crop the halo back off.  ``fn`` must be shape-preserving over rows.
    """
    from jax import shard_map

    def local(x):
        padded = exchange_row_halos(x, halo, row_axis=row_axis)
        out = fn(padded)
        return lax.slice_in_dim(out, halo, out.shape[row_axis] - halo, axis=row_axis)

    ndim_spec = lambda nd: P(None, *(TILE_AXIS if i == row_axis else None for i in range(1, nd)))

    def wrapped(x):
        spec = ndim_spec(x.ndim)
        return shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)

    return wrapped
