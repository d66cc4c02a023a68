"""Device mesh construction and sharding specs.

The reference is strictly single-device (one BPU; SURVEY.md §2 parallelism
table).  Scale-out here is designed TPU-first: a 2D logical mesh

  * ``data`` — shards the batch of stereo pairs (DP; "8 stereo pairs,
    tile-sharded" config in BASELINE.json)
  * ``tile`` — shards image rows (H).  This is the vision analog of
    sequence/context parallelism: the 4D cost volume scales with H, so
    row-tiling it across chips bounds per-chip HBM, with halo exchange
    for conv receptive fields (see :mod:`.halo`).

Everything goes through ``jax.sharding.NamedSharding`` + jit so GSPMD
inserts the collectives (all-gathers/collective-permutes for conv halos)
over ICI; nothing here hand-rolls NCCL-style comms.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

DATA_AXIS = "data"
TILE_AXIS = "tile"


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, tile) mesh.  With defaults (1,1) on one chip this
    degenerates gracefully to single-device execution under the same code
    path."""
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(
            f"mesh {cfg.data}x{cfg.tile} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(cfg.data, cfg.tile)
    return Mesh(grid, (DATA_AXIS, TILE_AXIS))


def auto_mesh_config(n_devices: Optional[int] = None) -> MeshConfig:
    """Pick a sensible (data, tile) split for n devices: favor data
    parallelism (perfectly efficient) and use tile sharding only when the
    batch can't cover the devices."""
    if n_devices is None:
        n_devices = jax.device_count()
    return MeshConfig(data=n_devices, tile=1)


# ---------------------------------------------------------------------------
# Canonical PartitionSpecs
# ---------------------------------------------------------------------------


def batch_image_spec(tile_rows: bool = True) -> P:
    """[B, H, W, C] images: batch over data, rows over tile."""
    return P(DATA_AXIS, TILE_AXIS if tile_rows else None, None, None)


def batch_map_spec(tile_rows: bool = True) -> P:
    """[B, H, W] per-pixel maps (disparity, depth)."""
    return P(DATA_AXIS, TILE_AXIS if tile_rows else None, None)


def replicated_spec() -> P:
    return P()


def shard_batch(mesh: Mesh, x, tile_rows: bool = True):
    """Place a host array onto the mesh with batch/row sharding."""
    spec = batch_image_spec(tile_rows) if x.ndim == 4 else batch_map_spec(tile_rows)
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
