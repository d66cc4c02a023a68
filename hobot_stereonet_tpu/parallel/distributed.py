"""Multi-host process-group initialization.

TPU-native replacement for the reference's inter-process comm layer (ROS2
DDS + hbmem shared memory, single host only — SURVEY.md §5): on a pod
slice, one Python process runs per host and ``jax.distributed.initialize``
forms the process group; GSPMD then inserts ICI/DCN collectives for any
jit'd computation over the global mesh.  This module is the composition
root the launch files played in the reference (C11): call
:func:`initialize` first in every process, then build the global mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Join (or skip, when single-process) the multi-host process group.

    Arguments default from the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``); on most managed TPU pods
    ``jax.distributed.initialize()`` auto-discovers everything and the env
    vars are unnecessary.  Returns a summary dict for logging.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    multi = (num_processes or 1) > 1 or coordinator_address is not None
    if multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "multi_process": multi,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(data: Optional[int] = None, tile: int = 1):
    """Build the (data, tile) mesh over ALL processes' devices.  With
    defaults, every global device lands on the data axis."""
    from ..config import MeshConfig
    from .mesh import make_mesh

    n = jax.device_count()
    if data is None:
        data = n // tile
    return make_mesh(MeshConfig(data=data, tile=tile), devices=jax.devices())
