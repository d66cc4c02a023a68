"""Orbax checkpointing for model params and training state.

The reference has no checkpoint/resume at all — its model is a static
``.hbm`` file loaded once at startup (``stereonet_node.cpp:136``;
SURVEY.md §5).  Here params, optimizer state, and step counter round-trip
through orbax, and the SLAM map state (pose graph) snapshots alongside so a
restarted host rejoins (SURVEY.md §5 failure-recovery plan).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> None:
    """Save a params pytree to ``path`` (directory, created/overwritten)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(params), force=True)


def load_params(path: str, like: Optional[Any] = None) -> Any:
    """Load a params pytree.  If ``like`` is given, restores with matching
    structure/dtypes (required when the tree contains non-default leaves)."""
    path = os.path.abspath(path)
    if like is not None:
        import orbax.checkpoint as ocp

        return _checkpointer().restore(path, item=jax.device_get(like))
    return _checkpointer().restore(path)


def save_train_state(path: str, state) -> None:
    """Save TrainState (params + opt state + step)."""
    save_params(path, {"params": state.params, "opt_state": state.opt_state,
                       "step": state.step})


def load_train_state(path: str, like) -> Any:
    from .training import TrainState

    tree = load_params(
        path,
        like={"params": like.params, "opt_state": like.opt_state, "step": like.step},
    )
    return TrainState(tree["params"], tree["opt_state"], tree["step"])
