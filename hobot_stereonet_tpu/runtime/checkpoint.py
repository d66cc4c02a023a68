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
    """Load a params pytree.

    Accepts either a bare params checkpoint or a full train-state
    checkpoint (``{"params", "opt_state", "step"}`` as written by
    :func:`save_train_state`) — in the latter case the ``params`` subtree
    is extracted.  ``like`` (optional) validates the restored structure.
    """
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path)
    if isinstance(restored, dict) and "params" in restored and "opt_state" in restored:
        restored = restored["params"]
    if like is not None:
        import jax.tree_util as jtu

        want = jtu.tree_structure(jax.device_get(like))
        got = jtu.tree_structure(restored)
        if want != got:
            raise ValueError(
                f"checkpoint structure mismatch: expected {want}, got {got}"
            )
    return restored


def save_train_state(path: str, state) -> None:
    """Save TrainState (params + opt state + step)."""
    save_params(path, {"params": state.params, "opt_state": state.opt_state,
                       "step": state.step})


def load_train_state(path: str, like) -> Any:
    from .training import TrainState

    tree = _checkpointer().restore(os.path.abspath(path))
    return TrainState(tree["params"], tree["opt_state"], tree["step"])
