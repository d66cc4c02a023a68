"""Training harness: multiscale disparity loss + (sharded) train step.

The reference never trains — its model arrives as a pre-compiled blob
trained offline with OpenExplorer HAT on SceneFlow (``README.md:5``).  A
complete framework must own that capability, so this module provides the
SceneFlow-style supervised recipe for the StereoNet family: smooth-L1 over
the coarse-to-fine pyramid, Adam(W), and a jit/pjit train step whose batch
shards over the (data, tile) mesh with replicated params (gradients are
psum-reduced by GSPMD automatically from the replicated-out sharding).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import batch_image_spec, batch_map_spec


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def _downsample_disparity(gt: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, H, W] ground truth -> [B, h, w].  Bilinear resize of *positions*;
    disparity values stay in full-res px units (our pyramid convention —
    see stereonet.py: coarse disparity is pre-scaled by k)."""
    if gt.shape[1] == h and gt.shape[2] == w:
        return gt
    return jax.image.resize(gt, (gt.shape[0], h, w), method="bilinear")


def multiscale_loss(
    outputs: Dict[str, Any],
    gt_disparity: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    max_disparity: float = 192.0,
    level_weights: Optional[Tuple[float, ...]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Smooth-L1 supervision over every pyramid level.

    ``valid`` masks invalid GT pixels (KITTI sparse GT; SceneFlow uses
    disp < max_disparity as validity, standard practice).
    """
    pyramid = outputs["pyramid"]
    if valid is None:
        valid = (gt_disparity > 0) & (gt_disparity < max_disparity)
    valid = valid.astype(jnp.float32)

    if level_weights is None:
        # Emphasize the final output; coarse levels get smaller weights.
        level_weights = tuple(0.5 ** (len(pyramid) - 1 - i) for i in range(len(pyramid)))

    total = 0.0
    for w_lvl, pred in zip(level_weights, pyramid):
        h, w = pred.shape[1], pred.shape[2]
        gt_s = _downsample_disparity(gt_disparity, h, w)
        v_s = _downsample_disparity(valid, h, w)
        v_s = (v_s > 0.5).astype(jnp.float32)
        err = smooth_l1(pred.astype(jnp.float32) - gt_s)
        total = total + w_lvl * jnp.sum(err * v_s) / jnp.maximum(jnp.sum(v_s), 1.0)

    final = pyramid[-1].astype(jnp.float32)
    epe = jnp.sum(jnp.abs(final - gt_disparity) * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return total, {"loss": total, "epe": epe}


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover - pytree plumbing
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):  # pragma: no cover
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-4,
                   warmup_steps: int = 500, total_steps: int = 100_000):
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def create_train_state(model, rng, optimizer, sample_left, sample_right) -> TrainState:
    params = jax.jit(model.init)(rng, sample_left, sample_right)
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_train_step(model, optimizer, max_disparity: float = 192.0) -> Callable:
    """Returns step(state, left, right, gt, valid) -> (state, metrics)."""

    def step(state: TrainState, left, right, gt, valid=None):
        def loss_fn(p):
            out = model.apply(p, left, right)
            return multiscale_loss(out, gt, valid, max_disparity)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def make_sharded_train_step(model, optimizer, mesh: Mesh,
                            max_disparity: float = 192.0,
                            tile_rows: bool = True) -> Callable:
    """jit the train step over a (data, tile) mesh.

    Inputs: batch sharded P('data','tile',...) — DP over batch, row tiling
    over H.  Params/opt state replicated; XLA turns the implied gradient
    reduction into psums over ICI.  Donates the state so params update
    in place in HBM.
    """
    step = make_train_step(model, optimizer, max_disparity)
    repl = NamedSharding(mesh, P())
    img = NamedSharding(mesh, batch_image_spec(tile_rows))
    dmap = NamedSharding(mesh, batch_map_spec(tile_rows))

    return jax.jit(
        step,
        in_shardings=(repl, img, img, dmap, dmap),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
