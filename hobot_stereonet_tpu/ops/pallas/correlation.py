"""Pallas TPU kernel: fused correlation cost volume.

Computes corr[b, d, h, w] = sum_c feat_l[b,h,w,c] * feat_r[b,h,w-d,c] / sqrt(C)
for d in [0, D) in ONE pass over VMEM-resident row strips.

Why a kernel: the jnp formulation materializes D shifted copies of feat_r
(or relies on XLA to fuse them); here each row strip of feat_l / feat_r is
loaded into VMEM once and all D diagonal products are computed in-register,
bounding HBM traffic at 2 reads + 1 write per element regardless of D.
The strips live at 1/8 resolution so a full W row-strip fits comfortably
in VMEM (90x160x32 fp32 = 1.8 MB per eye at 720p input).

The jnp reference (``ops.cost_volume.build_correlation_volume``) is the
correctness oracle; tests compare against it in interpret mode on CPU and
compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(fl_ref, fr_ref, out_ref, *, num_disparities: int):
    """Block: fl [1, TH, W, C], fr [1, TH, W, C] -> out [1, TH, W, D].

    Reads whole blocks and indexes the loaded arrays (Mosaic rejects memref
    sub-slices whose lane dim is not 128-aligned, so no ``ref.at[0]``).
    """
    fl = fl_ref[:][0]
    fr = fr_ref[:][0]
    c = fl.shape[-1]
    scale = 1.0 / (c ** 0.5)
    w = fl.shape[1]

    cols = []
    for d in range(num_disparities):
        if d == 0:
            shifted = fr
        else:
            # fr shifted right by d along W, zero-filling the left margin.
            shifted = jnp.pad(fr[:, : w - d, :], ((0, 0), (d, 0), (0, 0)))
        cols.append(jnp.sum(fl * shifted, axis=-1) * scale)  # [TH, W]
    out_ref[:] = jnp.stack(cols, axis=-1).astype(out_ref.dtype)[None]


@functools.partial(
    jax.jit, static_argnames=("num_disparities", "row_tile", "interpret")
)
def correlation_volume_pallas(
    feat_l: jnp.ndarray,
    feat_r: jnp.ndarray,
    num_disparities: int,
    row_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, H, W, C] x2 -> [B, H, W, D] correlation volume (channel-last,
    matching FastStereoNet's aggregation layout)."""
    b, h, w, c = feat_l.shape
    assert h % row_tile == 0, f"H={h} not divisible by row_tile={row_tile}"

    grid = (b, h // row_tile)
    blk = pl.BlockSpec(
        (1, row_tile, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, row_tile, w, num_disparities),
        lambda i, j: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def kernel(fl_ref, fr_ref, out_ref):
        _corr_kernel(fl_ref, fr_ref, out_ref, num_disparities=num_disparities)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, num_disparities), feat_l.dtype),
        grid=grid,
        in_specs=[blk, blk],
        out_specs=out_spec,
        interpret=interpret,
    )(feat_l, feat_r)


def _softargmin_kernel(cost_ref, disp_ref, conf_ref, *, scale: float):
    """Fused soft-argmin + confidence over the last axis.

    Block: cost [1, TH, W, D] -> disp [1, TH, W], conf [1, TH, W].  One
    pass: max, exp, normalize, expectation — no [*, D] intermediate ever
    leaves VMEM.
    """
    cost = cost_ref[:][0].astype(jnp.float32)
    d = cost.shape[-1]
    neg = -cost
    m = jnp.max(neg, axis=-1, keepdims=True)
    e = jnp.exp(neg - m)
    denom = jnp.sum(e, axis=-1)
    # tpu.iota only emits integers; cast after.
    idx = jax.lax.broadcasted_iota(jnp.int32, e.shape, dimension=e.ndim - 1).astype(
        jnp.float32
    )
    expectation = jnp.sum(e * idx, axis=-1) / denom
    disp_ref[:] = (expectation * scale).astype(disp_ref.dtype)[None]
    conf_ref[:] = (jnp.max(e, axis=-1) / denom).astype(conf_ref.dtype)[None]


@functools.partial(jax.jit, static_argnames=("scale", "row_tile", "interpret"))
def soft_argmin_pallas(
    cost: jnp.ndarray,
    scale: float = 1.0,
    row_tile: int = 8,
    interpret: bool = False,
):
    """[B, H, W, D] cost (channel-last) -> (disp [B,H,W] * scale, conf)."""
    b, h, w, d = cost.shape
    assert h % row_tile == 0
    # Mosaic constraint: for the 3D [B,H,W] outputs the (sublane, lane)
    # dims of the block are (row_tile, W); W always equals the full array
    # dim, but row_tile must be 8-divisible or cover H entirely.  720p/8
    # features have H=90 (no 8-divisible tile divides it), so fall back to
    # full-H blocks — 90x160xD f32 is ~1.4 MB, comfortably VMEM-resident.
    if row_tile % 8 != 0 and row_tile != h:
        row_tile = h

    grid = (b, h // row_tile)
    in_spec = pl.BlockSpec(
        (1, row_tile, w, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, row_tile, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )

    def kernel(cost_ref, disp_ref, conf_ref):
        _softargmin_kernel(cost_ref, disp_ref, conf_ref, scale=scale)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ),
        grid=grid,
        in_specs=[in_spec],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(cost)
