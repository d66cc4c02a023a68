"""Pallas TPU kernels: fused correlation cost volume + soft-argmin.

** MEASURED NEGATIVE RESULT — not wired into any model. **

On-chip (v5e, `scripts/bench_kernels.py`, model shapes: 1/8-res features of
720p, D=24, chained-scan methodology):

  correlation_volume:  XLA 0.80 ms vs Pallas 1.47 ms @ B=8  (0.54x)
                       XLA 3.25 ms vs Pallas 5.05 ms @ B=32 (0.64x)
  soft_argmin+conf:    XLA 0.51-0.59 ms; Pallas FAILS to compile at these
                       shapes (Mosaic scoped-VMEM stack OOM: H=90 is not
                       8-divisible so blocks fall back to full-H, and the
                       [90,160,24] f32 softmax intermediates exceed the
                       16 MB scoped-vmem limit).

Why XLA wins here: both ops are elementwise-reduce patterns XLA already
fuses well, the operands are small (1.8 MB/eye strips), and the hand
kernel's un-tileable lane dim (W=160, not 128-divisible) forces whole-row
blocks that leave the VPU under-occupied.  Contrast with the NV12 ingest
kernel (`preprocess_kernel.py`), which DOES win — its XLA lowering is
gather-based and bandwidth-bound, exactly where a fused one-pass kernel
helps.

Kept as tested reference implementations (the jnp path
``ops.cost_volume.build_correlation_volume`` remains the oracle; tests
compare in interpret mode on CPU and compiled on TPU) so the negative
result stays reproducible if shapes or Mosaic change.
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
