"""w8a8 int8 network inference path.

The reference runs the ENTIRE network int8 on the BPU — input quantization
defaults at /root/reference/stereonet_infer/include/preprocess.h:236-240,
int32 output dequantized at /root/reference/stereonet_infer/src/parser.cpp:84.
This is the TPU-native analog: symmetric per-output-channel weight
quantization + dynamic per-sample activation quantization, with every
``nn.Conv`` in the network executed as an s8 x s8 -> s32 convolution
(``preferred_element_type=int32``), which XLA lowers onto the MXU's int8
path (nominally 2x bf16 peak on v5e; the measured end-to-end effect on the
serving pipeline is recorded in int8_report.json — at these layer widths
the pipeline is not MXU-bound, so do not expect 2x wall clock).  Norms,
nonlinearities, and the soft-argmin
head stay in floating point — standard w8a8 practice (quantizing them buys
nothing: they are bandwidth-bound, not MXU-bound).

No model edits and no separate checkpoint format: flax's
``nn.intercept_methods`` swaps the conv compute at apply time, so the same
float32 params serve both precisions (``quantized_apply`` below).  Symmetric
quantization (zero-point 0) keeps SAME zero-padding exact through the
quantized conv, unlike the reference's asymmetric zp=0.5 input scheme which
only ever feeds unpadded full frames.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

# Symmetric int8: clip to +/-127 (not -128) so negation is exact and the
# scale is shared across sign.
_QMAX = 127.0


def _as_tuple(v, n: int):
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def quantize_weight(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8 quantization of a conv kernel
    laid out [*spatial, cin, cout] (flax HWIO/DHWIO convention).

    Returns (q_kernel int8, scale f32[cout])."""
    k32 = kernel.astype(jnp.float32)
    reduce_axes = tuple(range(k32.ndim - 1))
    scale = jnp.max(jnp.abs(k32), axis=reduce_axes) / _QMAX
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(k32 / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def quantize_activation(x: jnp.ndarray):
    """Per-sample (axis 0) dynamic symmetric int8 quantization.

    Per-sample — not per-batch — so a frame's result is independent of
    which other frames share its micro-batch (the engine pads partial
    batches by repeating the last frame; per-batch scales would make
    padding change real outputs)."""
    x32 = x.astype(jnp.float32)
    reduce_axes = tuple(range(1, x32.ndim))
    scale = jnp.max(jnp.abs(x32), axis=reduce_axes, keepdims=True) / _QMAX
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(x32 / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def _int8_conv(mod: nn.Conv, x: jnp.ndarray) -> jnp.ndarray:
    """Execute a bound nn.Conv as an integer convolution.

    s8 lhs x s8 rhs -> s32 accumulate, then one fused dequant-rescale:
    y = conv(q_x, q_k) * s_x[b] * s_k[cout] + bias.  Linearity of conv in
    both operands makes the factored rescale exact.
    """
    kernel = mod.variables["params"]["kernel"]
    bias = mod.variables["params"].get("bias")
    nspatial = kernel.ndim - 2

    q_k, s_k = quantize_weight(kernel)
    q_x, s_x = quantize_activation(x)

    spec = "NHWC" if nspatial == 2 else "NDHWC"
    kspec = "HWIO" if nspatial == 2 else "DHWIO"
    dn = lax.conv_dimension_numbers(q_x.shape, q_k.shape, (spec, kspec, spec))
    y = lax.conv_general_dilated(
        q_x,
        q_k,
        window_strides=_as_tuple(mod.strides, nspatial),
        padding=mod.padding,
        rhs_dilation=_as_tuple(mod.kernel_dilation, nspatial),
        dimension_numbers=dn,
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * s_k)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    out_dtype = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dtype)


def _interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if type(mod) is nn.Conv and context.method_name == "__call__":
        return _int8_conv(mod, args[0])
    return next_fun(*args, **kwargs)


def quantized_apply(model: nn.Module, params, *args, **kwargs) -> Any:
    """``model.apply`` with every nn.Conv run as a w8a8 int8 conv.

    Same signature and pytree as ``model.apply({'params'|...}, ...)`` —
    drop-in for the engine/eval forward closures.  Weights requantize per
    call (cheap: one elementwise pass over params, fused by XLA); the same
    fp32 checkpoint therefore serves bf16 and int8 without conversion.
    """
    with nn.intercept_methods(_interceptor):
        return model.apply(params, *args, **kwargs)


def make_apply_fn(model: nn.Module, int8: bool = False):
    """Uniform forward entry: returns f(params, *args) for either path."""
    if int8:
        return functools.partial(quantized_apply, model)
    return model.apply
