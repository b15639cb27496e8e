"""Primitive NN layers (functional, NHWC, explicit param pytrees).

These replace candle's `Linear` / `Conv2d` / `LayerNorm` / `BatchNorm` modules
(reference L0, see SURVEY.md §1). Params are plain dicts of jnp arrays kept in
float32; compute runs in the activation dtype with float32 MXU accumulation.

Param schemas:
  linear:     {"kernel": [in, out], "bias": [out]?}
  conv2d:     {"kernel": [kh, kw, in, out] (HWIO), "bias": [out]?}
  layer_norm: {"scale": [C], "bias": [C]}
  batch_norm: {"scale": [C], "shift": [C]}   # precomputed at load:
      scale = gamma / sqrt(running_var + eps); shift = beta - running_mean*scale
      (inference-only BN, reference: src/decoder.rs:129 `forward_t(..., false)`)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jax.Array]


def linear(params: Params, x: jax.Array) -> jax.Array:
    """Dense layer on the last axis."""
    kernel = params["kernel"].astype(x.dtype)
    y = jnp.einsum("...i,io->...o", x, kernel,
                   precision=lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv2d(
    params: Params,
    x: jax.Array,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """NHWC conv with HWIO weights (symmetric padding, matching candle's
    Conv2dConfig semantics)."""
    kernel = params["kernel"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def conv2d_concat(
    params: Params,
    xs,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """conv2d over the channel-concatenation of `xs` WITHOUT materializing the
    concat: conv(concat(a, b)) == conv_a(a) + conv_b(b) with the kernel split
    along its input-channel axis. Saves a full read+write pass over the
    concatenated activation (the decoder's big tensors are exactly these
    concats; reference: src/birefnet.rs:323,338,353,368,374).

    Each part accumulates on the MXU in f32 but is STORED between parts in
    the activation dtype: conv outputs cannot stay in registers across
    fusions, and the f32 intermediates were measured at ~0.44 ms/call of
    extra HBM traffic at the dec1 ASPP site (batch 2). Under f32 inputs the
    cast is the identity (the oracle-parity path is bit-unchanged); under
    bf16 the partial sums round like every other bf16 activation."""
    kernel = params["kernel"]
    out = None
    off = 0
    for x in xs:
        c = x.shape[-1]
        sub = kernel[:, :, off:off + c, :].astype(x.dtype)
        y = lax.conv_general_dilated(
            x, sub,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = y if out is None else out + y
        off += c
    assert off == kernel.shape[2], "input channels must cover the kernel"
    out = out.astype(jnp.float32)
    if "bias" in params:
        out = out + params["bias"].astype(jnp.float32)
    return out.astype(xs[0].dtype)


def layer_norm(params: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, statistics in float32
    (reference uses eps=1e-5 everywhere, e.g. src/swin.rs:333).

    (Round-3 negative result: a one-pass E[x^2]-E[x]^2 variance for bf16
    inputs did NOT remove the materialized f32 convert feeding this LN at
    the stage outputs — the normalize itself still consumes the f32 copy —
    and changed nothing measurable; see ROADMAP.md.)"""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm_inference(params: Params, x: jax.Array) -> jax.Array:
    """Eval-mode BatchNorm as a precomputed channel-wise affine."""
    y = x.astype(jnp.float32) * params["scale"].astype(jnp.float32)
    y = y + params["shift"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU (reference: src/swin.rs:105 `gelu_erf`)."""
    xf = x.astype(jnp.float32)
    return (jax.nn.gelu(xf, approximate=False)).astype(x.dtype)


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, jnp.zeros((), dtype=x.dtype))
