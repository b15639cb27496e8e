"""Fused on-device pre/post-processing pipeline.

The reference does all image preprocessing on the host with per-pixel Rust
loops (triangle resize, ImageNet normalize; reference:
examples/infer_image.rs:44-67) and the mask post-resize with a host Lanczos3
filter (reference: examples/infer_image.rs:96-108).

TPU-native design: the TPU ingests raw uint8 frames; resize (antialiased
triangle), /255, ImageNet normalization, the model forward, sigmoid, and the
Lanczos3 resize back to the original frame size all live inside ONE jitted
program — the only host<->device traffic is uint8 in, uint8 (or f32) mask out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .configs import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    BiRefNetConfig,
    ComputeConfig,
)
from .models import birefnet
from .ops.resize import resize_bilinear_half_pixel, resize_lanczos3


def preprocess(
    frames_u8: jax.Array,
    size: Tuple[int, int] = (1024, 1024),
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Raw [B, H, W, 3] uint8 frames -> normalized [B, size, size, 3].

    Resize uses an antialiased triangle filter (the reference's host-side
    `resize_exact(..., Triangle)`, reference: examples/infer_image.rs:49),
    then ImageNet mean/std normalization
    (reference: examples/infer_image.rs:53-63) — all on device.
    """
    x = frames_u8.astype(jnp.float32) / 255.0
    x = resize_bilinear_half_pixel(x, size[1], size[0])
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    return x.astype(dtype)


def postprocess(
    mask: jax.Array,
    out_h: int,
    out_w: int,
    as_uint8: bool = True,
) -> jax.Array:
    """[B, h, w, 1] (or channel-less [B, h, w]) sigmoid mask ->
    [B, out_h, out_w] resized mask.

    Lanczos3 resize back to the original frame size, then u8 quantization
    (reference: examples/infer_image.rs:96-108), on device. The channel-less
    form is the fast path (full-lane resize matmuls; see decoder head).
    """
    if mask.ndim == 4:
        mask = mask[..., 0]
    m = resize_lanczos3(mask.astype(jnp.float32), out_h, out_w)
    if as_uint8:
        m = jnp.clip(jnp.round(m * 255.0), 0.0, 255.0).astype(jnp.uint8)
    return m


def make_infer_fn(
    params,
    cfg: BiRefNetConfig,
    compute: ComputeConfig = ComputeConfig(),
    out_size: Optional[Tuple[int, int]] = None,
    as_uint8: bool = True,
):
    """Build the fully fused uint8-in -> mask-out inference function.

    Args:
      out_size: (h, w) of the returned mask; defaults to the input frame size.
    Returns a jitted fn: [B, H, W, 3] uint8 -> [B, out_h, out_w] mask.
    """
    from .params import (cast_matmul_weights, quantize_attn_int8,
                         quantize_mlp_int8)
    if compute.int8_mlp:
        params = quantize_mlp_int8(params)
    if compute.int8_attn:
        params = quantize_attn_int8(params)
    params = cast_matmul_weights(params, compute.dtype)

    @jax.jit
    def infer(frames_u8: jax.Array) -> jax.Array:
        b, h, w, _ = frames_u8.shape
        oh, ow = out_size if out_size is not None else (h, w)
        x = preprocess(frames_u8, cfg.size, dtype=compute.dtype)
        mask = birefnet.forward(params, cfg, x, compute)
        return postprocess(mask, oh, ow, as_uint8=as_uint8)

    return infer
