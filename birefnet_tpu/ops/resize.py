"""On-device resize ops with PyTorch-parity semantics.

The reference uses its candle fork's `upsample_bilinear2d(h, w, align_corners)`
pervasively (reference: src/birefnet.rs:332,372-373,425,435-438,450-452) with
align_corners=True, plus `upsample_nearest2d` in the ASPP global-pool branch
(reference: src/aspp.rs:318).

TPU-native design: align-corners bilinear resize is expressed as two separable
interpolation matmuls (one along H, one along W). The interpolation matrices
are computed at trace time from static shapes, so the whole resize lowers to
two MXU-friendly dense contractions — no gathers, no dynamic shapes.

All functions operate on NHWC tensors.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _align_corners_matrix(src: int, dst: int) -> np.ndarray:
    """Dense [dst, src] bilinear interpolation matrix, align_corners=True.

    PyTorch semantics: source coordinate of output index i is
    ``i * (src - 1) / (dst - 1)`` (or 0 when dst == 1).
    """
    m = np.zeros((dst, src), dtype=np.float32)
    if src == 1 or dst == 1:
        # dst==1 -> sample source coordinate 0; src==1 -> only one sample.
        m[:, 0] = 1.0
        return m
    scale = (src - 1) / (dst - 1)
    coords = np.arange(dst, dtype=np.float64) * scale
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, src - 1)
    hi = np.minimum(lo + 1, src - 1)
    frac = (coords - lo).astype(np.float32)
    rows = np.arange(dst)
    m[rows, lo] += 1.0 - frac
    m[rows, hi] += frac
    return m


def _apply_separable(x: jax.Array, out_h: int, out_w: int,
                     matrix_fn) -> jax.Array:
    """Apply a separable [dst, src] row/col filter pair on NHWC (4D) or
    channel-less NHW (3D) input.

    Contraction ORDER is chosen to minimize data movement: on TPU the
    W-contraction (``ow,bhwc->bhoc``) reads x in its natural NHWC layout
    (w sublanes x c lanes tiles feed the MXU directly), while the
    H-contraction needs an h-minor relayout copy of its operand (measured:
    a 0.16 ms copy of the 25 MB x1 feature for the cxt 256->32 downscale,
    batch 2). So the H-contraction runs on whichever side of the W resize
    is smaller: W first when downscaling W, H first when upscaling W.
    Numerics: each contraction accumulates in f32 and rounds once to the
    storage dtype — identical error structure in either order.

    The 3D form exists for the single-channel logit/mask path: a
    [B, H, W, 1] tensor occupies 1/128 of every lane tile and its W-resize
    is an N=1 matmul; as [B, H, W] the same data rides full W-lane tiles
    (measured on the decoder head at 1024^2 — see decoder_forward).
    """
    if x.ndim == 3:
        b, h, w = x.shape
        eq_h, eq_w = "oh,bhw->bow", "ow,bhw->bho"
    else:
        b, h, w, _ = x.shape
        eq_h, eq_w = "oh,bhwc->bowc", "ow,bhwc->bhoc"
    orig_dtype = x.dtype

    def along_h(x):
        mh = jnp.asarray(matrix_fn(h, out_h), dtype=orig_dtype)
        return jnp.einsum(eq_h, mh, x,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32).astype(orig_dtype)

    def along_w(x):
        mw = jnp.asarray(matrix_fn(w, out_w), dtype=orig_dtype)
        return jnp.einsum(eq_w, mw, x,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32).astype(orig_dtype)

    if out_w < w:
        if w != out_w:
            x = along_w(x)
        if h != out_h:
            x = along_h(x)
    else:
        if h != out_h:
            x = along_h(x)
        if w != out_w:
            x = along_w(x)
    return x


def resize_bilinear_align_corners(
    x: jax.Array, out_h: int, out_w: int
) -> jax.Array:
    """Bilinear resize with align_corners=True on NHWC input.

    Matches PyTorch ``F.interpolate(..., mode="bilinear", align_corners=True)``
    and the candle fork's ``upsample_bilinear2d(h, w, true)``
    (reference: src/birefnet.rs:332 and 7 sibling call sites).
    """
    h, w = x.shape[1:3]
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(x, out_h, out_w, _align_corners_matrix)


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize on NHWC input.

    Matches candle's ``upsample_nearest2d`` (floor of src-index scaling),
    used by the ASPP global-average-pool branch (reference: src/aspp.rs:318),
    where it upsamples from 1x1 — i.e. a pure broadcast.
    """
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    if h == 1 and w == 1:
        return jnp.broadcast_to(x, (b, out_h, out_w, c))
    # floor(i * src / dst) index map, computed statically.
    rows = np.floor(np.arange(out_h) * h / out_h).astype(np.int32)
    cols = np.floor(np.arange(out_w) * w / out_w).astype(np.int32)
    x = jnp.take(x, jnp.asarray(rows), axis=1)
    x = jnp.take(x, jnp.asarray(cols), axis=2)
    return x


@functools.lru_cache(maxsize=None)
def _lanczos3_matrix(src: int, dst: int) -> np.ndarray:
    """Dense [dst, src] Lanczos-3 resize matrix, half-pixel centers,
    antialiased on downscale — matching the `image` crate's Lanczos3 filter
    used for the output-mask resize (reference: examples/infer_image.rs:103-108).
    """
    a = 3.0
    scale = src / dst
    support = a * max(scale, 1.0)
    m = np.zeros((dst, src), dtype=np.float64)
    src_idx = np.arange(src, dtype=np.float64)

    def lanczos(t: np.ndarray) -> np.ndarray:
        t = np.abs(t)
        out = np.where(
            t < 1e-8, 1.0,
            a * np.sin(np.pi * t) * np.sin(np.pi * t / a)
            / (np.pi * np.pi * t * t))
        return np.where(t >= a, 0.0, out)

    norm = max(scale, 1.0)
    for i in range(dst):
        center = (i + 0.5) * scale - 0.5
        t = (src_idx - center) / norm
        weights = np.where(np.abs(src_idx - center) <= support, lanczos(t), 0.0)
        s = weights.sum()
        m[i] = weights / s if s != 0 else 0.0
    return m.astype(np.float32)


def resize_lanczos3(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Separable Lanczos-3 resize on NHWC input (two dense matmuls)."""
    h, w = x.shape[1:3]
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(x, out_h, out_w, _lanczos3_matrix)


def resize_bilinear_half_pixel(
    x: jax.Array, out_h: int, out_w: int, antialias: bool = True
) -> jax.Array:
    """Half-pixel-centered bilinear (triangle-filter) resize on NHWC input.

    This is the input preprocessing resize: the reference host path uses the
    `image` crate's Triangle filter (reference: examples/infer_image.rs:49),
    which is an antialiased bilinear with half-pixel centers. On TPU we express
    it as two separable dense matmuls computed at trace time.
    """
    h, w = x.shape[1:3]
    if (h, w) == (out_h, out_w):
        return x

    @functools.lru_cache(maxsize=None)
    def tri_matrix(src: int, dst: int) -> np.ndarray:
        scale = src / dst
        support = max(scale, 1.0) if antialias else 1.0
        m = np.zeros((dst, src), dtype=np.float64)
        src_idx = np.arange(src, dtype=np.float64)
        for i in range(dst):
            center = (i + 0.5) * scale - 0.5
            weights = np.clip(1.0 - np.abs(src_idx - center) / support, 0.0, None)
            s = weights.sum()
            if s > 0:
                m[i] = weights / s
            else:
                m[i, int(np.clip(round(center), 0, src - 1))] = 1.0
        return m.astype(np.float32)

    return _apply_separable(x, out_h, out_w, tri_matrix)
