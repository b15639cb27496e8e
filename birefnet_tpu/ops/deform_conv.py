"""Modulated deformable convolution v2 (XLA formulation).

TPU-native equivalent of the reference's Metal `deformable_im2col` kernel
(reference: src/aspp.rs:59-165, src/deform_conv.rs:102-215), which implements
torchvision-style `deform_conv2d` semantics: per-output-pixel learned offsets,
bilinear sampling with zero padding outside the image, and a multiplicative
modulation mask.

Instead of materializing the full [C*K, B*OH*OW] im2col buffer like the
reference, this formulation loops over the K kernel taps at trace time; each
tap does 4 corner row-gathers on the [B, H*W, C] feature map followed by an
MXU contraction against that tap's [C, outC] weight slice, accumulating into
the output. Peak memory stays at O(B*OH*OW*max(C, outC)) and every FLOP lands
on the MXU.

IMPORTANT: unlike the reference's CPU fallback, which silently ignores offsets
and degrades to a regular conv (reference: src/aspp.rs:183-185 — wrong by
design), this path implements *true* deformable sampling on every backend.

Layout: NHWC. offset/mask channel order follows torchvision:
offset[..., 2k] = Δy, offset[..., 2k+1] = Δx for row-major tap k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """Modulated deformable conv (torchvision deform_conv2d semantics).

    Args:
      x: [B, H, W, C] input.
      offset: [B, OH, OW, 2*kh*kw] sampling offsets ((dy, dx) per tap).
      mask: [B, OH, OW, kh*kw] modulation (caller applies 2*sigmoid,
        reference: src/aspp.rs:173-174).
      weight: [kh, kw, C, outC] (HWIO).
      bias: optional [outC].
      stride/padding/dilation: ints (symmetric).

    Returns:
      [B, OH, OW, outC].
    """
    b, h, w, c = x.shape
    kh, kw, _, out_c = weight.shape
    k = kh * kw
    oh = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    ow = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    p = oh * ow

    compute_dtype = x.dtype
    # Sampling coordinates in f32 regardless of compute dtype.
    offset = offset.astype(jnp.float32)
    mask = mask.astype(compute_dtype)

    # Static base grid for output pixels.
    base_y = (jnp.arange(oh, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(ow, dtype=jnp.float32) * stride - padding)
    base_y = base_y[:, None]  # [OH, 1]
    base_x = base_x[None, :]  # [1, OW]

    x_flat = x.reshape(b, h * w, c)
    w_flat = weight.reshape(k, c, out_c)

    out = jnp.zeros((b, p, out_c), dtype=jnp.float32)
    for tap in range(k):
        ky, kx = tap // kw, tap % kw
        dy = offset[..., 2 * tap]      # [B, OH, OW]
        dx = offset[..., 2 * tap + 1]
        ys = base_y[None] + ky * dilation + dy  # [B, OH, OW]
        xs = base_x[None] + kx * dilation + dx

        # torchvision: sample is zero unless -1 < y < H and -1 < x < W.
        valid = (ys > -1) & (ys < h) & (xs > -1) & (xs < w)

        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        ly = ys - y0
        lx = xs - x0
        hy = 1.0 - ly
        hx = 1.0 - lx

        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        corner_vals = []
        corner_wts = []
        for (cy, cx, wy, wx) in (
            (y0i, x0i, hy, hx),
            (y0i, x0i + 1, hy, lx),
            (y0i + 1, x0i, ly, hx),
            (y0i + 1, x0i + 1, ly, lx),
        ):
            in_b = (cy >= 0) & (cy < h) & (cx >= 0) & (cx < w)
            cyc = jnp.clip(cy, 0, h - 1)
            cxc = jnp.clip(cx, 0, w - 1)
            idx = (cyc * w + cxc).reshape(b, p)
            corner_vals.append(idx)
            wt = (wy * wx) * valid.astype(jnp.float32) * in_b.astype(jnp.float32)
            corner_wts.append(wt.reshape(b, p))

        # Single gather of the 4 corners: [B, P*4] -> [B, P*4, C]
        idx4 = jnp.stack(corner_vals, axis=-1).reshape(b, p * 4)
        gathered = jnp.take_along_axis(x_flat, idx4[..., None], axis=1)
        gathered = gathered.reshape(b, p, 4, c)
        wts = jnp.stack(corner_wts, axis=-1).astype(compute_dtype)  # [B, P, 4]
        sampled = jnp.einsum("bpic,bpi->bpc", gathered, wts,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        sampled = sampled.astype(compute_dtype)
        sampled = sampled * mask[..., tap].reshape(b, p, 1)

        # Tap contraction on the MXU: [B, P, C] @ [C, outC]
        out = out + jnp.einsum("bpc,co->bpo", sampled, w_flat[tap],
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)

    out = out.astype(compute_dtype).reshape(b, oh, ow, out_c)
    if bias is not None:
        out = out + bias.astype(compute_dtype)
    return out
