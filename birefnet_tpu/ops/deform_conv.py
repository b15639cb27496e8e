"""Modulated deformable convolution v2 (XLA formulation).

TPU-native equivalent of the reference's Metal `deformable_im2col` kernel
(reference: src/aspp.rs:59-165, src/deform_conv.rs:102-215), which implements
torchvision-style `deform_conv2d` semantics: per-output-pixel learned offsets,
bilinear sampling with zero padding outside the image, and a multiplicative
modulation mask.

Design (blocked im2col): instead of materializing the full
[C*K, B*OH*OW] column buffer like the reference, output positions are
processed in spatial blocks under `lax.scan`. Each block performs ONE fused
gather of all K taps x 4 bilinear corners ([pb, K*4] row-gather on the
[H*W, C] feature map), a corner/modulation weighted reduction, and ONE
[pb, K*C] @ [K*C, outC] MXU contraction — a large-K matmul that keeps the
systolic array full. Peak im2col memory is bounded by the block size.

IMPORTANT: unlike the reference's CPU fallback, which silently ignores offsets
and degrades to a regular conv (reference: src/aspp.rs:183-185 — wrong by
design), this path implements *true* deformable sampling on every backend.

Layout: NHWC. offset/mask channel order follows torchvision:
offset[..., 2k] = dy, offset[..., 2k+1] = dx for row-major tap k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Per-block im2col budget (bytes); governs the scan block size.
_IM2COL_BUDGET = 96 * 1024 * 1024


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
    offset = offset.astype(jnp.float32)

    # ---- Sampling coordinates for every (position, tap): [B, P, K] ----
    base_y = (jnp.arange(oh, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(ow, dtype=jnp.float32) * stride - padding)
    tap_dy = (jnp.arange(kh, dtype=jnp.float32) * dilation)[:, None]  # [kh,1]
    tap_dx = (jnp.arange(kw, dtype=jnp.float32) * dilation)[None, :]  # [1,kw]
    tap_dy = jnp.broadcast_to(tap_dy, (kh, kw)).reshape(k)
    tap_dx = jnp.broadcast_to(tap_dx, (kh, kw)).reshape(k)

    off = offset.reshape(b, p, k, 2)
    ys = base_y[:, None].repeat(ow, 1).reshape(1, p, 1) + tap_dy + off[..., 0]
    xs = base_x[None, :].repeat(oh, 0).reshape(1, p, 1) + tap_dx + off[..., 1]

    # torchvision: sample is zero unless -1 < y < H and -1 < x < W.
    valid = (ys > -1) & (ys < h) & (xs > -1) & (xs < w)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly, lx = ys - y0, xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # ---- Corner indices and combined weights: [B, P, K, 4] ----
    idx_list, wt_list = [], []
    for cy, cx, wy, wx in (
        (y0i, x0i, 1.0 - ly, 1.0 - lx),
        (y0i, x0i + 1, 1.0 - ly, lx),
        (y0i + 1, x0i, ly, 1.0 - lx),
        (y0i + 1, x0i + 1, ly, lx),
    ):
        in_b = (cy >= 0) & (cy < h) & (cx >= 0) & (cx < w)
        idx_list.append(jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1))
        wt_list.append(wy * wx * (valid & in_b).astype(jnp.float32))
    # Merged [K*4] trailing axis (not [K, 4]): a 4-wide minor axis pads to
    # 128 lanes in the TPU T(8,128) layout — 36.6x memory expansion on the
    # saved scan inputs when this path is differentiated (measured 2x1.77 GB
    # at the 1024^2 dec1 site, worker job_207). K*4 (e.g. 196 -> 256 lanes)
    # pads ~1.3x instead; the body reshapes per-block in VMEM-sized pieces.
    idx = jnp.stack(idx_list, axis=-1)  # [B, P, K, 4] int32
    wts = jnp.stack(wt_list, axis=-1)   # [B, P, K, 4] f32
    # Fold the modulation mask into the corner weights.
    wts = wts * mask.astype(jnp.float32).reshape(b, p, k, 1)
    idx = idx.reshape(b, p, k * 4)
    wts = wts.astype(compute_dtype).reshape(b, p, k * 4)

    x_flat = x.reshape(b, h * w, c)
    w_kc = weight.reshape(k * c, out_c)

    # ---- Block size from the im2col budget ----
    bytes_per_pos = k * 4 * c * x.dtype.itemsize
    pb = max(1, min(p, _IM2COL_BUDGET // max(1, b * bytes_per_pos)))
    # Round to a divisor-friendly size: pad P up to a multiple of pb.
    nb = -(-p // pb)
    p_pad = nb * pb
    if p_pad != p:
        idx = jnp.pad(idx, ((0, 0), (0, p_pad - p), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, p_pad - p), (0, 0)))

    idx_blocks = idx.reshape(b, nb, pb, k * 4).transpose(1, 0, 2, 3)
    wts_blocks = wts.reshape(b, nb, pb, k * 4).transpose(1, 0, 2, 3)

    def block_body(carry, inp):
        idx_b, wts_b = inp  # [B, pb, K*4]
        flat_idx = idx_b.reshape(b, pb * k * 4)
        g = jnp.take_along_axis(x_flat, flat_idx[..., None], axis=1)
        g = g.reshape(b, pb, k, 4, c)
        # Bilinear + modulation reduction over the 4 corners.
        cols = jnp.einsum("bpkic,bpki->bpkc", g,
                          wts_b.reshape(b, pb, k, 4),
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        cols = cols.astype(compute_dtype).reshape(b, pb, k * c)
        out_b = jnp.einsum("bpj,jo->bpo", cols, w_kc.astype(compute_dtype),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        return carry, out_b.astype(compute_dtype)

    if nb == 1:
        _, out = block_body(None, (idx_blocks[0], wts_blocks[0]))
        out = out[:, :p]
    else:
        # Scan-over-remat: without the checkpoint, the scan's VJP stacks
        # every iteration's gather/cols residuals — [nb, B, pb, K, 4, C]
        # alone was a 6.19 GB allocation at the 1024^2 dec1 site (job_207,
        # HBM OOM at 18.6/15.75 GB). Rematerializing the body makes the
        # backward re-gather per block instead; forward-only tracing is
        # unaffected.
        body = jax.checkpoint(block_body, prevent_cse=False)
        _, out_blocks = lax.scan(body, None, (idx_blocks, wts_blocks))
        out = out_blocks.transpose(1, 0, 2, 3).reshape(b, p_pad, out_c)[:, :p]

    out = out.reshape(b, oh, ow, out_c)
    if bias is not None:
        out = out + bias.astype(compute_dtype)
    return out


def deform_conv2d_local(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    padding: int = 0,
    dilation: int = 1,
    radius: int = 4,
    tile: int = 16,
) -> jax.Array:
    """Locally-bounded modulated deformable conv: MXU sampling, no gathers.

    Same semantics as `deform_conv2d` EXCEPT offsets are clamped to
    [-radius, radius] — the `deform_mode="deformable-local"` contract.
    Exact when all |offset| <= radius (torchvision-style zero padding
    outside the image included); documented deviation otherwise.

    Design (the designated N1 deformable kernel, together with
    `deform_conv2d` for the unclamped exact mode — a Pallas route was
    built and retired, see ROADMAP.md "N1 retirement"): XLA's gather
    floor on this platform is
    ~0.1G rows/s, so sampling runs as matmuls instead. The output is tiled
    t x t; for each tile a FIXED source window (tile + tap extent + 2R+3
    halo) is cut with one contiguous dynamic_slice from a zero-padded input
    (no gather), and the bilinear+modulation sampling matrix factorizes as
    row/col one-hot outer products:
        sel[pk, sy, sx] = A[pk, sy] * B[pk, sx]
        A = (1-ly)*onehot(y0) + ly*onehot(y0+1)   (VPU iota compares)
        B = m  * ((1-lx)*onehot(x0) + lx*onehot(x0+1))
    so cols = sel @ window is ONE dense [t^2*K, S] x [S, C] MXU matmul per
    tile, followed by the usual [t^2, K*C] @ [K*C, outC] contraction
    (reference columns-then-matmul structure: src/aspp.rs:138-165).
    stride=1 only (all 20 model call sites are stride 1).

    Zero padding outside the image falls out of the zero-padded window:
    corners landing in padding read zeros, matching the exact path's
    per-corner weight zeroing.
    """
    b, h, w, c = x.shape
    kh, kw, _, out_c = weight.shape
    k = kh * kw
    oh = h + 2 * padding - (dilation * (kh - 1) + 1) + 1
    ow = w + 2 * padding - (dilation * (kw - 1) + 1) + 1
    compute_dtype = x.dtype

    ext_h = dilation * (kh - 1)
    ext_w = dilation * (kw - 1)
    s_h = tile + ext_h + 2 * radius + 3
    s_w = tile + ext_w + 2 * radius + 3

    n_th = -(-oh // tile)
    n_tw = -(-ow // tile)
    oh_pad, ow_pad = n_th * tile, n_tw * tile

    # Zero-pad the input so every tile's source window is in bounds and
    # out-of-image corners contribute exactly zero. Per-axis high-side halo
    # (exact): the last tile's window ends at
    #   (n_t-1)*tile + s = o_pad + ext + 2R + 3
    # in x_pad coordinates, and x_pad extent is halo_lo + in + halo_hi, so
    # with in = o - 2*padding + ext the requirement reduces to
    #   halo_hi >= (o_pad - o) + padding + radius + 2.
    halo_lo = padding + radius + 1
    halo_hi_h = padding + radius + 2 + (oh_pad - oh)
    halo_hi_w = padding + radius + 2 + (ow_pad - ow)
    x_pad = jnp.pad(x, ((0, 0), (halo_lo, halo_hi_h), (halo_lo, halo_hi_w),
                        (0, 0)))

    # Tap geometry (row-major taps, matching offset channel order).
    tap_dy = jnp.repeat(jnp.arange(kh, dtype=jnp.float32) * dilation, kw)
    tap_dx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dilation, kh)

    # Tile the per-position offset/modulation maps: [T, B, t*t, K(,2)].
    def to_tiles(a, lastdims):
        a = a.reshape(b, oh, ow, *lastdims)
        a = jnp.pad(a, ((0, 0), (0, oh_pad - oh), (0, ow_pad - ow))
                    + ((0, 0),) * len(lastdims))
        a = a.reshape(b, n_th, tile, n_tw, tile, *lastdims)
        a = jnp.moveaxis(a, (1, 3), (0, 1))  # [n_th, n_tw, b, t, t, ...]
        return a.reshape(n_th * n_tw, b, tile * tile, *lastdims)

    off_t = to_tiles(
        jnp.clip(offset.astype(jnp.float32), -radius, radius), (k, 2))
    mask_t = to_tiles(mask.astype(jnp.float32), (k,))

    # Local output coordinates within a tile.
    oy_loc = jnp.repeat(jnp.arange(tile, dtype=jnp.float32), tile)
    ox_loc = jnp.tile(jnp.arange(tile, dtype=jnp.float32), tile)

    iota_h = jnp.arange(s_h, dtype=jnp.int32)
    iota_w = jnp.arange(s_w, dtype=jnp.int32)
    w_kc = weight.reshape(k * c, out_c).astype(compute_dtype)
    pk = tile * tile * k

    def one_tile(carry, inp):
        t_idx, off_b, mask_b = inp  # scalar, [B, t*t, K, 2], [B, t*t, K]
        ti, tj = t_idx // n_tw, t_idx % n_tw
        win = lax.dynamic_slice(
            x_pad, (0, ti * tile, tj * tile, 0), (b, s_h, s_w, c))
        win = win.reshape(b, s_h * s_w, c)

        # Sample coords relative to the window origin (always in range:
        # offsets are clamped).
        ry = (oy_loc[:, None] + tap_dy[None, :] + off_b[..., 0]
              + (radius + 1))                      # [B, t*t, K]
        rx = (ox_loc[:, None] + tap_dx[None, :] + off_b[..., 1]
              + (radius + 1))
        y0 = jnp.floor(ry)
        x0 = jnp.floor(rx)
        ly = (ry - y0)[..., None]
        lx = (rx - x0)[..., None]
        y0 = y0.astype(jnp.int32)[..., None]       # [B, t*t, K, 1]
        x0 = x0.astype(jnp.int32)[..., None]

        a_sel = ((1.0 - ly) * (iota_h == y0) + ly * (iota_h == y0 + 1))
        b_sel = ((1.0 - lx) * (iota_w == x0) + lx * (iota_w == x0 + 1))
        b_sel = b_sel * mask_b[..., None]
        sel = (a_sel.reshape(b, pk, s_h, 1)
               * b_sel.reshape(b, pk, 1, s_w)).reshape(b, pk, s_h * s_w)

        cols = jnp.einsum(
            "bps,bsc->bpc", sel.astype(compute_dtype), win,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        cols = cols.astype(compute_dtype).reshape(b, tile * tile, k * c)
        out_b = jnp.einsum("bpj,jo->bpo", cols, w_kc,
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        return carry, out_b.astype(compute_dtype)

    t_indices = jnp.arange(n_th * n_tw, dtype=jnp.int32)
    if n_th * n_tw == 1:
        _, out = one_tile(None, (t_indices[0], off_t[0], mask_t[0]))
        out = out[None]
    else:
        _, out = lax.scan(one_tile, None, (t_indices, off_t, mask_t))

    # [T, B, t*t, outC] -> [B, OH, OW, outC]
    out = out.reshape(n_th, n_tw, b, tile, tile, out_c)
    out = jnp.moveaxis(out, (0, 1), (1, 3))
    out = out.reshape(b, oh_pad, ow_pad, out_c)[:, :oh, :ow]
    if bias is not None:
        out = out + bias.astype(compute_dtype)
    return out
