"""Swin Transformer v1 backbone (TPU-native, functional, NHWC).

Covers the reference's backbone layer-for-layer in behavior
(reference: src/swin.rs): PatchEmbed, Mlp (exact GELU), WindowAttention with
precomputed relative-position bias, SwinTransformerBlock with cyclic shift,
PatchMerging, BasicLayer with the SW-MSA mask, and the 4-stage SwinTransformer
that emits per-stage LayerNormed multi-scale features.

TPU-native design choices (not a translation):
- Activations stay [B, H, W, C] (NHWC) end to end; there is no NCHW round-trip
  (the reference flattens to [B, HW, C] tokens and reshapes per block,
  reference: src/swin.rs:774,356).
- The SW-MSA mask and relative-position bias are trace-time constants —
  the reference rebuilds the mask on the host every forward
  (reference: src/swin.rs:584,603-655).
- Attention runs as one batched einsum over all windows*heads (or the fused
  Pallas kernel), never a per-window dispatch loop.

Param tree (per checkpoint schema, see params.py):
  patch_embed: {proj: conv2d, norm: layer_norm}
  layers_{i}: {blocks_{j}: {norm1, attn: {qkv, proj, cached_bias}, norm2,
               mlp: {fc1, fc2}}, downsample: {norm, reduction}?}
  norm_{i}: layer_norm
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from ..configs import ComputeConfig, SwinConfig
from ..ops import attention as attn_ops
from ..ops import layers as L
from ..ops import window as W


def mlp_forward(params, x: jax.Array) -> jax.Array:
    """fc1 -> exact GELU -> fc2 (reference: src/swin.rs:103-107)."""
    x = L.linear(params["fc1"], x)
    x = L.gelu_exact(x)
    return L.linear(params["fc2"], x)


def _ln(params, x: jax.Array, compute: ComputeConfig) -> jax.Array:
    """LayerNorm for the standalone (non-kernel-fused) sites.

    On the Pallas path the XLA lowering materializes the f32 upcast of the
    whole activation in HBM (measured ~0.2 ms/call at the stage-0 output,
    batch 2); the row-LN kernel streams bf16 tiles instead. Same f32-stats
    contract either way (ops/pallas/row_ln.py)."""
    if compute.use_flash_attention:
        from ..ops.pallas import row_ln
        return row_ln.layer_norm_rows(params, x)
    return L.layer_norm(params, x)


def window_attention_forward(
    params,
    x: jax.Array,
    mask: Optional[jax.Array],
    num_heads: int,
    compute: ComputeConfig,
) -> jax.Array:
    """W-MSA on window tokens [B_, N, C] (reference: src/swin.rs:212-311).

    `params["cached_bias"]` is the [heads, N, N] relative-position bias,
    precomputed at load exactly as the reference does
    (reference: src/swin.rs:146-152).
    """
    b_, n, c = x.shape
    head_dim = c // num_heads

    qkv = L.linear(params["qkv"], x)  # [B_, N, 3C]
    bias = params["cached_bias"]

    if compute.use_flash_attention:
        # Fully fused path: the kernel consumes the packed qkv projection
        # directly (per-head lane slices in VMEM), so the [3, B_, heads, N, d]
        # transpose and the output re-pack never materialize in HBM.
        # Under bf16 compute, bias/mask ride as bf16 operands (mask values
        # 0/-100 are exact in bf16; the kernel accumulates scores in f32).
        from ..ops.pallas import flash_window_attn
        if x.dtype == jnp.bfloat16:
            bias = bias.astype(jnp.bfloat16)
            mask = mask.astype(jnp.bfloat16) if mask is not None else None
        out = flash_window_attn.flash_window_attention_qkv(
            qkv, bias, mask, num_heads)
    else:
        qkv5 = qkv.reshape(b_, n, 3, num_heads, head_dim)
        qkv5 = qkv5.transpose(2, 0, 3, 1, 4)  # [3, B_, heads, N, hd]
        q, k, v = qkv5[0], qkv5[1], qkv5[2]
        out = attn_ops.window_attention(q, k, v, bias, mask)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
    return L.linear(params["proj"], out)


def swin_block_forward(
    params,
    x: jax.Array,
    window_size: int,
    shift_size: int,
    num_heads: int,
    attn_mask: Optional[jax.Array],
    compute: ComputeConfig,
) -> jax.Array:
    """One Swin block on NHWC input (reference: src/swin.rs:350-410)."""
    b, h, w, c = x.shape
    shortcut = x
    if compute.use_flash_attention and window_size != 12:
        # Geometry guard, restated at block level so DIRECT callers (tests,
        # partial pipelines) are covered too — swin_forward applies the same
        # tiering once per backbone: the fully-fused strip kernel is
        # legality-verified only at the ws=12 family; ws=7 runs the middle
        # tier (packed-qkv flash + fused MLP), anything else unfused.
        if window_size == 7:
            compute = compute.with_overrides(use_fused_block=False)
        else:
            compute = compute.with_overrides(use_flash_attention=False)
    fused_block = compute.use_flash_attention and compute.use_fused_block

    if fused_block:
        # Fully-fused path: LN1 + qkv + attention + proj in ONE Pallas
        # kernel reading windows straight from the padded NHWC tensor —
        # no window_partition/reverse relayouts, no qkv/attn HBM
        # round-trips (see ops/pallas/fused_block_attn.py). Padding
        # happens pre-LN here; the kernel zeroes pad tokens post-LN,
        # which is numerically identical to the unfused order.
        from ..ops.pallas import fused_block_attn
        p0 = window_size - shift_size
        if (shift_size > 0 and (-h) % window_size >= p0
                and (-w) % window_size >= p0):
            # Roll-free shifted partition: when the window-pad slack
            # covers ws - shift on both axes, pad top-left by p0 instead
            # of cyclically rolling — the offset canvas equals the rolled
            # one shifted by exactly one window, so windows/masks/pads
            # carry over bit-exactly (see window.py::sw_msa_mask_offset)
            # and the two full-map roll copies per shifted block vanish
            # (~1 ms/call at 1024^2 batch 2 across the qualifying
            # stages). Stages whose slack is too small (h mod ws >
            # ws - shift) keep the cyclic roll below.
            hp = h + (-h) % window_size
            wp = w + (-w) % window_size
            x = jnp.pad(x, ((0, 0), (p0, hp - h - p0), (p0, wp - w - p0),
                            (0, 0)))
            mask = W.sw_msa_mask_offset_dev(hp, wp, window_size, shift_size)
            x = fused_block_attn.fused_window_block_attention(
                x, params["norm1"], params["attn"], window_size, 0,
                num_heads, mask, h, w, residual=True, origin=p0)
            x = x[:, p0:p0 + h, p0:p0 + w, :]
        else:
            x = W.pad_to_multiple(x, window_size)
            if shift_size > 0:
                x = W.roll_2d(x, -shift_size, -shift_size)
            # residual=True: the shortcut add rides inside the kernel (the
            # pre-LN tokens are already in VMEM; a separate XLA add costs a
            # full HBM pass per block). Exact: roll/crop commute with the
            # add.
            x = fused_block_attn.fused_window_block_attention(
                x, params["norm1"], params["attn"], window_size, shift_size,
                num_heads, attn_mask if shift_size > 0 else None, h, w,
                residual=True)
            if shift_size > 0:
                x = W.roll_2d(x, shift_size, shift_size)
            if x.shape[1] != h or x.shape[2] != w:
                x = x[:, :h, :w, :]
    else:
        x = L.layer_norm(params["norm1"], x)
        x = W.pad_to_multiple(x, window_size)
        _, hp, wp, _ = x.shape

        if shift_size > 0:
            x = W.roll_2d(x, -shift_size, -shift_size)
            mask = attn_mask
        else:
            mask = None

        x_windows = W.window_partition(x, window_size)  # [B*nW, ws*ws, C]
        attn_windows = window_attention_forward(
            params["attn"], x_windows, mask, num_heads, compute)
        x = W.window_reverse(attn_windows, window_size, hp, wp)

        if shift_size > 0:
            x = W.roll_2d(x, shift_size, shift_size)

        if hp != h or wp != w:
            x = x[:, :h, :w, :]

    if not fused_block:
        x = shortcut + x  # fused-block path: residual added in the kernel
    if compute.use_flash_attention:
        # Token-local second half of the block fused into one kernel:
        # LN2 + fc1 + erf-GELU + fc2 + residual (the [T, 4C] hidden never
        # round-trips HBM; see ops/pallas/fused_mlp.py).
        from ..ops.pallas import fused_mlp
        fused = fused_mlp.fused_mlp_residual(x, params["norm2"],
                                             params["mlp"])
        if fused is not None:
            return fused
    x = x + mlp_forward(params["mlp"], L.layer_norm(params["norm2"], x))
    return x


def patch_merging_forward(
    params, x: jax.Array,
    compute: ComputeConfig = ComputeConfig(),
) -> jax.Array:
    """2x downsample on NHWC input (reference: src/swin.rs:491-527)."""
    b, h, w, c = x.shape
    if h % 2 == 1 or w % 2 == 1:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x0 = x[:, :, 0, :, 0, :]  # even rows, even cols
    x1 = x[:, :, 1, :, 0, :]  # odd rows, even cols
    x2 = x[:, :, 0, :, 1, :]  # even rows, odd cols
    x3 = x[:, :, 1, :, 1, :]  # odd rows, odd cols
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)  # [B, H/2, W/2, 4C]
    x = _ln(params["norm"], x, compute)
    return L.linear(params["reduction"], x)  # no bias


def basic_layer_forward(
    params,
    x: jax.Array,
    depth: int,
    num_heads: int,
    window_size: int,
    compute: ComputeConfig,
    downsample: bool,
):
    """One stage (reference: src/swin.rs:578-601).

    Returns (x_out, x_down) where x_out is the pre-downsample NHWC feature.
    """
    b, h, w, c = x.shape
    shift_size = window_size // 2
    hp = -(-h // window_size) * window_size
    wp = -(-w // window_size) * window_size

    # SW-MSA mask [nW, N, N] (reference: src/swin.rs:603-655), built from
    # iota ON DEVICE: numerically identical to the numpy trace-time constant
    # but with zero literal payload in the program text — the baked masks
    # were ~64% of the traced MLIR and set the remote-compile size wall for
    # the training step (see window.py::sw_msa_mask_dev).
    attn_mask = W.sw_msa_mask_dev(hp, wp, window_size, shift_size)

    if depth > 2 and depth % 2 == 0 and not compute.unroll_deep_stage:
        # Deep stages (Swin-L stage 2: 18 blocks) run as lax.scan over
        # [no-shift, shift] block pairs with stacked params — the pair body
        # compiles ONCE instead of depth/2 times, cutting XLA compile time
        # ~9x for the stage while keeping numerics identical. With
        # compute.unroll_deep_stage the blocks unroll instead (measured
        # 1.03-1.17x faster on TPU; XLA fuses across block boundaries).
        even = [params[f"blocks_{j}"] for j in range(0, depth, 2)]
        odd = [params[f"blocks_{j}"] for j in range(1, depth, 2)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *even)
        stacked_odd = jax.tree.map(lambda *xs: jnp.stack(xs), *odd)

        def pair_body(x, pair_params):
            p_even, p_odd = pair_params
            x = swin_block_forward(
                p_even, x, window_size, 0, num_heads, attn_mask, compute)
            x = swin_block_forward(
                p_odd, x, window_size, shift_size, num_heads, attn_mask,
                compute)
            return x, None

        if compute.remat_blocks:
            # Gradient checkpointing: the backward recomputes each pair's
            # activations from the carried x instead of saving them —
            # scan-over-remat, the standard TPU training memory shape
            # (stage-2's 18 blocks dominate saved-activation HBM).
            pair_body = jax.checkpoint(pair_body, prevent_cse=False)
        x, _ = jax.lax.scan(pair_body, x, (stacked, stacked_odd),
                            unroll=compute.deep_stage_scan_unroll)
    else:
        def one_block(p, x, block_shift):
            return swin_block_forward(
                p, x, window_size, block_shift, num_heads, attn_mask,
                compute)

        if compute.remat_blocks:
            # default prevent_cse=True: outside a scan body XLA's CSE
            # could otherwise undo the rematerialization.
            one_block = jax.checkpoint(one_block, static_argnums=(2,))
        for j in range(depth):
            x = one_block(params[f"blocks_{j}"], x,
                          0 if j % 2 == 0 else shift_size)

    x_out = x
    if downsample:
        x_down = patch_merging_forward(params["downsample"], x, compute)
    else:
        x_down = x
    return x_out, x_down


def patch_embed_forward(
    params, x: jax.Array, patch_size: int,
    compute: ComputeConfig = ComputeConfig(),
) -> jax.Array:
    """Patchify NHWC input: pad -> conv k=s=patch -> LN
    (reference: src/swin.rs:692-714).

    The k=s=patch conv is computed as space-to-depth + matmul: a stride-4
    conv over 3 input channels runs at ~1 TFLOP/s on the conv unit, while
    the equivalent [HW/16, 48] @ [48, C] contraction uses the MXU directly.
    """
    b, h, w, c = x.shape
    p = patch_size
    pad_h = (p - h % p) % p
    pad_w = (p - w % p) % p
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    b, h, w, c = x.shape
    # Space-to-depth WITHOUT the 6D transpose (measured 1.1 ms/call at
    # 1024^2 batch 2 — the dominant patch-embed cost): per patch-row
    # `ph`, a stride-p row slice makes (pw, c) lane-contiguous for free,
    # and the kernel's matching [p*c, O] slice absorbs the ordering. The
    # p thin matmuls accumulate in f32.
    kernel = params["proj"]["kernel"]  # [p, p, c, O]
    y = None
    for ph in range(p):
        xph = x[:, ph::p, :, :].reshape(b, h // p, w // p, p * c)
        w_ph = kernel[ph].reshape(p * c, -1)
        # Phase partials STORED in the activation dtype: each einsum still
        # accumulates on the MXU in f32, but keeping the running sum f32
        # materialized three f32[2,256,256,192] intermediates in HBM
        # (~0.9 ms/call at 1024^2 batch 2, job_111; measured 53.36 -> 52.92
        # ms/call e2e, job_112). f32 inputs unchanged.
        part = jnp.einsum("bhwi,io->bhwo", xph, w_ph.astype(xph.dtype),
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        y = part if y is None else y + part
    y = (y.astype(jnp.float32)
         + params["proj"]["bias"].astype(jnp.float32)).astype(x.dtype)
    if "norm" in params:
        y = _ln(params["norm"], y, compute)
    return y


def swin_forward(
    params,
    cfg: SwinConfig,
    x: jax.Array,
    compute: ComputeConfig = ComputeConfig(),
) -> List[jax.Array]:
    """Backbone forward on NHWC input.

    Returns the 4 multi-scale NHWC features [B, H/4^..., C_i] with per-stage
    LayerNorm applied (reference: src/swin.rs:768-797).
    """
    if compute.use_flash_attention and cfg.window_size != 12:
        # Supported-geometry guard: the fully-fused strip-reading block
        # kernel is legality-tested and accuracy-gated only at the ws=12
        # family the shipping Swin-L runs
        # (tests/tpu/test_kernel_legality.py); at ws=7/C=96 it fails
        # Mosaic's vector shape-cast on the in-kernel window split
        # (measured on the v5e, 2026-08-18).
        if cfg.window_size == 7:
            # MIDDLE tier for the ws=7 presets (swin_t/s, reference:
            # src/swin.rs:27-52): partitioned windows + the packed-qkv
            # flash attention core + the fused MLP kernel — verified on
            # the v5e at all four swin_t stage geometries (N=49,
            # C=96/192/384/768): Mosaic-legal, 1.2-1.6x the unfused
            # attention core, and exact at f32 after the round-4
            # precision fix (worker job_012/013/017).
            compute = compute.with_overrides(use_fused_block=False)
        else:
            # Unknown window geometry: the unfused XLA path, which is
            # exact everywhere.
            compute = compute.with_overrides(use_flash_attention=False)
    x = patch_embed_forward(params["patch_embed"], x, cfg.patch_size, compute)

    outs: List[jax.Array] = []
    for i, depth in enumerate(cfg.depths):
        is_last = i == len(cfg.depths) - 1
        x_out, x = basic_layer_forward(
            params[f"layers_{i}"], x, depth, cfg.num_heads[i],
            cfg.window_size, compute, downsample=not is_last)
        out = _ln(params[f"norm_{i}"], x_out, compute)
        outs.append(out)
    return outs
