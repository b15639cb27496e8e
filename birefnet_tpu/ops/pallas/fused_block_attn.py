"""Fully-fused Swin window-attention block kernel on NHWC tensors (N2+).

One Pallas kernel computing, per grid step, for a column of `bw` windows
read DIRECTLY from the padded(+rolled) NHWC tensor:

    LN1 -> (zero pad-tokens) -> qkv matmul -> per-head
    QK^T + rel-pos bias (+ SW-MSA mask) + softmax + PV -> proj matmul

This removes, relative to the partition-then-kernel path:
  - the window_partition / window_reverse HBM relayouts (measured ~4.3 ms
    per batch-2 call inside the 18-block stage alone, plus similar outside),
  - the HBM round-trips of the qkv projection and the attention output
    (the fused-block prototype measured 1.14-1.27x on stages 1-2).

Window geometry via BlockSpec: the x block is (1, bw*ws, Wp, C) — `bw`
full window-ROWS (TPU BlockSpec minor dims must be (8k, 128k) or the full
extent, so the W axis stays whole; the window split/merge inside the
kernel is an in-VMEM transpose, ~HBM-free). Pad tokens
(window grids overhang H, W) are zeroed AFTER the in-kernel LayerNorm,
reproducing exactly the reference's LN -> zero-pad -> window order
(reference: src/swin.rs:350-410); their positions are computed from the
grid coordinates, including the cyclic-shift remap for shifted blocks.

Numerics contract: LN stats in f32, f32 matmul accumulation, q*scale in
the input dtype. The per-head path (g=1) keeps the full f32 softmax of the
unfused path; the packed head-group path rounds the unnormalized softmax
weights exp(s-m) to the input dtype before the PV dot and normalizes after
(in bf16 runs this deviates from the unfused path by ~1 bf16 ulp; the f32
path is exact). Covered by the on-TPU accuracy gate (PARITY.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tuning

# Measured best head-group size per head count (round 2, v5e, batch 2):
# g-fold fewer MXU issues beats the g-fold block-diagonal FLOP waste up to
# these g (1.13-1.17x per stage); heads not listed run the per-head loop.
_PACKED_G = {6: 2, 12: 4, 24: 4, 48: 8}


def _kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            bias_ref, mask_ref, o_ref, *, heads, d, ws, bw, shift, origin,
            h_real, w_real, hp, wp, eps, residual,
            sqkv_ref=None, sproj_ref=None):
    """Block = `bw` full window-ROWS: x_ref[0] is [bw*ws, Wp, C] (the full
    width keeps the BlockSpec minor dims TPU-legal). Windows are split and
    merged with in-VMEM transposes — VMEM-speed, vs the HBM relayouts of
    the unfused path."""
    n = ws * ws
    c = heads * d
    wc = wp // ws
    nwin = bw * wc
    tokens = x_ref[0].reshape(bw * ws * wp, c)
    # Mosaic's DEFAULT precision for f32 dot operands is a single bf16
    # pass (~1e-2 rel — measured vs a f64 oracle, worker job_014/015,
    # round 4), NOT full f32; the library's f32 contract is
    # precision=HIGHEST (ops/layers.py). bf16 operands are native either
    # way, so gate on dtype to leave the headline path untouched.
    prec = (jax.lax.Precision.HIGHEST
            if tokens.dtype == jnp.float32 else None)

    # --- LayerNorm (f32 stats; ops/layers.py::layer_norm semantics) ---
    xf = tokens.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)

    # --- Zero pad-tokens (the reference zero-pads AFTER norm1) ---
    if hp != h_real or wp != w_real or origin:
        i = pl.program_id(1)
        tok = jax.lax.broadcasted_iota(jnp.int32, (bw * ws * wp, 1), 0)
        gr = i * (bw * ws) + tok // wp   # padded(+rolled/offset) row
        gc = tok % wp                    # padded(+rolled/offset) col
        if shift:
            gr = jax.lax.rem(gr + shift, hp)
            gc = jax.lax.rem(gc + shift, wp)
        # origin > 0 is the roll-free OFFSET partition (top-left zero pad
        # of `origin` rows/cols, window.py::sw_msa_mask_offset): real
        # tokens live at [origin, origin + real). origin == 0 reduces to
        # the cyclic/unshifted bounds check.
        h = jnp.where((gr < origin) | (gr >= origin + h_real)
                      | (gc < origin) | (gc >= origin + w_real), 0.0, h)
    h = h.astype(tokens.dtype)

    # --- window split: [bw, ws, wc, ws, C] -> [bw, wc, ws, ws, C] ---
    h = h.reshape(bw, ws, wc, ws, c)
    h = jnp.transpose(h, (0, 2, 1, 3, 4)).reshape(nwin * n, c)

    # --- qkv projection (f32 accumulate, like ops/layers.py::linear) ---
    if sqkv_ref is not None:
        # W8A8 (ComputeConfig.int8_attn): per-token int8 activations x
        # per-column int8 weights -> i32 MXU dot, dequant at f32. Same
        # scheme as fused_mlp._kernel_i8; the attention core below stays
        # bf16/f32 (the projections are 4C^2/token of the block's MACs,
        # the core only ~2*ws^2*C).
        from .fused_mlp import _quantize_rows
        qh, sx = _quantize_rows(h.astype(jnp.float32))
        acc = jax.lax.dot_general(
            qh, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        qkv = acc.astype(jnp.float32) * (
            sx * sqkv_ref[...].astype(jnp.float32))
    else:
        qkv = jax.lax.dot_general(
            h, wqkv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(h.dtype)
    qkv = qkv.reshape(nwin, n, 3 * c)

    # --- attention core ---
    # Head-GROUP packing (measured round 2): the per-head [nwin, 144, 32]
    # micro-dots are MXU-issue-bound (a NOATTN ablation put the core at
    # ~80% of the stage-0 kernel at ~21 TF/s). Packing g heads into one
    # block-diagonal QK/PV dot pair trades g-fold FLOP waste for g-fold
    # fewer issues — net 1.13-1.17x at the measured per-stage g. Per-head
    # sums come from a tiny block-ones matmul; a single group-wide row max
    # keeps the softmax exact (any m >= rowmax is valid).
    scale = d ** -0.5
    # Packed head groups only for bf16: the f32 variant's unrolled group
    # loop demands ~2x the scoped VMEM (measured: 121M > the 114M cap at
    # the half-st3 geometry -> Mosaic stack OOM), and the per-head loop
    # keeps the exactly-f32 softmax anyway (the parity config).
    g = _PACKED_G.get(heads, 1) if tokens.dtype == jnp.bfloat16 else 1
    outs = []
    if g <= 1:
        for hh in range(heads):
            q = qkv[:, :, hh * d:(hh + 1) * d] * scale
            k = qkv[:, :, c + hh * d:c + (hh + 1) * d]
            v = qkv[:, :, 2 * c + hh * d:2 * c + (hh + 1) * d]
            extra = bias_ref[hh][None].astype(jnp.float32)
            if mask_ref is not None:
                extra = extra + mask_ref[...].reshape(nwin, n, n).astype(
                    jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec) + extra
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec).astype(h.dtype))
    else:
        gd, gn = g * d, g * n
        if mask_ref is not None:
            mask_t = jnp.tile(
                mask_ref[...].reshape(nwin, n, n).astype(jnp.float32),
                (1, 1, g))
        r_bd = jax.lax.broadcasted_iota(jnp.int32, (gn, gd), 0) // n
        c_bd = jax.lax.broadcasted_iota(jnp.int32, (gn, gd), 1) // d
        bd_mask = (r_bd == c_bd)[None]
        r_o = jax.lax.broadcasted_iota(jnp.int32, (gn, g), 0) // n
        c_o = jax.lax.broadcasted_iota(jnp.int32, (gn, g), 1)
        ones_bd = (r_o == c_o).astype(h.dtype)
        r_e = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 0)
        c_e = jax.lax.broadcasted_iota(jnp.int32, (g, gd), 1) // d
        ones_exp = (r_e == c_e).astype(jnp.float32)
        for j in range(heads // g):
            q = qkv[:, :, j * gd:(j + 1) * gd] * scale
            k = qkv[:, :, c + j * gd:c + (j + 1) * gd]
            v = qkv[:, :, 2 * c + j * gd:2 * c + (j + 1) * gd]
            k_bd = jnp.where(bd_mask, jnp.tile(k, (1, g, 1)),
                             jnp.zeros((), k.dtype))
            s = jax.lax.dot_general(
                q, k_bd, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)
            extra = jnp.concatenate(
                [bias_ref[j * g + hh] for hh in range(g)],
                axis=-1)[None].astype(jnp.float32)
            if mask_ref is not None:
                extra = extra + mask_t
            s = s + extra
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(h.dtype)
            v_bd = jnp.where(bd_mask, jnp.tile(v, (1, g, 1)),
                             jnp.zeros((), v.dtype))
            o = jax.lax.dot_general(
                p, v_bd, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)
            sums = jax.lax.dot_general(
                p, ones_bd, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            denom = jax.lax.dot_general(
                sums, ones_exp, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)
            outs.append((o / denom).astype(h.dtype))
    attn = jnp.concatenate(outs, axis=-1).reshape(nwin * n, c)

    # --- output projection (token-local: window order is fine) ---
    if sproj_ref is not None:
        from .fused_mlp import _quantize_rows
        qa, sa = _quantize_rows(attn.astype(jnp.float32))
        acc = jax.lax.dot_general(
            qa, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (
            sa * sproj_ref[...].astype(jnp.float32))
    else:
        y = jax.lax.dot_general(
            attn, wproj_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
    y = (y + bproj_ref[...].astype(jnp.float32)).astype(o_ref.dtype)

    # --- window merge back to the row-strip layout ---
    y = y.reshape(bw, wc, ws, ws, c)
    y = jnp.transpose(y, (0, 2, 1, 3, 4)).reshape(bw * ws, wp, c)
    if residual:
        # Fold the Swin block's shortcut add (x + attn) into the kernel:
        # the pre-LN tokens are already in VMEM, and the standalone XLA add
        # costs a full read+read+write HBM pass per block (~2 ms/call over
        # the 48 block instances at 1024^2 batch 2). Exact: roll/crop
        # commute with the add, and pad-region contents are unspecified
        # anyway (caller crops).
        y = y + x_ref[0]
    o_ref[0] = y


# Window-rows per grid step. Measured (round 2, v5e, batch 2): ONE
# window-row per step wins at every stage — a full-width strip already
# holds 3-22 windows, and more grid steps pipeline DMA against the
# attention loop better than bigger blocks do (st0: 1.81 ms at bw=1 vs
# 2.12 at bw=2; st2: 0.57 vs 0.66 at bw=3).
_BW = 1


@functools.partial(
    jax.jit,
    static_argnames=("ws", "shift", "origin", "h_real", "w_real", "heads",
                     "residual", "interpret"))
def _fused(x, ln_g, ln_b, wqkv, bqkv, wproj, bproj, bias, mask_grid,
           ws, shift, origin, h_real, w_real, heads, residual=False,
           interpret=False, sqkv=None, sproj=None):
    b, hp, wp, c = x.shape
    n = ws * ws
    d = c // heads
    hc, wc = hp // ws, wp // ws
    bw = _BW

    x_spec = pl.BlockSpec((1, bw * ws, wp, c), lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [x_spec, full, full, full, full, full, full, full]
    args = [x, ln_g, ln_b, wqkv, bqkv, wproj, bproj, bias]
    has_mask = mask_grid is not None
    if has_mask:
        in_specs.append(pl.BlockSpec((bw, wc, n, n),
                                     lambda bi, i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask_grid)
    int8 = sqkv is not None
    if int8:
        # W8A8 projections: wqkv/wproj arrive int8, the dequant scales as
        # two extra f32 refs (trailing, so the fixed ref order above is
        # unchanged).
        in_specs += [full, full]
        args += [sqkv, sproj]

    def kern(*refs):
        j = 9 if has_mask else 8
        _kernel(*refs[:8],
                refs[8] if has_mask else None,      # mask_ref
                refs[-1],                           # o_ref
                heads=heads, d=d, ws=ws, bw=bw, shift=shift, origin=origin,
                h_real=h_real, w_real=w_real, hp=hp, wp=wp, eps=1e-5,
                residual=residual,
                sqkv_ref=refs[j] if int8 else None,
                sproj_ref=refs[j + 1] if int8 else None)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), x.dtype),
        grid=(b, hc // bw),
        in_specs=in_specs,
        out_specs=x_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=tuning.vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(*args)


def fused_window_block_attention(
    x: jax.Array,
    norm1_params,
    attn_params,
    window_size: int,
    shift_size: int,
    num_heads: int,
    attn_mask: Optional[jax.Array],
    h_real: int,
    w_real: int,
    residual: bool = False,
    interpret: Optional[bool] = None,
    origin: int = 0,
) -> jax.Array:
    """LN1 + windowed attention + proj on a padded(+rolled/offset) NHWC
    tensor.

    Args:
      x: [B, Hp, Wp, C] — PRE-norm activations, already padded to window
        multiples and (for cyclic shifted blocks) already rolled by
        -shift_size. Pad positions may hold arbitrary values; the kernel
        zeroes them post-LN exactly like the unfused path.
      norm1_params: {"scale", "bias"}; attn_params: {"qkv", "proj",
        "cached_bias"} (see models/swin.py).
      attn_mask: [nW, N, N] SW-MSA mask for shifted blocks (row-major
        window order), or None. For the roll-free offset partition pass
        window.sw_msa_mask_offset with shift_size=0 and origin=ws-shift.
      h_real/w_real: the unpadded spatial extent (pre-roll coordinates).
      origin: top-left pad extent of the roll-free OFFSET shifted
        partition (0 for unshifted / cyclic blocks); real tokens live at
        [origin, origin + real) on both axes.

    Returns [B, Hp, Wp, C] attention output; with residual=True the input
    x is added in-kernel (the Swin block's shortcut). Pad region contents
    are unspecified and must be cropped by the caller.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, hp, wp, c = x.shape
    ws = window_size
    n = ws * ws
    bias = attn_params["cached_bias"]
    mask_grid = None
    if attn_mask is not None:
        mask_grid = attn_mask.reshape(hp // ws, wp // ws, n, n)
    if x.dtype == jnp.bfloat16:
        bias = bias.astype(jnp.bfloat16)
        if mask_grid is not None:
            mask_grid = mask_grid.astype(jnp.bfloat16)
    # Weights cast outside the kernel so the (f32-stored) params are not
    # DMA'd at double width every grid step.
    if "kernel_q8" in attn_params["qkv"]:
        # W8A8 projections (ComputeConfig.int8_attn; weights quantized
        # once in params.quantize_attn_int8 — wide stages only).
        return _fused(
            x, norm1_params["scale"], norm1_params["bias"],
            attn_params["qkv"]["kernel_q8"], attn_params["qkv"]["bias"],
            attn_params["proj"]["kernel_q8"], attn_params["proj"]["bias"],
            bias, mask_grid, ws, shift_size, origin, h_real, w_real,
            num_heads, residual=residual, interpret=interpret,
            sqkv=attn_params["qkv"]["scale_q8"],
            sproj=attn_params["proj"]["scale_q8"])
    return _fused(
        x, norm1_params["scale"], norm1_params["bias"],
        attn_params["qkv"]["kernel"].astype(x.dtype),
        attn_params["qkv"]["bias"],
        attn_params["proj"]["kernel"].astype(x.dtype),
        attn_params["proj"]["bias"],
        bias, mask_grid, ws, shift_size, origin, h_real, w_real, num_heads,
        residual=residual, interpret=interpret)
