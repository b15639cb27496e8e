"""Fused Pallas kernel for deform_mode="deformable-local" (component N1).

STATUS — experimental, NOT wired into the model path. Measured round 2 on
this toolchain (v5e): the k=3 site compiles and runs 0.66x the XLA
formulation (the in-kernel selector build costs more than the HBM
traffic it saves), and the k=49-tap variant crashes the remote compiler
outright. Two hard platform rules were established en route (see
ROADMAP.md and the memory notes): window DMAs into scratch with sub-128
lane dims are rejected at compile time, and scratch spatial dims that
are not multiples of 8 FAULT the TPU at runtime. The XLA
`deform_conv2d_local` (16.7 img/s end-to-end) remains the shipping
faithful-bounded path; this file is kept as the working (interpret-exact,
parity-tested) kernel skeleton plus the measured record.

The XLA formulation (ops/deform_conv.py::deform_conv2d_local) materializes
a [P_tile*K, S] sampling-selector matrix in HBM per tile — measured ~2x
the arithmetic cost in pure traffic at the big 256^2 k=7 site. This
kernel builds the selector in VMEM and consumes it immediately:

  per grid step (one batch item, one t x t output tile):
    1. DMA the fixed source window [s_h, s_w, C] from the zero-padded
       input in HBM (offsets are clamped to +-radius, so the window is
       static per tile — no gathers anywhere),
    2. compute the bilinear corner coordinates/weights for every
       (position, tap) pair with iota arithmetic in the operand's native
       [t^2, K] layout,
    3. build the selector as FOUR masked one-hot FMAs directly in
       [t^2, K, S] form (s = sy*s_w + sx lane index — no transposes or
       minor-dim splits anywhere),
    4. cols = sel . window  ([t^2, K, S] x [S, C] dot),
    5. out = cols . weight  (contraction over (K, C)).

Semantics are identical to deform_conv2d_local (torchvision-style zero
padding outside the image included): offsets clamped to +-radius, exact
vs the faithful path whenever |offset| <= radius
(reference Metal kernel: src/aspp.rs:59-165).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tuning


def _kernel(offy_ref, offx_ref, mask_ref, x_hbm, w_ref, o_ref, win, sem, *,
            tile, kh, kw, dilation, radius, s_h, s_w, c, out_c, n_tw,
            compute_bf16):
    k = kh * kw
    p = tile * tile
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    copy = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(ti * tile, s_h),
                 pl.ds(tj * tile, s_w), :],
        win, sem)
    copy.start()

    # Per-(position, tap) sample coordinates relative to the window origin
    # (operand layout [t^2, K]; everything below stays in it).
    pos = jax.lax.broadcasted_iota(jnp.int32, (p, k), 0)
    tap = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)
    oy = (pos // tile).astype(jnp.float32)
    ox = (pos % tile).astype(jnp.float32)
    tap_dy = (tap // kw).astype(jnp.float32) * dilation
    tap_dx = (tap % kw).astype(jnp.float32) * dilation

    ry = oy + tap_dy + offy_ref[0, 0] + (radius + 1)
    rx = ox + tap_dx + offx_ref[0, 0] + (radius + 1)
    y0 = jnp.floor(ry)
    x0 = jnp.floor(rx)
    ly = ry - y0
    lx = rx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    mod = mask_ref[0, 0].astype(jnp.float32)

    # Selector [t^2, K, S]: four weighted one-hots on the s = sy*s_w + sx
    # lane index.
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_h * s_w), 2)
    base = (y0 * s_w + x0)[:, :, None]
    sel_dtype = jnp.bfloat16 if compute_bf16 else jnp.float32
    sel = jnp.zeros((p, k, s_h * s_w), jnp.float32)
    for cy, cx, wsel in ((0, 0, (1 - ly) * (1 - lx)), (0, 1, (1 - ly) * lx),
                         (1, 0, ly * (1 - lx)), (1, 1, ly * lx)):
        idx = base + (cy * s_w + cx)
        sel = sel + jnp.where(iota_s == idx,
                              (wsel * mod)[:, :, None], 0.0)
    sel = sel.astype(sel_dtype)

    copy.wait()
    w = win[...].reshape(s_h * s_w, c)

    # Mosaic's matmul wants plain 2D operands: merge (t^2, K) rows (free,
    # leading dims) for the sampling dot, then re-merge (K, C) lanes for
    # the weight contraction.
    cols = jax.lax.dot_general(
        sel.reshape(p * k, s_h * s_w), w.astype(sel_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [t^2*K, C]
    cols = cols.astype(w_ref.dtype).reshape(p, k * c)
    out = jax.lax.dot_general(
        cols, w_ref[...].reshape(k * c, out_c), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [t^2, outC]
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("oh_pad", "ow_pad", "kh", "kw", "padding",
                              "dilation", "radius", "tile", "interpret"))
def _run(x_pad, offy, offx, maskt, w3, *, oh_pad, ow_pad, kh, kw, padding,
         dilation, radius, tile, interpret=False):
    b = x_pad.shape[0]
    c = x_pad.shape[-1]
    k = kh * kw
    out_c = w3.shape[-1]
    n_th = oh_pad // tile
    n_tw = ow_pad // tile
    # Window DMAs whose scratch spatial dims are not multiples of 8 FAULT
    # this environment's TPU at runtime (measured: 23x23 crashes, 24x24
    # works); round up — the selector never indexes the extra columns.
    s_h = -(-(tile + dilation * (kh - 1) + 2 * radius + 3) // 8) * 8
    s_w = -(-(tile + dilation * (kw - 1) + 2 * radius + 3) // 8) * 8
    p = tile * tile
    compute_bf16 = x_pad.dtype == jnp.bfloat16

    tile_spec = pl.BlockSpec((1, 1, p, k),
                             lambda bi, i, j: (bi, i * n_tw + j, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tile=tile, kh=kh, kw=kw, dilation=dilation,
            radius=radius, s_h=s_h, s_w=s_w, c=c, out_c=out_c, n_tw=n_tw,
            compute_bf16=compute_bf16),
        out_shape=jax.ShapeDtypeStruct((b, n_th * n_tw, p, out_c),
                                       x_pad.dtype),
        grid=(b, n_th, n_tw),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),   # x_pad stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weight [K, C, outC]
        ],
        out_specs=pl.BlockSpec((1, 1, p, out_c),
                               lambda bi, i, j: (bi, i * n_tw + j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((s_h, s_w, c), x_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=tuning.vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(offy, offx, maskt, x_pad, w3)
    return out


def deform_conv2d_local_pallas(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    padding: int = 0,
    dilation: int = 1,
    radius: int = 4,
    tile: int = 8,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in for ops.deform_conv.deform_conv2d_local (same semantics)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    kh, kw, _, out_c = weight.shape
    k = kh * kw
    oh = h + 2 * padding - (dilation * (kh - 1) + 1) + 1
    ow = w + 2 * padding - (dilation * (kw - 1) + 1) + 1
    n_th = -(-oh // tile)
    n_tw = -(-ow // tile)
    oh_pad, ow_pad = n_th * tile, n_tw * tile

    halo_lo = padding + radius + 1
    # +8 covers the kernel's rounding of the DMA window to 8-multiples.
    halo_hi = halo_lo + dilation * (kh - 1) + tile + 8 + (oh_pad - oh) \
        + (ow_pad - ow)
    # This environment's remote compiler rejects window DMAs into scratch
    # with a sub-128 lane dim; pad channels to a 128 multiple (the padded
    # lanes carry zeros and zero weight rows — exact, and the sampling
    # dot's N<=128 ran at partial lane rate anyway).
    c_pad = -(-c // 128) * 128
    x_pad = jnp.pad(x, ((0, 0), (halo_lo, halo_hi), (halo_lo, halo_hi),
                        (0, c_pad - c)))

    def to_tiles(a, lastdim):
        a = a.reshape(b, oh, ow, lastdim)
        a = jnp.pad(a, ((0, 0), (0, oh_pad - oh), (0, ow_pad - ow), (0, 0)))
        a = a.reshape(b, n_th, tile, n_tw, tile, lastdim)
        a = jnp.moveaxis(a, 3, 2)  # [b, n_th, n_tw, tile, tile, lastdim]
        return a.reshape(b, n_th * n_tw, tile * tile, lastdim)

    off = jnp.clip(offset.astype(jnp.float32), -radius, radius)
    off = off.reshape(b, oh, ow, k, 2)
    offy = to_tiles(off[..., 0], k)
    offx = to_tiles(off[..., 1], k)
    maskt = to_tiles(mask.astype(jnp.float32), k)

    w3 = jnp.pad(weight, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
    w3 = w3.reshape(kh * kw, c_pad, out_c).astype(x.dtype)
    out = _run(x_pad, offy, offx, maskt, w3, oh_pad=oh_pad, ow_pad=ow_pad,
               kh=kh, kw=kw, padding=padding, dilation=dilation,
               radius=radius, tile=tile, interpret=interpret)
    # [b, T, t^2, outC] -> [b, OH, OW, outC]
    out = out.reshape(b, n_th, n_tw, tile, tile, out_c)
    out = jnp.moveaxis(out, 2, 3)
    out = out.reshape(b, oh_pad, ow_pad, out_c)[:, :oh, :ow]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
