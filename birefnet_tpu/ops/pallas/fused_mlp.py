"""Fused Swin MLP kernel: LN2 + fc1 + exact GELU + fc2 + residual.

Every op here is token-local, so one Pallas kernel runs the whole
post-attention half of a Swin block (reference: src/swin.rs:405-407,
x + mlp(norm2(x))) over flat token tiles:

  out_tile = x_tile + (GELU_erf(LN(x_tile) @ W1 + b1) @ W2 + b2)

What this buys over the XLA fusion chain (measured round 2, stage-2 at
batch 2: the fc1 fusions alone are 0.456 ms/block at ~44% MXU):
  - the [T, 4C] hidden activation never round-trips HBM
    (50 MB write + 50 MB read per stage-2 block at batch 2),
  - LN2's extra read pass and the residual's separate pass disappear,
  - both weights stay VMEM-resident across the token grid.

Numerics contract (identical to the unfused path, ops/layers.py):
LN stats f32, matmuls f32-accumulated with the bias added at f32 before
the cast back, GELU exact (erf) computed in f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tuning


def _erf(z, fast: bool = False):
    """f32 erf via Abramowitz-Stegun. Mosaic TPU lowers neither erf nor
    erfc, and the exact-GELU parity contract (reference: src/swin.rs:105
    gelu_erf) rules out the tanh approximation (~1e-3 off).

    fast=False: 7.1.26, max abs error 1.5e-7 (used under f32 compute).
    fast=True: 7.1.25 (3-term) with an approximate reciprocal — error
    well under the bf16 output resolution; measured 8-17% faster MLP
    kernels (the GELU runs on the [T, 4C] hidden, the kernel's largest
    VPU term). Used only under bf16 compute; the on-TPU accuracy gate
    (bf16 headline vs f32, MAE < 1e-3) still passes.
    """
    a = jnp.abs(z)
    if fast:
        t = pl.reciprocal(1.0 + 0.47047 * a, approx=True)
        poly = t * (0.3480242 + t * (-0.0958798 + t * 0.7478556))
    else:
        t = 1.0 / (1.0 + 0.3275911 * a)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(z < 0, -e, e)


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            eps):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    h = h.astype(x.dtype)
    # f32 operands need precision=HIGHEST: Mosaic's DEFAULT f32 dot is a
    # single bf16 pass (~1e-2 rel; worker job_014, round 4). bf16 is
    # native either way.
    prec = (jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32 else None)

    h1 = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    h1 = h1 + b1_ref[...].astype(jnp.float32)
    fast = x.dtype == jnp.bfloat16
    h1 = (h1 * 0.5 * (1.0 + _erf(h1 * (2.0 ** -0.5),
                                 fast=fast))).astype(x.dtype)

    y = jax.lax.dot_general(
        h1, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    y = (y + b2_ref[...].astype(jnp.float32)).astype(x.dtype)
    o_ref[...] = x + y


def _quantize_rows(h):
    """Per-token symmetric int8 quantization of an f32 [t, C] tile.

    Returns (int8 values, f32 [t, 1] dequant scale). Symmetric
    round-to-nearest over [-127, 127]; the tiny floor keeps all-zero rows
    finite."""
    a = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    scale = jnp.maximum(a, 1e-30) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(h * (1.0 / scale)), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def _kernel_i8(x_ref, g_ref, b_ref, w1q_ref, s1_ref, b1_ref, w2q_ref,
               s2_ref, b2_ref, o_ref, *, eps):
    """W8A8 variant: LN f32 -> per-token int8 activations x
    per-output-channel int8 weights -> i32 MXU dots, dequant + bias +
    GELU at f32 (the selective ComputeConfig.int8_mlp path; weights are
    pre-quantized once in params.quantize_mlp_int8)."""
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    h = (xf - mean) * jax.lax.rsqrt(var + eps)
    h = h * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)

    q, sx = _quantize_rows(h)
    acc = jax.lax.dot_general(
        q, w1q_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h1 = acc.astype(jnp.float32) * (sx * s1_ref[...].astype(jnp.float32))
    h1 = h1 + b1_ref[...].astype(jnp.float32)
    h1 = h1 * 0.5 * (1.0 + _erf(h1 * (2.0 ** -0.5), fast=True))

    q2, sx2 = _quantize_rows(h1)
    acc2 = jax.lax.dot_general(
        q2, w2q_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc2.astype(jnp.float32) * (sx2 * s2_ref[...].astype(jnp.float32))
    y = (y + b2_ref[...].astype(jnp.float32)).astype(x.dtype)
    o_ref[...] = x + y


def _resident_weights_fit(c: int, weight_itemsize: int,
                          highest_precision: bool) -> bool:
    """Both full weight matrices ([C,4C] fc1 + [4C,C] fc2) stay resident
    in VMEM for the kernel's lifetime (full BlockSpecs) — 8*C*C bytes.

    f32 weights additionally pay Mosaic's precision=HIGHEST multi-pass
    dot scratch: measured +21.5MB over the 75.5MB resident weights at
    C=1536 (97.02M total vs the 96M scoped limit — worker job_105 OOM at
    128^2), so f32 budgets at 4/3 x. Over-budget geometries make
    fused_mlp_residual return None and the caller runs the unfused XLA
    path (same graceful demotion as the ws=7 fused-block fallback)."""
    wbytes = 8 * c * c * weight_itemsize
    if highest_precision:
        wbytes = (wbytes * 4) // 3
    # 8MB headroom for activation tiles / hidden f32 / double buffering.
    return wbytes <= tuning.vmem_limit_bytes() - (8 << 20)


def _pick_tile(t: int, c: int, itemsize: int) -> Optional[int]:
    """Token rows per grid step: divisor of T, multiple of 8, hidden
    activation under a VMEM budget.

    f32 gets half the bf16 budget: its dots run precision=HIGHEST
    (multi-pass), whose extra scratch pushed the C=1536 f32 geometry
    132KB over the 114M scoped-VMEM cap at the bf16-sized tile
    (measured, worker job_018 round 4)."""
    budget = (8 if itemsize == 2 else 4) * 1024 * 1024
    cap = max(8, budget // (4 * c * itemsize))
    best = None
    for cand in range(8, min(t, cap, 4096) + 1, 8):
        if t % cand == 0:
            best = cand
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused(x2d, ln_g, ln_b, w1, b1, w2, b2, interpret=False):
    t, c = x2d.shape
    tt = _pick_tile(t, c, x2d.dtype.itemsize)
    spec = pl.BlockSpec((tt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((t, c), x2d.dtype),
        grid=(t // tt,),
        in_specs=[spec, full, full, full, full, full, full],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=tuning.vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(x2d, ln_g, ln_b, w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_i8(x2d, ln_g, ln_b, w1q, s1, b1, w2q, s2, b2, interpret=False):
    t, c = x2d.shape
    # The int8 body holds the [tt, 4C] accumulator at i32 AND its f32
    # dequant, so the token tile budgets as if 4-byte elements.
    tt = _pick_tile(t, c, 4)
    spec = pl.BlockSpec((tt, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_i8, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((t, c), x2d.dtype),
        grid=(t // tt,),
        in_specs=[spec] + [full] * 8,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=tuning.vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(x2d, ln_g, ln_b, w1q, s1, b1, w2q, s2, b2)


def fused_mlp_residual(
    x: jax.Array,
    norm2_params,
    mlp_params,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x + fc2(gelu_erf(fc1(LN(x)))) on an NHWC (or any [..., C]) tensor.

    Falls back to None-signal (returns None) when no legal token tile
    exists; the caller then uses the unfused path.

    Blocks whose mlp params carry `kernel_q8`/`scale_q8` (added by
    params.quantize_mlp_int8 under ComputeConfig.int8_mlp) run the W8A8
    kernel instead — same fusion structure, int8 MXU dots.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    c = shape[-1]
    t = 1
    for s in shape[:-1]:
        t *= s
    int8 = "kernel_q8" in mlp_params["fc1"]
    if _pick_tile(t, c, 4 if int8 else x.dtype.itemsize) is None:
        return None
    # Compiled-path VMEM gate (interpret mode has no VMEM): the weights
    # are kernel-resident; kernels here cast them to x.dtype, and f32
    # dots run precision=HIGHEST (extra scratch — see the helper).
    if not interpret and not _resident_weights_fit(
            c, 1 if int8 else x.dtype.itemsize,
            highest_precision=(not int8 and x.dtype.itemsize == 4)):
        return None
    if int8:
        out = _fused_i8(
            x.reshape(t, c), norm2_params["scale"], norm2_params["bias"],
            mlp_params["fc1"]["kernel_q8"], mlp_params["fc1"]["scale_q8"],
            mlp_params["fc1"]["bias"],
            mlp_params["fc2"]["kernel_q8"], mlp_params["fc2"]["scale_q8"],
            mlp_params["fc2"]["bias"],
            interpret=interpret)
    else:
        out = _fused(
            x.reshape(t, c), norm2_params["scale"], norm2_params["bias"],
            mlp_params["fc1"]["kernel"].astype(x.dtype),
            mlp_params["fc1"]["bias"],
            mlp_params["fc2"]["kernel"].astype(x.dtype),
            mlp_params["fc2"]["bias"],
            interpret=interpret)
    return out.reshape(shape)
