"""Pallas row LayerNorm: bf16 in -> bf16 out with f32 stats, no f32 HBM copy.

The XLA lowering of the stage-output LayerNorms (models/swin.py
swin_forward, reference: src/swin.rs:784-789 per-stage `norm{i}`)
materializes the float32 upcast of the whole activation in HBM before the
normalize consumes it (measured: a 0.20 ms/call f32[131072,192] convert +
layout copies at the stage-0 output alone, batch 2; the one-pass-variance
rewrite did not remove it — ROADMAP.md round-3 negative results). Token-row
LayerNorm is purely local to the channel axis, so a trivial Pallas kernel
streams bf16 tiles through VMEM, computes the f32 statistics in registers,
and writes bf16 straight back: HBM traffic drops from ~6 bytes/elem
(bf16 read + f32 write + f32 read + bf16 write) to 4 bytes/elem read+write.

Numerics: identical contract to ops/layers.py layer_norm (f32 statistics,
eps inside rsqrt, f32 scale/bias application, cast back to the input
dtype). Reduction order within a row differs from XLA's only in tree
shape; both accumulate in f32 over <= 3072 lanes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    c = xf.shape[-1]
    mean = jnp.sum(xf, axis=-1, keepdims=True) * (1.0 / c)
    d = xf - mean
    var = jnp.sum(d * d, axis=-1, keepdims=True) * (1.0 / c)
    y = d * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _row_ln(x2d, g, b, eps, interpret=False):
    n, c = x2d.shape
    t = 512
    while t > 8 and n % t:
        t //= 2
    spec = pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(n // t,),
        in_specs=[spec, full, full],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2d, g, b)


def layer_norm_rows(
    params,
    x: jax.Array,
    eps: float = 1e-5,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for ops/layers.py layer_norm on [..., C] activations.

    Falls back to the XLA formulation when the geometry is Pallas-illegal
    (rows not a multiple of 8 after the largest power-of-two tile split).
    """
    from .. import layers as L

    n = 1
    for d in x.shape[:-1]:
        n *= d
    c = x.shape[-1]
    # The channel block spans the full extent (legal for any C); rows need
    # 8-alignment after the power-of-two tile split.
    if n % 8:
        return L.layer_norm(params, x, eps=eps)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    y = _row_ln(x.reshape(n, c), params["scale"], params["bias"],
                eps, interpret=interpret)
    return y.reshape(x.shape)
