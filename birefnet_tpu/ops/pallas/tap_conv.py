"""Direct tap-accumulation conv for tiny-channel full-resolution heads.

The decoder's folded ipt1 head is a 5x5 'same' conv 3->1 at the full image
resolution (models/decoder.py::_composed_pair_conv; reference head:
src/birefnet.rs:371-375 + src/decoder.rs:28-56). Channel counts this small
defeat both the conv unit (~0.3 TF/s, pathological T(2,128) layouts) and
the s2d-matmul route (the 16-phase de-interleave is a lane shuffle on a
[B,H/4,W/4,4,4] tensor — measured 0.50 ms/call of relayout at 1024^2
batch 2, pre-unit attribution job_103).

TPU-native shape of the problem: with W in LANES ([B, C, H, W] layout) the
conv is 75 scalar-times-vector FMAs over full 1024-lane registers — pure
VPU streaming, no phases, no relayout:

    y[r, :] = sum_{u,v,c} K[u,v,c] * x[c, r+u, v:v+W]

Halo handling without overlapping BlockSpecs: the padded input is passed
TWICE — an Rt-row block and the 8-row tail that follows it — and the
kernel concatenates them along sublanes. f32 accumulation; bias in SMEM.

Border semantics: the kernel computes the zero-padded 'same' composition
everywhere; callers overwrite the outermost ring with the exact two-conv
recompute exactly as for the other composed-conv routes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tuning


def _kernel(xa_ref, xb_ref, k_ref, b_ref, o_ref, *, kk, cin, rt, w_out):
    x = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=1)  # [C, Rt+8, Wp]
    acc = jnp.full((rt, w_out), b_ref[0], jnp.float32)
    # Row-slice per (c, u) before the lane slices so the scheduler's live
    # set stays a handful of [rt, Wp] tiles (the flat 75-slice form hoisted
    # every tap and blew the 16M scoped-VMEM stack at 1024^2).
    for c in range(cin):
        for u in range(kk):
            xu = x[c, u:u + rt].astype(jnp.float32)
            for v in range(kk):
                acc += k_ref[u, v, c] * jax.lax.slice(
                    xu, (0, v), (rt, v + w_out))
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tap_conv(xt, k, bias, interpret=False):
    # xt: [B, C, Hp, Wp] padded by (K-1)/2 zeros on H/W fronts and
    # (K-1)/2 + 8 on the H back (tail-block slack), K-1 on the W back.
    b, cin, hp, wp = xt.shape
    kk = k.shape[0]
    w_out = wp - (kk - 1)
    h_out = hp - (kk - 1) - 8
    rt = 128
    while rt > 8 and h_out % rt:
        rt //= 2
    grid = (b, h_out // rt)
    return pl.pallas_call(
        functools.partial(_kernel, kk=kk, cin=cin, rt=rt, w_out=w_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cin, rt, wp), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, 8, wp),
                         lambda bi, i, _rt=rt: (bi, 0, (i * _rt + _rt) // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, w_out), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out), xt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=tuning.vmem_limit_bytes()),
        interpret=interpret,
    )(xt, xt, k, bias)  # same array through both halo specs


def tap_conv_same(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """K x K 'same' (zero-padded) conv [B,H,W,Cin] -> [B,H,W] for tiny Cin
    and a single output channel.

    kernel: [K, K, Cin, 1] or [K, K, Cin]; bias: scalar/[1] or None.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, cin = x.shape
    if kernel.ndim == 4:
        kernel = kernel[..., 0]
    kk = kernel.shape[0]
    r = (kk - 1) // 2
    xt = jnp.transpose(x, (0, 3, 1, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (r, r + 8), (r, r)))
    kf = kernel.astype(jnp.float32)
    bf = (jnp.zeros((1,), jnp.float32) if bias is None
          else bias.reshape(1).astype(jnp.float32))
    return _tap_conv(xt, kf, bf, interpret=interpret)
