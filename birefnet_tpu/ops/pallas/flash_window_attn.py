"""Fused Pallas window-attention kernel (component N2, SURVEY.md §2.2).

Replaces the reference's MFA flash-attention Swift bridge
(reference: src/swin.rs:226-259, candle-mps-flash-attention). The MFA path
dispatches per batch entry — 484 tiny dispatches for Swin's windows, its
documented perf cliff (reference: examples/bench_flash_attn.rs:62-74). Here
windows map onto the Pallas grid: each program fuses
QK^T + relative-position bias + shift mask + softmax + PV for a block of
windows of one head entirely in VMEM, so the [B*nW, heads, 144, 144] score
tensor never touches HBM (the unfused XLA path round-trips it ~4x per layer).

Swin windows are 144 tokens — the whole scores tile fits in VMEM, so no
online-softmax streaming is needed (flash's tiling degenerates to one tile;
cf. "Flash Window Attention", arXiv:2501.06480). Numerics: f32 scores,
f32 softmax, f32 PV accumulation — same contract as the reference naive path
(reference: src/swin.rs:266-311) and ops/attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tuning


def _pick_window_block(b_windows: int, n_mask_windows: Optional[int]) -> int:
    """Windows per grid step: the largest divisor of B_ (and of the mask
    period, when masked) that is <= 16 (VMEM budget ~2MB/step)."""
    best = 1
    for cand in range(1, 17):
        if b_windows % cand:
            continue
        if n_mask_windows is not None and n_mask_windows % cand:
            continue
        best = cand
    return best


def _attn_core(q, k, v, s_extra, o_dtype):
    """Shared fused core: [BW, N, d] q/k/v + f32 score addend -> [BW, N, d]."""
    # f32 operands need precision=HIGHEST: Mosaic's DEFAULT f32 dot is a
    # single bf16 pass (~1e-2 rel — measured vs a f64 oracle, worker
    # job_013/014, round 4). bf16 operands are native either way.
    prec = (jax.lax.Precision.HIGHEST
            if q.dtype == jnp.float32 else None)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    s = s + s_extra

    # Full-window softmax in f32 (mask values are finite -100s, reference:
    # src/swin.rs:651, so no -inf edge cases).
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l

    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    return o.astype(o_dtype)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale):
    # q/k/v refs: [BW, 1, N, d]; bias: [1, N, N]; mask: [BW, N, N].
    q = q_ref[:, 0] * scale  # input dtype, matching the reference's q*scale
    extra = (bias_ref[0][None].astype(jnp.float32)
             + mask_ref[...].astype(jnp.float32))
    o_ref[:, 0] = _attn_core(q, k_ref[:, 0], v_ref[:, 0], extra, o_ref.dtype)


def _kernel_plain(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[:, 0] * scale
    extra = bias_ref[0][None].astype(jnp.float32)
    o_ref[:, 0] = _attn_core(q, k_ref[:, 0], v_ref[:, 0], extra, o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_masked(q, k, v, bias, mask, interpret=False):
    b_, heads, n, d = q.shape
    nw = mask.shape[0]
    bw = _pick_window_block(b_, nw)
    mask_period = nw // bw  # mask block reuse period along the window axis

    qkv_spec = pl.BlockSpec(
        (bw, 1, n, d), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_masked, scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b_, heads, n, d), q.dtype),
        grid=(b_ // bw, heads),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, n, n), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, n, n), lambda i, h: (i % mask_period, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias, mask)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_plain(q, k, v, bias, interpret=False):
    b_, heads, n, d = q.shape
    bw = _pick_window_block(b_, None)

    qkv_spec = pl.BlockSpec(
        (bw, 1, n, d), lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_plain, scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b_, heads, n, d), q.dtype),
        grid=(b_ // bw, heads),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, n, n), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias)


def _kernel_qkv(qkv_ref, bias_ref, mask_ref, o_ref, *, heads, d, scale,
                masked):
    """All-heads fused kernel on packed qkv [BW, N, 3C].

    Per head: static 32-lane slices of the packed projection (no 5D
    transpose ever materializes), QK^T + bias (+ mask) + softmax + PV, output
    written back into the packed [BW, N, C] layout the proj matmul consumes.
    """
    c = heads * d
    for h in range(heads):
        q = qkv_ref[:, :, h * d:(h + 1) * d] * scale
        k = qkv_ref[:, :, c + h * d:c + (h + 1) * d]
        v = qkv_ref[:, :, 2 * c + h * d:2 * c + (h + 1) * d]
        extra = bias_ref[h][None].astype(jnp.float32)
        if masked:
            extra = extra + mask_ref[...].astype(jnp.float32)
        o_ref[:, :, h * d:(h + 1) * d] = _attn_core(q, k, v, extra,
                                                    o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _flash_qkv(qkv, bias, mask, heads, interpret=False):
    b_, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    nw = mask.shape[0] if mask is not None else 1
    # VMEM: qkv block + bias (full) + mask block + per-head score
    # temporaries. v5e VMEM is 128MB; a measured bw sweep (round 2) showed
    # larger window blocks win 10-30% (fewer grid steps, better pipelining),
    # so budget 12MB for the qkv block and cap bw at 24.
    cap = max(1, tuning.block_budget_bytes() // (n * c3 * qkv.dtype.itemsize))
    bw = 1
    for cand in range(1, min(24, cap) + 1):
        if b_ % cand == 0 and (mask is None or nw % cand == 0):
            bw = cand

    in_specs = [
        pl.BlockSpec((bw, n, c3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # full bias
    ]
    args = [qkv, bias]
    if mask is not None:
        period = nw // bw
        in_specs.append(
            pl.BlockSpec((bw, n, n), lambda i: (i % period, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask)
        kern = functools.partial(_kernel_qkv, heads=heads, d=d,
                                 scale=d ** -0.5, masked=True)
    else:
        def kern(qkv_ref, bias_ref, o_ref):
            _kernel_qkv(qkv_ref, bias_ref, None, o_ref, heads=heads, d=d,
                        scale=d ** -0.5, masked=False)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b_, n, c), qkv.dtype),
        grid=(b_ // bw,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bw, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=tuning.vmem_limit_bytes(),
        ),
        interpret=interpret,
    )(*args)


def flash_window_attention_qkv(
    qkv: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
    num_heads: int = 1,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused window attention on the packed qkv projection.

    Args:
      qkv: [B_, N, 3C] — the raw qkv linear output (features ordered
        [q|k|v] x [head-major], the torch convention).
      bias: [heads, N, N]; mask: optional [nW, N, N].
    Returns [B_, N, C], ready for the output projection.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_qkv(qkv, bias, mask, num_heads, interpret=interpret)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Bias-free flash attention — N2 API parity with the reference MFA
    bridge's `flash_attention(q, k, v, causal)` entry point (reference:
    src/swin.rs:9-10; the BiRefNet model itself never calls it, only the
    bias variants below).

    Args:
      q, k, v: [B_, heads, N, head_dim].
      causal: mask out j > i scores (finite -1e9 addend, same
        finite-mask contract as the SW-MSA path).
    Returns [B_, heads, N, head_dim].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    heads, n = q.shape[1], q.shape[2]
    if causal:
        i = jnp.arange(n)
        bias = jnp.where(i[:, None] >= i[None, :], 0.0, -1e9)
        bias = jnp.broadcast_to(bias.astype(q.dtype), (heads, n, n))
    else:
        bias = jnp.zeros((heads, n, n), q.dtype)
    return _flash_plain(q, k, v, bias, interpret=interpret)


def flash_window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in replacement for ops.attention.window_attention.

    Args:
      q, k, v: [B_, heads, N, head_dim], B_ = batch * num_windows.
      bias: [heads, N, N] relative-position bias.
      mask: optional [nW, N, N] SW-MSA mask (0 / -100); B_ % nW == 0.
      interpret: force Pallas interpret mode (auto: True off-TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mask is None:
        return _flash_plain(q, k, v, bias, interpret=interpret)
    return _flash_masked(q, k, v, bias, mask, interpret=interpret)
