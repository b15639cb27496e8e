"""Windowed multi-head attention with relative-position bias.

XLA reference path for window attention, numerically matching the reference's
naive path (reference: src/swin.rs:266-311): softmax((q*scale) @ k^T + bias
[+ mask]) @ v, softmax in float32.

TPU-native notes: all windows and heads are batched into single large einsums
so the MXU sees [B*nW*heads, N, N] contractions instead of the per-window
dispatch loop that cripples the reference's MFA flash path
(reference: examples/bench_flash_attn.rs:62-74). A fused Pallas kernel
(ops/pallas/flash_window_attn.py) covers the same contract.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled-dot-product window attention.

    Args:
      q, k, v: [B_, heads, N, head_dim] where B_ = batch * num_windows.
      bias: relative-position bias [heads, N, N] (precomputed at load,
        reference: src/swin.rs:146-152).
      mask: optional SW-MSA mask [nW, N, N] with 0/-100 entries; B_ must be a
        multiple of nW (reference: src/swin.rs:288-297).

    Returns:
      [B_, heads, N, head_dim] attention output.
    """
    b_, heads, n, head_dim = q.shape
    scale = head_dim ** -0.5
    q = q * jnp.asarray(scale, dtype=q.dtype)
    # [B_, heads, N, N]; accumulate in f32 on the MXU.
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    attn = attn + bias.astype(jnp.float32)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, heads, n, n)
        attn = attn + mask.astype(jnp.float32)[None, :, None]
        attn = attn.reshape(b_, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)  # float32
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)
