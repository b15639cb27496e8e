#!/usr/bin/env python
"""Window-attention microbenchmark: Pallas flash vs naive XLA.

Mirrors the reference's bench_swin_attn / bench_flash_attn examples
(reference: examples/bench_swin_attn.rs:10-18, examples/bench_flash_attn.rs):
the Swin-L stage-0 config (484 windows x 144 tokens x head_dim 32, 6 heads)
plus the other stage shapes, flash vs naive ms/call and max-abs parity.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.common import device_busy_ms, ensure_tpu_or_reexec  # noqa: E402
from birefnet_tpu.ops.attention import window_attention  # noqa: E402
from birefnet_tpu.ops.pallas.flash_window_attn import (  # noqa: E402
    flash_window_attention,
    flash_window_attention_qkv,
)

# (label, B_, heads, N, d, nW): per-stage shapes at 1024^2 + half-scale pass.
CONFIGS = [
    ("stage0 1024", 484, 6, 144, 32, 484),
    ("stage1 1024", 121, 12, 144, 32, 121),
    ("stage2 1024", 36, 24, 144, 32, 36),
    ("stage3 1024", 9, 48, 144, 32, 9),
    ("stage0  512", 121, 6, 144, 32, 121),
]


def main():
    ensure_tpu_or_reexec()
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    print(f"backend={jax.default_backend()} dtype=bfloat16")
    print(f"{'config':>12} {'naive ms':>9} {'flash ms':>9} {'fused ms':>9} "
          f"{'speedup':>8} {'max|diff|':>10}")
    for label, b_, h, n, d, nw in CONFIGS:
        q = jnp.asarray(rng.normal(size=(b_, h, n, d)), dtype)
        k = jnp.asarray(rng.normal(size=(b_, h, n, d)), dtype)
        v = jnp.asarray(rng.normal(size=(b_, h, n, d)), dtype)
        bias = jnp.asarray(rng.normal(size=(h, n, n)), jnp.float32)
        mask = jnp.asarray(
            rng.integers(0, 2, size=(nw, n, n)) * -100.0, jnp.float32)
        # packed layout for the fused all-heads kernel
        qkv = jnp.concatenate([
            t.transpose(0, 2, 1, 3).reshape(b_, n, h * d) for t in (q, k, v)
        ], axis=-1)

        o_naive = window_attention(q, k, v, bias, mask)
        o_flash = flash_window_attention(q, k, v, bias, mask)
        o_fused = flash_window_attention_qkv(qkv, bias, mask, h)
        diff = float(jnp.abs(
            o_naive.astype(jnp.float32) - o_flash.astype(jnp.float32)).max())

        # device-busy timing (wall clocks carry tunnel latency; see common.py)
        naive_jit = jax.jit(window_attention)
        t_naive = device_busy_ms(naive_jit, q, k, v, bias, mask)
        t_flash = device_busy_ms(
            lambda *a: flash_window_attention(*a), q, k, v, bias, mask)
        t_fused = device_busy_ms(
            lambda *a: flash_window_attention_qkv(*a, num_heads=h),
            qkv, bias, mask)
        print(f"{label:>12} {t_naive:>9.3f} {t_flash:>9.3f} "
              f"{t_fused:>9.3f} "
              f"{t_naive / t_fused:>7.2f}x {diff:>10.4f}")


if __name__ == "__main__":
    main()
