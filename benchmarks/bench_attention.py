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

    # The SHIPPING path: the fused NHWC Swin-block kernel (LN1 + qkv +
    # packed-head attention + proj straight off the padded NHWC tensor,
    # ops/pallas/fused_block_attn.py), vs the unfused block.
    import birefnet_tpu as bt
    from birefnet_tpu.models.swin import swin_block_forward
    from birefnet_tpu.ops import window as Wops
    print(f"\n{'full swin block':>16} {'unfused ms':>11} {'fused ms':>9} "
          f"{'speedup':>8}")
    for label, hp, c, heads in (("stage0 1024", 264, 192, 6),
                                ("stage1 1024", 132, 384, 12),
                                ("stage2 1024", 72, 768, 24)):
        x = jnp.asarray(rng.normal(size=(2, hp, hp, c)) * 0.1, dtype)
        params = {
            "norm1": {"scale": jnp.ones((c,), jnp.float32),
                      "bias": jnp.zeros((c,), jnp.float32)},
            "norm2": {"scale": jnp.ones((c,), jnp.float32),
                      "bias": jnp.zeros((c,), jnp.float32)},
            "attn": {
                "qkv": {"kernel": jnp.asarray(
                    rng.normal(0, .05, size=(c, 3 * c)), jnp.float32),
                    "bias": jnp.zeros((3 * c,), jnp.float32)},
                "proj": {"kernel": jnp.asarray(
                    rng.normal(0, .05, size=(c, c)), jnp.float32),
                    "bias": jnp.zeros((c,), jnp.float32)},
                "cached_bias": jnp.asarray(
                    rng.normal(size=(heads, 144, 144)), jnp.float32)},
            "mlp": {"fc1": {"kernel": jnp.asarray(
                rng.normal(0, .05, size=(c, 4 * c)), jnp.float32),
                "bias": jnp.zeros((4 * c,), jnp.float32)},
                "fc2": {"kernel": jnp.asarray(
                    rng.normal(0, .05, size=(4 * c, c)), jnp.float32),
                    "bias": jnp.zeros((c,), jnp.float32)}},
        }
        amask = jnp.asarray(Wops.sw_msa_mask(hp, hp, 12, 6))

        def blk(t, flash):
            return swin_block_forward(
                params, t, 12, 6, heads, amask,
                bt.ComputeConfig(dtype=dtype, use_flash_attention=flash))
        t_un = device_busy_ms(jax.jit(lambda t: blk(t, False)), x)
        t_fu = device_busy_ms(jax.jit(lambda t: blk(t, True)), x)
        print(f"{label:>16} {t_un:>11.3f} {t_fu:>9.3f} {t_un / t_fu:>7.2f}x")


if __name__ == "__main__":
    main()
