"""Pallas flash window-attention parity vs the naive path.

Mirrors the reference's flash-vs-naive self-consistency suite
(reference: examples/test_flash_bias.rs): same-scenario structure (simple
bias, real Swin-L window shape, shifted-window mask, full BiRefNet config)
with its 0.01 / 0.1 max-abs-diff thresholds as outer bounds — the fused
kernel's f32 math is far tighter in practice.

On CPU the kernel runs in Pallas interpret mode; the compiled-TPU run is
exercised by benchmarks/bench_attention.py and the TPU test job.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from birefnet_tpu.ops.attention import window_attention
from birefnet_tpu.ops.pallas.flash_window_attn import flash_window_attention


def _rand(rng, shape, dtype=np.float32):
    return rng.normal(size=shape).astype(dtype)


def _run_pair(rng, b_, heads, n, d, nw=None, dtype=jnp.float32):
    q = jnp.asarray(_rand(rng, (b_, heads, n, d)), dtype)
    k = jnp.asarray(_rand(rng, (b_, heads, n, d)), dtype)
    v = jnp.asarray(_rand(rng, (b_, heads, n, d)), dtype)
    bias = jnp.asarray(_rand(rng, (heads, n, n)), jnp.float32)
    mask = None
    if nw is not None:
        m = (rng.integers(0, 2, size=(nw, n, n)) * -100.0).astype(np.float32)
        mask = jnp.asarray(m)
    naive = window_attention(q, k, v, bias, mask)
    flash = flash_window_attention(q, k, v, bias, mask, interpret=True)
    return np.asarray(naive, np.float32), np.asarray(flash, np.float32)


def test_simple_bias(rng):
    """Scenario 1 of test_flash_bias.rs: small config, bias only."""
    naive, flash = _run_pair(rng, 4, 2, 16, 8)
    assert np.abs(naive - flash).max() < 0.01  # reference threshold
    np.testing.assert_allclose(flash, naive, atol=1e-5, rtol=1e-5)


def test_swin_l_stage0_shape(rng):
    """Scenario 3: the real Swin-L stage-0 window config — 484 windows x
    144 tokens x head_dim 32 (reference: examples/bench_swin_attn.rs:10-18),
    reduced to 121 windows to keep interpret-mode runtime sane."""
    naive, flash = _run_pair(rng, 121, 6, 144, 32)
    assert np.abs(naive - flash).max() < 0.1  # reference threshold
    np.testing.assert_allclose(flash, naive, atol=1e-4, rtol=1e-4)
    # All-zeros-output failure detector (reference: test_flash_bias.rs:60-61).
    assert np.abs(flash).max() > 0


def test_shifted_window_mask(rng):
    """Scenario 4: shifted-window attention with per-window mask."""
    naive, flash = _run_pair(rng, 36, 4, 144, 32, nw=9)
    np.testing.assert_allclose(flash, naive, atol=1e-4, rtol=1e-4)


def test_mask_period_batching(rng):
    """B_ = batch * nW with batch > 1: mask must repeat with period nW."""
    naive, flash = _run_pair(rng, 8, 2, 16, 8, nw=4)
    np.testing.assert_allclose(flash, naive, atol=1e-5, rtol=1e-5)


def test_bf16(rng):
    """bf16 inputs, f32 softmax: must stay within bf16 noise of the f32
    naive path."""
    q32, f32flash = _run_pair(rng, 16, 2, 144, 32, nw=4, dtype=jnp.float32)
    _, bf16flash = _run_pair(
        np.random.default_rng(0), 16, 2, 144, 32, nw=4, dtype=jnp.bfloat16)
    # separate rngs -> just check self-consistency on the same inputs:
    rng2 = np.random.default_rng(42)
    q = _rand(rng2, (16, 2, 144, 32))
    k = _rand(rng2, (16, 2, 144, 32))
    v = _rand(rng2, (16, 2, 144, 32))
    bias = _rand(rng2, (2, 144, 144))
    naive = window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias))
    flash_bf16 = flash_window_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(bias), interpret=True)
    diff = np.abs(np.asarray(flash_bf16, np.float32) - np.asarray(naive))
    assert diff.max() < 0.1  # reference's large-config threshold


def test_flash_attention_bias_free(rng):
    """N2 API parity: the reference MFA bridge also exposes a bias-free
    `flash_attention(q, k, v, causal)` (reference: src/swin.rs:9-10). The
    model never calls it, but the entry point must exist and match a plain
    softmax(q*scale @ k^T) @ v reference, causal and not."""
    from birefnet_tpu.ops.pallas.flash_window_attn import flash_attention
    b_, heads, n, d = 4, 2, 16, 8
    q = jnp.asarray(_rand(rng, (b_, heads, n, d)))
    k = jnp.asarray(_rand(rng, (b_, heads, n, d)))
    v = jnp.asarray(_rand(rng, (b_, heads, n, d)))

    s = np.einsum("bhnd,bhmd->bhnm", np.asarray(q), np.asarray(k)) * d**-0.5
    want = np.einsum("bhnm,bhmd->bhnd",
                     np.asarray(jax.nn.softmax(jnp.asarray(s), axis=-1)),
                     np.asarray(v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    causal = np.where(np.tril(np.ones((n, n))), s, -np.inf)
    want_c = np.einsum(
        "bhnm,bhmd->bhnd",
        np.asarray(jax.nn.softmax(jnp.asarray(causal), axis=-1)),
        np.asarray(v))
    got_c = np.asarray(flash_attention(q, k, v, causal=True, interpret=True))
    np.testing.assert_allclose(got_c, want_c, atol=1e-5, rtol=1e-5)


def test_qkv_packed_kernel_matches_naive(rng):
    """The all-heads packed-qkv kernel must match the naive path."""
    from birefnet_tpu.ops.pallas.flash_window_attn import (
        flash_window_attention_qkv)
    b_, heads, n, d, nw = 12, 6, 144, 32, 4
    c = heads * d
    qkv = _rand(rng, (b_, n, 3 * c))
    bias = _rand(rng, (heads, n, n))
    m = (rng.integers(0, 2, size=(nw, n, n)) * -100.0).astype(np.float32)

    qkv5 = qkv.reshape(b_, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    naive = window_attention(
        jnp.asarray(qkv5[0]), jnp.asarray(qkv5[1]), jnp.asarray(qkv5[2]),
        jnp.asarray(bias), jnp.asarray(m))
    naive = np.asarray(naive).transpose(0, 2, 1, 3).reshape(b_, n, c)

    got = np.asarray(flash_window_attention_qkv(
        jnp.asarray(qkv), jnp.asarray(bias), jnp.asarray(m), heads,
        interpret=True))
    np.testing.assert_allclose(got, naive, atol=1e-4, rtol=1e-4)

    # No-mask variant
    naive2 = window_attention(
        jnp.asarray(qkv5[0]), jnp.asarray(qkv5[1]), jnp.asarray(qkv5[2]),
        jnp.asarray(bias), None)
    naive2 = np.asarray(naive2).transpose(0, 2, 1, 3).reshape(b_, n, c)
    got2 = np.asarray(flash_window_attention_qkv(
        jnp.asarray(qkv), jnp.asarray(bias), None, heads, interpret=True))
    np.testing.assert_allclose(got2, naive2, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Fused NHWC window-block kernel (ops/pallas/fused_block_attn.py): the full
# LN1+qkv+attn+proj block vs the unfused swin_block_forward path.
# ---------------------------------------------------------------------------

def _block_params(rng, c, heads):
    def lin(i, o):
        return {"kernel": jnp.asarray(_rand(rng, (i, o)) * 0.05),
                "bias": jnp.asarray(_rand(rng, (o,)))}
    n = 144
    return {
        "norm1": {"scale": jnp.asarray(1 + 0.1 * _rand(rng, (c,))),
                  "bias": jnp.asarray(0.1 * _rand(rng, (c,)))},
        "norm2": {"scale": jnp.asarray(1 + 0.1 * _rand(rng, (c,))),
                  "bias": jnp.asarray(0.1 * _rand(rng, (c,)))},
        "attn": {"qkv": lin(c, 3 * c), "proj": lin(c, c),
                 "cached_bias": jnp.asarray(_rand(rng, (heads, n, n)))},
        "mlp": {"fc1": lin(c, 4 * c), "fc2": lin(4 * c, c)},
    }


@pytest.mark.parametrize("shift", [0, 6])
# exact grid + padded(cyclic-roll slack) + padded(offset/roll-free slack):
# (16, 16) has pad slack 8 >= ws - shift, so shift=6 exercises the
# roll-free offset partition against the unfused cyclic path.
@pytest.mark.parametrize("hw", [(24, 24), (20, 17), (16, 16)])
# heads=2 exercises the per-head loop, heads=6 the packed-group core
@pytest.mark.parametrize("heads,c", [(2, 64), (6, 192)])
def test_fused_nhwc_block_matches_unfused(rng, shift, hw, heads, c):
    from birefnet_tpu.models.swin import swin_block_forward
    from birefnet_tpu.configs import ComputeConfig
    from birefnet_tpu.ops import window as W

    ws = 12
    h, w = hw
    params = _block_params(rng, c, heads)
    x = jnp.asarray(_rand(rng, (2, h, w, c)))
    hp = -(-h // ws) * ws
    wp = -(-w // ws) * ws
    attn_mask = jnp.asarray(W.sw_msa_mask(hp, wp, ws, ws // 2))

    want = np.asarray(swin_block_forward(
        params, x, ws, shift, heads, attn_mask,
        ComputeConfig(use_flash_attention=False)), np.float32)
    got = np.asarray(swin_block_forward(
        params, x, ws, shift, heads, attn_mask,
        ComputeConfig(use_flash_attention=True)), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_int8_mlp_kernel_matches_f32_reference(rng):
    """W8A8 fused MLP (ComputeConfig.int8_mlp): the interpret-mode kernel
    must match the f32 MLP at the expected int8 quantization scale
    (per-token activation x per-column weight symmetric int8: ~1-2e-2
    rel, the round-3d measured error band)."""
    from birefnet_tpu.ops.pallas import fused_mlp
    from birefnet_tpu.params import quantize_mlp_int8
    from birefnet_tpu.ops import layers as L

    c = 768
    x = jnp.asarray(_rand(rng, (64, c))).astype(jnp.bfloat16)
    n2 = {"scale": jnp.asarray(1 + 0.1 * _rand(rng, (c,))),
          "bias": jnp.asarray(0.1 * _rand(rng, (c,)))}
    mlp = {"fc1": {"kernel": jnp.asarray(0.05 * _rand(rng, (c, 4 * c))),
                   "bias": jnp.asarray(0.05 * _rand(rng, (4 * c,)))},
           "fc2": {"kernel": jnp.asarray(0.05 * _rand(rng, (4 * c, c))),
                   "bias": jnp.asarray(0.05 * _rand(rng, (c,)))}}
    qmlp = quantize_mlp_int8({"mlp": mlp})["mlp"]
    assert qmlp["fc1"]["kernel_q8"].dtype == jnp.int8
    assert qmlp["fc2"]["scale_q8"].shape == (c,)
    out = fused_mlp.fused_mlp_residual(x, n2, qmlp)
    got = np.asarray(out, np.float32)

    hn = L.layer_norm(n2, x.astype(jnp.float32))
    hid = jax.nn.gelu(hn @ mlp["fc1"]["kernel"] + mlp["fc1"]["bias"],
                      approximate=False)
    ref = np.asarray(x.astype(jnp.float32) + hid @ mlp["fc2"]["kernel"]
                     + mlp["fc2"]["bias"], np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-2, rel
    # and it must really differ from the bf16 kernel (int8 engaged)
    bf16 = np.asarray(fused_mlp.fused_mlp_residual(x, n2, mlp), np.float32)
    assert np.abs(got - bf16).max() > 0.0


def test_fused_mlp_vmem_gate(monkeypatch):
    """Compiled-path VMEM gate: both full weight matrices are
    kernel-resident (8*C*C bytes) and f32 pays HIGHEST-precision scratch
    (+4/3), so the f32 C=1536 geometry must DEMOTE to the unfused path
    (None) instead of OOM-ing scoped VMEM at compile — the measured
    failure was 97.02M vs the 96M v5e limit (worker job_105, 128^2
    f32+flash). bf16 C=1536 and f32 C<=768 stay fused."""
    from birefnet_tpu.ops.pallas import fused_mlp, tuning

    v5e_limit = min(100 << 20, ((128 << 20) * 3) // 4)  # 96 MiB
    monkeypatch.setattr(tuning, "vmem_limit_bytes", lambda: v5e_limit)
    assert not fused_mlp._resident_weights_fit(1536, 4, True)   # f32 st3
    assert fused_mlp._resident_weights_fit(1536, 2, False)      # bf16 st3
    assert fused_mlp._resident_weights_fit(768, 4, True)        # f32 st2
    assert fused_mlp._resident_weights_fit(1536, 1, False)      # int8 st3

    # e2e: the rejected geometry returns None BEFORE building any kernel
    # (interpret=False is safe on CPU for the reject path).
    c = 1536
    x = jnp.zeros((16, c), jnp.float32)
    n2 = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    mlp = {"fc1": {"kernel": jnp.zeros((c, 4 * c)),
                   "bias": jnp.zeros((4 * c,))},
           "fc2": {"kernel": jnp.zeros((4 * c, c)),
                   "bias": jnp.zeros((c,))}}
    assert fused_mlp.fused_mlp_residual(x, n2, mlp, interpret=False) is None


def test_int8_mlp_quantization_is_selective():
    """params.quantize_mlp_int8 must touch ONLY the wide-stage MLPs
    (C >= INT8_MLP_MIN_CHANNELS = stages 2/3): the narrow stages measured
    0.78x/0.85x for the int8 kernel (ROADMAP round 3d) and keep bf16."""
    from birefnet_tpu.params import quantize_mlp_int8

    def mk(c):
        return {"fc1": {"kernel": jnp.zeros((c, 4 * c)),
                        "bias": jnp.zeros((4 * c,))},
                "fc2": {"kernel": jnp.zeros((4 * c, c)),
                        "bias": jnp.zeros((c,))}}

    tree = {"layers_0": {"blocks_0": {"mlp": mk(192)}},
            "layers_1": {"blocks_0": {"mlp": mk(384)}},
            "layers_2": {"blocks_0": {"mlp": mk(768)}},
            "layers_3": {"blocks_0": {"mlp": mk(1536)}}}
    q = quantize_mlp_int8(tree)
    assert "kernel_q8" not in q["layers_0"]["blocks_0"]["mlp"]["fc1"]
    assert "kernel_q8" not in q["layers_1"]["blocks_0"]["mlp"]["fc1"]
    assert "kernel_q8" in q["layers_2"]["blocks_0"]["mlp"]["fc1"]
    assert "kernel_q8" in q["layers_3"]["blocks_0"]["mlp"]["fc2"]
    # original kernels stay (unfused / probe paths still read them)
    assert q["layers_2"]["blocks_0"]["mlp"]["fc1"]["kernel"].shape == \
        (768, 3072)


def test_int8_block_attention_matches_unfused(rng):
    """W8A8 qkv/proj in the fused block kernel (ComputeConfig.int8_attn):
    the interpret-mode kernel must match the unfused f32 block at the
    int8 quantization scale, and quantization must be selective (wide
    stages only, original kernels kept for the unfused paths)."""
    from birefnet_tpu.models.swin import swin_block_forward
    from birefnet_tpu.configs import ComputeConfig
    from birefnet_tpu.ops import window as W
    from birefnet_tpu.params import quantize_attn_int8

    ws, heads, c = 12, 24, 768
    h = w = 24
    params = _block_params(rng, c, heads)
    x = jnp.asarray(_rand(rng, (1, h, w, c)))
    attn_mask = jnp.asarray(W.sw_msa_mask(h, w, ws, ws // 2))

    qparams = quantize_attn_int8(params)
    assert qparams["attn"]["qkv"]["kernel_q8"].dtype == jnp.int8
    assert qparams["attn"]["proj"]["scale_q8"].shape == (c,)
    # the narrow stages stay bf16
    narrow = quantize_attn_int8(_block_params(rng, 192, 6))
    assert "kernel_q8" not in narrow["attn"]["qkv"]
    # original kernels stay (unfused / middle-tier paths still read them)
    assert qparams["attn"]["qkv"]["kernel"].shape == (c, 3 * c)

    for shift in (0, 6):
        want = np.asarray(swin_block_forward(
            params, x, ws, shift, heads, attn_mask,
            ComputeConfig(use_flash_attention=False)), np.float32)
        got = np.asarray(swin_block_forward(
            qparams, x, ws, shift, heads, attn_mask,
            ComputeConfig(use_flash_attention=True)), np.float32)
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 5e-2, f"shift={shift}: rel {rel}"
        # engaged: int8 output must differ from the bf16 fused kernel
        bf16 = np.asarray(swin_block_forward(
            params, x, ws, shift, heads, attn_mask,
            ComputeConfig(use_flash_attention=True)), np.float32)
        assert np.abs(got - bf16).max() > 0.0
