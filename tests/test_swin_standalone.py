"""Standalone Swin backbone tests (the reference's test_swin example analog).

The reference's `examples/test_swin.rs` builds swin_t with random weights on
256x256 and checks the 4 stage shapes (reference: examples/test_swin.rs:53-71,
prints only — we assert). Also covers swin_t parity vs the torch oracle and
the spatially-sharded full model.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import birefnet_tpu as bt
from birefnet_tpu.configs import SwinConfig
from birefnet_tpu.models import swin as bswin
from birefnet_tpu.params import _swin, _swin_entries, _Source
from tests.torch_ref.birefnet_torch import SwinTransformer as TorchSwin


def _random_swin_ckpt(cfg: SwinConfig, seed=0, prefix="bb"):
    rng = np.random.default_rng(seed)
    return {name: rng.normal(0, 0.05, size=shape).astype(np.float32)
            for name, shape in _swin_entries(prefix, cfg)}


def init_swin_params(cfg: SwinConfig, seed=0):
    """Random standalone-backbone params (test_swin.rs's VarMap analog)."""
    ckpt = _random_swin_ckpt(cfg, seed)
    return jax.tree.map(jnp.asarray, _swin(_Source(ckpt), "bb", cfg))


def test_swin_t_stage_shapes():
    """swin_t on 256^2: stage shapes must be H/4..H/32 with C=96*2^i
    (reference: examples/test_swin.rs:53-71)."""
    cfg = SwinConfig.swin_t()
    params = init_swin_params(cfg, seed=2)
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    outs = bswin.swin_forward(params, cfg, x)
    expected = [(1, 64, 64, 96), (1, 32, 32, 192),
                (1, 16, 16, 384), (1, 8, 8, 768)]
    assert [o.shape for o in outs] == expected


def test_remat_blocks_grad_equivalence():
    """compute.remat_blocks (gradient checkpointing) changes backward
    memory scheduling only: forward values and parameter gradients match
    the plain path on BOTH branches — the deep-stage lax.scan
    (scan-over-remat-pair) and the unrolled depth-2 stages."""
    from birefnet_tpu.configs import ComputeConfig

    cfg = SwinConfig.swin_t()  # stage 2 depth 6 -> scan; others unrolled
    params = init_swin_params(cfg, seed=7)
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(0, 1, (1, 64, 64, 3)).astype(np.float32))

    def make_loss(compute):
        def loss(p):
            outs = bswin.swin_forward(p, cfg, x, compute)
            return sum(jnp.mean(o * o) for o in outs)
        return loss

    base, gbase = jax.value_and_grad(make_loss(ComputeConfig()))(params)
    rem, grem = jax.value_and_grad(
        make_loss(ComputeConfig(remat_blocks=True)))(params)
    assert abs(float(base) - float(rem)) < 1e-6 * max(1.0, abs(float(base)))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(gbase)[0],
            jax.tree_util.tree_flatten_with_path(grem)[0]):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5,
                                   err_msg=jax.tree_util.keystr(ka))


def test_deep_stage_scan_unroll_equivalence():
    """The deep-stage lax.scan partial-unroll knob and the full python
    unroll must be numerically identical to the plain scan (same per-block
    ops, only loop structure differs). swin_t's stage 2 (depth 6) takes
    the scan path."""
    from birefnet_tpu.configs import ComputeConfig

    cfg = SwinConfig.swin_t()
    params = init_swin_params(cfg, seed=5)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(0, 1, (1, 96, 96, 3)).astype(np.float32))
    base = bswin.swin_forward(params, cfg, x, ComputeConfig())
    for compute in (ComputeConfig(deep_stage_scan_unroll=3),
                    ComputeConfig(unroll_deep_stage=True)):
        outs = bswin.swin_forward(params, cfg, x, compute)
        for o, b in zip(outs, base):
            np.testing.assert_allclose(np.asarray(o), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)


def test_ws7_preset_flash_runs_middle_tier(monkeypatch):
    """Supported-geometry guard, round-4 tiering: with flash requested on
    a ws=7 preset the backbone runs the MIDDLE tier (partitioned windows +
    packed-qkv flash core + fused MLP — the strip-reading block kernel is
    ws=12-only). Engagement is asserted STRUCTURALLY (both middle-tier
    kernels invoked; a roundoff-diff assert would be platform-fragile),
    and the tier must agree with the unfused path at f32 roundoff."""
    from birefnet_tpu.configs import ComputeConfig
    from birefnet_tpu.ops.pallas import flash_window_attn, fused_mlp

    cfg = SwinConfig.swin_t()
    params = init_swin_params(cfg, seed=6)
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(0, 0.3, (1, 56, 56, 3)).astype(np.float32))
    base = bswin.swin_forward(params, cfg, x, ComputeConfig())

    calls = {"flash_qkv": 0, "fused_mlp": 0}
    orig_flash = flash_window_attn.flash_window_attention_qkv
    orig_mlp = fused_mlp.fused_mlp_residual

    def spy_flash(*a, **k):
        calls["flash_qkv"] += 1
        return orig_flash(*a, **k)

    def spy_mlp(*a, **k):
        calls["fused_mlp"] += 1
        return orig_mlp(*a, **k)

    monkeypatch.setattr(flash_window_attn, "flash_window_attention_qkv",
                        spy_flash)
    monkeypatch.setattr(fused_mlp, "fused_mlp_residual", spy_mlp)
    flash = bswin.swin_forward(
        params, cfg, x, ComputeConfig(use_flash_attention=True))
    assert calls["flash_qkv"] > 0, "packed-qkv flash core did not engage"
    assert calls["fused_mlp"] > 0, "fused MLP kernel did not engage"
    for i, (b, f) in enumerate(zip(base, flash)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(b),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"stage {i}")


def test_unknown_ws_flash_falls_back_bitwise():
    """A window size outside the validated {12 fused, 7 middle-tier}
    families must provably fall back to the unfused XLA path —
    bitwise-identical outputs."""
    import dataclasses as _dc

    from birefnet_tpu.configs import ComputeConfig

    cfg = _dc.replace(SwinConfig.swin_t(), window_size=5)
    params = init_swin_params(cfg, seed=6)
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(0, 0.3, (1, 40, 40, 3)).astype(np.float32))
    base = bswin.swin_forward(params, cfg, x, ComputeConfig())
    flash = bswin.swin_forward(
        params, cfg, x, ComputeConfig(use_flash_attention=True))
    for b, f in zip(base, flash):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(f))


def test_swin_t_parity_vs_torch(rng):
    cfg = SwinConfig.swin_t()
    ckpt = _random_swin_ckpt(cfg, seed=3)
    params = jax.tree.map(jnp.asarray, _swin(_Source(ckpt), "bb", cfg))

    tm = TorchSwin(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                   window_size=7)
    sd = {k[len("bb."):]: torch.from_numpy(v.copy()) for k, v in ckpt.items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected and not [m for m in missing if "relative_position_index" not in m]
    tm.eval()

    x = rng.normal(size=(1, 56, 56, 3)).astype(np.float32)
    outs = bswin.swin_forward(params, cfg, jnp.asarray(x))
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for i, (o, w) in enumerate(zip(outs, want)):
        np.testing.assert_allclose(
            np.asarray(o), w.permute(0, 2, 3, 1).numpy(),
            atol=2e-4, rtol=1e-3, err_msg=f"stage {i}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatial_sharded_full_model_matches_dense(rng):
    """Full BiRefNet with H sharded 2-way (GSPMD) == dense result."""
    from birefnet_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(2, spatial=2)
    cfg = bt.BiRefNetConfig.swin_l()
    params = bt.init_params(cfg, seed=4)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.3

    want = np.asarray(bt.birefnet.forward_logits(params, cfg, jnp.asarray(x)))

    spec = NamedSharding(mesh, P(None, pmesh.SPATIAL_AXIS, None, None))
    xs = jax.device_put(jnp.asarray(x), spec)
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    got = np.asarray(jax.jit(
        lambda p, t: bt.birefnet.forward_logits(p, cfg, t),
        in_shardings=(NamedSharding(mesh, P()), spec),
        out_shardings=spec)(ps, xs))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
