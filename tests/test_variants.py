"""Config-driven backbone family: full BiRefNet on the swin_t/s/b presets.

The reference carries the backbone name in its config but always
instantiates swin_l (reference: src/birefnet.rs:24,391); its swin_t/s/b
presets (reference: src/swin.rs:27-66) are reachable only standalone.
Here `BiRefNetConfig.for_backbone` honors the name: the decoder/squeeze
channel plan derives from the backbone's stage channels through the same
formulas the reference uses for swin_l (reference: src/birefnet.rs:50-61,
176-238). These tests pin (a) the derived channel math, (b) schema
equality with the equally-parameterized torch oracle, (c) full-model
numerical parity on the smallest variant, and (d) the two-way checkpoint
round trip.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import birefnet_tpu as bt
from birefnet_tpu import params as P
from birefnet_tpu.models import birefnet as bmodel
from tests.torch_ref import birefnet_torch as tref


def _oracle(cfg):
    s = cfg.swin_config()
    return tref.BiRefNetTorch(s.embed_dim, s.depths, s.num_heads,
                              s.window_size)


def test_variant_channel_math():
    t = bt.BiRefNetConfig.swin_t()
    assert t.backbone == "swin_v1_t"
    assert t.backbone_channels == (96, 192, 384, 768)
    assert t.cxt == (96, 192, 384)
    assert t.lateral_channels() == (192, 384, 768, 1536)
    assert t.x4_channels() == 1536 + 2 * (96 + 192 + 384)  # 2880
    assert t.dec_out_channels() == (768, 384, 192, 96)
    assert t.dec_in_channels() == (1536 + 384, 768 + 384, 384 + 192, 192 + 96)
    assert t.final_channels() == 96 + 48
    # ipt inputs are patch-derived, backbone-independent.
    assert t.ipt_in_channels() == (3, 48, 192, 768, 3072)

    b = bt.BiRefNetConfig.swin_b()
    assert b.backbone_channels == (128, 256, 512, 1024)
    assert b.x4_channels() == 2048 + 2 * (128 + 256 + 512)  # 3840
    assert b.swin_config().window_size == 12

    s = bt.BiRefNetConfig.swin_s()
    assert s.backbone_channels == (96, 192, 384, 768)
    assert s.swin_config().depths == (2, 2, 18, 2)

    # The flagship is unchanged by the resolution-by-name plumbing.
    l = bt.BiRefNetConfig.swin_l()
    assert l.swin_config() == bt.SwinConfig.swin_l()
    assert l.x4_channels() == 5760


def test_mismatched_backbone_channels_raise():
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(),
                              backbone="swin_v1_t")
    with pytest.raises(ValueError, match="stage channels"):
        cfg.swin_config()
    with pytest.raises(ValueError, match="unknown backbone"):
        dataclasses.replace(bt.BiRefNetConfig.swin_l(),
                            backbone="resnet50").swin_config()


@pytest.mark.parametrize("name", ["swin_v1_t", "swin_v1_b"])
def test_variant_schema_matches_torch(name):
    cfg = bt.BiRefNetConfig.for_backbone(name)
    ckpt = bt.random_checkpoint(cfg, seed=3)
    sd = _oracle(cfg).state_dict()
    theirs = {k for k in sd if "num_batches_tracked" not in k}
    assert set(ckpt) == theirs, (
        f"only-ours: {sorted(set(ckpt) - theirs)[:5]} "
        f"only-theirs: {sorted(theirs - set(ckpt))[:5]}")
    for k, v in ckpt.items():
        assert tuple(sd[k].shape) == v.shape, k


def test_swin_t_full_model_parity(rng):
    cfg = bt.BiRefNetConfig.swin_t()
    ckpt = bt.random_checkpoint(cfg, seed=3)
    params = jax.tree.map(jnp.asarray, bt.build_param_tree(ckpt, cfg))
    m = _oracle(cfg)
    tref.load_flat_checkpoint(m, ckpt)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5
    got = np.asarray(bmodel.forward_logits(params, cfg, jnp.asarray(x)))
    with torch.no_grad():
        want = m.forward_logits(
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_swin_t_export_roundtrip():
    cfg = bt.BiRefNetConfig.swin_t()
    ckpt = bt.random_checkpoint(cfg, seed=5)
    params = bt.build_param_tree(ckpt, cfg)
    out = P.export_checkpoint(params, cfg)
    assert set(out) == set(ckpt)
    reloaded = bt.build_param_tree(out, cfg)
    jax.tree.map(np.testing.assert_array_equal, params, reloaded)
