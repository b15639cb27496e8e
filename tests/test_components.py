"""Parity tests for secondary inventory components.

The reference keeps several dead-but-present components that other BiRefNet
variants use (SURVEY.md §2.1): ResBlk (reference: src/decoder.rs:145-217),
the classic dilated ASPP (reference: src/aspp.rs:336-447), the standalone
DeformableConv2d with stride support (reference: src/deform_conv.rs:17-222),
and the swin_t/s/b presets. This framework implements them as working,
tested components.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import birefnet_tpu as bt
from birefnet_tpu.configs import SwinConfig
from birefnet_tpu.models import aspp as baspp
from birefnet_tpu.models import decoder as bdec
from birefnet_tpu.ops import layers as L
from tests.torch_ref.birefnet_torch import ASPPDeformable, BasicDecBlk


def _conv_params(rng, cin, cout, k, bias=True):
    p = {"kernel": jnp.asarray(
        rng.normal(0, 0.1, size=(k, k, cin, cout)).astype(np.float32))}
    if bias:
        p["bias"] = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    return p


def _to_torch_conv(p, conv):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            np.asarray(p["kernel"]).transpose(3, 2, 0, 1)))
        if "bias" in p:
            conv.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))


def _bn_params(rng, c):
    scale = rng.uniform(0.5, 1.5, size=c).astype(np.float32)
    shift = rng.normal(size=c).astype(np.float32)
    return {"scale": jnp.asarray(scale), "shift": jnp.asarray(shift)}


def test_res_blk_parity(rng):
    """ResBlk = BasicDecBlk + 1x1 residual conv
    (reference: src/decoder.rs:198-217)."""
    cin, cout = 24, 16
    cfg = bt.BiRefNetConfig.swin_l()
    ckpt = {}
    npr = np.random.default_rng(5)
    # Build a ResBlk checkpoint fragment by hand via the schema helpers.
    from birefnet_tpu.params import (
        _basic_dec_blk_entries, _conv_entries, build_param_tree, _Source,
        _basic_dec_blk, _conv)
    entries = _basic_dec_blk_entries("blk", cin, cout) + _conv_entries(
        "blk.conv_resi", cin, cout, 1)
    for name, shape in entries:
        if name.endswith("running_var"):
            ckpt[name] = npr.uniform(0.5, 1.5, size=shape).astype(np.float32)
        else:
            ckpt[name] = npr.normal(0, 0.1, size=shape).astype(np.float32)

    src = _Source(ckpt)
    params = _basic_dec_blk(src, "blk")
    params["conv_resi"] = _conv(src, "blk.conv_resi")
    params = jax.tree.map(jnp.asarray, params)

    x = rng.normal(size=(1, 6, 6, cin)).astype(np.float32)
    got = np.asarray(bdec.res_blk_forward(params, jnp.asarray(x),
                                          bt.ComputeConfig()))

    class ResBlkTorch(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(cin, 64, 3, padding=1)
            self.bn_in = nn.BatchNorm2d(64)
            self.dec_att = ASPPDeformable(64)
            self.conv_out = nn.Conv2d(64, cout, 3, padding=1)
            self.bn_out = nn.BatchNorm2d(cout)
            self.conv_resi = nn.Conv2d(cin, cout, 1)

        def forward(self, x):
            resi = self.conv_resi(x)
            x = F.relu(self.bn_in(self.conv_in(x)))
            x = self.dec_att(x)
            return self.bn_out(self.conv_out(x)) + resi

    tm = ResBlkTorch()
    sd = {k.replace("blk.", ""): torch.from_numpy(v.copy())
          for k, v in ckpt.items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(
            0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_classic_aspp_parity(rng):
    """Non-deformable dilated ASPP (reference: src/aspp.rs:429-446)."""
    npr = np.random.default_rng(6)
    cin, cout, inter = 8, 8, 256
    params = {
        "aspp1": {"atrous_conv": _conv_params(npr, cin, inter, 1)},
        "aspp2": {"atrous_conv": _conv_params(npr, cin, inter, 3)},
        "aspp3": {"atrous_conv": _conv_params(npr, cin, inter, 3)},
        "aspp4": {"atrous_conv": _conv_params(npr, cin, inter, 3)},
        "global_avg_pool_conv": _conv_params(npr, cin, inter, 1),
        "conv1": _conv_params(npr, inter * 5, cout, 1),
    }
    x = rng.normal(size=(1, 12, 12, cin)).astype(np.float32)
    got = np.asarray(baspp.aspp_forward(params, jnp.asarray(x)))

    class ASPPTorch(nn.Module):
        def __init__(self):
            super().__init__()
            d = baspp.ASPP_DILATIONS
            self.a1 = nn.Conv2d(cin, inter, 1)
            self.a2 = nn.Conv2d(cin, inter, 3, padding=d[1], dilation=d[1])
            self.a3 = nn.Conv2d(cin, inter, 3, padding=d[2], dilation=d[2])
            self.a4 = nn.Conv2d(cin, inter, 3, padding=d[3], dilation=d[3])
            self.gp = nn.Conv2d(cin, inter, 1)
            self.c1 = nn.Conv2d(inter * 5, cout, 1)

        def forward(self, x):
            h, w = x.shape[2:]
            xs = [F.relu(self.a1(x)), F.relu(self.a2(x)),
                  F.relu(self.a3(x)), F.relu(self.a4(x))]
            x5 = F.relu(self.gp(x.mean((2, 3), keepdim=True)))
            xs.append(F.interpolate(x5, size=(h, w), mode="nearest"))
            return F.relu(self.c1(torch.cat(xs, 1)))

    tm = ASPPTorch()
    for p, conv in [(params["aspp1"]["atrous_conv"], tm.a1),
                    (params["aspp2"]["atrous_conv"], tm.a2),
                    (params["aspp3"]["atrous_conv"], tm.a3),
                    (params["aspp4"]["atrous_conv"], tm.a4),
                    (params["global_avg_pool_conv"], tm.gp),
                    (params["conv1"], tm.c1)]:
        _to_torch_conv(p, conv)
    tm.eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(
            0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_standalone_deformable_conv2d_stride(rng):
    """Standalone DeformableConv2d exercises stride=2 + bias
    (reference: src/deform_conv.rs:29-99, examples/test_deform_conv.rs:79-82)."""
    npr = np.random.default_rng(7)
    cin, cout, k, stride, pad = 6, 5, 3, 2, 1
    params = {
        "offset_conv": _conv_params(npr, cin, 2 * k * k, k),
        "modulator_conv": _conv_params(npr, cin, k * k, k),
        "regular_conv": _conv_params(npr, cin, cout, k),  # bias present here
    }
    x = rng.normal(size=(2, 9, 9, cin)).astype(np.float32)
    got = np.asarray(baspp.deform_conv_aspp_forward(
        params, jnp.asarray(x), k, pad, bt.ComputeConfig(), stride=stride))
    # Output dims match the reference's assertion
    # (examples/test_deform_conv.rs:79-82): (H + 2p - k)/s + 1.
    assert got.shape == (2, (9 + 2 * pad - k) // stride + 1,
                         (9 + 2 * pad - k) // stride + 1, cout)

    from tests.torch_ref.birefnet_torch import deform_conv2d_torch
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    oc = nn.Conv2d(cin, 2 * k * k, k, stride=stride, padding=pad)
    mc = nn.Conv2d(cin, k * k, k, stride=stride, padding=pad)
    rc = nn.Conv2d(cin, cout, k, stride=stride, padding=pad)
    _to_torch_conv(params["offset_conv"], oc)
    _to_torch_conv(params["modulator_conv"], mc)
    _to_torch_conv(params["regular_conv"], rc)
    with torch.no_grad():
        off = oc(tx)
        mod = 2.0 * torch.sigmoid(mc(tx))
        want = deform_conv2d_torch(
            tx, off, mod, rc.weight, rc.bias, stride=stride,
            padding=pad).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("preset,embed,window", [
    ("swin_t", 96, 7), ("swin_s", 96, 7), ("swin_b", 128, 12),
    ("swin_l", 192, 12)])
def test_swin_presets(preset, embed, window):
    cfg = getattr(SwinConfig, preset)()
    assert cfg.embed_dim == embed
    assert cfg.window_size == window
    assert cfg.stage_channels() == tuple(embed * (1 << i) for i in range(4))


def test_channel_math():
    """The exact derived channel table (reference: src/birefnet.rs:176-238)."""
    cfg = bt.BiRefNetConfig.swin_l()
    assert cfg.lateral_channels() == (384, 768, 1536, 3072)
    assert cfg.x4_channels() == 5760
    assert cfg.ipt_in_channels() == (3, 48, 192, 768, 3072)
    assert cfg.ipt_out_channels() == (48, 96, 192, 384, 384)
    assert cfg.dec_in_channels() == (3456, 1920, 960, 480)
    assert cfg.dec_out_channels() == (1536, 768, 384, 192)
    assert cfg.final_channels() == 240


@pytest.mark.parametrize("mul_scl,cxt", [(False, (192, 384, 768)),
                                         (True, ()), (False, ())])
def test_config_variants_end_to_end(rng, mul_scl, cxt):
    """Non-default BiRefNetConfig toggles (reference: src/birefnet.rs:21-29,
    mul_scl_ipt / cxt) must flow through schema -> loader -> forward."""
    import dataclasses
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(),
                              mul_scl_ipt=mul_scl, cxt=cxt)
    # Channel math adapts (reference: src/birefnet.rs:50-61).
    mult = 2 if mul_scl else 1
    assert cfg.lateral_channels() == tuple(c * mult
                                           for c in (192, 384, 768, 1536))
    assert cfg.x4_channels() == 1536 * mult + sum(c * mult for c in cxt)

    params = bt.init_params(cfg, seed=1)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.3
    y = bt.birefnet.forward_logits(params, cfg, jnp.asarray(x))
    assert y.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_deformable_local_mode_matches_faithful_in_aspp(rng):
    """deform_mode="deformable-local" == "deformable" through a real
    DeformConvASPP whenever the learned offsets stay within the clamp
    radius (they do at this scale: offsets come from a small-weight conv
    of bounded inputs)."""
    npr = rng
    cin, cout, k, hw = 16, 24, 7, 24
    off = _conv_params(npr, cin, 2 * k * k, k)
    off = {"kernel": off["kernel"] * 0.05, "bias": off["bias"] * 0.05}
    params = {
        "offset_conv": off,  # scaled so |offset| stays inside the radius
        "modulator_conv": _conv_params(npr, cin, k * k, k),
        "regular_conv": _conv_params(npr, cin, cout, k, bias=False),
    }
    x = jnp.asarray(npr.normal(size=(2, hw, hw, cin)).astype(np.float32))
    exact = baspp.deform_conv_aspp_forward(
        params, x, k, k // 2, bt.ComputeConfig(deform_mode="deformable"))
    local = baspp.deform_conv_aspp_forward(
        params, x, k, k // 2,
        bt.ComputeConfig(deform_mode="deformable-local",
                         deform_local_radius=6))
    np.testing.assert_allclose(np.asarray(local), np.asarray(exact),
                               atol=5e-5, rtol=1e-4)
