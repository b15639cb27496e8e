"""Full-model and per-module numerical parity vs the PyTorch oracle.

The same random flat checkpoint (schema-exact, see params.checkpoint_spec)
drives both the JAX framework and the torch reference; outputs must agree to
float32 tolerance. This replaces the reference's debug_*.py manual diffing
with an automated rig (SURVEY.md §4 implication).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import birefnet_tpu as bt
from birefnet_tpu.models import birefnet as bmodel
from birefnet_tpu.models import swin as bswin
from birefnet_tpu.models import aspp as baspp
from birefnet_tpu.models import decoder as bdec
from tests.torch_ref import birefnet_torch as tref

CFG = bt.BiRefNetConfig.swin_l()


@pytest.fixture(scope="module")
def ckpt():
    return bt.random_checkpoint(CFG, seed=7)


@pytest.fixture(scope="module")
def jax_params(ckpt):
    return jax.tree.map(jnp.asarray, bt.build_param_tree(ckpt, CFG))


@pytest.fixture(scope="module")
def torch_model(ckpt):
    m = tref.BiRefNetTorch()
    tref.load_flat_checkpoint(m, ckpt)
    return m


def test_checkpoint_schema_matches_torch_state_dict(ckpt, torch_model):
    """Our checkpoint spec == the torch model's state_dict key inventory."""
    ours = set(ckpt.keys())
    theirs = {k for k in torch_model.state_dict().keys()
              if "num_batches_tracked" not in k}
    assert ours == theirs, (
        f"only-ours: {sorted(ours - theirs)[:5]} "
        f"only-theirs: {sorted(theirs - ours)[:5]}")


def test_swin_backbone_parity(rng, jax_params, torch_model):
    x = rng.normal(size=(1, 96, 96, 3)).astype(np.float32) * 0.5
    feats = bswin.swin_forward(jax_params["bb"], CFG.swin_config(),
                               jnp.asarray(x))
    with torch.no_grad():
        tfeats = torch_model.bb(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(feats) == 4
    expected_hw = (24, 12, 6, 3)
    for i, (f, tf) in enumerate(zip(feats, tfeats)):
        want = tf.permute(0, 2, 3, 1).numpy()
        assert f.shape == want.shape
        assert f.shape[1] == expected_hw[i]
        np.testing.assert_allclose(
            np.asarray(f), want, atol=2e-4, rtol=1e-3,
            err_msg=f"stage {i} mismatch")


def test_aspp_deformable_parity(rng, jax_params, torch_model):
    x = rng.normal(size=(1, 8, 8, 64)).astype(np.float32)
    p = jax_params["squeeze_module"]["blocks_0"]["dec_att"]
    got = np.asarray(baspp.aspp_deformable_forward(
        p, jnp.asarray(x), bt.ComputeConfig()))
    with torch.no_grad():
        want = torch_model.squeeze_module[0].dec_att(
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_basic_dec_blk_parity(rng, jax_params, torch_model):
    cin = CFG.x4_channels()
    x = rng.normal(size=(1, 4, 4, cin)).astype(np.float32) * 0.1
    got = np.asarray(bdec.basic_dec_blk_forward(
        jax_params["squeeze_module"]["blocks_0"], jnp.asarray(x),
        bt.ComputeConfig()))
    with torch.no_grad():
        want = torch_model.squeeze_module[0](
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_image2patches_parity(rng):
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    got = np.asarray(bdec.image2patches(jnp.asarray(x), 8, 8))
    want = tref.image2patches(
        torch.from_numpy(x).permute(0, 3, 1, 2), 8, 8
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_full_model_parity(rng, jax_params, torch_model):
    """End-to-end logits parity at 64x64 (structurally identical to 1024x1024:
    both backbone passes, cxt concat, squeeze, full decoder)."""
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5
    got = np.asarray(bmodel.forward_logits(jax_params, CFG, jnp.asarray(x)))
    with torch.no_grad():
        want = torch_model.forward_logits(
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    # Sigmoid surface parity (reference: src/birefnet.rs:466-469).
    got_mask = np.asarray(bmodel.forward(jax_params, CFG, jnp.asarray(x)))
    np.testing.assert_allclose(
        got_mask, 1.0 / (1.0 + np.exp(-want)), atol=1e-4)


def test_nchw_surface(rng, jax_params):
    """Reference-parity NCHW I/O contract (B,3,H,W) -> (B,1,H,W)."""
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    y = bmodel.forward_logits_nchw(jax_params, CFG, jnp.asarray(x))
    assert y.shape == (1, 1, 64, 64)


def test_loader_missing_key_raises(ckpt):
    bad = dict(ckpt)
    bad.pop("decoder.conv_out1.0.weight")
    with pytest.raises(KeyError, match="conv_out1"):
        bt.build_param_tree(bad, CFG)


def test_loader_unexpected_key_raises(ckpt):
    bad = dict(ckpt)
    bad["decoder.some_new_head.weight"] = np.zeros((1, 1), np.float32)
    with pytest.raises(ValueError, match="unexpected"):
        bt.build_param_tree(bad, CFG)


def test_loader_ignorable_keys_ok(ckpt):
    ok = dict(ckpt)
    ok["squeeze_module.0.bn_in.num_batches_tracked"] = np.zeros((), np.float32)
    ok["bb.layers.0.blocks.0.attn.relative_position_index"] = np.zeros(
        (144, 144), np.float32)
    bt.build_param_tree(ok, CFG)  # should not raise


def test_regular_deform_mode_matches_reference_cpu_semantics(rng, jax_params,
                                                             torch_model):
    """deform_mode="regular" must equal the candle CPU path: offsets ignored,
    plain regular_conv (reference: src/aspp.rs:183-185)."""
    import torch.nn.functional as F
    x = rng.normal(size=(1, 8, 8, 64)).astype(np.float32)
    p = jax_params["squeeze_module"]["blocks_0"]["dec_att"]
    compute = bt.ComputeConfig(deform_mode="regular")
    got = np.asarray(baspp.aspp_module_deformable_forward(
        {"atrous_conv": p["aspp_deforms_2"]["atrous_conv"],
         "bn": p["aspp_deforms_2"]["bn"]}, jnp.asarray(x), 7, 3, compute))
    tmod = torch_model.squeeze_module[0].dec_att.aspp_deforms[2]
    with torch.no_grad():
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        y = F.conv2d(tx, tmod.atrous_conv.regular_conv.weight, padding=3)
        want = F.relu(tmod.bn(y)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_bf16_mask_mae_within_budget(rng, jax_params):
    """bf16 end-to-end mask must stay within the 1e-3 MAE quality bar
    (BASELINE.md target) of the f32 mask."""
    x32 = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.5
    m32 = np.asarray(bmodel.forward(jax_params, CFG, jnp.asarray(x32)),
                     np.float32)
    m16 = np.asarray(bmodel.forward(
        jax_params, CFG, jnp.asarray(x32, jnp.bfloat16),
        bt.ComputeConfig(dtype=jnp.bfloat16)), np.float32)
    mae = np.abs(m32 - m16).mean()
    assert mae < 1e-3, f"bf16 mask MAE {mae:.2e}"


def test_full_model_parity_nonsquare(rng, jax_params, torch_model):
    """Non-square input (H != W) exercises every H/W-ordering path: resize
    matrices, window padding, image2patches grids, mask building."""
    x = rng.normal(size=(1, 64, 96, 3)).astype(np.float32) * 0.5
    got = np.asarray(bmodel.forward_logits(jax_params, CFG, jnp.asarray(x)))
    with torch.no_grad():
        want = torch_model.forward_logits(
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (1, 64, 96, 1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
