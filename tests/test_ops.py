"""Op-level parity tests vs PyTorch ground truth.

Mirrors the reference's numerical-parity test strategy (SURVEY.md §4):
every custom op is validated against the PyTorch oracle on random inputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from birefnet_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
)
from birefnet_tpu.ops.window import (
    pad_to_multiple,
    relative_position_index,
    roll_2d,
    sw_msa_mask,
    window_partition,
    window_reverse,
)
from birefnet_tpu.ops.attention import window_attention
from birefnet_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_local
from tests.torch_ref.birefnet_torch import deform_conv2d_torch


@pytest.mark.parametrize("src,dst", [(8, 16), (16, 8), (7, 13), (32, 32),
                                     (5, 1), (1, 5), (33, 64), (64, 33)])
def test_resize_align_corners_matches_torch(rng, src, dst):
    x = rng.normal(size=(2, src, src + 1, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), dst, dst + 2))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(dst, dst + 2),
        mode="bilinear", align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("src,dst", [(1, 8), (4, 8), (8, 4), (3, 7)])
def test_resize_nearest_matches_torch(rng, src, dst):
    x = rng.normal(size=(1, src, src, 4)).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), dst, dst))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(dst, dst),
        mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_window_partition_reverse_roundtrip(rng):
    x = rng.normal(size=(2, 24, 36, 8)).astype(np.float32)
    w = window_partition(jnp.asarray(x), 12)
    assert w.shape == (2 * 2 * 3, 144, 8)
    back = window_reverse(w, 12, 24, 36)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_partition_matches_torch_layout(rng):
    from tests.torch_ref.birefnet_torch import window_partition as tw
    x = rng.normal(size=(1, 24, 24, 4)).astype(np.float32)
    got = np.asarray(window_partition(jnp.asarray(x), 12))
    want = tw(torch.from_numpy(x), 12).numpy()
    np.testing.assert_array_equal(got, want)


def test_roll_matches_torch(rng):
    x = rng.normal(size=(1, 10, 12, 3)).astype(np.float32)
    got = np.asarray(roll_2d(jnp.asarray(x), -6, -6))
    want = torch.roll(torch.from_numpy(x), (-6, -6), dims=(1, 2)).numpy()
    np.testing.assert_array_equal(got, want)


def test_relative_position_index_matches_torch():
    ws = 12
    idx = relative_position_index(ws)
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij"))
    cf = coords.flatten(1)
    rel = cf[:, :, None] - cf[:, None, :]
    want = ((rel[0] + ws - 1) * (2 * ws - 1) + (rel[1] + ws - 1)).numpy()
    np.testing.assert_array_equal(idx, want)
    assert idx.max() == (2 * ws - 1) ** 2 - 1


def test_sw_msa_mask_values():
    # Reference semantics: -100.0 (not -inf) for cross-region pairs
    # (reference: src/swin.rs:651).
    m = sw_msa_mask(24, 24, 12, 6)
    assert m.shape == (4, 144, 144)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # Non-shifted top-left window: fully unmasked.
    assert (m[0] == 0).all()
    # Bottom-right window mixes 4 regions: must have masked pairs.
    assert (m[3] == -100.0).any()


def test_sw_msa_mask_dev_matches_numpy():
    # The on-device (iota-built) mask builders must be bit-identical to the
    # numpy trace-time-constant versions at every shipped geometry — they
    # exist only to remove the mask literals from the program text (the
    # remote-compile size wall), not to change a single value.
    from birefnet_tpu.ops.window import (
        sw_msa_mask_dev, sw_msa_mask_offset, sw_msa_mask_offset_dev)
    geoms = [(264, 264, 12, 6), (132, 132, 12, 6), (72, 72, 12, 6),
             (36, 36, 12, 6), (24, 24, 12, 6), (28, 28, 7, 3),
             (36, 48, 12, 6)]
    for hp, wp, ws, shift in geoms:
        np.testing.assert_array_equal(
            np.asarray(sw_msa_mask_dev(hp, wp, ws, shift)),
            sw_msa_mask(hp, wp, ws, shift), err_msg=f"{(hp, wp, ws, shift)}")
        np.testing.assert_array_equal(
            np.asarray(sw_msa_mask_offset_dev(hp, wp, ws, shift)),
            sw_msa_mask_offset(hp, wp, ws, shift),
            err_msg=f"offset {(hp, wp, ws, shift)}")


def test_window_attention_matches_torch(rng):
    b_, heads, n, d = 8, 3, 16, 8
    nw = 4
    q = rng.normal(size=(b_, heads, n, d)).astype(np.float32)
    k = rng.normal(size=(b_, heads, n, d)).astype(np.float32)
    v = rng.normal(size=(b_, heads, n, d)).astype(np.float32)
    bias = rng.normal(size=(heads, n, n)).astype(np.float32)
    mask = (rng.integers(0, 2, size=(nw, n, n)) * -100.0).astype(np.float32)

    got = np.asarray(window_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias),
        jnp.asarray(mask)))

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    attn = (tq * d ** -0.5) @ tk.transpose(-2, -1)
    attn = attn + torch.from_numpy(bias).unsqueeze(0)
    attn = attn.view(b_ // nw, nw, heads, n, n)
    attn = attn + torch.from_numpy(mask).unsqueeze(0).unsqueeze(2)
    attn = attn.view(b_, heads, n, n).softmax(-1)
    want = (attn @ tv).numpy()
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("k,pad,stride", [(1, 0, 1), (3, 1, 1), (7, 3, 1),
                                          (3, 1, 2)])
def test_deform_conv_matches_torch(rng, k, pad, stride):
    b, h, w, cin, cout = 2, 9, 11, 6, 5
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    offset = (rng.normal(size=(b, oh, ow, 2 * k * k)) * 2).astype(np.float32)
    mask = rng.uniform(0, 2, size=(b, oh, ow, k * k)).astype(np.float32)
    weight = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), stride=stride, padding=pad))

    # Torch oracle uses NCHW + OIHW + interleaved (dy,dx) offset channels.
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    toff = torch.from_numpy(offset).permute(0, 3, 1, 2)
    tmask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    tw = torch.from_numpy(weight).permute(3, 2, 0, 1)
    want = deform_conv2d_torch(
        tx, toff, tmask, tw, torch.from_numpy(bias),
        stride=stride, padding=pad).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("k,pad,tile", [(1, 0, 8), (3, 1, 8), (7, 3, 8),
                                        (3, 1, 16)])
def test_deform_conv_local_matches_exact_when_bounded(rng, k, pad, tile):
    """deform_conv2d_local == deform_conv2d whenever |offset| <= radius
    (the deform_mode="deformable-local" contract), including zero-padding
    border semantics and non-tile-divisible output sizes."""
    b, h, w, cin, cout, radius = 2, 19, 13, 6, 5, 3
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    offset = rng.uniform(-radius, radius,
                         size=(b, h, w, 2 * k * k)).astype(np.float32)
    mask = rng.uniform(0, 2, size=(b, h, w, k * k)).astype(np.float32)
    weight = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    bias = rng.normal(size=(cout,)).astype(np.float32)

    want = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), padding=pad))
    got = np.asarray(deform_conv2d_local(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), padding=pad,
        radius=radius, tile=tile))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_deform_conv_local_clamps_large_offsets(rng):
    """Offsets beyond the radius behave exactly as if clamped to +-radius."""
    b, h, w, cin, cout, k, radius = 1, 12, 12, 4, 3, 3, 2
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    offset = (rng.normal(size=(b, h, w, 2 * k * k)) * 6).astype(np.float32)
    mask = rng.uniform(0, 2, size=(b, h, w, k * k)).astype(np.float32)
    weight = rng.normal(size=(k, k, cin, cout)).astype(np.float32)

    want = np.asarray(deform_conv2d(
        jnp.asarray(x),
        jnp.asarray(np.clip(offset, -radius, radius)), jnp.asarray(mask),
        jnp.asarray(weight), padding=1))
    got = np.asarray(deform_conv2d_local(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), padding=1, radius=radius, tile=8))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_deform_conv_scan_remat_grads_match_direct(rng):
    """The blocked-im2col scan path (nb > 1) is wrapped in jax.checkpoint
    so its VJP re-gathers per block instead of stacking every iteration's
    residuals (a 6.19 GB allocation at the 1024² dec1 site — HBM OOM on a
    16 GB chip, worker job_207). Values must be bitwise equal to the
    single-block path and grads equal to f32 reassociation roundoff."""
    import birefnet_tpu.ops.deform_conv as dc
    b, h, w, cin, cout, kh = 1, 24, 24, 8, 16, 3
    k = kh * kh
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    off = jnp.asarray(
        rng.normal(scale=2.0, size=(b, h, w, 2 * k)).astype(np.float32))
    m = jnp.asarray(
        rng.uniform(0.2, 1.8, size=(b, h, w, k)).astype(np.float32))
    wt = jnp.asarray(
        rng.normal(size=(kh, kh, cin, cout)).astype(np.float32))

    def run(budget):
        old = dc._IM2COL_BUDGET
        dc._IM2COL_BUDGET = budget
        try:
            def f(x, off, m, wt):
                return jnp.sum(dc.deform_conv2d(x, off, m, wt,
                                                padding=1) ** 2)
            return jax.value_and_grad(f, argnums=(0, 1, 2, 3))(x, off, m, wt)
        finally:
            dc._IM2COL_BUDGET = old

    v1, g1 = run(10 ** 9)     # nb == 1: direct block_body call
    v2, g2 = run(8 * 1024)    # small budget forces the scanned+remat path
    assert float(v1) == float(v2), (v1, v2)
    for a, b_ in zip(g1, g2):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        rel = float(jnp.max(jnp.abs(a - b_))) / scale
        assert rel < 1e-6, (rel, a.shape)


def test_deform_conv_zero_offset_equals_regular_conv(rng):
    """With zero offsets and unit mask, deform conv == regular conv."""
    b, h, w, cin, cout, k = 1, 8, 8, 4, 3, 3
    x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
    weight = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    offset = np.zeros((b, h, w, 2 * k * k), np.float32)
    mask = np.ones((b, h, w, k * k), np.float32)
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), padding=1))
    want = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(weight).permute(3, 2, 0, 1),
        padding=1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pad_to_multiple():
    x = jnp.ones((1, 10, 14, 2))
    y = pad_to_multiple(x, 12)
    assert y.shape == (1, 12, 24, 2)
    assert float(y[:, 10:, :, :].sum()) == 0.0


# (The experimental Pallas deform-local kernel and its parity test were
# retired in round 3: a compile-safe chunked-tap variant measured
# 0.38-0.82x the XLA sampler at every model site — ROADMAP.md
# "N1 retirement". deform_conv2d / deform_conv2d_local above are the
# designated N1 implementations.)


def test_row_ln_matches_layer_norm(rng):
    # Pallas row-LN (interpret mode) vs the XLA LayerNorm it replaces on
    # the stage-output sites; f32 exact to reduction order, bf16 to 2 ulp.
    from birefnet_tpu.ops.pallas.row_ln import layer_norm_rows
    from birefnet_tpu.ops import layers as L

    for shape in [(2, 8, 8, 192), (4, 16, 1536), (2, 7, 3, 96), (5, 192)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 3.0
        p = {"scale": jnp.asarray(
                 rng.normal(size=(shape[-1],)).astype(np.float32)),
             "bias": jnp.asarray(
                 rng.normal(size=(shape[-1],)).astype(np.float32))}
        a = layer_norm_rows(p, x)
        b = L.layer_norm(p, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)
        xb = x.astype(jnp.bfloat16)
        ab = layer_norm_rows(p, xb).astype(np.float32)
        bb = L.layer_norm(p, xb).astype(np.float32)
        ulp = np.maximum(np.abs(np.asarray(bb)), 1e-2) * 2.0 ** -8
        assert float(np.max(np.abs(np.asarray(ab) - np.asarray(bb)) / ulp)) \
            <= 2.5


def test_tap_conv_matches_conv2d(rng):
    # Direct tap-accumulation head conv (interpret mode) vs lax conv;
    # f32 to FMA-order rounding, bf16 within a few ulp (f32 taps).
    from birefnet_tpu.ops.pallas.tap_conv import tap_conv_same
    from birefnet_tpu.ops import layers as L

    for (h, w) in [(32, 64), (64, 64)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(5, 5, 3, 1)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))
        y = tap_conv_same(x, k, b)
        ref = L.conv2d({"kernel": k, "bias": b}, x, padding=2)[..., 0]
        assert y.shape == (2, h, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=0, atol=1e-4)
