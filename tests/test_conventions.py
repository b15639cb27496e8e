"""Desk-check tests pinning the two authored layout conventions against the
reference's own definitions, derived IN-TEST from first principles — not
imported from params.py or the torch oracle (round-3 verdict weak #6: a
mirrored misreading shared between the framework and the oracle would pass
every oracle-parity test; these two conventions are where that risk lives).

1. Deformable-conv offset channel interleave. The reference launches the
   candle fork's `deformable_im2col` with a torchvision-shaped config
   (h, w, kh, kw, pad, stride, dilation, batch, C, n_offset_grps=1,
   use_mask=true) and a `columns [C*kh*kw, B*oh*ow]` buffer (reference:
   src/deform_conv.rs:102-144) — torchvision `deform_conv2d` semantics,
   whose documented offset layout is [B, 2*kh*kw, OH, OW] with channel
   2*t = dy and 2*t + 1 = dx for ROW-major tap t = ti*kw + tj, sampling at
       y = y_out*stride - pad + ti*dil + dy,
       x = x_out*stride - pad + tj*dil + dx
   (bilinear, zero outside the open interval (-1, H)x(-1, W), times the
   modulation mask). The expected values below are computed by a literal
   numpy transcription of that formula.

2. image2patches channel order. The reference rearranges NCHW as
   reshape[B, C, gh, th, gw, tw] -> permute(0,1,2,4,3,5) ->
   reshape[B, C*gh*gw, th, tw] (reference: src/birefnet.rs:288-300), i.e.
       out[b, (c*gh + i)*gw + j, y, x] = img[b, c, i*th + y, j*tw + x]
   — contiguous tiles, channel-major-then-grid-row-major channel index.
   The ipt_blk conv weights are loaded with NO channel permutation
   (params.py transposes OIHW->HWIO only), so our NHWC image2patches must
   produce exactly this channel order.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from birefnet_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_local
from birefnet_tpu.models.decoder import image2patches


def _torchvision_deform_ref(x, offset, mask, weight, stride=1, padding=0,
                            dilation=1):
    """Literal scalar-loop transcription of torchvision deform_conv2d
    (the desk derivation — independent of birefnet_tpu AND of the torch
    oracle). NHWC in/out to match the framework's layout."""
    b, h, w, c = x.shape
    kh, kw, _, out_c = weight.shape
    oh = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    ow = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    def sample(bi, y, x_, ci):
        # zero unless -1 < y < H and -1 < x < W; bilinear with zero corners
        if not (-1 < y < h and -1 < x_ < w):
            return 0.0
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        ly, lx = y - y0, x_ - x0
        val = 0.0
        for dy, wy in ((0, 1 - ly), (1, ly)):
            for dx, wx in ((0, 1 - lx), (1, lx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xx < w:
                    val += wy * wx * x[bi, yy, xx, ci]
        return val

    out = np.zeros((b, oh, ow, out_c), np.float64)
    for bi in range(b):
        for oy in range(oh):
            for ox in range(ow):
                for ti in range(kh):
                    for tj in range(kw):
                        t = ti * kw + tj  # ROW-major tap index
                        dy = offset[bi, oy, ox, 2 * t]
                        dx = offset[bi, oy, ox, 2 * t + 1]
                        m = mask[bi, oy, ox, t]
                        y = oy * stride - padding + ti * dilation + dy
                        x_ = ox * stride - padding + tj * dilation + dx
                        for ci in range(c):
                            v = sample(bi, y, x_, ci) * m
                            out[bi, oy, ox] += v * weight[ti, tj, ci]
    return out.astype(np.float32)


def test_offset_dy_dx_interleave_desk_check():
    """Integer offsets on single channels make the (dy, dx) interleave and
    the row-major tap order directly observable: only the top-right tap
    (0, 2) carries weight, and only ITS offset channels (2*2=4 for dy,
    5 for dx) may move the output. A [2, K] (all-dy-then-all-dx) layout or
    column-major taps would leave the output unshifted / shift the wrong
    axis."""
    h, w, k = 5, 6, 3
    x = (np.arange(h * w, dtype=np.float32).reshape(1, h, w, 1) + 1.0)
    weight = np.zeros((k, k, 1, 1), np.float32)
    ti, tj = 0, 2
    weight[ti, tj, 0, 0] = 1.0
    t = ti * k + tj
    mask = np.ones((1, h, w, k * k), np.float32)

    for ch, (edy, edx) in ((2 * t, (1.0, 0.0)), (2 * t + 1, (0.0, 1.0))):
        offset = np.zeros((1, h, w, 2 * k * k), np.float32)
        offset[..., ch] = 1.0
        # Hand expectation: out[y, x] = x_in[y + ti - 1 + edy, x + tj - 1
        # + edx] with zeros outside (pad=1, stride=1, single active tap).
        want = np.zeros((1, h, w, 1), np.float32)
        for oy in range(h):
            for ox in range(w):
                sy = int(oy + ti - 1 + edy)
                sx = int(ox + tj - 1 + edx)
                if 0 <= sy < h and 0 <= sx < w:
                    want[0, oy, ox, 0] = x[0, sy, sx, 0]
        ref = _torchvision_deform_ref(x, offset, mask, weight, padding=1)
        np.testing.assert_allclose(ref, want, atol=1e-6)  # desk self-check

        got = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), padding=1))
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"offset channel {ch}")
        got_local = np.asarray(deform_conv2d_local(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight), padding=1, radius=2, tile=4))
        np.testing.assert_allclose(got_local, want, atol=1e-5,
                                   err_msg=f"local offset channel {ch}")


def test_deform_fractional_bilinear_desk_check():
    """Fractional offsets + modulation + border behavior vs the literal
    torchvision-formula loop (catches sign/corner-weight mistakes the
    integer-shift test cannot)."""
    rng = np.random.default_rng(42)
    h, w, cin, cout, k = 6, 5, 2, 3, 3
    x = rng.normal(size=(1, h, w, cin)).astype(np.float32)
    weight = rng.normal(size=(k, k, cin, cout)).astype(np.float32)
    offset = rng.normal(scale=1.7, size=(1, h, w, 2 * k * k)) \
        .astype(np.float32)
    mask = rng.uniform(0.0, 2.0, size=(1, h, w, k * k)).astype(np.float32)

    want = _torchvision_deform_ref(x, offset, mask, weight, padding=1)
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), padding=1))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_image2patches_channel_order_desk_check():
    """out[b, y, x, (c*gh + i)*gw + j] must equal img[b, i*th + y,
    j*tw + x, c] — the reference's reshape/permute chain evaluated by
    hand (reference: src/birefnet.rs:288-300). Encodes (c, y, x) into the
    value so any permutation of the channel index is caught."""
    th, tw, gh, gw, c = 2, 3, 2, 2, 3
    h, w = gh * th, gw * tw
    img = np.zeros((1, h, w, c), np.float32)
    for y in range(h):
        for x in range(w):
            for ci in range(c):
                img[0, y, x, ci] = ci * 10000 + y * 100 + x

    got = np.asarray(image2patches(jnp.asarray(img), th, tw))
    assert got.shape == (1, th, tw, c * gh * gw)
    for o in range(c * gh * gw):
        ci = o // (gh * gw)
        i = (o % (gh * gw)) // gw
        j = o % gw
        for y in range(th):
            for x in range(tw):
                want = img[0, i * th + y, j * tw + x, ci]
                assert got[0, y, x, o] == want, (
                    f"channel {o}: expected img[{i * th + y},"
                    f"{j * tw + x},{ci}]={want}, got {got[0, y, x, o]}")
