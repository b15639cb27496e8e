"""BiRefNet decoder blocks and full decoder (TPU-native, functional, NHWC).

Behavioral counterpart of reference src/decoder.rs (SimpleConvs, BasicLatBlk,
BasicDecBlk, ResBlk) and the full BiRefNetDecoder of src/birefnet.rs:121-377,
including the GDT attention gates and the image2patches input pyramid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import BiRefNetConfig, ComputeConfig
from ..ops import layers as L
from ..ops.resize import resize_bilinear_align_corners
from .aspp import aspp_deformable_forward


def simple_convs_forward(params, x: jax.Array) -> jax.Array:
    """conv3x3 -> conv3x3, NO activation between
    (reference: src/decoder.rs:50-56)."""
    x = L.conv2d(params["conv1"], x, padding=1)
    return L.conv2d(params["conv_out"], x, padding=1)


def basic_lat_blk_forward(params, x) -> jax.Array:
    """1x1 conv lateral projection (reference: src/decoder.rs:70-74).

    `x` may be a parts list standing for its channel concat (split-kernel
    partial sums, exact in f32 — see ops.layers.conv2d_concat)."""
    if isinstance(x, (list, tuple)):
        return L.conv2d_concat(params["conv"], list(x))
    return L.conv2d(params["conv"], x)


def basic_dec_blk_forward(
    params, x, compute: ComputeConfig,
    use_aspp_deformable: bool = True,
    return_pre_out: bool = False,
    deform_site_base: int | None = None,
) -> jax.Array:
    """conv_in -> BN -> ReLU -> [ASPPDeformable] -> conv_out -> BN, no final
    ReLU (reference: src/decoder.rs:126-141).

    `x` may be a list of NHWC tensors standing for their channel concat;
    conv_in is then computed as split partial convs (exact, no concat
    materialization — see ops.layers.conv2d_concat).
    `return_pre_out` stops before conv_out/bn_out (used by the final-head
    fold, which absorbs them into a 1-channel conv).
    `deform_site_base`: forward-order index of this block's ASPP's first
    deformable site (ComputeConfig.deform_site_radii numbering).
    """
    if isinstance(x, (list, tuple)):
        x = L.conv2d_concat(params["conv_in"], list(x), padding=1)
    else:
        x = L.conv2d(params["conv_in"], x, padding=1)
    x = L.batch_norm_inference(params["bn_in"], x)
    x = L.relu(x)
    if use_aspp_deformable:
        x = aspp_deformable_forward(params["dec_att"], x, compute,
                                    site_base=deform_site_base)
    if return_pre_out:
        return x
    x = L.conv2d(params["conv_out"], x, padding=1)
    return L.batch_norm_inference(params["bn_out"], x)


def res_blk_forward(
    params, x: jax.Array, compute: ComputeConfig,
    use_aspp_deformable: bool = True,
) -> jax.Array:
    """BasicDecBlk + 1x1 residual conv (reference: src/decoder.rs:198-217).

    Unused by the Swin-L BiRefNet graph but part of the component inventory
    (other BiRefNet variants use it).
    """
    resi = L.conv2d(params["conv_resi"], x)
    x = L.conv2d(params["conv_in"], x, padding=1)
    x = L.batch_norm_inference(params["bn_in"], x)
    x = L.relu(x)
    if use_aspp_deformable:
        x = aspp_deformable_forward(params["dec_att"], x, compute)
    x = L.conv2d(params["conv_out"], x, padding=1)
    x = L.batch_norm_inference(params["bn_out"], x)
    return x + resi


def gdt_convs_forward(params, x: jax.Array) -> jax.Array:
    """conv3x3(in->16) -> BN -> ReLU (reference: src/birefnet.rs:111-118)."""
    x = L.conv2d(params["conv"], x, padding=1)
    x = L.batch_norm_inference(params["bn"], x)
    return L.relu(x)


def image2patches(x: jax.Array, target_h: int, target_w: int) -> jax.Array:
    """Space-to-channel rearrange on NHWC input
    (reference: src/birefnet.rs:288-300).

    [B, gh*th, gw*tw, C] -> [B, th, tw, C*gh*gw] with output channel index
    (c*gh + i)*gw + j, matching the reference's NCHW channel ordering so the
    ipt_blk conv weights line up.
    """
    b, h, w, c = x.shape
    gh, gw = h // target_h, w // target_w
    x = x.reshape(b, gh, target_h, gw, target_w, c)
    x = x.transpose(0, 2, 4, 5, 1, 3)  # [B, th, tw, C, gh, gw]
    return x.reshape(b, target_h, target_w, c * gh * gw)


def _composed_bulk_s2d(k_comp: jax.Array, b_comp, x: jax.Array) -> jax.Array:
    """5x5 'same' conv on tiny-channel input via 4x space-to-depth.

    x [B, H, W, C] -> xs [B, H/4, W/4, 16C] via 4 strided row slices (the
    transpose-free patch-embed trick, lanes ordered (ph, pw, c)); a 5x5
    conv then only couples 3x3 s2d blocks, so it becomes ONE im2col matmul
    [*, 9*16C] @ [9*16C, 16*co] over the 16 output phases, and the result
    is interleaved back with a single small transpose. The phase weight
    matrix is built from k_comp with constant one-hot selectors:
      row (dy,dx,py,px,c) of phase (a,b) takes k_comp[u,v,c,:] where
      a+u-2 = 4(dy-1)+py and b+v-2 = 4(dx-1)+px.
    """
    import numpy as np

    b, h, w, c = x.shape
    co = k_comp.shape[-1]
    hq, wq = h // 4, w // 4
    parts = [x[:, ph::4, :, :].reshape(b, hq, wq, 4 * c) for ph in range(4)]
    xs = jnp.concatenate(parts, axis=-1)  # [B, hq, wq, 16c], (ph, pw, c)
    xsp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))

    sel = np.zeros((5, 3, 4, 4), np.float32)  # [u/v, d, p, phase]
    for u in range(5):
        for a in range(4):
            r = a + u - 2 + 4
            sel[u, r // 4, r % 4, a] = 1.0
    sel = jnp.asarray(sel)
    wm = jnp.einsum("uvco,udpa,vxqb->dxpqcabo", k_comp, sel, sel)
    wm = wm.reshape(9, 16 * c, 16 * co).astype(x.dtype)

    # 9 shifted partial dots (f32 accumulate) instead of materializing the
    # [B, hq, wq, 9*16c] cols concat — the concat cost a measured write +
    # re-read pass (~0.3 ms at 1024^2 batch 2) for a single matmul whose
    # inputs are re-slices of xsp.
    y = None
    for dy in range(3):
        for dx in range(3):
            yk = jnp.einsum(
                "bhwi,io->bhwo", xsp[:, dy:dy + hq, dx:dx + wq, :],
                wm[dy * 3 + dx],
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            y = yk if y is None else y + yk
    if b_comp is not None:
        y = y + jnp.tile(b_comp, 16).astype(jnp.float32)
    y = y.astype(x.dtype)
    # de-interleave phases: [B, hq, wq, 4(a), 4(b), co] -> [B, H, W, co]
    y = y.reshape(b, hq, wq, 4, 4, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, h, w, co)
    return y


def _composed_pair_conv(pa, pb, x: jax.Array,
                        compute: ComputeConfig) -> jax.Array:
    """conv3x3_B(conv3x3_A(x)) with no nonlinearity between, as ONE
    composed 5x5 conv on the interior plus an exact 1-px border recompute.
    Returns CHANNEL-LESS [B, H, W] logits (the only call site is the
    single-channel folded ipt1 head; see the decoder head note).

    The composition is exact everywhere EXCEPT the outermost output ring:
    there the pipeline's crop-then-zero-pad of the intermediate differs
    from the composed conv's view, so the four border strips are
    recomputed with the original pair on 3-row/3-col slices (~1% of the
    work). Used for the decoder's full-resolution ipt1 head
    (3->64 then folded 64->1 at 1024^2): ~30x fewer FLOPs than running
    the 64-channel intermediate at full resolution.
    """
    wa, ba = pa["kernel"], pa.get("bias")
    wb, bb = pb["kernel"], pb.get("bias")
    kh, kw, ci, mid = wa.shape
    _, _, _, co = wb.shape
    assert co == 1, "composed head is single-channel"

    # Composed kernel K[u1+u2, v1+v2, i, o] = sum_m A[u1,v1,i,m] B[u2,v2,m,o]
    k_comp = jnp.zeros((kh + 2, kw + 2, ci, co), wa.dtype)
    for u1 in range(kh):
        for v1 in range(kw):
            k_comp = k_comp.at[u1:u1 + 3, v1:v1 + 3].add(
                jnp.einsum("im,uvmo->uvio", wa[u1, v1], wb))
    b_comp = jnp.einsum("uvmo,m->o", wb, ba) if ba is not None else None
    if bb is not None:
        b_comp = bb if b_comp is None else b_comp + bb

    h, w = x.shape[1:3]
    if (x.dtype == jnp.bfloat16 and jax.default_backend() == "tpu"
            and not compute.differentiable):
        # Direct Pallas tap conv with W in lanes: 75 scalar-x-vector FMAs,
        # no s2d phases and no 16-phase de-interleave (the de-interleave
        # lane shuffle alone measured 0.50 ms/call at 1024^2 batch 2,
        # job_103). bf16/TPU path only (and forward-only: no VJP — the
        # differentiable flag demotes to the s2d route for training): the
        # f32 oracle-parity path keeps the s2d-matmul rounding it was
        # pinned with.
        from ..ops.pallas.tap_conv import tap_conv_same
        out = tap_conv_same(x, k_comp, b_comp)
    elif ci <= 8 and kh == kw == 3 and h % 4 == 0 and w % 4 == 0:
        # Bulk 5x5 on the 4x space-to-depth form: the conv unit runs
        # 3->1-channel convs at ~0.3 TF/s and demands a pathological
        # T(2,128) layout (measured 1.37 ms + a 0.76 ms input copy at
        # 1024^2 batch 2); the s2d route (strided row slices -> one
        # [*, 9*16c] x [9*16c, 16co] matmul over 16 output phases)
        # measured 0.77 ms and takes the image as produced.
        out = _composed_bulk_s2d(k_comp, b_comp, x)[..., 0]
    else:
        comp = {"kernel": k_comp}
        if b_comp is not None:
            comp["bias"] = b_comp
        out = L.conv2d(comp, x, padding=2)[..., 0]

    def pair(strip):
        return L.conv2d(pb, L.conv2d(pa, strip, padding=1),
                        padding=1)[..., 0]

    h, w = x.shape[1:3]
    top = pair(x[:, 0:3])[:, 0:1]
    bot = pair(x[:, h - 3:])[:, 2:3]
    left = pair(x[:, :, 0:3])[:, :, 0:1]
    right = pair(x[:, :, w - 3:])[:, :, 2:3]
    out = jnp.concatenate([top, out[:, 1:h - 1], bot], axis=1)
    return jnp.concatenate(
        [left, out[:, :, 1:w - 1], right], axis=2)


def input_pyramid(params, cfg: BiRefNetConfig, x: jax.Array,
                  compute: ComputeConfig):
    """The decoder's input-image pyramid: ipt_blk5..2 on image2patches
    (reference: src/birefnet.rs:304-320) plus the folded full-resolution
    ipt1-head logit (see decoder_forward's head notes).

    Split out because it depends ONLY on the input image: the staged
    pipeline computes it inside the `pre` unit, where the space-to-depth
    slices fuse with preprocessing — computed in the merge unit instead,
    the unit boundary costs a measured ~0.75 ms input-relayout copy
    (ROADMAP round 3)."""
    b, h, w, _ = x.shape
    ipt = {
        "ipt5": simple_convs_forward(params["ipt_blk5"],
                                     image2patches(x, h // 32, w // 32)),
        "ipt4": simple_convs_forward(params["ipt_blk4"],
                                     image2patches(x, h // 16, w // 16)),
        "ipt3": simple_convs_forward(params["ipt_blk3"],
                                     image2patches(x, h // 8, w // 8)),
        "ipt2": simple_convs_forward(params["ipt_blk2"],
                                     image2patches(x, h // 4, w // 4)),
    }
    # ipt1 feeds ONLY the final head; its whole linear chain (conv 3->64,
    # folded conv 64->1) is composed into one 5x5 conv, so nothing
    # 64-channel ever runs at full resolution (fold derivation at the
    # decoder_forward head).
    ipt1p = params["ipt_blk1"]
    k_head = params["conv_out1"]["kernel"][0, 0]  # [240, 1]
    dec_out1_c = params["decoder_block1"]["conv_out"]["kernel"].shape[-1]
    k_ipt1 = k_head[dec_out1_c:, :]               # [48, 1]
    w_i1 = jnp.einsum("hwcd,do->hwco", ipt1p["conv_out"]["kernel"], k_ipt1)
    b_i1 = (ipt1p["conv_out"]["bias"] @ k_ipt1)[..., 0]
    ipt["logit_ipt1"] = _composed_pair_conv(
        ipt1p["conv1"], {"kernel": w_i1, "bias": b_i1[None]}, x, compute)
    return ipt


def decoder_forward(
    params,
    cfg: BiRefNetConfig,
    x: jax.Array,
    x1: jax.Array,
    x2: jax.Array,
    x3: jax.Array,
    x4: jax.Array,
    compute: ComputeConfig,
    pyramid=None,
) -> jax.Array:
    """Full decoder (reference: src/birefnet.rs:278-376).

    Args are NHWC: x the input image, x1..x3 the (doubled) backbone features
    — each either a tensor or a parts list standing for its channel concat
    (never materialized; laterals consume the parts via conv2d_concat) —
    and x4 the squeezed deep feature. `pyramid` optionally supplies the
    precomputed `input_pyramid` (staged path); `x` may then be None.
    Returns [B, H, W] logits (channel-less; see the head note below —
    the reference's [B, 1, H, W] surface lives in models/birefnet.py).
    """
    if pyramid is None:
        pyramid = input_pyramid(params, cfg, x, compute)
    h, w = pyramid["logit_ipt1"].shape[1:3]
    first = lambda t: t[0] if isinstance(t, (list, tuple)) else t
    h1, w1 = first(x1).shape[1:3]
    h2, w2 = first(x2).shape[1:3]
    h3, w3 = first(x3).shape[1:3]

    # Input patch pyramid (reference: src/birefnet.rs:304-320).
    ipt5 = pyramid["ipt5"]
    ipt4 = pyramid["ipt4"]
    ipt3 = pyramid["ipt3"]
    ipt2 = pyramid["ipt2"]

    def gdt_gate(p, stage: str) -> jax.Array:
        """p * sigmoid(conv1x1(GdtConvs(p))) (reference: src/birefnet.rs:327-329)."""
        g = gdt_convs_forward(params[f"gdt_convs_{stage}"], p)
        attn = L.sigmoid(L.conv2d(params[f"gdt_convs_attn_{stage}"], g))
        return p * attn

    # Stage 4 (reference: src/birefnet.rs:322-334).
    # Deformable-site numbering (ComputeConfig.deform_site_radii): the
    # squeeze module holds sites 0-3, so decoder_block4..1 hold
    # 4-7 / 8-11 / 12-15 / 16-19 — the forward order that
    # calibrate.probe_offset_maxima records.
    p4 = basic_dec_blk_forward(
        params["decoder_block4"], [x4, ipt5], compute,
        cfg.use_aspp_deformable, deform_site_base=4)
    p4 = gdt_gate(p4, "4")
    p3_in = (resize_bilinear_align_corners(p4, h3, w3)
             + basic_lat_blk_forward(params["lateral_block4"], x3))

    # Stage 3 (reference: src/birefnet.rs:336-349).
    ipt4_up = resize_bilinear_align_corners(ipt4, h3, w3)
    p3 = basic_dec_blk_forward(
        params["decoder_block3"], [p3_in, ipt4_up], compute,
        cfg.use_aspp_deformable, deform_site_base=8)
    p3 = gdt_gate(p3, "3")
    p2_in = (resize_bilinear_align_corners(p3, h2, w2)
             + basic_lat_blk_forward(params["lateral_block3"], x2))

    # Stage 2 (reference: src/birefnet.rs:351-364).
    ipt3_up = resize_bilinear_align_corners(ipt3, h2, w2)
    p2 = basic_dec_blk_forward(
        params["decoder_block2"], [p2_in, ipt3_up], compute,
        cfg.use_aspp_deformable, deform_site_base=12)
    p2 = gdt_gate(p2, "2")
    p1_in = (resize_bilinear_align_corners(p2, h1, w1)
             + basic_lat_blk_forward(params["lateral_block2"], x1))

    # Stage 1 (reference: src/birefnet.rs:366-369); stop before conv_out —
    # it is folded into the head below.
    ipt2_up = resize_bilinear_align_corners(ipt2, h1, w1)
    p1_feat = basic_dec_blk_forward(
        params["decoder_block1"], [p1_in, ipt2_up], compute,
        cfg.use_aspp_deformable, return_pre_out=True, deform_site_base=16)

    # Final head (reference: src/birefnet.rs:371-375):
    # conv_out1 is a 1x1 conv over concat(p1_up, ipt1_up). It is EXACTLY
    # absorbable (1x1 convs have no spatial extent, so unlike 3x3-with-3x3
    # composition there is no border discrepancy):
    #   - p1 branch: head_p1 o bn_out o conv_out3x3 == one 3x3 conv 64->1
    #   - ipt1 branch: head_ipt1 o conv_out3x3 == one 3x3 conv 64->1,
    #     then composed with the 3->64 input conv into one 5x5 (3->1) conv
    #     with an exact border recompute (computed in `input_pyramid` as
    #     pyramid["logit_ipt1"], already at full resolution)
    # and the 1x1 head commutes with the bilinear upsample, so only single
    # channels are convolved/upsampled at high resolution.
    blk1 = params["decoder_block1"]
    k_head = params["conv_out1"]["kernel"][0, 0]  # [240, 1]
    dec_out1_c = blk1["conv_out"]["kernel"].shape[-1]
    k_p1 = k_head[:dec_out1_c, :]                 # [192, 1]

    # p1 branch fold: W[3,3,64,1], b scalar.
    bn = blk1["bn_out"]
    w_p1 = jnp.einsum("hwcd,d,do->hwco", blk1["conv_out"]["kernel"],
                      bn["scale"], k_p1)
    b_p1 = ((bn["scale"] * blk1["conv_out"]["bias"] + bn["shift"])
            @ k_p1)[..., 0]
    logit_p1 = L.conv2d({"kernel": w_p1, "bias": b_p1[None]}, p1_feat,
                        padding=1)

    # The full-resolution tail runs CHANNEL-LESS ([B, H, W]): a [B,H,W,1]
    # tensor fills 1/128 of every lane tile and its W-resize is an N=1
    # matmul; dropping the singleton axis before the upsample makes both
    # resize contractions full-lane (measured: the head reshape alone was
    # 0.30 ms/call at batch 2). Callers needing the reference's [B,H,W,1]
    # logits surface re-add the axis (models/birefnet.py forward_logits).
    logits = (resize_bilinear_align_corners(logit_p1[..., 0], h, w)
              + pyramid["logit_ipt1"])
    if "bias" in params["conv_out1"]:
        logits = logits + params["conv_out1"]["bias"].astype(logits.dtype)
    return logits
