"""Non-circular checkpoint-schema fingerprint.

`params.checkpoint_spec` and the torch oracle (tests/torch_ref) were both
written in this repo, so spec<->oracle agreement cannot catch a bug mirrored
into both. This test rebuilds the expected tensor name/shape table from a
THIRD source: the reference's own weight-loading code — every
`VarBuilder::get`/`vb.pp` call in /root/reference/src declares one tensor of
the ZhengPeng7/BiRefNet checkpoint (candle's loader is strict, so that set
is exactly the schema the real checkpoint satisfies; reference:
src/birefnet.rs:389-409 "Any missing / shape-mismatched tensor fails here").

The table below is hand-transcribed from those constructors (file:line cited
per group) using torch layouts (conv OIHW, linear [out, in]) and does not
import the oracle or reuse params.py helpers.
"""

import birefnet_tpu as bt
from birefnet_tpu import params as P

# Swin-L constants as the reference declares them
# (reference: src/swin.rs:14-88 swin_l preset).
EMBED = 192
DEPTHS = [2, 2, 18, 2]
HEADS = [6, 12, 24, 48]
WINDOW = 12
MLP_RATIO = 4
PATCH = 4
IN_CHANS = 3


def _conv(out, name, o, i, k, bias=True):
    out[f"{name}.weight"] = (o, i, k, k)
    if bias:
        out[f"{name}.bias"] = (o,)


def _linear(out, name, o, i, bias=True):
    out[f"{name}.weight"] = (o, i)
    if bias:
        out[f"{name}.bias"] = (o,)


def _norm(out, name, c):  # LayerNorm: weight + bias
    out[f"{name}.weight"] = (c,)
    out[f"{name}.bias"] = (c,)


def _bn(out, name, c):  # candle batch_norm: weight/bias/running stats
    out[f"{name}.weight"] = (c,)
    out[f"{name}.bias"] = (c,)
    out[f"{name}.running_mean"] = (c,)
    out[f"{name}.running_var"] = (c,)


def _deform_conv_aspp(out, name, cin, cout, k):
    # reference: src/aspp.rs DeformConvASPP::new — offset_conv (2k^2, bias),
    # modulator_conv (k^2, bias), regular_conv (NO bias).
    _conv(out, f"{name}.offset_conv", 2 * k * k, cin, k)
    _conv(out, f"{name}.modulator_conv", k * k, cin, k)
    _conv(out, f"{name}.regular_conv", cout, cin, k, bias=False)


def _aspp_module_deformable(out, name, cin, planes, k):
    # reference: src/aspp.rs:196-214 — atrous_conv + bn.
    _deform_conv_aspp(out, f"{name}.atrous_conv", cin, planes, k)
    _bn(out, f"{name}.bn", planes)


def _aspp_deformable(out, name, cin, cout):
    # reference: src/aspp.rs:236-290 — aspp1 (k=1), aspp_deforms k=1/3/7,
    # global_avg_pool.1 conv NO bias + .2 bn, conv1 (5*256->out, NO bias), bn1.
    inter = 256
    _aspp_module_deformable(out, f"{name}.aspp1", cin, inter, 1)
    for i, k in enumerate((1, 3, 7)):
        _aspp_module_deformable(out, f"{name}.aspp_deforms.{i}", cin, inter, k)
    _conv(out, f"{name}.global_avg_pool.1", inter, cin, 1, bias=False)
    _bn(out, f"{name}.global_avg_pool.2", inter)
    _conv(out, f"{name}.conv1", cout, inter * 5, 1, bias=False)
    _bn(out, f"{name}.bn1", cout)


def _basic_dec_blk(out, name, cin, cout):
    # reference: src/decoder.rs:78-141 — conv_in 3x3 -> bn_in -> dec_att
    # (ASPPDeformable(64)) -> conv_out 3x3 -> bn_out; inter fixed 64.
    inter = 64
    _conv(out, f"{name}.conv_in", inter, cin, 3)
    _bn(out, f"{name}.bn_in", inter)
    _aspp_deformable(out, f"{name}.dec_att", inter, inter)
    _conv(out, f"{name}.conv_out", cout, inter, 3)
    _bn(out, f"{name}.bn_out", cout)


def _simple_convs(out, name, cin, cout, inter=64):
    # reference: src/decoder.rs:28-56 — conv1 3x3 -> conv_out 3x3.
    _conv(out, f"{name}.conv1", inter, cin, 3)
    _conv(out, f"{name}.conv_out", cout, inter, 3)


def expected_schema():
    out = {}

    # --- Swin backbone, prefix "bb" (reference: src/birefnet.rs:393,
    # src/swin.rs:659-764) ---
    bb = "bb"
    _conv(out, f"{bb}.patch_embed.proj", EMBED, IN_CHANS, PATCH)
    _norm(out, f"{bb}.patch_embed.norm", EMBED)
    for i, depth in enumerate(DEPTHS):
        dim = EMBED * (2 ** i)
        for j in range(depth):
            blk = f"{bb}.layers.{i}.blocks.{j}"
            _norm(out, f"{blk}.norm1", dim)
            # reference: src/swin.rs:137-141 — ((2w-1)^2, heads)
            out[f"{blk}.attn.relative_position_bias_table"] = (
                (2 * WINDOW - 1) ** 2, HEADS[i])
            _linear(out, f"{blk}.attn.qkv", 3 * dim, dim)
            _linear(out, f"{blk}.attn.proj", dim, dim)
            _norm(out, f"{blk}.norm2", dim)
            _linear(out, f"{blk}.mlp.fc1", MLP_RATIO * dim, dim)
            _linear(out, f"{blk}.mlp.fc2", dim, MLP_RATIO * dim)
        if i < len(DEPTHS) - 1:
            # reference: src/swin.rs:479-528 — norm(4C), reduction 4C->2C
            # NO bias.
            _norm(out, f"{bb}.layers.{i}.downsample.norm", 4 * dim)
            _linear(out, f"{bb}.layers.{i}.downsample.reduction",
                    2 * dim, 4 * dim, bias=False)
        # reference: src/swin.rs:784-789 — per-stage output LayerNorm.
        _norm(out, f"{bb}.norm{i}", dim)

    # --- channel plan (reference: src/birefnet.rs:176-207) ---
    lat_ch = [384, 768, 1536, 3072]
    ipt_out = [48, 96, 192, 384, 384]
    squeeze_in = lat_ch[3] + 2 * (192 + 384 + 768)  # 5760 (cxt concat)
    dec_out = [lat_ch[2], lat_ch[1], lat_ch[0], lat_ch[0] // 2]
    dec_in = [lat_ch[3] + ipt_out[4], dec_out[0] + ipt_out[3],
              dec_out[1] + ipt_out[2], dec_out[2] + ipt_out[1]]

    # --- squeeze (reference: src/birefnet.rs:75-83,396-399) ---
    _basic_dec_blk(out, "squeeze_module.0", squeeze_in, lat_ch[3])

    # --- decoder (reference: src/birefnet.rs:189-243) ---
    d = "decoder"
    ipt_in = [3, ipt_out[0], lat_ch[0] // 2, lat_ch[2] // 2, lat_ch[3]]
    for idx in range(5):
        _simple_convs(out, f"{d}.ipt_blk{idx + 1}", ipt_in[idx], ipt_out[idx])
    for pos, stage in enumerate((4, 3, 2, 1)):
        _basic_dec_blk(out, f"{d}.decoder_block{stage}",
                       dec_in[pos], dec_out[pos])
    for stage, ch in ((4, lat_ch[2]), (3, lat_ch[1]), (2, lat_ch[0])):
        _conv(out, f"{d}.lateral_block{stage}.conv", ch, ch, 1)
    for pos, stage in enumerate((4, 3, 2)):
        # GdtConvs .0 conv/.1 bn (reference: src/birefnet.rs:97-118);
        # attn/pred heads + ms_spvn (reference: src/birefnet.rs:225-243).
        _conv(out, f"{d}.gdt_convs_{stage}.0", 16, dec_out[pos], 3)
        _bn(out, f"{d}.gdt_convs_{stage}.1", 16)
        _conv(out, f"{d}.gdt_convs_attn_{stage}.0", 1, 16, 1)
        _conv(out, f"{d}.gdt_convs_pred_{stage}.0", 1, 16, 1)
        _conv(out, f"{d}.conv_ms_spvn_{stage}", 1, dec_out[pos], 1)
    # conv_out1.0: (dec_out[3]=192 + ipt_out[0]=48) -> 1
    # (reference: src/birefnet.rs:237-238).
    _conv(out, f"{d}.conv_out1.0", 1, dec_out[3] + ipt_out[0], 1)
    return out


def test_spec_matches_reference_declared_schema():
    exp = expected_schema()
    got = {name: tuple(shape)
           for name, shape in P.checkpoint_spec(bt.BiRefNetConfig.swin_l())}
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    assert not missing, f"spec lacks reference-declared tensors: {missing[:10]}"
    assert not extra, f"spec has tensors the reference never loads: {extra[:10]}"
    bad = {k: (exp[k], got[k]) for k in exp if exp[k] != got[k]}
    assert not bad, f"shape mismatches (expected, got): {dict(list(bad.items())[:10])}"
    # The known count for this checkpoint (VERDICT round 2: 687 tensors).
    assert len(exp) == 687, len(exp)
