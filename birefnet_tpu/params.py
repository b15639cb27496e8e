"""Checkpoint schema, loader and parameter-tree construction.

The reference loads `ZhengPeng7/BiRefNet` `model.safetensors` through candle's
`VarBuilder` with strict name-keyed lookups — construction doubles as the
checkpoint schema validator (reference: src/birefnet.rs:389-409,
examples/infer_image.rs:30-40). This module replicates that contract:

- `checkpoint_spec(cfg)` enumerates every expected tensor name + shape,
  including the heads the reference loads purely for weight compatibility
  (gdt_convs_pred_*, conv_ms_spvn_*; reference: src/birefnet.rs:229-243).
- `load_checkpoint` maps the flat torch-layout dict into our nested NHWC
  param tree with an explicit key-coverage report (missing keys raise,
  unexpected keys raise unless in the known-ignorable set).
- Conv weights transpose OIHW -> HWIO; linear weights [out,in] -> [in,out];
  eval-mode BatchNorm folds into per-channel scale/shift; the window-attention
  relative-position bias is precomputed to [heads, N, N] exactly as the
  reference does at load time (reference: src/swin.rs:146-152).
- `random_checkpoint` synthesizes a schema-exact random checkpoint for tests.
"""

from __future__ import annotations

import re
from typing import Dict, List, Mapping, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .configs import BiRefNetConfig, SwinConfig
from .ops.window import relative_position_index

BN_EPS = 1e-5

# Keys present in real checkpoints that carry no inference information.
IGNORABLE_PATTERNS = (
    re.compile(r".*num_batches_tracked$"),
    re.compile(r".*relative_position_index$"),
    re.compile(r".*attn_mask$"),
)


# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------

def _conv_entries(name: str, cin: int, cout: int, k: int, bias: bool = True):
    out = [(f"{name}.weight", (cout, cin, k, k))]
    if bias:
        out.append((f"{name}.bias", (cout,)))
    return out


def _linear_entries(name: str, cin: int, cout: int, bias: bool = True):
    out = [(f"{name}.weight", (cout, cin))]
    if bias:
        out.append((f"{name}.bias", (cout,)))
    return out


def _ln_entries(name: str, c: int):
    return [(f"{name}.weight", (c,)), (f"{name}.bias", (c,))]


def _bn_entries(name: str, c: int):
    return [
        (f"{name}.weight", (c,)),
        (f"{name}.bias", (c,)),
        (f"{name}.running_mean", (c,)),
        (f"{name}.running_var", (c,)),
    ]


def _deform_conv_entries(name: str, cin: int, cout: int, k: int):
    """DeformConvASPP weights (reference: src/aspp.rs:38-45)."""
    kk = k * k
    return (
        _conv_entries(f"{name}.offset_conv", cin, 2 * kk, k)
        + _conv_entries(f"{name}.modulator_conv", cin, kk, k)
        + _conv_entries(f"{name}.regular_conv", cin, cout, k, bias=False)
    )


def _aspp_deformable_entries(name: str, cin: int, cout: int):
    """ASPPDeformable weights (reference: src/aspp.rs:236-300)."""
    inter = 256
    out = []
    out += _deform_conv_entries(f"{name}.aspp1.atrous_conv", cin, inter, 1)
    out += _bn_entries(f"{name}.aspp1.bn", inter)
    for i, k in enumerate((1, 3, 7)):
        out += _deform_conv_entries(f"{name}.aspp_deforms.{i}.atrous_conv", cin, inter, k)
        out += _bn_entries(f"{name}.aspp_deforms.{i}.bn", inter)
    out += _conv_entries(f"{name}.global_avg_pool.1", cin, inter, 1, bias=False)
    out += _bn_entries(f"{name}.global_avg_pool.2", inter)
    out += _conv_entries(f"{name}.conv1", inter * 5, cout, 1, bias=False)
    out += _bn_entries(f"{name}.bn1", cout)
    return out


def _basic_dec_blk_entries(name: str, cin: int, cout: int, inter: int = 64):
    """BasicDecBlk weights (reference: src/decoder.rs:86-123)."""
    out = []
    out += _conv_entries(f"{name}.conv_in", cin, inter, 3)
    out += _bn_entries(f"{name}.bn_in", inter)
    out += _aspp_deformable_entries(f"{name}.dec_att", inter, inter)
    out += _conv_entries(f"{name}.conv_out", inter, cout, 3)
    out += _bn_entries(f"{name}.bn_out", cout)
    return out


def _simple_convs_entries(name: str, cin: int, cout: int, inter: int = 64):
    return (_conv_entries(f"{name}.conv1", cin, inter, 3)
            + _conv_entries(f"{name}.conv_out", inter, cout, 3))


def _swin_entries(prefix: str, cfg: SwinConfig):
    out = []
    ed = cfg.embed_dim
    out += _conv_entries(f"{prefix}.patch_embed.proj", cfg.in_channels, ed,
                         cfg.patch_size)
    out += _ln_entries(f"{prefix}.patch_embed.norm", ed)
    ws = cfg.window_size
    table_rows = (2 * ws - 1) * (2 * ws - 1)
    for i, depth in enumerate(cfg.depths):
        dim = ed * (1 << i)
        heads = cfg.num_heads[i]
        for j in range(depth):
            b = f"{prefix}.layers.{i}.blocks.{j}"
            out += _ln_entries(f"{b}.norm1", dim)
            out.append((f"{b}.attn.relative_position_bias_table",
                        (table_rows, heads)))
            out += _linear_entries(f"{b}.attn.qkv", dim, dim * 3)
            out += _linear_entries(f"{b}.attn.proj", dim, dim)
            out += _ln_entries(f"{b}.norm2", dim)
            hidden = int(dim * cfg.mlp_ratio)
            out += _linear_entries(f"{b}.mlp.fc1", dim, hidden)
            out += _linear_entries(f"{b}.mlp.fc2", hidden, dim)
        if i < len(cfg.depths) - 1:
            out += _ln_entries(f"{prefix}.layers.{i}.downsample.norm", 4 * dim)
            out += _linear_entries(f"{prefix}.layers.{i}.downsample.reduction",
                                   4 * dim, 2 * dim, bias=False)
        out += _ln_entries(f"{prefix}.norm{i}", dim)
    return out


def checkpoint_spec(cfg: BiRefNetConfig) -> List[Tuple[str, Tuple[int, ...]]]:
    """Every tensor (name, shape) the ZhengPeng7/BiRefNet checkpoint must
    provide (torch layouts: conv OIHW, linear [out, in])."""
    out = []
    out += _swin_entries("bb", cfg.swin_config())

    # Squeeze module (reference: src/birefnet.rs:75-83,396-399).
    out += _basic_dec_blk_entries(
        "squeeze_module.0", cfg.x4_channels(), cfg.lateral_channels()[3])

    # Decoder (reference: src/birefnet.rs:170-243).
    d = "decoder"
    ipt_in = cfg.ipt_in_channels()
    ipt_out = cfg.ipt_out_channels()
    for idx in range(5):
        out += _simple_convs_entries(f"{d}.ipt_blk{idx + 1}", ipt_in[idx],
                                     ipt_out[idx])
    dec_in = cfg.dec_in_channels()
    dec_out = cfg.dec_out_channels()
    for pos, stage in enumerate((4, 3, 2, 1)):
        out += _basic_dec_blk_entries(f"{d}.decoder_block{stage}",
                                      dec_in[pos], dec_out[pos])
    lat = cfg.lateral_channels()
    for stage, ch in ((4, lat[2]), (3, lat[1]), (2, lat[0])):
        out += _conv_entries(f"{d}.lateral_block{stage}.conv", ch, ch, 1)
    for pos, stage in enumerate((4, 3, 2)):
        ch = dec_out[pos]
        out += _conv_entries(f"{d}.gdt_convs_{stage}.0", ch, 16, 3)
        out += _bn_entries(f"{d}.gdt_convs_{stage}.1", 16)
        out += _conv_entries(f"{d}.gdt_convs_attn_{stage}.0", 16, 1, 1)
        # Loaded for weight compatibility, never called
        # (reference: src/birefnet.rs:229-232,150-155).
        out += _conv_entries(f"{d}.gdt_convs_pred_{stage}.0", 16, 1, 1)
        out += _conv_entries(f"{d}.conv_ms_spvn_{stage}", ch, 1, 1)
    out += _conv_entries(f"{d}.conv_out1.0", cfg.final_channels(), 1, 1)
    return out


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

class _Source:
    """Wraps the flat checkpoint dict; tracks key usage for coverage checks."""

    def __init__(self, tensors: Mapping[str, np.ndarray]):
        self._t = tensors
        self.used: set = set()

    def take(self, name: str) -> np.ndarray:
        if name not in self._t:
            raise KeyError(f"checkpoint missing tensor: {name}")
        self.used.add(name)
        arr = np.asarray(self._t[name])
        return arr.astype(np.float32) if arr.dtype != np.float32 else arr

    def unused(self) -> List[str]:
        extra = [k for k in self._t if k not in self.used]
        return [k for k in extra
                if not any(p.match(k) for p in IGNORABLE_PATTERNS)]


def _conv(src: _Source, name: str, bias: bool = True) -> Dict[str, np.ndarray]:
    w = src.take(f"{name}.weight")  # OIHW
    p = {"kernel": np.transpose(w, (2, 3, 1, 0))}  # -> HWIO
    if bias:
        p["bias"] = src.take(f"{name}.bias")
    return p


def _linear(src: _Source, name: str, bias: bool = True) -> Dict[str, np.ndarray]:
    w = src.take(f"{name}.weight")  # [out, in]
    p = {"kernel": np.transpose(w)}  # -> [in, out]
    if bias:
        p["bias"] = src.take(f"{name}.bias")
    return p


def _ln(src: _Source, name: str) -> Dict[str, np.ndarray]:
    return {"scale": src.take(f"{name}.weight"),
            "bias": src.take(f"{name}.bias")}


def _bn(src: _Source, name: str) -> Dict[str, np.ndarray]:
    gamma = src.take(f"{name}.weight")
    beta = src.take(f"{name}.bias")
    mean = src.take(f"{name}.running_mean")
    var = src.take(f"{name}.running_var")
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": scale, "shift": beta - mean * scale}


def _attn(src: _Source, name: str, window_size: int, num_heads: int):
    table = src.take(f"{name}.relative_position_bias_table")  # [(2w-1)^2, heads]
    idx = relative_position_index(window_size)  # [N, N]
    # Precompute [heads, N, N] bias (reference: src/swin.rs:146-152).
    cached = table[idx.reshape(-1)]  # [N*N, heads]
    n = window_size * window_size
    cached = cached.reshape(n, n, num_heads).transpose(2, 0, 1)
    return {
        "qkv": _linear(src, f"{name}.qkv"),
        "proj": _linear(src, f"{name}.proj"),
        "cached_bias": np.ascontiguousarray(cached),
    }


def _deform_conv(src: _Source, name: str):
    return {
        "offset_conv": _conv(src, f"{name}.offset_conv"),
        "modulator_conv": _conv(src, f"{name}.modulator_conv"),
        "regular_conv": _conv(src, f"{name}.regular_conv", bias=False),
    }


def _aspp_deformable(src: _Source, name: str):
    p = {
        "aspp1": {"atrous_conv": _deform_conv(src, f"{name}.aspp1.atrous_conv"),
                  "bn": _bn(src, f"{name}.aspp1.bn")},
        "global_avg_pool_conv": _conv(src, f"{name}.global_avg_pool.1", bias=False),
        "global_avg_pool_bn": _bn(src, f"{name}.global_avg_pool.2"),
        "conv1": _conv(src, f"{name}.conv1", bias=False),
        "bn1": _bn(src, f"{name}.bn1"),
    }
    for i in range(3):
        p[f"aspp_deforms_{i}"] = {
            "atrous_conv": _deform_conv(src, f"{name}.aspp_deforms.{i}.atrous_conv"),
            "bn": _bn(src, f"{name}.aspp_deforms.{i}.bn"),
        }
    return p


def _basic_dec_blk(src: _Source, name: str):
    return {
        "conv_in": _conv(src, f"{name}.conv_in"),
        "bn_in": _bn(src, f"{name}.bn_in"),
        "dec_att": _aspp_deformable(src, f"{name}.dec_att"),
        "conv_out": _conv(src, f"{name}.conv_out"),
        "bn_out": _bn(src, f"{name}.bn_out"),
    }


def _simple_convs(src: _Source, name: str):
    return {"conv1": _conv(src, f"{name}.conv1"),
            "conv_out": _conv(src, f"{name}.conv_out")}


def _swin(src: _Source, prefix: str, cfg: SwinConfig):
    p: Dict = {
        "patch_embed": {
            "proj": _conv(src, f"{prefix}.patch_embed.proj"),
            "norm": _ln(src, f"{prefix}.patch_embed.norm"),
        }
    }
    for i, depth in enumerate(cfg.depths):
        layer: Dict = {}
        for j in range(depth):
            b = f"{prefix}.layers.{i}.blocks.{j}"
            layer[f"blocks_{j}"] = {
                "norm1": _ln(src, f"{b}.norm1"),
                "attn": _attn(src, f"{b}.attn", cfg.window_size,
                              cfg.num_heads[i]),
                "norm2": _ln(src, f"{b}.norm2"),
                "mlp": {"fc1": _linear(src, f"{b}.mlp.fc1"),
                        "fc2": _linear(src, f"{b}.mlp.fc2")},
            }
        if i < len(cfg.depths) - 1:
            layer["downsample"] = {
                "norm": _ln(src, f"{prefix}.layers.{i}.downsample.norm"),
                "reduction": _linear(
                    src, f"{prefix}.layers.{i}.downsample.reduction", bias=False),
            }
        p[f"layers_{i}"] = layer
        p[f"norm_{i}"] = _ln(src, f"{prefix}.norm{i}")
    return p


def build_param_tree(
    tensors: Mapping[str, np.ndarray],
    cfg: BiRefNetConfig,
    strict: bool = True,
) -> Dict:
    """Flat torch-layout checkpoint dict -> nested NHWC param tree (numpy)."""
    src = _Source(tensors)
    swin_cfg = cfg.swin_config()

    params: Dict = {"bb": _swin(src, "bb", swin_cfg)}
    params["squeeze_module"] = {"blocks_0": _basic_dec_blk(src, "squeeze_module.0")}

    d = "decoder"
    dec: Dict = {}
    for idx in range(5):
        dec[f"ipt_blk{idx + 1}"] = _simple_convs(src, f"{d}.ipt_blk{idx + 1}")
    for stage in (4, 3, 2, 1):
        dec[f"decoder_block{stage}"] = _basic_dec_blk(src, f"{d}.decoder_block{stage}")
    for stage in (4, 3, 2):
        dec[f"lateral_block{stage}"] = {
            "conv": _conv(src, f"{d}.lateral_block{stage}.conv")}
        dec[f"gdt_convs_{stage}"] = {
            "conv": _conv(src, f"{d}.gdt_convs_{stage}.0"),
            "bn": _bn(src, f"{d}.gdt_convs_{stage}.1"),
        }
        dec[f"gdt_convs_attn_{stage}"] = _conv(src, f"{d}.gdt_convs_attn_{stage}.0")
        # Weight-compatibility-only heads; never used in the forward
        # (reference: src/birefnet.rs:150-166).
        dec[f"gdt_convs_pred_{stage}"] = _conv(src, f"{d}.gdt_convs_pred_{stage}.0")
        dec[f"conv_ms_spvn_{stage}"] = _conv(src, f"{d}.conv_ms_spvn_{stage}")
    dec["conv_out1"] = _conv(src, f"{d}.conv_out1.0")
    params["decoder"] = dec

    if strict:
        extra = src.unused()
        if extra:
            raise ValueError(
                f"checkpoint has {len(extra)} unexpected tensors, e.g. "
                f"{extra[:10]}")
    return params


def load_checkpoint(
    path: str,
    cfg: BiRefNetConfig | None = None,
    strict: bool = True,
) -> Dict:
    """Load a safetensors checkpoint into a jnp param tree."""
    from safetensors import safe_open

    cfg = cfg or BiRefNetConfig.swin_l()
    tensors: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    tree = build_param_tree(tensors, cfg, strict=strict)
    # One batched transfer (hundreds of individual device_puts are slow and
    # fragile through a remote-device tunnel).
    return jax.device_put(tree)


# ---------------------------------------------------------------------------
# Synthetic checkpoints (tests / benchmarks without network access)
# ---------------------------------------------------------------------------

def random_checkpoint(
    cfg: BiRefNetConfig, seed: int = 0, scale: float = 0.05
) -> Dict[str, np.ndarray]:
    """Random flat checkpoint with exactly the schema the loader expects.

    All tensors are nonzero-random so parity tests exercise every code path;
    running_var is kept positive.
    """
    rng = np.random.default_rng(seed)
    out: Dict[str, np.ndarray] = {}
    for name, shape in checkpoint_spec(cfg):
        if name.endswith("running_var"):
            arr = rng.uniform(0.5, 1.5, size=shape)
        elif name.endswith((".weight", "bias_table")) and len(shape) > 1:
            arr = rng.normal(0.0, scale, size=shape)
        else:
            arr = rng.normal(0.0, scale, size=shape)
        out[name] = arr.astype(np.float32)
    return out


def init_params(cfg: BiRefNetConfig, seed: int = 0) -> Dict:
    """Random jnp param tree (for tests and benchmarks)."""
    tree = build_param_tree(random_checkpoint(cfg, seed), cfg)
    return jax.device_put(tree)


def cast_matmul_weights(params, dtype):
    """Pre-cast every matmul/conv "kernel" leaf to the compute dtype.

    The model code casts kernels to the activation dtype at every use
    (`kernel.astype(x.dtype)`); with f32-stored params under bf16 compute
    that conversion re-runs per call — measured ~1.6 ms/call per staged
    unit at batch 2 (the whole ~200M-param tree converts each time).
    Casting once here turns those converts into no-ops. Biases and
    norm/BN parameters stay f32 (they are consumed at f32 by design).
    """
    import jax
    import jax.numpy as jnp

    if dtype == jnp.float32:
        return params

    def walk(tree):
        if isinstance(tree, dict):
            return {k: (v.astype(dtype)
                        if k == "kernel" and hasattr(v, "astype") else
                        walk(v))
                    for k, v in tree.items()}
        return tree

    return walk(params)


# Channel threshold for the selective int8 MLP path
# (ComputeConfig.int8_mlp): the W8A8 kernel wins only where C is wide
# enough for the halved MXU passes to beat the per-token quantize VPU
# cost — measured 1.12x/1.40x at Swin-L stages 2/3 (C=768/1536) but
# 0.78x/0.85x at stages 0/1 (ROADMAP round 3d / round 5).
INT8_MLP_MIN_CHANNELS = 768


def quantize_mlp_int8(params, min_channels: int = INT8_MLP_MIN_CHANNELS):
    """Add per-output-channel int8 weights to the wide Swin MLP blocks.

    For every backbone block's mlp whose input width C >= min_channels,
    fc1/fc2 gain `kernel_q8` (int8, symmetric round-to-nearest) and
    `scale_q8` (f32 [out], dequant = q * scale) — computed ONCE here from
    the f32 master kernels so the per-call graph never re-quantizes
    weights (only activations, inside the kernel). The original `kernel`
    leaves stay (the unfused / non-int8 paths still read them);
    ops/pallas/fused_mlp.py dispatches on the presence of `kernel_q8`.
    """

    def quant_cols(w):
        w = jnp.asarray(w, jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-30) / 127.0
        q = jnp.clip(jnp.round(w / scale), -127.0, 127.0).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if (k == "mlp" and isinstance(v, dict)
                    and "fc1" in v and "fc2" in v
                    and v["fc1"]["kernel"].shape[0] >= min_channels):
                new = {}
                for fc in ("fc1", "fc2"):
                    q, s = quant_cols(v[fc]["kernel"])
                    new[fc] = dict(v[fc], kernel_q8=q, scale_q8=s)
                out[k] = new
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def quantize_attn_int8(params, min_channels: int = INT8_MLP_MIN_CHANNELS):
    """Add per-output-channel int8 weights to the wide Swin attention
    projections (ComputeConfig.int8_attn).

    Same scheme and selectivity as quantize_mlp_int8, applied to each
    wide-stage block's attn qkv/proj kernels — the other 1/3 of the block
    matmul MACs (4C^2/token vs the MLP's 8C^2; the window-attention core
    itself is ~2*ws^2*C/token and stays bf16, as do the f32 softmax
    statistics). ops/pallas/fused_block_attn.py dispatches on the
    presence of `kernel_q8`.
    """

    def quant_cols(w):
        w = jnp.asarray(w, jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-30) / 127.0
        q = jnp.clip(jnp.round(w / scale), -127.0, 127.0).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if (k == "attn" and isinstance(v, dict)
                    and "qkv" in v and "proj" in v
                    and v["qkv"]["kernel"].shape[0] >= min_channels):
                new = {}
                for p in ("qkv", "proj"):
                    q, s = quant_cols(v[p]["kernel"])
                    new[p] = dict(v[p], kernel_q8=q, scale_q8=s)
                out[k] = dict(v, **new)
            else:
                out[k] = walk(v)
        return out

    return walk(params)


# ---------------------------------------------------------------------------
# Checkpoint EXPORT: nested NHWC param tree -> flat torch-layout schema
# ---------------------------------------------------------------------------
# Exact inverse of build_param_tree, making TRAINED parameters (train.py)
# consumable by the upstream torch BiRefNet and by the reference
# (candle-birefnet loads the same ZhengPeng7 schema,
# reference: src/birefnet.rs:471-477). Every load-time transform is
# inverted bit-exactly:
#   conv/linear: layout transposes;
#   BN fold:     emitted as gamma=scale, beta=shift, mean=0,
#                var=1-BN_EPS — chosen so the loader's gamma/sqrt(var+eps)
#                is EXACTLY 1.0 in f32 (asserted below), i.e. the fold
#                round-trips to the bit. A torch eval-mode BN with these
#                stats computes the identical affine.
#   cached_bias: scattered back into the (2w-1)^2-row bias table (the
#                relative-position index covers every row — asserted).


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _inv_conv(tree, name: str, out: Dict[str, np.ndarray], bias: bool = True):
    out[f"{name}.weight"] = np.transpose(_f32(tree["kernel"]), (3, 2, 0, 1))
    if bias:
        out[f"{name}.bias"] = _f32(tree["bias"])


def _inv_linear(tree, name: str, out, bias: bool = True):
    out[f"{name}.weight"] = np.transpose(_f32(tree["kernel"]))
    if bias:
        out[f"{name}.bias"] = _f32(tree["bias"])


def _inv_ln(tree, name: str, out):
    out[f"{name}.weight"] = _f32(tree["scale"])
    out[f"{name}.bias"] = _f32(tree["bias"])


def _inv_bn(tree, name: str, out):
    scale, shift = _f32(tree["scale"]), _f32(tree["shift"])
    var = np.full_like(scale, np.float32(1.0) - np.float32(BN_EPS))
    assert float(np.sqrt(var.flat[0] + np.float32(BN_EPS))) == 1.0
    out[f"{name}.weight"] = scale
    out[f"{name}.bias"] = shift
    out[f"{name}.running_mean"] = np.zeros_like(scale)
    out[f"{name}.running_var"] = var


def _inv_attn(tree, name: str, window_size: int, num_heads: int, out):
    _inv_linear(tree["qkv"], f"{name}.qkv", out)
    _inv_linear(tree["proj"], f"{name}.proj", out)
    cached = _f32(tree["cached_bias"])  # [heads, N, N]
    n = window_size * window_size
    idx = np.asarray(relative_position_index(window_size)).reshape(-1)
    table = np.zeros(((2 * window_size - 1) ** 2, num_heads), np.float32)
    # Scatter (consistent writes: every (i,j) pair with the same relative
    # displacement carries the same bias value by construction).
    table[idx] = cached.transpose(1, 2, 0).reshape(n * n, num_heads)
    assert len(np.unique(idx)) == table.shape[0], "bias table not covered"
    out[f"{name}.relative_position_bias_table"] = table


def _inv_deform_conv(tree, name: str, out):
    _inv_conv(tree["offset_conv"], f"{name}.offset_conv", out)
    _inv_conv(tree["modulator_conv"], f"{name}.modulator_conv", out)
    _inv_conv(tree["regular_conv"], f"{name}.regular_conv", out, bias=False)


def _inv_aspp_deformable(tree, name: str, out):
    _inv_deform_conv(tree["aspp1"]["atrous_conv"], f"{name}.aspp1.atrous_conv", out)
    _inv_bn(tree["aspp1"]["bn"], f"{name}.aspp1.bn", out)
    for i in range(3):
        sub = tree[f"aspp_deforms_{i}"]
        _inv_deform_conv(sub["atrous_conv"],
                         f"{name}.aspp_deforms.{i}.atrous_conv", out)
        _inv_bn(sub["bn"], f"{name}.aspp_deforms.{i}.bn", out)
    _inv_conv(tree["global_avg_pool_conv"], f"{name}.global_avg_pool.1",
              out, bias=False)
    _inv_bn(tree["global_avg_pool_bn"], f"{name}.global_avg_pool.2", out)
    _inv_conv(tree["conv1"], f"{name}.conv1", out, bias=False)
    _inv_bn(tree["bn1"], f"{name}.bn1", out)


def _inv_basic_dec_blk(tree, name: str, out):
    _inv_conv(tree["conv_in"], f"{name}.conv_in", out)
    _inv_bn(tree["bn_in"], f"{name}.bn_in", out)
    _inv_aspp_deformable(tree["dec_att"], f"{name}.dec_att", out)
    _inv_conv(tree["conv_out"], f"{name}.conv_out", out)
    _inv_bn(tree["bn_out"], f"{name}.bn_out", out)


def _inv_simple_convs(tree, name: str, out):
    _inv_conv(tree["conv1"], f"{name}.conv1", out)
    _inv_conv(tree["conv_out"], f"{name}.conv_out", out)


def _inv_swin(tree, prefix: str, cfg: SwinConfig, out):
    _inv_conv(tree["patch_embed"]["proj"], f"{prefix}.patch_embed.proj", out)
    _inv_ln(tree["patch_embed"]["norm"], f"{prefix}.patch_embed.norm", out)
    for i, depth in enumerate(cfg.depths):
        layer = tree[f"layers_{i}"]
        for j in range(depth):
            blk = layer[f"blocks_{j}"]
            b = f"{prefix}.layers.{i}.blocks.{j}"
            _inv_ln(blk["norm1"], f"{b}.norm1", out)
            _inv_attn(blk["attn"], f"{b}.attn", cfg.window_size,
                      cfg.num_heads[i], out)
            _inv_ln(blk["norm2"], f"{b}.norm2", out)
            _inv_linear(blk["mlp"]["fc1"], f"{b}.mlp.fc1", out)
            _inv_linear(blk["mlp"]["fc2"], f"{b}.mlp.fc2", out)
        if i < len(cfg.depths) - 1:
            _inv_ln(layer["downsample"]["norm"],
                    f"{prefix}.layers.{i}.downsample.norm", out)
            _inv_linear(layer["downsample"]["reduction"],
                        f"{prefix}.layers.{i}.downsample.reduction",
                        out, bias=False)
        _inv_ln(tree[f"norm_{i}"], f"{prefix}.norm{i}", out)


def export_checkpoint(params, cfg: BiRefNetConfig) -> Dict[str, np.ndarray]:
    """Nested param tree -> flat torch-schema tensors (f32).

    The result matches checkpoint_spec(cfg) name-for-name and
    shape-for-shape (validated strictly here), and
    build_param_tree(export_checkpoint(p)) == p bit-exactly — the
    round-trip the tests pin.
    """
    out: Dict[str, np.ndarray] = {}
    _inv_swin(params["bb"], "bb", cfg.swin_config(), out)
    _inv_basic_dec_blk(params["squeeze_module"]["blocks_0"],
                       "squeeze_module.0", out)
    d, dec = "decoder", params["decoder"]
    for idx in range(5):
        _inv_simple_convs(dec[f"ipt_blk{idx + 1}"], f"{d}.ipt_blk{idx + 1}", out)
    for stage in (4, 3, 2, 1):
        _inv_basic_dec_blk(dec[f"decoder_block{stage}"],
                           f"{d}.decoder_block{stage}", out)
    for stage in (4, 3, 2):
        _inv_conv(dec[f"lateral_block{stage}"]["conv"],
                  f"{d}.lateral_block{stage}.conv", out)
        _inv_conv(dec[f"gdt_convs_{stage}"]["conv"],
                  f"{d}.gdt_convs_{stage}.0", out)
        _inv_bn(dec[f"gdt_convs_{stage}"]["bn"], f"{d}.gdt_convs_{stage}.1", out)
        _inv_conv(dec[f"gdt_convs_attn_{stage}"], f"{d}.gdt_convs_attn_{stage}.0", out)
        _inv_conv(dec[f"gdt_convs_pred_{stage}"], f"{d}.gdt_convs_pred_{stage}.0", out)
        _inv_conv(dec[f"conv_ms_spvn_{stage}"], f"{d}.conv_ms_spvn_{stage}", out)
    _inv_conv(dec["conv_out1"], f"{d}.conv_out1.0", out)

    spec = dict(checkpoint_spec(cfg))
    missing = sorted(set(spec) - set(out))
    extra = sorted(set(out) - set(spec))
    if missing or extra:
        raise ValueError(
            f"export schema mismatch: missing {missing[:5]} extra {extra[:5]}")
    for k, v in out.items():
        if tuple(v.shape) != tuple(spec[k]):
            raise ValueError(f"{k}: exported {v.shape} != spec {spec[k]}")
    # Force C-contiguity: the transposes above produce views, and
    # safetensors' writer serializes wrong bytes for non-contiguous
    # arrays backed by jnp buffers (measured: file != passed dict for
    # every linear kernel when exporting a device_put tree; the
    # in-memory dict was exact). ascontiguousarray is a no-op copy-wise
    # for already-C arrays.
    return {k: np.ascontiguousarray(v) for k, v in out.items()}


def save_checkpoint(path: str, params, cfg: BiRefNetConfig | None = None) -> None:
    """Write params as a ZhengPeng7-schema safetensors file — loadable by
    load_checkpoint, by upstream torch BiRefNet (eval mode), and by the
    reference implementation."""
    from safetensors.numpy import save_file

    cfg = cfg or BiRefNetConfig.swin_l()
    save_file(export_checkpoint(params, cfg), path)
