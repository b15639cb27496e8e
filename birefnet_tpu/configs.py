"""Model configurations for the TPU-native BiRefNet framework.

Mirrors the configuration surface of the reference implementation
(reference: src/swin.rs:14-88, src/birefnet.rs:13-67, src/decoder.rs:11-24)
as frozen dataclasses with the same presets and derived channel math.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Swin Transformer backbone hyperparameters (reference: src/swin.rs:14-88)."""

    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 4
    in_channels: int = 3
    # Present in the reference config but unused at inference
    # (reference: src/swin.rs:22 — drop_path_rate never read in forward).
    drop_path_rate: float = 0.2

    @staticmethod
    def swin_t() -> "SwinConfig":
        """Swin-T preset (reference: src/swin.rs:27-38)."""
        return SwinConfig(
            embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
            window_size=7)

    @staticmethod
    def swin_s() -> "SwinConfig":
        """Swin-S preset (reference: src/swin.rs:41-52)."""
        return SwinConfig(
            embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
            window_size=7)

    @staticmethod
    def swin_b() -> "SwinConfig":
        """Swin-B preset (reference: src/swin.rs:55-66)."""
        return SwinConfig(
            embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
            window_size=12)

    @staticmethod
    def swin_l() -> "SwinConfig":
        """Swin-L preset, used by BiRefNet (reference: src/swin.rs:69-80)."""
        return SwinConfig()

    def stage_channels(self) -> Tuple[int, ...]:
        """Per-stage output channels: embed_dim * 2^i (reference: src/swin.rs:83-88)."""
        return tuple(self.embed_dim * (1 << i) for i in range(len(self.depths)))


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Decoder block configuration (reference: src/decoder.rs:11-24)."""

    use_aspp_deformable: bool = True
    # BiRefNet uses fixed 64 inter channels (reference: src/decoder.rs:21,93-97).
    inter_channels_adaptive: bool = False

    def inter_channels(self, in_channels: int) -> int:
        return in_channels // 4 if self.inter_channels_adaptive else 64


# Backbone name -> SwinConfig preset (reference: src/swin.rs:27-80; the
# name strings follow the reference's "swin_v1_l" convention,
# reference: src/birefnet.rs:39).
_SWIN_BACKBONES = {
    "swin_v1_t": SwinConfig.swin_t,
    "swin_v1_s": SwinConfig.swin_s,
    "swin_v1_b": SwinConfig.swin_b,
    "swin_v1_l": SwinConfig.swin_l,
}


@dataclasses.dataclass(frozen=True)
class BiRefNetConfig:
    """Top-level BiRefNet configuration (reference: src/birefnet.rs:13-67)."""

    size: Tuple[int, int] = (1024, 1024)
    backbone: str = "swin_v1_l"
    backbone_channels: Tuple[int, ...] = (192, 384, 768, 1536)
    mul_scl_ipt: bool = True
    ms_supervision: bool = True
    dec_ipt: bool = True
    use_aspp_deformable: bool = True
    cxt: Tuple[int, ...] = (192, 384, 768)

    @staticmethod
    def swin_l() -> "BiRefNetConfig":
        """Preset matching the pretrained ZhengPeng7/BiRefNet weights
        (reference: src/birefnet.rs:64-66)."""
        return BiRefNetConfig()

    @staticmethod
    def for_backbone(backbone: str) -> "BiRefNetConfig":
        """Full-model config for any Swin preset backbone.

        The reference carries the backbone NAME in its config but always
        instantiates swin_l (reference: src/birefnet.rs:24,391), leaving
        its swin_t/s/b presets (reference: src/swin.rs:27-66) reachable
        only standalone. Here the name is honored: the decoder/squeeze
        channel plan derives from the backbone's stage channels through
        the same formulas the reference uses for swin_l
        (reference: src/birefnet.rs:50-61,176-238), giving the
        upstream-"lite"-style model family as first-class variants.
        cxt follows the swin_l pattern (the first three stage channels —
        reference: src/birefnet.rs:42). The resulting checkpoint schema is
        this framework's generic derivation, self-consistent under
        load/export (tests/test_variants.py); only the swin_l flagship
        schema is pinned to the published ZhengPeng7 checkpoint.
        """
        swin = _SWIN_BACKBONES[backbone]()
        ch = swin.stage_channels()
        return BiRefNetConfig(backbone=backbone, backbone_channels=ch,
                              cxt=ch[:3])

    @staticmethod
    def swin_t() -> "BiRefNetConfig":
        return BiRefNetConfig.for_backbone("swin_v1_t")

    @staticmethod
    def swin_s() -> "BiRefNetConfig":
        return BiRefNetConfig.for_backbone("swin_v1_s")

    @staticmethod
    def swin_b() -> "BiRefNetConfig":
        return BiRefNetConfig.for_backbone("swin_v1_b")

    def swin_config(self) -> SwinConfig:
        """Resolve the backbone preset by name (default swin_v1_l — the
        only backbone the reference ever instantiates,
        reference: src/birefnet.rs:391)."""
        if self.backbone not in _SWIN_BACKBONES:
            raise ValueError(
                f"unknown backbone {self.backbone!r}; "
                f"known: {sorted(_SWIN_BACKBONES)}")
        swin = _SWIN_BACKBONES[self.backbone]()
        if tuple(self.backbone_channels) != swin.stage_channels():
            raise ValueError(
                f"backbone_channels {self.backbone_channels} do not match "
                f"{self.backbone}'s stage channels {swin.stage_channels()}; "
                f"use BiRefNetConfig.for_backbone({self.backbone!r})")
        return swin

    def lateral_channels(self) -> Tuple[int, ...]:
        """Effective channels after mul_scl_ipt doubling
        (reference: src/birefnet.rs:50-53)."""
        mult = 2 if self.mul_scl_ipt else 1
        return tuple(c * mult for c in self.backbone_channels)

    def x4_channels(self) -> int:
        """Squeeze input channels including cxt concat
        (reference: src/birefnet.rs:56-61). Swin-L: 3072 + 2*(192+384+768) = 5760."""
        mult = 2 if self.mul_scl_ipt else 1
        return self.backbone_channels[3] * mult + sum(c * mult for c in self.cxt)

    # ---- Decoder channel plan (reference: src/birefnet.rs:176-238) ----

    def ipt_out_channels(self) -> Tuple[int, ...]:
        """ipt_blk1..5 output channels."""
        return (48, 96, 192, 384, 384)

    def ipt_in_channels(self) -> Tuple[int, ...]:
        """ipt_blk1..5 input channels.

        These are the image2patches channel counts 3*(grid)^2 for grids
        1/4/8/16/32 (plus ipt_blk2 consuming ipt_blk1's 48 channels) — fixed
        by the patching scheme, independent of the config toggles. The
        reference derives them from lateral_channels
        (reference: src/birefnet.rs:182-193), which coincides with these
        values ONLY for the default config; the patch-derived values are the
        runtime-consistent ones for non-default mul_scl_ipt/cxt variants.
        """
        return (3, 48, 192, 768, 3072)

    def dec_out_channels(self) -> Tuple[int, ...]:
        """decoder_block4..1 output channels (reference: src/birefnet.rs:202)."""
        lat = self.lateral_channels()
        return (lat[2], lat[1], lat[0], lat[0] // 2)

    def dec_in_channels(self) -> Tuple[int, ...]:
        """decoder_block4..1 input channels (reference: src/birefnet.rs:204-207)."""
        lat = self.lateral_channels()
        ipt_out = self.ipt_out_channels()
        dec_out = self.dec_out_channels()
        return (
            lat[3] + ipt_out[4],
            dec_out[0] + ipt_out[3],
            dec_out[1] + ipt_out[2],
            dec_out[2] + ipt_out[1],
        )

    def final_channels(self) -> int:
        """conv_out1 input channels = dec_out[3] + ipt_out[0]
        (reference: src/birefnet.rs:237)."""
        return self.dec_out_channels()[3] + self.ipt_out_channels()[0]

    def decoder_config(self) -> DecoderConfig:
        return DecoderConfig(
            use_aspp_deformable=self.use_aspp_deformable,
            inter_channels_adaptive=False,
        )


@dataclasses.dataclass(frozen=True)
class ComputeConfig:
    """Runtime compute policy — the TPU analog of the reference's cargo feature
    flags `metal` / `flash-attn` and the DISABLE_FLASH_ATTN env kill-switch
    (reference: Cargo.toml:23-27, src/swin.rs:228).

    Unlike the reference's CPU path, the fallback (non-Pallas) deformable conv
    here is a *faithful* XLA-gather implementation, never a silent regular conv
    (the reference CPU fallback is wrong-by-design; reference: src/aspp.rs:183-185).
    """

    # Activation compute dtype. Params are kept in float32; matmuls/convs run in
    # `dtype` with float32 accumulation.
    dtype: jnp.dtype = jnp.float32
    # Use the fused Pallas flash window-attention kernel (N2) when available.
    use_flash_attention: bool = False
    # Internal tier knob (set by the geometry guard — applied in
    # swin_forward AND restated per-block in swin_block_forward so direct
    # block calls are covered — not by users): with flash on, use the
    # fully-fused strip-reading block
    # kernel (fused_block_attn — validated at the ws=12 family). When
    # False, flash demotes to the MIDDLE tier: partitioned windows +
    # packed-qkv flash attention core + fused MLP (legality- and
    # accuracy-verified at the ws=7 presets' N=49 geometries on the v5e,
    # worker job_012/013/017, round 4 — 1.2-1.6x the unfused core).
    use_fused_block: bool = True
    # RETIRED (round 3, accepted-but-ignored for CLI/API stability): the
    # XLA formulations (deform_conv2d / deform_conv2d_local) are the
    # designated N1 deformable kernels. A compile-safe chunked-tap Pallas
    # kernel measured 0.38-0.82x the XLA sampler at every model site
    # (ROADMAP.md "N1 retirement").
    use_pallas_deform: bool = False
    # Deformable-conv semantics:
    #   "deformable" — true modulated deformable sampling (the reference's
    #     Metal-path behavior and the upstream PyTorch model;
    #     reference: src/aspp.rs:59-165).
    #   "regular" — offsets/modulator ignored, plain conv. This is EXACTLY
    #     the reference's CPU-path behavior (reference: src/aspp.rs:183-185),
    #     which is also what the driver's mask-MAE metric compares against
    #     (BASELINE.json infer_image config runs the reference "on CPU").
    #     All-MXU; much faster on TPU (XLA gather throughput bounds the
    #     deformable path).
    #   "deformable-local" — true deformable sampling with offsets clamped
    #     to +-deform_local_radius px, computed as tiled one-hot MXU matmuls
    #     instead of gathers (ops/deform_conv.py::deform_conv2d_local).
    #     Exact vs "deformable" whenever |offset| <= radius; runs at MXU
    #     speed instead of the platform's ~0.1G rows/s gather floor.
    deform_mode: str = "deformable"
    # Offset clamp radius (px) for deform_mode="deformable-local".
    deform_local_radius: int = 4
    # Per-site radii for deform_mode="deformable-local": one entry per
    # deformable site of the BiRefNet graph in forward order (squeeze's 4
    # ASPP branches, then decoder_block4..1 x 4 branches each = 20 for the
    # Swin-L graph — the same order as calibrate.probe_offset_maxima).
    # An int entry dispatches deform_conv2d_local at that site's own
    # radius; a None entry keeps EXACT sampling (deform_conv2d) at that
    # site alone — so one large-offset site no longer drags the whole
    # model to a big radius or to the slow exact path. When None (the
    # default) every site uses the global deform_local_radius. Sites
    # reached without a site index (direct unit calls outside the full
    # model graph) also use the global radius.
    deform_site_radii: Optional[Tuple[Optional[int], ...]] = None
    # Selective W8A8 int8 quantization of the fused MLP kernel at the
    # wide-channel stages (C >= params.INT8_MLP_MIN_CHANNELS, i.e. Swin-L
    # stages 2/3 — 18+2 blocks x 2 backbone passes). Round-3d measured the
    # int8 kernel 0.78x/0.85x at stages 0/1 (the per-token quantize passes
    # are VPU work that swamps the MXU saving at small C) but 1.12x/1.40x
    # at stages 2/3, so the quantized path ships ONLY there (round-5
    # verdict item 2). OFF by default: it trades accuracy (int8 grid) for
    # throughput and must stay inside the BASELINE.md mask-MAE < 1e-3 gate
    # (measured — see PARITY.md accuracy table).
    int8_mlp: bool = False
    # Selective W8A8 quantization of the fused block-attention kernel's
    # qkv/proj projections at the same wide stages (the other 1/3 of the
    # block matmul MACs: 4C^2/token vs the MLP's 8C^2). The attention
    # core (QK^T, softmax, PV) and its f32 statistics stay untouched.
    # Same accuracy contract as int8_mlp: ships only inside the
    # BASELINE.md mask-MAE < 1e-3 gate (measured — PARITY.md table).
    int8_attn: bool = False
    # Unroll the 18-block backbone stage instead of lax.scan over block
    # pairs. Measured 1.03-1.17x device time (XLA optimizes across block
    # boundaries) at ~65s extra one-time compile; keep False where compile
    # time matters (CPU tests), True for TPU serving/bench.
    unroll_deep_stage: bool = False
    # Autodiff gate (train.py): when True every forward formulation must be
    # JAX-differentiable, so the one dtype-gated Pallas path (the decoder's
    # bf16 tap-conv head, models/decoder.py::_composed_pair_conv) falls
    # back to its XLA s2d-matmul route — Pallas kernels here are
    # forward-only (no VJP). The flash/int8 Pallas paths are flag-gated
    # already and are rejected by train.validate_train_compute. Inference
    # defaults are unaffected.
    differentiable: bool = False
    # Gradient checkpointing (training only; no effect on forward-only
    # use): rematerialize each Swin block pair in the backward pass
    # instead of saving its activations — jax.checkpoint around the
    # block-pair body (models/swin.py::basic_layer_forward). Peak
    # training activation memory for the backbone drops from
    # O(depth x block activations) to O(1 pair) per stage at the cost of
    # one extra forward recompute — the standard TPU HBM/FLOPs trade.
    remat_blocks: bool = False
    # Partial unroll factor for the lax.scan over block pairs (used only
    # when unroll_deep_stage=False). k>1 compiles the pair body k times and
    # runs depth/2/k loop iterations: most of full unroll's runtime win
    # (loop dispatch overhead + cross-block fusion) at a bounded compile
    # cost. Measured on TPU v5e (see ROADMAP round 3).
    deep_stage_scan_unroll: int = 1

    def __post_init__(self):
        if self.deform_mode not in ("deformable", "regular",
                                    "deformable-local"):
            raise ValueError(f"unknown deform_mode: {self.deform_mode!r}")

    def with_overrides(self, **kw) -> "ComputeConfig":
        return dataclasses.replace(self, **kw)


# ImageNet normalization constants (reference: examples/infer_image.rs:53-54).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
