"""Deformable ASPP modules (TPU-native, functional, NHWC).

Behavioral counterpart of reference src/aspp.rs: DeformConvASPP (modulated
deformable conv v2), ASPPModuleDeformable (deform -> BN -> ReLU) and
ASPPDeformable (5-branch pyramid: 1x1 deform + k in {1,3,7} deforms +
global-average-pool branch, fused by a 1x1 conv).

The classic dilated ASPP (reference: src/aspp.rs:336-447, dead code kept "for
reference") is provided too for component parity — see `aspp_forward`.

Unlike the reference's CPU fallback (which ignores offsets entirely,
reference: src/aspp.rs:183-185), every path here performs true deformable
sampling (XLA gather formulation or the Pallas kernel).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from ..configs import ComputeConfig
from ..ops import layers as L
from ..ops.deform_conv import deform_conv2d
from ..ops.resize import resize_nearest

# When not None, every deformable site appends its max|offset| (a traced
# f32 scalar) during tracing — the hook behind the runtime offset-radius
# probe (calibrate.py). The reference has no analog: its Metal path never
# inspects the offsets it samples with (reference: src/aspp.rs:169-186).
_OFFSET_STATS: list | None = None


@contextlib.contextmanager
def collect_offset_stats():
    """Collect per-site max|offset| during a forward trace.

    Yields the list that the 20 deformable sites (squeeze + 4 decoder
    blocks x 4 branches; reference: src/birefnet.rs call graph) append
    their traced max|offset| scalars to, in forward order."""
    global _OFFSET_STATS
    prev = _OFFSET_STATS
    _OFFSET_STATS = stats = []
    try:
        yield stats
    finally:
        _OFFSET_STATS = prev

# ASPP internal width (reference: src/aspp.rs:243).
ASPP_INTER_CHANNELS = 256
# Parallel deformable branch kernel sizes (reference: src/aspp.rs:244).
ASPP_DEFORM_KERNELS = (1, 3, 7)


def deform_conv_aspp_forward(
    params,
    x: jax.Array,
    kernel_size: int,
    padding: int,
    compute: ComputeConfig,
    stride: int = 1,
    site: int | None = None,
) -> jax.Array:
    """Modulated deformable conv (reference: src/aspp.rs:169-186).

    offset_conv / modulator_conv are regular convs; the modulator is
    2*sigmoid(x) (reference: src/aspp.rs:173-174); regular_conv supplies the
    (bias-free) sampling weights (reference: src/aspp.rs:44-45).

    `site`: this call's index in the model's forward-order deformable-site
    numbering (configs.ComputeConfig.deform_site_radii). With per-site
    radii configured, a site dispatches the local kernel at its OWN
    calibrated radius, and a site whose probed offsets exceeded the cap
    (radius entry None) falls back to exact sampling alone — trace-time
    dispatch, no runtime branching.
    """
    mode = compute.deform_mode
    radius = compute.deform_local_radius
    if (mode == "deformable-local" and compute.deform_site_radii is not None
            and site is not None):
        site_radius = compute.deform_site_radii[site]
        if site_radius is None:
            mode = "deformable"  # per-site exact fallback, this site only
        else:
            radius = site_radius
    if mode == "regular":
        # candle-CPU-compat: the reference computes offsets/modulator then
        # discards them on CPU (reference: src/aspp.rs:183-185); skipping
        # them entirely is numerically identical.
        return L.conv2d(params["regular_conv"], x, stride=stride,
                        padding=padding)
    offset = L.conv2d(params["offset_conv"], x, stride=stride, padding=padding)
    if _OFFSET_STATS is not None:
        _OFFSET_STATS.append(jnp.max(jnp.abs(offset.astype(jnp.float32))))
    mod_raw = L.conv2d(params["modulator_conv"], x, stride=stride, padding=padding)
    mask = 2.0 * jax.nn.sigmoid(mod_raw.astype(jnp.float32))
    mask = mask.astype(x.dtype)

    weight = params["regular_conv"]["kernel"].astype(x.dtype)
    bias = params["regular_conv"].get("bias")
    if mode == "deformable-local" and stride == 1:
        from ..ops.deform_conv import deform_conv2d_local
        # Measured (round 2, v5e): k=7's big halo'd windows favor small
        # tiles (8), k<=3 favors 16 — 8.1x over the exact gather path at
        # the 256^2 k7 site.
        return deform_conv2d_local(
            x, offset, mask, weight, bias=bias, padding=padding,
            radius=radius,
            tile=8 if kernel_size >= 7 else 16)
    # N1 resolution (round 3): the XLA formulations ARE the designated
    # deformable kernels. A chunked-tap Pallas kernel (sel built in VMEM,
    # taps in 2D [cs*p, S] chunks) was built and measured 0.38-0.82x the
    # XLA sampler at every site — the VPU selector-build floor exceeds the
    # HBM traffic it saves; see ROADMAP.md "N1 retirement" for the numbers.
    # `compute.use_pallas_deform` is accepted-but-ignored for CLI/API
    # stability.
    return deform_conv2d(
        x, offset, mask, weight, bias=bias, stride=stride, padding=padding)


def aspp_module_deformable_forward(
    params, x: jax.Array, kernel_size: int, padding: int,
    compute: ComputeConfig,
    site: int | None = None,
) -> jax.Array:
    """DeformConv -> BN(eval) -> ReLU (reference: src/aspp.rs:217-223)."""
    x = deform_conv_aspp_forward(
        params["atrous_conv"], x, kernel_size, padding, compute, site=site)
    x = L.batch_norm_inference(params["bn"], x)
    return L.relu(x)


def aspp_deformable_forward(
    params, x: jax.Array, compute: ComputeConfig,
    site_base: int | None = None,
) -> jax.Array:
    """5-branch deformable ASPP (reference: src/aspp.rs:303-332).

    Branch order for the concat: aspp1, aspp_deforms[0..2], global_avg_pool
    (reference: src/aspp.rs:320-327).

    `site_base`: forward-order index of this ASPP's FIRST deformable site
    (its 4 branches occupy site_base .. site_base+3, in branch order) —
    see ComputeConfig.deform_site_radii.
    """
    b, h, w, c = x.shape
    st = lambda i: None if site_base is None else site_base + i
    x1 = aspp_module_deformable_forward(params["aspp1"], x, 1, 0, compute,
                                        site=st(0))

    branches = [x1]
    for i, k in enumerate(ASPP_DEFORM_KERNELS):
        branches.append(
            aspp_module_deformable_forward(
                params[f"aspp_deforms_{i}"], x, k, k // 2, compute,
                site=st(1 + i)))

    # Global average pool branch (reference: src/aspp.rs:313-318):
    # mean over H,W -> 1x1 conv (no bias) -> BN -> ReLU -> nearest upsample
    # (from 1x1 this is a broadcast).
    x5 = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    x5 = x5.astype(x.dtype)
    x5 = L.conv2d(params["global_avg_pool_conv"], x5)
    x5 = L.batch_norm_inference(params["global_avg_pool_bn"], x5)
    x5 = L.relu(x5)  # [B, 1, 1, 256]; nearest-upsample == broadcast

    # conv1 over the 5-branch concat WITHOUT materializing the [B,H,W,1280]
    # tensor (measured HBM-bound at the 256^2 decoder_block1 site: the
    # concat costs a full write+read pass): split-kernel partial sums
    # stored in the activation dtype (ops.layers.conv2d_concat), with the
    # spatially-constant
    # global-pool branch contributed at 1x1 and broadcast (a 1x1 conv
    # commutes with the nearest upsample from 1x1;
    # reference semantics: src/aspp.rs:313-331).
    kernel = params["conv1"]["kernel"]  # no bias
    c_sp = sum(bi.shape[-1] for bi in branches)
    out = L.conv2d_concat({"kernel": kernel[:, :, :c_sp]}, branches)
    out = out + L.conv2d({"kernel": kernel[:, :, c_sp:]}, x5)
    out = L.batch_norm_inference(params["bn1"], out)
    return L.relu(out)


def deformable_conv2d_forward(
    params,
    x: jax.Array,
    kernel_size: int,
    stride: int = 1,
    padding: int = 0,
    compute: ComputeConfig = ComputeConfig(),
) -> jax.Array:
    """Standalone generic DeformableConv2d layer: offset/modulator convs +
    modulated deformable sampling, with stride support and a bias on the
    regular conv (the reference's exported `DeformableConv2d`,
    reference: src/deform_conv.rs:17-222, src/lib.rs:13 — near-duplicate of
    the ASPP one but model-unused; provided for API parity).

    params: {offset_conv, modulator_conv, regular_conv} conv2d param dicts
    (regular_conv may carry a bias, unlike the ASPP variant).
    """
    return deform_conv_aspp_forward(params, x, kernel_size, padding, compute,
                                    stride=stride)


# ---------------------------------------------------------------------------
# Classic (non-deformable) dilated ASPP — component parity with the
# reference's dead-but-present ASPP / ASPPModule (reference: src/aspp.rs:336-447).
# ---------------------------------------------------------------------------

ASPP_DILATIONS = (1, 6, 12, 18)


def aspp_module_forward(
    params, x: jax.Array, padding: int, dilation: int
) -> jax.Array:
    """Dilated conv -> ReLU (reference: src/aspp.rs:369-373)."""
    return L.relu(L.conv2d(params["atrous_conv"], x, padding=padding,
                           dilation=dilation))


def aspp_forward(params, x: jax.Array) -> jax.Array:
    """Classic ASPP with dilations 1/6/12/18 (reference: src/aspp.rs:429-446)."""
    b, h, w, c = x.shape
    x1 = aspp_module_forward(params["aspp1"], x, 0, ASPP_DILATIONS[0])
    x2 = aspp_module_forward(params["aspp2"], x, ASPP_DILATIONS[1], ASPP_DILATIONS[1])
    x3 = aspp_module_forward(params["aspp3"], x, ASPP_DILATIONS[2], ASPP_DILATIONS[2])
    x4 = aspp_module_forward(params["aspp4"], x, ASPP_DILATIONS[3], ASPP_DILATIONS[3])

    x5 = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
    x5 = L.relu(L.conv2d(params["global_avg_pool_conv"], x5))
    x5 = resize_nearest(x5, h, w)

    out = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
    return L.relu(L.conv2d(params["conv1"], out))
