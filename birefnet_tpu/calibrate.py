"""Runtime offset-radius calibration (the data-derived route to fast
faithful deformable sampling).

`deformable-local` samples at MXU speed but clamps offsets to +-R, and its
cost scales ~quadratically with R (per-tile source window
S = (t + ext + 2R + 3)^2 — ops/deform_conv.py). The right R is a property
of the trained weights: the upstream BiRefNet's learned offsets are
expected well under the default +-4 px, but with egress blocked this repo
has never been able to inspect the real checkpoint (README). Instead of
guessing, serve.py can PROBE at runtime: one exact-deformable forward on
the first batch records max|offset| at every one of the 20 deformable
sites (squeeze + decoder_block4..1, 4 ASPP branches each — reference:
src/birefnet.rs:393-401,189-243 construction, src/aspp.rs:169-186 offset
computation), and the serving pipeline is then compiled as
deformable-local at radius ceil(max) + safety — exact with respect to the
probed data by construction, at local-kernel speed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .configs import BiRefNetConfig, ComputeConfig

# Forward-order names of the 20 deformable sites (the probe's output
# order and ComputeConfig.deform_site_radii's index space): squeeze's 4
# ASPP branches, then decoder_block4..1 x 4 branches each. Branch order
# within an ASPP: aspp1 (k=1), aspp_deforms k=1, k=3, k=7
# (reference: src/aspp.rs:243-244,303-332 branch construction).
SITE_NAMES = tuple(
    f"{blk}.{br}"
    for blk in ("squeeze", "dec4", "dec3", "dec2", "dec1")
    for br in ("aspp1", "deform_k1", "deform_k3", "deform_k7"))


def probe_offset_maxima(
    params,
    cfg: BiRefNetConfig,
    frames_u8,
    compute: ComputeConfig = ComputeConfig(),
) -> np.ndarray:
    """Per-site max|offset| (px) over one exact-deformable forward.

    Runs the staged unit structure (pre / backbone x2 / merge — the same
    split as staged.py, which is also the only 1024^2-compilable shape in
    this environment) with deform_mode forced to the exact "deformable"
    semantics, collecting the traced max|offset| of each deformable site.

    Returns a [20] float array in forward order (squeeze's 4 branches,
    then decoder_block4..1 x 4 branches each).
    """
    from .models import aspp as baspp
    from .models import birefnet as bmodel
    from .models import decoder as bdec
    from .models import swin as bswin
    from .params import cast_matmul_weights
    from .ops.resize import resize_bilinear_align_corners
    from . import pipeline

    compute = compute.with_overrides(deform_mode="deformable")
    swin_cfg = cfg.swin_config()
    params = cast_matmul_weights(params, compute.dtype)

    @jax.jit
    def pre(params_dec, frames):
        x = pipeline.preprocess(frames, cfg.size, dtype=compute.dtype)
        x_half = None
        if cfg.mul_scl_ipt:
            b, h, w, _ = x.shape
            x_half = resize_bilinear_align_corners(x, h // 2, w // 2)
        pyramid = bdec.input_pyramid(params_dec, cfg, x, compute)
        return x, x_half, pyramid

    @jax.jit
    def backbone(p, x):
        return bswin.swin_forward(p, swin_cfg, x, compute)

    @jax.jit
    def merge_stats(params, pyramid, feats, feats_half):
        # Same concat plan as staged.merge_decode_post (reference:
        # src/birefnet.rs:423-460); logits are discarded — only the
        # offsets' maxima leave the device.
        x1, x2, x3, x4 = feats
        if cfg.mul_scl_ipt:
            ups = [resize_bilinear_align_corners(fh, f.shape[1], f.shape[2])
                   for f, fh in zip(feats, feats_half)]
            x1 = jnp.concatenate([x1, ups[0]], axis=-1)
            x2 = jnp.concatenate([x2, ups[1]], axis=-1)
            x3 = jnp.concatenate([x3, ups[2]], axis=-1)
            x4 = jnp.concatenate([x4, ups[3]], axis=-1)
        if cfg.cxt:
            h4, w4 = x4.shape[1:3]
            x4 = jnp.concatenate(
                [resize_bilinear_align_corners(x1, h4, w4),
                 resize_bilinear_align_corners(x2, h4, w4),
                 resize_bilinear_align_corners(x3, h4, w4),
                 x4], axis=-1)
        with baspp.collect_offset_stats() as stats:
            x4 = bmodel.squeeze_module_forward(params["squeeze_module"], x4,
                                               compute)
            bdec.decoder_forward(params["decoder"], cfg, None, x1, x2, x3,
                                 x4, compute, pyramid=pyramid)
        return jnp.stack(stats)

    x, x_half, pyramid = pre(params["decoder"], frames_u8)
    feats = backbone(params["bb"], x)
    feats_half = backbone(params["bb"], x_half) if cfg.mul_scl_ipt else None
    return np.asarray(merge_stats(params, pyramid, feats, feats_half),
                      np.float32)


def calibrated_radius(
    maxima: np.ndarray, safety: int = 1, cap: int = 8
) -> Optional[int]:
    """Pick the deformable-local radius from probed per-site maxima.

    ceil(max) alone already makes the local kernel exact for the probed
    batch (the clamp never binds); `safety` adds margin for batch-to-batch
    variation. Returns None when even the probed offsets exceed `cap` —
    the caller should keep the exact gather path then (a huge radius makes
    the local kernel slower than exact sampling).
    """
    r = int(np.ceil(float(np.max(maxima)))) + safety
    r = max(r, 1)
    return None if r > cap else r


def calibrated_site_radii(
    maxima: np.ndarray, safety: int = 1, cap: int = 8
) -> Tuple[Optional[int], ...]:
    """Per-site radii from the probed per-site maxima.

    Each site gets its OWN ceil(max)+safety radius — the probe already
    measures all 20 sites individually, and the local kernel's cost grows
    ~quadratically with R (source window S = (t + ext + 2R + 3)^2), so a
    site that probed at 0.4 px should not pay the radius of a site that
    probed at 6. A site whose radius would exceed `cap` gets None: THAT
    site alone falls back to exact sampling (a huge radius makes the
    local kernel slower than the exact gather path there), instead of
    dragging the whole model to the exact path the way a single global
    radius would.
    """
    radii = []
    for m in np.asarray(maxima, np.float32):
        r = max(int(np.ceil(float(m))) + safety, 1)
        radii.append(None if r > cap else r)
    return tuple(radii)


def auto_deform_compute(
    params,
    cfg: BiRefNetConfig,
    frames_u8,
    compute: ComputeConfig,
    safety: int = 1,
    cap: int = 8,
) -> Tuple[ComputeConfig, np.ndarray, Optional[Tuple[Optional[int], ...]]]:
    """deform_mode="auto" resolution: probe, then pick the serving mode.

    Dispatch is PER SITE: each of the 20 deformable sites runs
    deformable-local at its own calibrated radius, and sites whose probed
    offsets exceed `cap` keep exact sampling individually (None entries).
    Only when EVERY site exceeds the cap does the whole model resolve to
    plain "deformable".

    Returns (resolved_compute, per-site maxima [20], per-site radii tuple
    or None when all-exact). The resolved compute's deform_local_radius
    is set to the largest per-site radius (the fallback for any
    deformable call reached outside the numbered model graph).
    """
    maxima = probe_offset_maxima(params, cfg, frames_u8, compute)
    radii = calibrated_site_radii(maxima, safety=safety, cap=cap)
    live = [r for r in radii if r is not None]
    if not live:
        resolved = compute.with_overrides(deform_mode="deformable",
                                          deform_site_radii=None)
        return resolved, maxima, None
    resolved = compute.with_overrides(deform_mode="deformable-local",
                                      deform_site_radii=radii,
                                      deform_local_radius=max(live))
    return resolved, maxima, radii
