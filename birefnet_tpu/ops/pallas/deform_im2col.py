"""Pallas deformable-sampling kernel slot (component N1, SURVEY.md §2.2).

Status: delegates to the XLA blocked-im2col formulation. Measured findings
on this platform (TPU v5e, this Mosaic toolchain) that drove the decision:

- XLA's gather lowering issues ~0.1G rows/s regardless of row width
  (128B vs 512B rows), batch, or table size — a fixed per-index pipeline.
  True deformable BiRefNet samples ~21M rows/image (60 taps x 4 corners
  across 5 ASPPDeformables), so ~200ms/image is the platform gather floor;
  deform_mode="regular" exists for the candle-CPU-compat fast path.
- Inside Pallas kernels, `jnp.take_along_axis` / advanced indexing do NOT
  lower (verified at several shapes); only scalar fori_loop dynamic slices
  work (~3.2M sequential iterations — non-viable).
- An in-kernel one-hot MXU shuffle (iota==idx matmul) DOES lower and is
  exact, but needs the full [P, HW] selector in VMEM: feasible only for
  HW <= ~4096 (the 32^2/64^2 decoder stages), which carry only ~7% of the
  gathered rows. Fusing it for those stages is not worth the complexity.
- A tiled one-hot with a clamped +-R source halo would cover the 128^2 and
  256^2 stages at MXU speed but changes semantics when |offset| > R; without
  real trained weights to bound offsets it is not parity-safe. It remains
  the design path for a future `deform_mode="deformable-local"`.

The XLA path (ops/deform_conv.py) is already shaped for the hardware: a
scanned blocked-im2col with one fused row-gather and one large-K MXU
contraction per spatial block — the same columns-then-matmul structure as
the reference's Metal kernel (reference: src/aspp.rs:138-165) without
materializing the full buffer.
"""

from __future__ import annotations

import jax

from ..deform_conv import deform_conv2d


def deform_conv2d_pallas(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """Signature-compatible slot for the fused Pallas deformable conv;
    currently delegates to the blocked-im2col XLA formulation (see module
    docstring for why)."""
    return deform_conv2d(x, offset, mask, weight, bias=bias, stride=stride,
                         padding=padding, dilation=dilation)
