"""Pallas deformable-sampling kernel slot (component N1, SURVEY.md §2.2).

Status: the Mosaic toolchain in this environment exposes no vectorized
VMEM gather (verified: `jnp.take_along_axis` / advanced indexing fail to
lower inside TPU kernels; only scalar `fori_loop` dynamic slices work, which
is orders of magnitude too slow for 65k positions x 49 taps x 4 corners).
A Pallas formulation of deformable sampling therefore cannot beat the XLA
formulation here, and this entry point delegates to it.

The XLA path (ops/deform_conv.py) is already shaped for the hardware: a
scanned blocked-im2col with one fused row-gather (XLA's native gather
lowering) and one large-K MXU contraction per spatial block — the same
columns-then-matmul structure as the reference's Metal kernel
(reference: src/aspp.rs:138-165) without materializing the full buffer.

If a dynamic-gather primitive lands in this toolchain, the kernel drops in
here behind the same signature; callers already route through
`ComputeConfig.use_pallas_deform`.
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
