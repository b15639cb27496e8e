"""Explicit halo exchange for spatially-sharded activations.

For high-resolution variants (BASELINE.json: "2048x2048, activations sharded
across a v5e-8 mesh") NHWC activations are sharded along H over the mesh's
`spatial` axis. Convolutions and shifted windows then need rows from
neighboring shards:

- convs with padding p need a p-row halo from each neighbor;
- the Swin cyclic shift (roll) moves rows across the global H axis, i.e.
  across shards, with wraparound.

The production path lets GSPMD insert these collectives automatically from
sharding annotations (parallel/sharding.py); this module is the explicit
`shard_map` + `ppermute` formulation — point-to-point neighbor transfers that
ride adjacent ICI links — used where manual scheduling beats GSPMD and as the
ground truth for testing the sharded numerics.

The reference has no distributed capability at all (SURVEY.md §2.3); this is
new TPU-native surface, not a port.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import SPATIAL_AXIS


def _ring_perm(n: int, step: int):
    """Permutation sending shard i -> i+step (mod n)."""
    return [(i, (i + step) % n) for i in range(n)]


def _shift_perm(n: int, step: int):
    """Non-cyclic permutation sending shard i -> i+step (dropped at edges)."""
    return [(i, i + step) for i in range(n) if 0 <= i + step < n]


def halo_exchange_h(
    x: jax.Array,
    halo_up: int,
    halo_down: int,
    axis_name: str = SPATIAL_AXIS,
    cyclic: bool = False,
) -> jax.Array:
    """Pad the local H axis with `halo_up` rows from the previous shard and
    `halo_down` rows from the next shard (zeros at the global edges unless
    `cyclic`). Must be called inside shard_map.

    x: local [B, H_loc, W, C] shard. Returns [B, halo_up + H_loc + halo_down,
    W, C].
    """
    n = lax.psum(1, axis_name)
    parts = []
    if halo_up:
        # Shard i receives the bottom rows of shard i-1: send down (i -> i+1).
        top_halo = lax.ppermute(
            x[:, -halo_up:], axis_name,
            perm=_ring_perm(n, 1) if cyclic else _shift_perm(n, 1))
        parts.append(top_halo)
    parts.append(x)
    if halo_down:
        bottom_halo = lax.ppermute(
            x[:, :halo_down], axis_name,
            perm=_ring_perm(n, -1) if cyclic else _shift_perm(n, -1))
        parts.append(bottom_halo)
    return jnp.concatenate(parts, axis=1)


def roll_h_sharded(
    x: jax.Array, shift: int, axis_name: str = SPATIAL_AXIS
) -> jax.Array:
    """Cyclic roll along the *global* H axis of an H-sharded NHWC tensor.

    Equivalent to jnp.roll(x_global, shift, axis=1) — the TPU-native analog of
    the reference's narrow+cat roll_2d (reference: src/swin.rs:412-444) when H
    spans shards. |shift| must be <= the local shard height.
    Must be called inside shard_map.
    """
    if shift == 0:
        return x
    n = lax.psum(1, axis_name)
    h_loc = x.shape[1]
    s = abs(shift)
    assert s <= h_loc, "shift must not exceed the local shard height"
    if shift > 0:
        # Rows move down; each shard receives the last s rows of the previous
        # shard (cyclically).
        recv = lax.ppermute(x[:, -s:], axis_name, perm=_ring_perm(n, 1))
        return jnp.concatenate([recv, x[:, :-s]], axis=1)
    recv = lax.ppermute(x[:, :s], axis_name, perm=_ring_perm(n, -1))
    return jnp.concatenate([x[:, s:], recv], axis=1)


def sharded_conv2d(
    mesh: Mesh,
    params,
    x: jax.Array,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    axis_name: str = SPATIAL_AXIS,
):
    """Conv2d on an H-sharded NHWC tensor via explicit halo exchange.

    Top-level entry (wraps shard_map): x is globally [B, H, W, C] sharded
    P(None, spatial, None, None); params are replicated. Supports stride 1
    (the only stride the BiRefNet graph uses; reference: src/aspp.rs:84).
    """
    assert stride == 1, "sharded conv supports stride 1"
    kh = params["kernel"].shape[0]
    # The halo rows come from `padding`; that only reproduces the unsharded
    # conv when the conv is 'same'-padded (every conv in the BiRefNet graph
    # is). A valid/under-padded conv would silently mis-stitch shard edges.
    if kh > 1:
        assert padding == dilation * (kh // 2), (
            f"sharded_conv2d requires 'same' padding: padding={padding}, "
            f"need dilation*(kh//2)={dilation * (kh // 2)}")
    halo = padding if kh > 1 else 0

    def local_fn(params, x_loc):
        if halo:
            x_loc = halo_exchange_h(x_loc, halo, halo, axis_name)
        # H context comes from the halos; W padding stays symmetric.
        y = lax.conv_general_dilated(
            x_loc, params["kernel"].astype(x_loc.dtype),
            window_strides=(1, 1),
            padding=((0, 0), (padding, padding)) if halo
            else ((padding, padding), (padding, padding)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(x_loc.dtype)

    spec = P(None, axis_name, None, None)
    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), spec), out_specs=spec,
        check_vma=False,
    )(params, x)
