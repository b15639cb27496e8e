"""Window ops for shifted-window attention.

Pure-functional equivalents of the reference's host-side window machinery:
partition/reverse (reference: src/swin.rs:446-475), cyclic roll
(reference: src/swin.rs:412-444), the SW-MSA attention mask
(reference: src/swin.rs:603-655) and the relative-position index
(reference: src/swin.rs:166-210).

TPU-native notes:
- All shapes are static under jit, so the attention mask and relative-position
  index are trace-time-determined — the reference rebuilds the mask on the
  host every forward (reference: src/swin.rs:584). The numpy builders below
  bake the mask as a program literal (kept for tests and small callers); the
  `*_dev` variants build the identical values from iota ON DEVICE, which the
  model uses so the program text stays small (the baked [nW, ws², ws²] f32
  masks were ~64% of the traced MLIR and set this environment's
  remote-compile size wall for the training step — one cheap elementwise
  pass per program replaces them).
- The cyclic shift is `jnp.roll`, which XLA lowers to two slices + concat —
  identical math to the reference's narrow+cat `roll_2d`.

Layout: activations are NHWC ([B, H, W, C]); windows are [B*nW, ws*ws, C] with
the window grid enumerated row-major, exactly matching the reference so weights
and biases line up.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """[B, H, W, C] -> [B*nW, ws*ws, C] (reference: src/swin.rs:446-459).

    H and W must be multiples of window_size (pad first).
    """
    b, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // ws) * (w // ws), ws * ws, c)


def window_reverse(windows: jax.Array, window_size: int, h: int, w: int) -> jax.Array:
    """[B*nW, ws*ws, C] -> [B, H, W, C] (reference: src/swin.rs:461-475)."""
    ws = window_size
    b_nw, _, c = windows.shape
    num_windows = (h // ws) * (w // ws)
    b = b_nw // num_windows
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def roll_2d(x: jax.Array, shift_h: int, shift_w: int) -> jax.Array:
    """Cyclic shift over H and W of an NHWC tensor
    (reference: src/swin.rs:412-444)."""
    return jnp.roll(x, shift=(shift_h, shift_w), axis=(1, 2))


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: int) -> np.ndarray:
    """[ws*ws, ws*ws] int32 index into the (2*ws-1)^2 bias table
    (reference: src/swin.rs:166-210, matches the PyTorch Swin implementation).
    """
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords_flat = coords.reshape(2, -1)  # [2, ws*ws], (h, w) per token
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]  # [2, N, N]
    rel_h = rel[0] + (ws - 1)
    rel_w = rel[1] + (ws - 1)
    return (rel_h * (2 * ws - 1) + rel_w).astype(np.int32)


@functools.lru_cache(maxsize=None)
def sw_msa_mask(hp: int, wp: int, window_size: int, shift_size: int) -> np.ndarray:
    """SW-MSA attention mask [nW, ws*ws, ws*ws] float32 with 0 / -100.0 entries.

    The reference builds this on the host each forward with a 9-region fill and
    uses -100.0 (not -inf) for masked pairs (reference: src/swin.rs:603-655).
    hp/wp are the window-padded spatial dims.
    """
    ws = window_size
    img_mask = np.zeros((hp, wp), dtype=np.float32)
    h_slices = ((0, hp - ws), (hp - ws, hp - shift_size), (hp - shift_size, hp))
    w_slices = ((0, wp - ws), (wp - ws, wp - shift_size), (wp - shift_size, wp))
    cnt = 0
    for h0, h1 in h_slices:
        for w0, w1 in w_slices:
            img_mask[h0:h1, w0:w1] = cnt
            cnt += 1
    # Partition into windows: [nW, ws*ws]
    m = img_mask.reshape(hp // ws, ws, wp // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]  # mask1 - mask2, matching :645-647
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))


@functools.lru_cache(maxsize=None)
def sw_msa_mask_offset(hp: int, wp: int, window_size: int,
                       shift_size: int) -> np.ndarray:
    """SW-MSA mask for the roll-free OFFSET window partition.

    TPU-native roll elimination: instead of cyclically rolling the feature
    map by -shift (two full-map HBM copies per shifted block, the XLA
    lowering of the reference's roll_2d, reference: src/swin.rs:412-444),
    the shifted partition is realized by zero-padding (window_size -
    shift_size) rows/cols at the TOP-LEFT, so window boundaries land at
    original coordinates {shift + j*ws} directly. Because top pad + shift
    = ws, the offset canvas equals the rolled canvas cyclically shifted by
    exactly ONE window: offset window (i, j) holds precisely the tokens of
    cyclic window (i-1, j-1) (mod grid), in the same in-window order, with
    identical zero pads. The mask is therefore the cyclic mask with the
    window grid rolled by one — bit-exact attention results, no data
    movement. Applicable when the window-pad slack >= ws - shift on both
    axes (the caller falls back to the cyclic roll otherwise).
    """
    ws = window_size
    n = ws * ws
    m = sw_msa_mask(hp, wp, ws, shift_size)
    g = m.reshape(hp // ws, wp // ws, n, n)
    g = np.roll(g, (1, 1), axis=(0, 1))
    return np.ascontiguousarray(g.reshape(-1, n, n))


def _sw_msa_region_ids_dev(hp: int, wp: int, window_size: int,
                           shift_size: int) -> jax.Array:
    """[nW, ws*ws] int32 region ids of the 9-region SW-MSA fill, built from
    iota ON DEVICE (traced ops, zero literal payload in the program).

    Row/col region index is 0 / 1 / 2 for the slices
    (0, d-ws) / (d-ws, d-shift) / (d-shift, d) — exactly the reference's
    host fill order (reference: src/swin.rs:603-655), so
    id = 3*row_region + col_region reproduces its cnt values.
    """
    ws = window_size
    row = jnp.arange(hp, dtype=jnp.int32)
    col = jnp.arange(wp, dtype=jnp.int32)
    rr = ((row >= hp - ws).astype(jnp.int32)
          + (row >= hp - shift_size).astype(jnp.int32))
    cc = ((col >= wp - ws).astype(jnp.int32)
          + (col >= wp - shift_size).astype(jnp.int32))
    img = rr[:, None] * 3 + cc[None, :]  # [hp, wp]
    m = img.reshape(hp // ws, ws, wp // ws, ws)
    return m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)


def _region_ids_to_mask(m: jax.Array) -> jax.Array:
    diff = m[:, None, :] - m[:, :, None]  # mask1 - mask2 (src/swin.rs:645-647)
    return jnp.where(diff != 0, jnp.float32(-100.0), jnp.float32(0.0))


def sw_msa_mask_dev(hp: int, wp: int, window_size: int,
                    shift_size: int) -> jax.Array:
    """Traced equivalent of sw_msa_mask (bit-identical values).

    The numpy version bakes an [nW, ws², ws²] f32 literal into the program
    — 40 MB at 1024² stage 0, and the dominant share (~64% measured at
    256²) of the traced-MLIR text that the remote-compile service must
    ingest. Building it from iota keeps the program text small (lifting
    the training-step remote-compile size wall) at a trace-time-constant
    compute cost of one cheap elementwise pass per program.
    """
    return _region_ids_to_mask(
        _sw_msa_region_ids_dev(hp, wp, window_size, shift_size))


def sw_msa_mask_offset_dev(hp: int, wp: int, window_size: int,
                           shift_size: int) -> jax.Array:
    """Traced equivalent of sw_msa_mask_offset (bit-identical values):
    the cyclic mask with the window grid rolled by one (see
    sw_msa_mask_offset for the derivation)."""
    ws = window_size
    m = _sw_msa_region_ids_dev(hp, wp, ws, shift_size)
    g = m.reshape(hp // ws, wp // ws, ws * ws)
    g = jnp.roll(g, (1, 1), axis=(0, 1))
    return _region_ids_to_mask(g.reshape(-1, ws * ws))


def pad_to_multiple(x: jax.Array, multiple: int) -> jax.Array:
    """Zero-pad H and W (bottom/right) of NHWC input up to a multiple
    (reference: src/swin.rs:359-366)."""
    b, h, w, c = x.shape
    pad_b = (multiple - h % multiple) % multiple
    pad_r = (multiple - w % multiple) % multiple
    if pad_b == 0 and pad_r == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
