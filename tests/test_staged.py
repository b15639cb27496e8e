"""Staged-compilation path must be numerically identical to the fused one."""

import numpy as np

import jax
import jax.numpy as jnp

import birefnet_tpu as bt
from birefnet_tpu import pipeline, staged


def test_staged_matches_fused(rng):
    import dataclasses
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(64, 64))
    params = bt.init_params(cfg, seed=0)
    frames = rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    frames = jnp.asarray(frames)

    fused = pipeline.make_infer_fn(params, cfg)
    stg = staged.make_staged_infer_fn(params, cfg)
    a = np.asarray(fused(frames))
    b = np.asarray(stg(frames))
    assert a.shape == b.shape
    # u8 quantization boundary: allow 1 LSB.
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
