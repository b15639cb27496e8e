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


def test_staged_warmup_and_donation(rng):
    """warmup_batch pre-compiles every unit (no recompile on first call) and
    buffer donation keeps repeat calls correct."""
    import dataclasses
    import time
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(64, 64))
    params = bt.init_params(cfg, seed=1)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8))

    t0 = time.time()
    stg = staged.make_staged_infer_fn(params, cfg, warmup_batch=1)
    t_build = time.time() - t0
    t0 = time.time()
    a = np.asarray(stg(frames))
    t_first = time.time() - t0
    b = np.asarray(stg(frames))  # donated temporaries are per-call: must match
    np.testing.assert_array_equal(a, b)
    assert t_first < max(2.0, t_build / 3), (
        f"first call took {t_first:.1f}s after a {t_build:.1f}s warmup - "
        f"AOT executables were not reused")
