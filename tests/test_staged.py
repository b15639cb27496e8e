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
    """warmup_batch pre-compiles every unit and calls at the warmed shape
    dispatch through the AOT executables (the jit fallback path is never
    traced); buffer donation keeps repeat calls correct."""
    import dataclasses
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(64, 64))
    params = bt.init_params(cfg, seed=1)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8))

    stg = staged.make_staged_infer_fn(params, cfg, warmup_batch=1)
    assert stg._aot and stg._aot["shape"] == (1, 64, 64)
    a = np.asarray(stg(frames))
    b = np.asarray(stg(frames))  # donated temporaries are per-call: must match
    np.testing.assert_array_equal(a, b)
    # Direct executable-reuse check (no wall-clock): every call went through
    # the AOT executables, so the jit units' dispatch caches stay empty.
    for name, unit in stg._units.items():
        assert unit._cache_size() == 0, (
            f"unit {name} was traced at call time despite warmup")


def test_staged_warmup_other_shape_falls_back(rng):
    """A batch different from the warmed one takes the jit fallback path and
    still produces output of the right shape."""
    import dataclasses
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(64, 64))
    params = bt.init_params(cfg, seed=1)
    stg = staged.make_staged_infer_fn(params, cfg, warmup_batch=1)
    frames2 = jnp.asarray(
        rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8))
    out = stg(frames2)
    assert out.shape == (2, 64, 64)
    assert stg._units["pre"]._cache_size() == 1  # fallback was used
