"""On-device pre/post pipeline tests.

Validates the fused device-side path against the reference's host-side
semantics: triangle resize + ImageNet normalize in
(reference: examples/infer_image.rs:44-67), sigmoid + Lanczos3 resize +
u8 quantization out (reference: examples/infer_image.rs:85-108).
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

import birefnet_tpu as bt
from birefnet_tpu import pipeline
from birefnet_tpu.utils import native


def test_preprocess_normalization(rng):
    frames = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    out = np.asarray(pipeline.preprocess(jnp.asarray(frames), (32, 32)))
    mean = np.array(bt.IMAGENET_MEAN, np.float32)
    std = np.array(bt.IMAGENET_STD, np.float32)
    want = ((frames.astype(np.float32) / 255.0) - mean) / std
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_preprocess_resize_matches_pil(rng):
    frames = rng.integers(0, 256, size=(1, 96, 96, 3), dtype=np.uint8)
    out = np.asarray(pipeline.preprocess(jnp.asarray(frames), (48, 48)))
    mean = np.array(bt.IMAGENET_MEAN, np.float32)
    std = np.array(bt.IMAGENET_STD, np.float32)
    denorm = out * std + mean  # back to [0,1] resized image
    want = np.asarray(Image.fromarray(frames[0]).resize(
        (48, 48), Image.BILINEAR)).astype(np.float32) / 255.0
    # Same triangle filter family (device matmul vs PIL fixed point).
    assert np.abs(denorm[0] - want).mean() < 2e-3
    assert np.abs(denorm[0] - want).max() < 0.03


def test_postprocess_uint8_range():
    mask = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32).reshape(
        1, 8, 8, 1))
    out = np.asarray(pipeline.postprocess(mask, 16, 16))
    assert out.dtype == np.uint8 and out.shape == (1, 16, 16)


def test_postprocess_matches_native_lanczos(rng):
    m = rng.uniform(0, 1, size=(1, 32, 32, 1)).astype(np.float32)
    out = np.asarray(pipeline.postprocess(jnp.asarray(m), 48, 48))
    want = native.resize_lanczos3_u8(
        np.clip(np.rint(m[0] * 255), 0, 255).astype(np.uint8), 48, 48)[..., 0]
    # Device path resizes in float then quantizes; native path quantizes
    # first. Allow small differences.
    diff = np.abs(out[0].astype(int) - want.astype(int))
    assert np.median(diff) <= 1 and (diff <= 3).mean() > 0.97


def test_make_infer_fn_end_to_end(rng):
    """Tiny end-to-end: uint8 frames in, uint8 masks out, one jit."""
    cfg = bt.BiRefNetConfig.swin_l()
    import dataclasses
    cfg = dataclasses.replace(cfg, size=(64, 64))
    params = bt.init_params(cfg, seed=0)
    infer = pipeline.make_infer_fn(params, cfg)
    frames = rng.integers(0, 256, size=(1, 80, 100, 3), dtype=np.uint8)
    out = np.asarray(infer(jnp.asarray(frames)))
    assert out.shape == (1, 80, 100) and out.dtype == np.uint8
