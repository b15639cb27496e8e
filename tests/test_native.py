"""Native C++ host-image runtime: build, bindings, and parity tests."""

import numpy as np
import pytest
from PIL import Image

from birefnet_tpu.utils import native


def test_native_library_builds():
    assert native.has_native(), "native/libbirefnet_host.so failed to build"


def test_triangle_resize_matches_pil(rng):
    img = rng.integers(0, 256, size=(97, 123, 3), dtype=np.uint8)
    got = native.resize_triangle_u8(img, 64, 64)
    want = np.asarray(
        Image.fromarray(img).resize((64, 64), Image.BILINEAR))
    # Same filter family; implementations may differ by 1-2 LSB on edges.
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.median(diff) <= 1
    assert (diff <= 3).mean() > 0.99


def test_lanczos_resize_matches_pil(rng):
    img = rng.integers(0, 256, size=(64, 64, 1), dtype=np.uint8)
    got = native.resize_lanczos3_u8(img, 96, 96)
    want = np.asarray(
        Image.fromarray(img[..., 0]).resize((96, 96), Image.LANCZOS))[..., None]
    diff = np.abs(got.astype(int) - want.astype(int))
    # PIL clips its intermediate pass to uint8; we (like the reference's Rust
    # `image` crate) keep float through both passes, so ringing pixels can
    # differ by many LSB. Require broad agreement only.
    assert np.median(diff) <= 1
    assert (diff <= 4).mean() > 0.95


def test_batch_resize_matches_single(rng):
    imgs = rng.integers(0, 256, size=(4, 40, 50, 3), dtype=np.uint8)
    got = native.batch_resize_triangle_u8(imgs, 32, 32)
    for i in range(4):
        np.testing.assert_array_equal(
            got[i], native.resize_triangle_u8(imgs[i], 32, 32))


def test_normalize_imagenet(rng):
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    got = native.normalize_imagenet(img)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    want = ((img.astype(np.float32) / 255.0) - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_numpy_fallback_matches_native(rng):
    """The pure-NumPy fallback must match the C++ implementation."""
    if not native.has_native():
        pytest.skip("no native lib")
    img = rng.integers(0, 256, size=(33, 45, 3), dtype=np.uint8)
    got_native = native.resize_triangle_u8(img, 20, 24)
    got_np = native._numpy_resample(img, 20, 24, 1.0, native._tri)
    diff = np.abs(got_native.astype(int) - got_np.astype(int))
    assert diff.max() <= 1  # float rounding at the u8 boundary
