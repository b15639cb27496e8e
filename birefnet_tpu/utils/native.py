"""ctypes bindings for the native C++ host-image runtime (native/).

Auto-builds `libbirefnet_host.so` with the repo Makefile on first use when a
toolchain is present; all entry points have pure-NumPy fallbacks so the
framework works without the native library (mirroring how the reference's
native paths are feature-gated; reference: Cargo.toml:23-27).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libbirefnet_host.so"))

_U8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_F32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


@functools.lru_cache(maxsize=1)
def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    ci = ctypes.c_int
    lib.birefnet_resize_triangle_u8.argtypes = [_U8, ci, ci, _U8, ci, ci, ci]
    lib.birefnet_resize_lanczos3_u8.argtypes = [_U8, ci, ci, _U8, ci, ci, ci]
    lib.birefnet_batch_resize_triangle_u8.argtypes = [
        _U8, ci, ci, ci, _U8, ci, ci, ci]
    lib.birefnet_normalize_imagenet.argtypes = [_U8, ci, _F32]
    return lib


def has_native() -> bool:
    return _load_lib() is not None


def _numpy_resample(src: np.ndarray, dh: int, dw: int, support: float,
                    filt) -> np.ndarray:
    """Separable resample fallback (same semantics as the C++ path)."""
    sh, sw, ch = src.shape

    def table(s, d):
        scale = s / d
        fs = max(scale, 1.0)
        idx = np.arange(s, dtype=np.float64)
        m = np.zeros((d, s), dtype=np.float64)
        for i in range(d):
            center = (i + 0.5) * scale - 0.5
            w = filt(np.abs(idx - center) / fs)
            w[np.abs(idx - center) > support * fs] = 0.0
            ssum = w.sum()
            m[i] = w / ssum if ssum else 0.0
        return m.astype(np.float32)

    tmp = np.einsum("dw,hwc->hdc", table(sw, dw), src.astype(np.float32))
    out = np.einsum("dh,hwc->dwc", table(sh, dh), tmp)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _tri(t):
    return np.clip(1.0 - t, 0.0, None)


def _lcz3(t):
    t = np.abs(t)
    with np.errstate(divide="ignore", invalid="ignore"):
        v = 3.0 * np.sin(np.pi * t) * np.sin(np.pi * t / 3.0) / (
            np.pi * np.pi * t * t)
    v = np.where(t < 1e-8, 1.0, v)
    return np.where(t >= 3.0, 0.0, v)


def resize_triangle_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """[H, W, C] uint8 -> [dh, dw, C] uint8, antialiased triangle filter."""
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw, ch = img.shape
    lib = _load_lib()
    if lib is None:
        return _numpy_resample(img, dh, dw, 1.0, _tri)
    out = np.empty((dh, dw, ch), np.uint8)
    lib.birefnet_resize_triangle_u8(img, sh, sw, out, dh, dw, ch)
    return out


def resize_lanczos3_u8(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """[H, W, C] uint8 -> [dh, dw, C] uint8, Lanczos3 filter
    (reference mask-resize semantics; examples/infer_image.rs:103-108)."""
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw, ch = img.shape
    lib = _load_lib()
    if lib is None:
        return _numpy_resample(img, dh, dw, 3.0, _lcz3)
    out = np.empty((dh, dw, ch), np.uint8)
    lib.birefnet_resize_lanczos3_u8(img, sh, sw, out, dh, dw, ch)
    return out


def batch_resize_triangle_u8(imgs: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """[B, H, W, C] uint8 -> [B, dh, dw, C] uint8 (loader hot path,
    OpenMP-parallel over the batch in the native library)."""
    imgs = np.ascontiguousarray(imgs, np.uint8)
    b, sh, sw, ch = imgs.shape
    lib = _load_lib()
    if lib is None:
        return np.stack([
            _numpy_resample(imgs[i], dh, dw, 1.0, _tri) for i in range(b)])
    out = np.empty((b, dh, dw, ch), np.uint8)
    lib.birefnet_batch_resize_triangle_u8(imgs, b, sh, sw, out, dh, dw, ch)
    return out


def normalize_imagenet(img_u8: np.ndarray) -> np.ndarray:
    """[..., 3] uint8 -> float32 ImageNet-normalized (host fallback; the TPU
    pipeline normalizes on device)."""
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    lib = _load_lib()
    if lib is None:
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return ((img_u8.astype(np.float32) / 255.0) - mean) / std
    out = np.empty(img_u8.shape, np.float32)
    lib.birefnet_normalize_imagenet(img_u8, img_u8.size, out)
    return out
