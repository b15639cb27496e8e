"""End-to-end serving entry point test (CPU, tiny size)."""

import os

import numpy as np
import pytest
from PIL import Image
from safetensors.numpy import save_file

import birefnet_tpu as bt


def test_serve_batch(tmp_path, rng):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for i, (h, w) in enumerate([(50, 70), (80, 60), (64, 64)]):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / f"im{i}.png")

    ckpt = tmp_path / "model.safetensors"
    save_file(bt.random_checkpoint(bt.BiRefNetConfig.swin_l(), 3), str(ckpt))

    from birefnet_tpu import serve
    out = tmp_path / "masks"
    rc = serve.main([str(imgs), "--out", str(out), "--checkpoint", str(ckpt),
                     "--batch", "2", "--size", "64", "--dtype", "float32",
                     "--cpu"])
    assert rc == 0
    masks = sorted(os.listdir(out))
    assert masks == ["im0_mask.png", "im1_mask.png", "im2_mask.png"]
    m0 = np.asarray(Image.open(out / "im0_mask.png"))
    assert m0.shape == (50, 70)  # original size restored
