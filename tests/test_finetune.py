"""Finetune CLI e2e: tiny synthetic dataset -> trained torch-schema
checkpoint + resumable state, driven through finetune.main."""

import numpy as np
import pytest
from PIL import Image

import birefnet_tpu as bt
from birefnet_tpu import finetune


@pytest.fixture()
def dataset(tmp_path, rng):
    imgs, masks = tmp_path / "imgs", tmp_path / "masks"
    imgs.mkdir(), masks.mkdir()
    for i in range(3):
        arr = rng.integers(0, 256, size=(48 + i, 56, 3), dtype=np.uint8)
        Image.fromarray(arr).save(imgs / f"im{i}.png")
        m = rng.integers(0, 2, size=(48 + i, 56), dtype=np.uint8) * 255
        Image.fromarray(m, mode="L").save(masks / f"im{i}.jpg")
    return str(imgs), str(masks)


def test_find_pairs_and_mask_loading(dataset):
    imgs, masks = dataset
    pairs = finetune.find_pairs(imgs, masks)
    assert len(pairs) == 3
    m = finetune.load_mask(pairs[0][1], 64)
    assert m.shape == (64, 64) and m.dtype == np.float32
    assert 0.0 <= m.min() and m.max() <= 1.0

    batches = list(finetune._batches(pairs, batch=2, size=64, steps=2))
    assert len(batches) == 2
    f, y = batches[0]
    assert f.shape == (2, 64, 64, 3) and f.dtype == np.uint8
    assert y.shape == (2, 64, 64) and y.dtype == np.float32


def test_batches_flip_augmentation(dataset):
    """flip=True leaves sample SELECTION identical (independent rng
    stream) and flips image+mask jointly along W for the selected
    samples."""
    pairs = finetune.find_pairs(*dataset)
    plain = list(finetune._batches(pairs, batch=2, size=64, steps=4, seed=5))
    aug = list(finetune._batches(pairs, batch=2, size=64, steps=4, seed=5,
                                 flip=True))
    flipped = unflipped = 0
    for (f0, m0), (f1, m1) in zip(plain, aug):
        for i in range(2):
            if np.array_equal(f0[i], f1[i]):
                assert np.array_equal(m0[i], m1[i])
                unflipped += 1
            else:
                assert np.array_equal(f0[i][:, ::-1], f1[i])
                assert np.array_equal(m0[i][:, ::-1], m1[i])
                flipped += 1
    assert flipped and unflipped  # seed 5: both outcomes occur


def test_find_pairs_missing_mask(tmp_path, rng):
    imgs, masks = tmp_path / "i", tmp_path / "m"
    imgs.mkdir(), masks.mkdir()
    Image.fromarray(
        rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)).save(
        imgs / "a.png")
    with pytest.raises(FileNotFoundError, match="no mask"):
        finetune.find_pairs(str(imgs), str(masks))


def test_finetune_e2e_produces_loadable_checkpoint(dataset, tmp_path):
    imgs, masks = dataset
    out = str(tmp_path / "trained.safetensors")
    state_path = str(tmp_path / "state.safetensors")
    rc = finetune.main([
        imgs, masks, "--out", out, "--size", "64", "--batch", "1",
        "--steps", "2", "--lr", "1e-4", "--save-state", state_path])
    assert rc == 0

    # The exported checkpoint is the torch schema and loads strictly.
    cfg64 = __import__("dataclasses").replace(
        bt.BiRefNetConfig.swin_l(), size=(64, 64))
    params = bt.load_checkpoint(out, cfg64)
    assert "bb" in params and "decoder" in params

    # The saved state resumes (one more step from step 2 -> 3).
    rc = finetune.main([
        imgs, masks, "--out", out, "--size", "64", "--batch", "1",
        "--steps", "1", "--resume", state_path,
        "--save-state", state_path])
    assert rc == 0
    from birefnet_tpu import train
    template = train.init_train_state(bt.init_params(cfg64, seed=0))
    st = train.load_train_state(state_path, template)
    assert int(st.step) == 3
