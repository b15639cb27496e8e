"""Evaluation-metric tests: identities, hand-computed cases, and a
brute-force oracle for the vectorized precision/recall."""

import numpy as np
import pytest
from PIL import Image

from birefnet_tpu import evaluate as ev


def _disk(h=64, w=64, r=20, cy=None, cx=None):
    cy, cx = h // 2 if cy is None else cy, w // 2 if cx is None else cx
    yy, xx = np.mgrid[:h, :w]
    return (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.float64)


def test_perfect_prediction_is_ideal():
    gt = _disk()
    f = ev.f_measure(gt, gt)
    e = ev.e_measure(gt, gt)
    assert ev.mae(gt, gt) == 0.0
    assert f["adp"] > 0.999 and f["max"] > 0.999
    assert e["adp"] > 0.99 and e["max"] > 0.99
    assert ev.s_measure(gt, gt) > 0.95


def test_inverted_prediction_is_bad():
    gt = _disk()
    inv = 1.0 - gt
    assert ev.mae(inv, gt) == 1.0
    assert ev.f_measure(inv, gt)["max"] < 0.4
    assert ev.s_measure(inv, gt) < 0.4
    assert ev.e_measure(inv, gt)["max"] < 0.6


def test_mae_matches_direct():
    rng = np.random.default_rng(0)
    pred = rng.random((32, 48))
    gt = _disk(32, 48, 10)
    assert abs(ev.mae(pred, gt) - np.abs(pred - gt).mean()) < 1e-12


def test_f_measure_hand_case():
    """4x4 binary case computed by hand: tp=2, fp=1, fn=1 at t=0.5."""
    gt = np.zeros((4, 4)); gt[0, 0] = gt[0, 1] = gt[0, 2] = 1
    pred = np.zeros((4, 4)); pred[0, 0] = pred[0, 1] = pred[1, 0] = 1.0
    # precision 2/3, recall 2/3, beta2=0.3 -> F = 1.3*P*R/(0.3P+R)
    p = r = 2.0 / 3.0
    want = 1.3 * p * r / (0.3 * p + r)
    got = ev.f_measure(pred, gt)["max"]
    assert abs(got - want) < 1e-6, (got, want)


def test_precision_recall_vectorization_matches_bruteforce():
    rng = np.random.default_rng(1)
    pred = rng.random((40, 40))
    gt = _disk(40, 40, 12)
    precision, recall = ev._precision_recall(pred, gt)
    # brute force at a few bin lower edges
    edges = np.linspace(0.0, 1.0 + 1e-9, 257)[:-1]
    for i in (0, 31, 128, 200, 255):
        t = edges[i]
        binary = pred >= t
        tp = (binary & (gt == 1)).sum()
        bp = max(binary.sum(), 1e-12)
        assert abs(precision[i] - tp / (bp + 1e-8)) < 1e-6
        assert abs(recall[i] - tp / (gt.sum() + 1e-8)) < 1e-6


def test_s_measure_degenerate_gts():
    pred = np.full((16, 16), 0.25)
    assert abs(ev.s_measure(pred, np.zeros((16, 16))) - 0.75) < 1e-9
    assert abs(ev.s_measure(pred, np.ones((16, 16))) - 0.25) < 1e-9


def test_e_measure_degenerate_gts():
    pred = np.zeros((16, 16))
    assert ev.e_measure(pred, np.zeros((16, 16)))["max"] == 1.0
    assert ev.e_measure(np.ones((16, 16)), np.ones((16, 16)))["max"] == 1.0


def test_shifted_prediction_ranks_below_good_one():
    gt = _disk()
    close = _disk(cy=34, cx=34)   # slightly shifted disk
    far = _disk(cy=12, cx=50)     # badly shifted
    for metric in (lambda p: ev.f_measure(p, gt)["max"],
                   lambda p: ev.s_measure(p, gt),
                   lambda p: ev.e_measure(p, gt)["max"]):
        assert metric(gt) > metric(close) > metric(far)


def test_weighted_f_identities():
    """F-beta^w (Margolin 2014): perfect = 1, inverted ~ 0, empty GT = 0,
    and it ranks a near-miss above a far-miss."""
    gt = _disk()
    assert abs(ev.weighted_f_measure(gt, gt) - 1.0) < 1e-6
    assert ev.weighted_f_measure(1.0 - gt, gt) < 0.05
    assert ev.weighted_f_measure(gt, np.zeros_like(gt)) == 0.0
    close, far = _disk(cy=34, cx=34), _disk(cy=12, cx=50)
    assert (ev.weighted_f_measure(gt, gt)
            > ev.weighted_f_measure(close, gt)
            > ev.weighted_f_measure(far, gt))


def test_weighted_f_rewards_near_foreground_errors():
    """The dependency weighting's point (Margolin 2014 fig. 3): a false
    positive NEXT TO the object costs less than the same-size false
    positive far away (the distance attenuation B < 2 near the object)."""
    gt = _disk(64, 64, 12)
    near = gt.copy(); near[32, 45:48] = 1.0   # 3 FPs hugging the boundary
    far = gt.copy(); far[2, 45:48] = 1.0      # 3 FPs far from the object
    assert ev.weighted_f_measure(near, gt) > ev.weighted_f_measure(far, gt)


def test_weighted_f_regression_pin():
    """Pinned value on a fixed random case (guards the transcription:
    index transform, 7x7 sigma-5 Gaussian, B attenuation, beta=1)."""
    rng = np.random.default_rng(42)
    gt = _disk(48, 48, 14)
    pred = np.clip(gt + rng.normal(0, 0.15, gt.shape), 0, 1)
    got = ev.weighted_f_measure(pred, gt)
    # pinned 2026-08-19 (update only with a reasoned recomputation)
    assert abs(got - 0.8762441573216712) < 1e-9, got


def test_validate_rejects_bad_inputs():
    with pytest.raises(ValueError, match="same-shape"):
        ev.mae(np.zeros((4, 4)), np.zeros((4, 5)))
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        ev.mae(np.full((4, 4), 2.0), np.zeros((4, 4)))


def test_evaluate_maps_and_cli(tmp_path, rng):
    gt = _disk(32, 32, 9)
    pred = np.clip(gt * 0.9 + 0.05, 0, 1)
    scores = ev.evaluate_maps([(pred, gt), (gt, gt)])
    assert set(scores) == {"mae", "s_measure", "weighted_f", "adp_f",
                           "max_f", "adp_e", "max_e"}
    assert scores["mae"] < 0.1 and scores["max_f"] > 0.9

    pd, gd = tmp_path / "pred", tmp_path / "gt"
    pd.mkdir(), gd.mkdir()
    Image.fromarray((pred * 255).astype(np.uint8), mode="L").save(
        pd / "a.png")
    Image.fromarray((gt * 255).astype(np.uint8), mode="L").save(
        gd / "a.png")
    assert ev.main([str(pd), str(gd)]) == 0
