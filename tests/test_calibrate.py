"""Runtime offset-radius calibration (calibrate.py): the data-derived
route to faithful deformable sampling at local-kernel speed.

The reference never inspects its learned offsets (the Metal kernel just
samples; reference: src/aspp.rs:169-186); this subsystem is new
capability — probe max|offset| at the 20 deformable sites, then serve
deformable-local at the measured radius, which is exact for the probed
data by construction.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import birefnet_tpu as bt
from birefnet_tpu import calibrate, pipeline


@pytest.fixture(scope="module")
def setup(rng):
    import dataclasses
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(64, 64))
    params = bt.init_params(cfg, seed=3)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8))
    return cfg, params, frames


def test_probe_returns_20_sites(setup):
    cfg, params, frames = setup
    maxima = calibrate.probe_offset_maxima(params, cfg, frames)
    # squeeze (4 branches) + decoder_block4..1 (4 branches each)
    assert maxima.shape == (20,)
    assert np.isfinite(maxima).all() and (maxima >= 0).all()
    assert maxima.max() > 0  # random offset convs produce nonzero offsets


def test_calibrated_radius_policy():
    assert calibrate.calibrated_radius(np.array([0.3, 0.1]), safety=1) == 2
    assert calibrate.calibrated_radius(np.array([2.2]), safety=1) == 4
    assert calibrate.calibrated_radius(np.array([0.01]), safety=0) == 1
    assert calibrate.calibrated_radius(np.array([9.0]), cap=8) is None
    assert calibrate.calibrated_radius(np.array([6.9]), cap=8) == 8


def test_calibrated_site_radii_policy():
    """Per-site policy: each site gets its OWN ceil+safety radius; only
    the sites over the cap fall back (None), never their neighbors."""
    maxima = np.array([0.3, 2.2, 9.0, 0.01])
    assert calibrate.calibrated_site_radii(maxima, safety=1, cap=8) == \
        (2, 4, None, 2)
    assert calibrate.calibrated_site_radii(maxima, safety=0, cap=8) == \
        (1, 3, None, 1)
    # cap binds per site, not globally
    assert calibrate.calibrated_site_radii(maxima, safety=1, cap=3) == \
        (2, None, None, 2)
    assert len(calibrate.SITE_NAMES) == 20


def test_auto_mode_matches_exact_deformable(setup):
    """The auto-resolved pipeline must reproduce the exact-deformable
    masks when the probed per-site radii bound the offsets (which they do
    by construction for the probe batch)."""
    cfg, params, frames = setup
    compute = bt.ComputeConfig(deform_mode="deformable")
    resolved, maxima, radii = calibrate.auto_deform_compute(
        params, cfg, frames, compute)
    assert radii is not None and len(radii) == 20
    assert resolved.deform_mode == "deformable-local"
    assert resolved.deform_site_radii == radii
    # Each live radius bounds its own site's probed max; the global
    # fallback radius is the largest live one.
    for m, r in zip(maxima, radii):
        if r is not None:
            assert r >= int(np.ceil(float(m)))
    assert resolved.deform_local_radius == \
        max(r for r in radii if r is not None)

    exact = pipeline.make_infer_fn(params, cfg, compute)
    local = pipeline.make_infer_fn(params, cfg, resolved)
    a = np.asarray(exact(frames)).astype(int)
    b = np.asarray(local(frames)).astype(int)
    assert np.abs(a - b).max() <= 1  # u8 quantization boundary


def test_per_site_outlier_falls_back_alone(setup):
    """A site over the cap keeps exact sampling ALONE (None entry) while
    the other sites run local at heterogeneous radii — and the mixed
    pipeline still reproduces the exact-deformable masks."""
    cfg, params, frames = setup
    compute = bt.ComputeConfig(deform_mode="deformable")
    maxima = calibrate.probe_offset_maxima(params, cfg, frames)
    radii = list(calibrate.calibrated_site_radii(maxima, safety=1, cap=8))
    # Force heterogeneity: squeeze.aspp1 exact (as if its probe exceeded
    # the cap), dec4.deform_k3 a larger-than-needed radius.
    radii[0] = None
    radii[6] = (radii[6] or 1) + 2
    het = compute.with_overrides(
        deform_mode="deformable-local", deform_site_radii=tuple(radii),
        deform_local_radius=max(r for r in radii if r is not None))
    exact = pipeline.make_infer_fn(params, cfg, compute)
    mixed = pipeline.make_infer_fn(params, cfg, het)
    a = np.asarray(exact(frames)).astype(int)
    b = np.asarray(mixed(frames)).astype(int)
    assert np.abs(a - b).max() <= 1


def test_auto_all_sites_over_cap_resolves_exact(setup):
    """Only when EVERY site exceeds the cap does the whole model resolve
    to plain exact deformable (cap=0 forces it: any radius > 0)."""
    cfg, params, frames = setup
    compute = bt.ComputeConfig(deform_mode="deformable")
    resolved, maxima, radii = calibrate.auto_deform_compute(
        params, cfg, frames, compute, cap=0)
    assert radii is None
    assert resolved.deform_mode == "deformable"
    assert resolved.deform_site_radii is None


def test_serve_auto_mode_end_to_end(tmp_path, rng):
    """serve.py --deform-mode auto: probe + calibrated serving, whole."""
    import os
    from PIL import Image
    from safetensors.numpy import save_file
    from birefnet_tpu.serve import main

    ckpt = tmp_path / "m.safetensors"
    save_file(bt.random_checkpoint(bt.BiRefNetConfig.swin_l(), 3),
              str(ckpt))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, (h, w) in enumerate([(80, 70), (64, 64), (33, 57)]):
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
        ).save(img_dir / f"im{i}.png")
    out_dir = tmp_path / "masks"
    rc = main([str(img_dir), "--out", str(out_dir),
               "--checkpoint", str(ckpt), "--batch", "2", "--size", "64",
               "--dtype", "float32", "--cpu", "--deform-mode", "auto"])
    assert rc == 0
    assert sorted(os.listdir(out_dir)) == \
        [f"im{i}_mask.png" for i in range(3)]
