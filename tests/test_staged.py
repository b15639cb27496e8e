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


def test_staged_warmup_and_repeat_calls(rng):
    """warmup_batch pre-compiles every unit and calls at the warmed shape
    dispatch through the AOT executables (the jit fallback path is never
    traced); repeat calls must be bitwise repeatable."""
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


def test_staged_aot_dir_persists_and_reloads(rng, tmp_path):
    """aot_dir round trip (round-4 verdict item 4): the first construction
    compiles and persists every unit's executable
    (jax.experimental.serialize_executable); a second construction with the
    same code/config/shapes loads ALL units from disk — no trace, no
    compile — and produces bitwise-identical masks."""
    import dataclasses
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(64, 64))
    params = bt.init_params(cfg, seed=1)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8))

    d = str(tmp_path / "aot")
    first = staged.make_staged_infer_fn(params, cfg, warmup_batch=1,
                                        aot_dir=d)
    assert first._aot["loaded_from_disk"] == []
    import os
    names = sorted(os.listdir(d))
    assert len(names) == 4 and all(n.endswith(".pkl") for n in names)
    a = np.asarray(first(frames))

    second = staged.make_staged_infer_fn(params, cfg, warmup_batch=1,
                                         aot_dir=d)
    assert sorted(second._aot["loaded_from_disk"]) == [
        "backbone_full", "backbone_half", "merge", "pre"]
    b = np.asarray(second(frames))
    np.testing.assert_array_equal(a, b)


def test_staged_aot_key_tracks_config(rng, tmp_path):
    """A different ComputeConfig must MISS the persisted executables (the
    cache key covers the config, shapes, topology, and code fingerprint —
    a stale-hit here would silently serve the wrong program)."""
    import dataclasses
    from birefnet_tpu.configs import ComputeConfig
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(64, 64))
    key_a = staged._aot_cache_key(
        cfg, ComputeConfig(), {}, 1, (64, 64), None, True, None)
    key_b = staged._aot_cache_key(
        cfg, ComputeConfig(deform_mode="regular"), {}, 1, (64, 64), None,
        True, None)
    key_c = staged._aot_cache_key(
        cfg, ComputeConfig(), {}, 2, (64, 64), None, True, None)
    assert len({key_a, key_b, key_c}) == 3


def test_staged_aot_dir_roundtrip_on_mesh(rng, tmp_path):
    """aot_dir + mesh: the deserialize path must pass the ORIGINAL mesh
    device assignment as execution_devices (the PJRT default is all
    local devices in enumeration order, which can mismatch the mesh) —
    a serve --dp --aot-dir RESTART depends on this. Persist on a DP
    mesh, reload, and require identical sharded masks."""
    import dataclasses
    from birefnet_tpu.parallel import mesh as pmesh
    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(64, 64))
    params = bt.init_params(cfg, seed=1)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(8, 64, 64, 3), dtype=np.uint8))
    mesh = pmesh.make_mesh(8, spatial=1)

    d = str(tmp_path / "aot_mesh")
    first = staged.make_staged_infer_fn(params, cfg, warmup_batch=8,
                                        mesh=mesh, aot_dir=d)
    assert first._aot["loaded_from_disk"] == []
    a = np.asarray(first(frames))

    second = staged.make_staged_infer_fn(params, cfg, warmup_batch=8,
                                         mesh=mesh, aot_dir=d)
    assert sorted(second._aot["loaded_from_disk"]) == [
        "backbone_full", "backbone_half", "merge", "pre"]
    b = np.asarray(second(frames))
    np.testing.assert_array_equal(a, b)
