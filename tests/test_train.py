"""Training-step tests: loss parity vs torch, grad flow, FSDP sharding.

The reference is inference-only; the loss contract here is the upstream
BiRefNet structure loss (weighted BCE + weighted IoU), checked against an
independent torch implementation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import birefnet_tpu as bt
from birefnet_tpu import train
from birefnet_tpu.parallel import mesh as pmesh
from birefnet_tpu.parallel import sharding as pshard


def test_structure_loss_matches_torch():
    """structure_loss == the F3Net/BiRefNet torch formulation (avg_pool2d
    k=31 s=1 p=15 count_include_pad, weighted BCE-with-logits, +1 IoU)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    logits = rng.normal(size=(2, 40, 44)).astype(np.float32) * 3.0
    mask = (rng.random(size=(2, 40, 44)) > 0.5).astype(np.float32)

    got = float(train.structure_loss(jnp.asarray(logits), jnp.asarray(mask)))

    p = torch.from_numpy(logits)[:, None]
    m = torch.from_numpy(mask)[:, None]
    weit = 1 + 5 * torch.abs(
        F.avg_pool2d(m, kernel_size=31, stride=1, padding=15) - m)
    wbce = F.binary_cross_entropy_with_logits(p, m, reduction="none")
    wbce = (weit * wbce).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    ps = torch.sigmoid(p)
    inter = ((ps * m) * weit).sum(dim=(2, 3))
    union = ((ps + m) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    want = float((wbce + wiou).mean())

    assert abs(got - want) < 1e-5, (got, want)


def test_validate_train_compute_rejects_pallas_paths():
    for flag in ("use_flash_attention", "int8_mlp", "int8_attn",
                 "use_pallas_deform"):
        with pytest.raises(ValueError, match="forward-only"):
            train.validate_train_compute(
                bt.ComputeConfig(**{flag: True}))
    out = train.validate_train_compute(
        bt.ComputeConfig(unroll_deep_stage=True))
    assert out.differentiable and not out.unroll_deep_stage
    # bf16 requests demote to f32: the inference bf16 path's
    # preferred_element_type=f32 ops have no JAX transpose.
    out = train.validate_train_compute(bt.ComputeConfig(dtype=jnp.bfloat16))
    assert out.dtype == jnp.float32


def test_fsdp_specs_logic():
    mesh = pmesh.make_mesh(8, spatial=1)
    params = {
        "w": jnp.zeros((7, 7, 96, 192)),      # largest divisible dim: 192
        "dense": jnp.zeros((1536, 384)),       # tie-free: 1536
        "bias": jnp.zeros((192,)),             # under min_size: replicated
        "odd": jnp.zeros((501, 501)),          # indivisible: replicated
    }
    specs = pshard.fsdp_specs(params, mesh)
    P = jax.sharding.PartitionSpec
    assert specs["w"].spec == P(None, None, None, "data")
    assert specs["dense"].spec == P("data", None)
    assert specs["bias"].spec == P()
    assert specs["odd"].spec == P()


def test_lr_schedules():
    import optax  # noqa: F401 (schedule objects are optax callables)

    const = train.lr_schedule(train.TrainConfig(learning_rate=2e-4))
    assert float(const(0)) == float(const(999)) == 2e-4

    warm = train.lr_schedule(
        train.TrainConfig(learning_rate=1e-4, warmup_steps=10))
    assert float(warm(0)) == 0.0
    assert abs(float(warm(5)) - 5e-5) < 1e-9  # f32 schedule arithmetic

    cos = train.lr_schedule(train.TrainConfig(
        learning_rate=1e-4, schedule="cosine", warmup_steps=10,
        total_steps=100))
    assert float(cos(0)) == 0.0
    assert abs(float(cos(10)) - 1e-4) < 1e-10   # peak after warmup
    assert float(cos(100)) < 1e-8               # decayed to ~0
    assert float(cos(55)) < 1e-4

    with pytest.raises(ValueError, match="total_steps"):
        train.lr_schedule(train.TrainConfig(schedule="cosine"))
    with pytest.raises(ValueError, match="unknown schedule"):
        train.lr_schedule(train.TrainConfig(schedule="linear"))


def test_backbone_lr_scale():
    """backbone_lr_scale routes params['bb'] through a scaled-LR AdamW
    (0 = frozen, no updates) while the rest trains at full LR. Toy tree —
    the routing is structural, not model-specific."""
    import optax

    params = {"bb": {"w": jnp.ones((4,))}, "decoder": {"w": jnp.ones((4,))}}
    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.5), params)

    def one_update(scale):
        tcfg = train.TrainConfig(learning_rate=1e-2, weight_decay=0.0,
                                 backbone_lr_scale=scale)
        opt = train.make_optimizer(tcfg)
        upd, _ = opt.update(grads, opt.init(params), params)
        return optax.apply_updates(params, upd)

    frozen = one_update(0.0)
    np.testing.assert_array_equal(np.asarray(frozen["bb"]["w"]), 1.0)
    assert not np.allclose(np.asarray(frozen["decoder"]["w"]), 1.0)

    half = one_update(0.5)
    d_bb = 1.0 - np.asarray(half["bb"]["w"])
    d_dec = 1.0 - np.asarray(half["decoder"]["w"])
    # identical grads through separate AdamWs: bb step = scale * dec step
    np.testing.assert_allclose(d_bb, 0.5 * d_dec, rtol=1e-5)
    assert d_dec.min() > 0

    uniform = one_update(1.0)  # single-optimizer fast path
    np.testing.assert_allclose(np.asarray(uniform["bb"]["w"]),
                               np.asarray(uniform["decoder"]["w"]),
                               rtol=1e-7)


def test_train_state_save_resume_roundtrip(tmp_path):
    params = {"blk": {"kernel": jnp.arange(12.0).reshape(3, 4),
                      "bias": jnp.ones((4,))}}
    tcfg = train.TrainConfig()
    state = train.init_train_state(params, tcfg)
    state = state._replace(step=jnp.asarray(17, jnp.int32))

    p = str(tmp_path / "state.safetensors")
    train.save_train_state(p, state)
    template = train.init_train_state(
        jax.tree.map(jnp.zeros_like, params), tcfg)
    loaded = train.load_train_state(p, template)

    assert int(loaded.step) == 17
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(state)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0]):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Strict coverage both ways.
    bad = train.init_train_state({"other": jnp.zeros((3, 4))}, tcfg)
    with pytest.raises(ValueError, match="mismatch"):
        train.load_train_state(p, bad)


def _offset_conv_leaves(params):
    leaves = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if any(getattr(k, "key", None) == "offset_conv" for k in path):
            leaves.append((jax.tree_util.keystr(path), leaf))
    return leaves


def test_train_step_full_model():
    """2 steps at 64² f32 on the full Swin-L graph: loss decreases, grads
    are finite, and gradient FLOWS THROUGH the deformable offset convs
    (weight_decay=0 so a parameter moves iff its gradient is nonzero)."""
    cfg = bt.BiRefNetConfig.swin_l()
    params = bt.init_params(cfg, seed=0)
    compute = bt.ComputeConfig(deform_mode="deformable")
    tcfg = train.TrainConfig(learning_rate=1e-4, weight_decay=0.0)
    step = train.make_train_step(cfg, compute, tcfg)
    state = train.init_train_state(params, tcfg)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    # A structured target (disk) so the loss has signal.
    yy, xx = np.mgrid[:64, :64]
    labels = jnp.asarray(
        (((yy - 32) ** 2 + (xx - 32) ** 2) < 20 ** 2)[None].astype(np.float32))

    # Snapshot BEFORE stepping: the step donates the state, so the
    # original param buffers are invalid afterwards.
    before = [(k, np.asarray(v)) for k, v in _offset_conv_leaves(params)]

    losses = []
    for _ in range(2):
        state, metrics = step(state, x, labels)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))
    assert losses[1] < losses[0], losses
    assert int(state.step) == 2
    after = _offset_conv_leaves(state.params)
    assert before, "no offset_conv leaves found"
    moved = [k for (k, b), (_, a) in zip(before, after)
             if not np.allclose(np.asarray(b), np.asarray(a))]
    assert moved, "no gradient reached any deformable offset conv"


def test_split_update_matches_fused():
    """split_update=True (grads and AdamW update as two programs — the
    route past the remote-compile helper's memory cap at ≥384², see
    make_train_step) computes the same step as the fused program."""
    cfg = bt.BiRefNetConfig.swin_l()
    params = bt.init_params(cfg, seed=1)
    tcfg = train.TrainConfig(learning_rate=1e-4)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(
        (rng.random(size=(1, 64, 64)) > 0.5).astype(np.float32))

    fused = train.make_train_step(cfg, bt.ComputeConfig(), tcfg,
                                  donate=False, split_update=False)
    split = train.make_train_step(cfg, bt.ComputeConfig(), tcfg,
                                  donate=False, split_update=True)
    s1, m1 = fused(train.init_train_state(params, tcfg), x, labels)
    s2, m2 = split(train.init_train_state(params, tcfg), x, labels)

    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert abs(l1 - l2) < 1e-6 * max(1.0, abs(l1)), (l1, l2)
    g1, g2 = float(m1["grad_norm"]), float(m2["grad_norm"])
    assert abs(g1 - g2) <= 1e-4 * max(1.0, g1), (g1, g2)
    worst = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        s1.params, s2.params)))
    assert worst < 1e-5, worst
    assert int(s2.step) == 1

    # Auto default: fused below the measured 384² wall, split at/above it
    # (jit objects expose .lower; the split step is a plain function).
    small = train.make_train_step(
        dataclasses.replace(cfg, size=(256, 256)), bt.ComputeConfig(), tcfg)
    big = train.make_train_step(
        dataclasses.replace(cfg, size=(384, 384)), bt.ComputeConfig(), tcfg)
    assert hasattr(small, "lower") and not hasattr(big, "lower")


def test_grad_accum_matches_full_batch():
    """accum_steps=2 on a batch of 2 == the plain full-batch step: equal
    microbatches make the mean-of-means loss exact, and the single AdamW
    update lands within grad-reassociation roundoff of the full-batch
    update."""
    cfg = bt.BiRefNetConfig.swin_l()
    params = bt.init_params(cfg, seed=0)
    tcfg1 = train.TrainConfig(learning_rate=1e-4)
    tcfg2 = dataclasses.replace(tcfg1, accum_steps=2)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    labels = jnp.asarray(
        (rng.random(size=(2, 64, 64)) > 0.5).astype(np.float32))

    # donate=False: the same buffers feed both steps.
    step1 = train.make_train_step(cfg, bt.ComputeConfig(), tcfg1,
                                  donate=False)
    step2 = train.make_train_step(cfg, bt.ComputeConfig(), tcfg2,
                                  donate=False)
    s1, m1 = step1(train.init_train_state(params, tcfg1), x, labels)
    s2, m2 = step2(train.init_train_state(params, tcfg2), x, labels)

    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert abs(l1 - l2) < 1e-6 * max(1.0, abs(l1)), (l1, l2)
    g1, g2 = float(m1["grad_norm"]), float(m2["grad_norm"])
    assert abs(g1 - g2) <= 1e-4 * g1, (g1, g2)
    worst = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        s1.params, s2.params)))
    assert worst < 1e-5, worst

    # Indivisible batch is rejected at trace time.
    tcfg3 = dataclasses.replace(tcfg1, accum_steps=3)
    step3 = train.make_train_step(cfg, bt.ComputeConfig(), tcfg3,
                                  donate=False)
    with pytest.raises(ValueError, match="not divisible"):
        step3(train.init_train_state(params, tcfg3), x, labels)
    with pytest.raises(ValueError, match="accum_steps"):
        train.make_train_step(
            cfg, bt.ComputeConfig(),
            dataclasses.replace(tcfg1, accum_steps=0))


def test_train_step_fsdp_dp2():
    """FSDP-sharded step on a 2-device data mesh: params/moments sharded by
    fsdp_specs, batch sharded over data; one step runs, loss finite, and
    the updated params keep their FSDP shardings."""
    mesh = pmesh.make_mesh(2, spatial=1)
    cfg = bt.BiRefNetConfig.swin_l()
    params = bt.init_params(cfg, seed=0)
    tcfg = train.TrainConfig(learning_rate=1e-4)
    compute = bt.ComputeConfig()

    specs = pshard.fsdp_specs(params, mesh)
    params = jax.device_put(params, specs)
    state = train.init_train_state(params, tcfg)

    in_sharding = pshard.batch_leading(mesh)
    step = train.make_train_step(cfg, compute, tcfg, in_sharding=in_sharding,
                                 param_sharding=specs)

    rng = np.random.default_rng(1)
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        in_sharding)
    labels = jax.device_put(
        jnp.asarray((rng.random(size=(2, 64, 64)) > 0.5).astype(np.float32)),
        in_sharding)

    state2, metrics = step(state, x, labels)
    assert np.isfinite(float(metrics["loss"]))

    # The big swin qkv kernels must still be sharded (not silently gathered
    # to replicated) after the update.
    flat_specs = jax.tree_util.tree_flatten_with_path(specs)[0]
    flat_after = jax.tree_util.tree_flatten_with_path(state2.params)[0]
    sharded = 0
    for (pth, spec), (_, leaf) in zip(flat_specs, flat_after):
        if spec.spec != jax.sharding.PartitionSpec():
            sharded += 1
            # Semantic comparison: GSPMD normalizes specs (trailing Nones
            # etc.), so object equality is too strict.
            assert leaf.sharding.is_equivalent_to(spec, leaf.ndim), (
                jax.tree_util.keystr(pth), leaf.sharding, spec)
    assert sharded > 100  # Swin-L has hundreds of big matrices
