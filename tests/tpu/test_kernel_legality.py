"""On-TPU Pallas kernel legality tier (round-2 verdict item 7).

Every other Pallas test in this suite runs interpret mode on CPU, which does
NOT enforce Mosaic's lowering rules (BlockSpec minor-dim tiling, missing op
lowerings, VMEM limits — see ROADMAP.md "Measurement notes"). This tier
COMPILES and EXECUTES every shipping kernel at every geometry the model
uses, on the real chip.

Run (one command, needs the TPU):

    BIREFNET_TEST_TPU=1 python -m pytest tests/tpu -q

or as a worker job via benchmarks/tpu_worker.py (drop a job file running
pytest.main). Results are recorded in PARITY.md's accuracy-gate table.
Collected-but-skipped on CPU runs of the main suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="legality tier needs the real TPU (run with BIREFNET_TEST_TPU=1)")

# (label, padded H=W, C, heads) for every geometry the Swin-L model runs the
# fused block-attention kernel at: 1024^2 full scale + 512^2 half scale
# (the backbone runs at both; reference: src/birefnet.rs:423-426).
BLOCK_GEOMETRIES = [
    ("full-st0", 264, 192, 6),
    ("full-st1", 132, 384, 12),
    ("full-st2", 72, 768, 24),
    ("full-st3", 36, 1536, 48),
    ("half-st0", 132, 192, 6),
    ("half-st1", 72, 384, 12),
    ("half-st2", 36, 768, 24),
    ("half-st3", 24, 1536, 48),
]

WS = 12
N = WS * WS


def _block_inputs(hp, c, heads, shift, dtype=jnp.bfloat16, seed=0):
    from birefnet_tpu.ops import window as W
    rng = np.random.default_rng(seed)
    h_real = hp - 8  # window-grid overhang, as at the real sizes
    x = jnp.asarray(rng.normal(size=(1, hp, hp, c)) * 0.1, dtype)
    n1 = {"scale": jnp.ones((c,), jnp.float32),
          "bias": jnp.zeros((c,), jnp.float32)}
    ap = {"qkv": {"kernel": jnp.asarray(rng.normal(0, .05, size=(c, 3 * c)),
                                        dtype),
                  "bias": jnp.zeros((3 * c,), jnp.float32)},
          "proj": {"kernel": jnp.asarray(rng.normal(0, .05, size=(c, c)),
                                         dtype),
                   "bias": jnp.zeros((c,), jnp.float32)},
          "cached_bias": jnp.asarray(rng.normal(size=(heads, N, N)),
                                     jnp.float32)}
    mask = jnp.asarray(W.sw_msa_mask(hp, hp, WS, shift)) if shift else None
    return x, n1, ap, mask, h_real


def check_fused_block_attention(hp, c, heads, shift, interpret, label="",
                                int8=False):
    """Compile + execute the fused Swin-block attention kernel at one
    geometry; compare against the unfused jnp path. With int8=True the
    qkv/proj projections run the W8A8 path (ComputeConfig.int8_attn) and
    the tolerance widens to the int8 quantization scale."""
    from birefnet_tpu.ops.pallas import fused_block_attn
    from birefnet_tpu.ops import window as W
    from birefnet_tpu.ops import attention as attn_ops
    from birefnet_tpu.ops import layers as L
    x, n1, ap, mask, h_real = _block_inputs(hp, c, heads, shift)
    if int8:
        from birefnet_tpu.params import quantize_attn_int8
        ap = quantize_attn_int8({"attn": ap}, min_channels=c)["attn"]
        assert ap["qkv"]["kernel_q8"].dtype == jnp.int8
    out = fused_block_attn.fused_window_block_attention(
        x, n1, ap, WS, shift, heads, mask, h_real, h_real,
        interpret=interpret)
    if shift:  # kernel I/O are in rolled coordinates (see its docstring)
        out = W.roll_2d(out, shift, shift)
    got = np.asarray(out[:, :h_real, :h_real], np.float32)
    assert np.isfinite(got).all(), f"{label} produced non-finite values"

    # reference: unfused path on the unrolled tensor
    xu = W.roll_2d(x, shift, shift) if shift else x
    h = L.layer_norm(n1, xu.astype(jnp.float32))
    h = h.at[:, h_real:].set(0.0)
    h = h.at[:, :, h_real:].set(0.0)
    if shift:
        h = W.roll_2d(h, -shift, -shift)
    win = W.window_partition(h, WS)
    qkv = L.linear({k: v.astype(jnp.float32) for k, v in ap["qkv"].items()},
                   win)
    b_, n, _ = qkv.shape
    q5 = qkv.reshape(b_, n, 3, heads, c // heads).transpose(2, 0, 3, 1, 4)
    ref = attn_ops.window_attention(
        q5[0], q5[1], q5[2], ap["cached_bias"],
        mask.astype(jnp.float32) if mask is not None else None)
    ref = ref.transpose(0, 2, 1, 3).reshape(b_, n, c)
    ref = L.linear({k: v.astype(jnp.float32) for k, v in ap["proj"].items()},
                   ref)
    ref = W.window_reverse(ref, WS, hp, hp)
    if shift:
        ref = W.roll_2d(ref, shift, shift)
    ref = np.asarray(ref[:, :h_real, :h_real], np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    tol = 5e-2 if int8 else 2e-2
    assert rel < tol, f"{label} shift={shift}: rel diff {rel}"


@requires_tpu
@pytest.mark.parametrize("shift", [0, 6])
@pytest.mark.parametrize("label,hp,c,heads", BLOCK_GEOMETRIES)
def test_fused_block_attention_compiles(label, hp, c, heads, shift):
    check_fused_block_attention(hp, c, heads, shift, interpret=False,
                                label=label)


@requires_tpu
@pytest.mark.parametrize("shift", [0, 6])
@pytest.mark.parametrize("label,hp,c,heads",
                         [g for g in BLOCK_GEOMETRIES if g[2] >= 768])
def test_int8_block_attention_compiles(label, hp, c, heads, shift):
    """W8A8 qkv/proj variant (ComputeConfig.int8_attn) at the wide-stage
    geometries it ships at: i8 x i8 -> i32 dots must lower on Mosaic
    inside the strip-reading block kernel."""
    check_fused_block_attention(hp, c, heads, shift, interpret=False,
                                label=label, int8=True)


# Geometries whose pad slack (8) covers ws - shift (6): the model runs
# these shifted blocks through the roll-free OFFSET partition
# (window.py::sw_msa_mask_offset, models/swin.py flash path).
OFFSET_GEOMETRIES = [
    ("full-st0", 264, 192, 6),
    ("full-st2", 72, 768, 24),
    ("half-st1", 72, 384, 12),
    ("half-st3", 24, 1536, 48),
]


def check_offset_block_attention(hp, c, heads, interpret, label=""):
    """Compile + execute the fused kernel in roll-free offset mode
    (origin=ws-shift, shift=0, rolled-grid mask); reference = the unfused
    cyclic-roll path."""
    from birefnet_tpu.ops.pallas import fused_block_attn
    from birefnet_tpu.ops import window as W
    from birefnet_tpu.ops import attention as attn_ops
    from birefnet_tpu.ops import layers as L
    shift = WS // 2
    p0 = WS - shift
    _, n1, ap, _, h_real = _block_inputs(hp, c, heads, shift)
    rng = np.random.default_rng(1)
    x_real = jnp.asarray(rng.normal(size=(1, h_real, h_real, c)) * 0.1,
                         jnp.bfloat16)
    x_off = jnp.pad(x_real, ((0, 0), (p0, hp - h_real - p0),
                             (p0, hp - h_real - p0), (0, 0)))
    mask_off = jnp.asarray(W.sw_msa_mask_offset(hp, hp, WS, shift))
    out = fused_block_attn.fused_window_block_attention(
        x_off, n1, ap, WS, 0, heads, mask_off, h_real, h_real,
        interpret=interpret, origin=p0)
    got = np.asarray(out[:, p0:p0 + h_real, p0:p0 + h_real], np.float32)
    assert np.isfinite(got).all(), f"{label} offset produced non-finite"

    # cyclic-roll reference, unfused
    xp = W.pad_to_multiple(x_real, WS)
    h = L.layer_norm(n1, xp.astype(jnp.float32))
    h = h.at[:, h_real:].set(0.0)
    h = h.at[:, :, h_real:].set(0.0)
    h = W.roll_2d(h, -shift, -shift)
    win = W.window_partition(h, WS)
    qkv = L.linear({k: v.astype(jnp.float32) for k, v in ap["qkv"].items()},
                   win)
    b_, n, _ = qkv.shape
    q5 = qkv.reshape(b_, n, 3, heads, c // heads).transpose(2, 0, 3, 1, 4)
    mask_cyc = jnp.asarray(W.sw_msa_mask(hp, hp, WS, shift))
    ref = attn_ops.window_attention(q5[0], q5[1], q5[2], ap["cached_bias"],
                                    mask_cyc)
    ref = ref.transpose(0, 2, 1, 3).reshape(b_, n, c)
    ref = L.linear({k: v.astype(jnp.float32) for k, v in ap["proj"].items()},
                   ref)
    ref = W.window_reverse(ref, WS, hp, hp)
    ref = W.roll_2d(ref, shift, shift)
    ref = np.asarray(ref[:, :h_real, :h_real], np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, f"{label} offset: rel diff {rel}"


@requires_tpu
@pytest.mark.parametrize("label,hp,c,heads", OFFSET_GEOMETRIES)
def test_offset_block_attention_compiles(label, hp, c, heads):
    check_offset_block_attention(hp, c, heads, interpret=False, label=label)


@requires_tpu
@pytest.mark.parametrize("h,c", [(256, 192), (128, 384), (64, 768),
                                 (32, 1536), (128, 192), (64, 384),
                                 (32, 768), (16, 1536)])
def test_fused_mlp_compiles(h, c):
    """Compile + execute the fused MLP kernel at every shipping token/C
    geometry (full and half scale)."""
    from birefnet_tpu.ops.pallas import fused_mlp
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, h, h, c)) * 0.1, jnp.bfloat16)
    n2 = {"scale": jnp.ones((c,), jnp.float32),
          "bias": jnp.zeros((c,), jnp.float32)}
    mlp = {"fc1": {"kernel": jnp.asarray(
                       rng.normal(0, .05, size=(c, 4 * c)), jnp.bfloat16),
                   "bias": jnp.zeros((4 * c,), jnp.float32)},
           "fc2": {"kernel": jnp.asarray(
                       rng.normal(0, .05, size=(4 * c, c)), jnp.bfloat16),
                   "bias": jnp.zeros((c,), jnp.float32)}}
    out = fused_mlp.fused_mlp_residual(x, n2, mlp, interpret=False)
    assert out is not None, f"no legal tile for ({h},{c})"
    got = np.asarray(out, np.float32)
    assert np.isfinite(got).all()
    # reference: x + fc2(gelu_erf(fc1(LN(x))))
    from birefnet_tpu.ops import layers as L
    hn = L.layer_norm(n2, x.astype(jnp.float32))
    hid = jax.nn.gelu(hn @ mlp["fc1"]["kernel"].astype(jnp.float32)
                      + mlp["fc1"]["bias"], approximate=False)
    ref = np.asarray(
        x.astype(jnp.float32)
        + hid @ mlp["fc2"]["kernel"].astype(jnp.float32)
        + mlp["fc2"]["bias"], np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, f"({h},{c}): rel diff {rel}"


@requires_tpu
@pytest.mark.parametrize("h,c", [(72, 768), (36, 1536), (36, 768),
                                 (18, 1536)])
def test_int8_mlp_compiles(h, c):
    """Compile + execute the W8A8 int8 MLP kernel at the wide-stage
    geometries it ships at (ComputeConfig.int8_mlp: Swin-L stages 2/3,
    full + half scale, batch 2 — window-padded grids 72/36/18).

    int8 dots must lower on Mosaic (i8 x i8 -> i32 MXU) and the
    per-token quantize error must stay at the expected scale."""
    from birefnet_tpu.ops.pallas import fused_mlp
    from birefnet_tpu.params import quantize_mlp_int8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, h, c)) * 0.1, jnp.bfloat16)
    n2 = {"scale": jnp.ones((c,), jnp.float32),
          "bias": jnp.zeros((c,), jnp.float32)}
    mlp = {"fc1": {"kernel": jnp.asarray(
                       rng.normal(0, .05, size=(c, 4 * c)), jnp.float32),
                   "bias": jnp.zeros((4 * c,), jnp.float32)},
           "fc2": {"kernel": jnp.asarray(
                       rng.normal(0, .05, size=(4 * c, c)), jnp.float32),
                   "bias": jnp.zeros((c,), jnp.float32)}}
    qmlp = quantize_mlp_int8({"mlp": mlp})["mlp"]
    assert qmlp["fc1"]["kernel_q8"].dtype == jnp.int8
    out = fused_mlp.fused_mlp_residual(x, n2, qmlp, interpret=False)
    assert out is not None, f"no legal tile for ({h},{c})"
    got = np.asarray(out, np.float32)
    assert np.isfinite(got).all()
    from birefnet_tpu.ops import layers as L
    hn = L.layer_norm(n2, x.astype(jnp.float32))
    hid = jax.nn.gelu(hn @ mlp["fc1"]["kernel"] + mlp["fc1"]["bias"],
                      approximate=False)
    ref = np.asarray(
        x.astype(jnp.float32) + hid @ mlp["fc2"]["kernel"]
        + mlp["fc2"]["bias"], np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 5e-2, f"({h},{c}): rel diff {rel}"


@requires_tpu
@pytest.mark.parametrize("b_,heads,masked", [(484, 6, True), (484, 6, False),
                                             (121, 12, True), (36, 24, True),
                                             (9, 48, False)])
def test_flash_qkv_compiles(b_, heads, masked):
    """Compile + execute the packed-qkv flash kernel (API-parity path) at
    the real Swin window shapes, incl. the (484, 6, 144, 32) headline shape
    (reference: examples/bench_flash_attn.rs)."""
    from birefnet_tpu.ops.pallas import flash_window_attn
    rng = np.random.default_rng(0)
    c = heads * 32
    qkv = jnp.asarray(rng.normal(size=(b_, N, 3 * c)) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(heads, N, N)), jnp.bfloat16)
    nw = 484 if b_ == 484 else b_
    mask = (jnp.asarray(rng.integers(0, 2, size=(nw, N, N)) * -100.0,
                        jnp.bfloat16) if masked else None)
    out = flash_window_attn.flash_window_attention_qkv(
        qkv, bias, mask, heads, interpret=False)
    assert out.shape == (b_, N, c)
    assert np.isfinite(np.asarray(out, np.float32)).all()


N7 = 49  # ws=7 presets (swin_t/s; reference: src/swin.rs:27-52)


@requires_tpu
@pytest.mark.parametrize("b_,c,heads,masked",
                         [(128, 96, 3, False), (128, 96, 3, True),
                          (32, 192, 6, True), (8, 384, 12, True),
                          (2, 768, 24, False)])
def test_flash_qkv_ws7_compiles(b_, c, heads, masked):
    """MIDDLE tier (round 4): the packed-qkv kernel at the ws=7 presets'
    N=49 geometries — Mosaic-legal and parity-checked vs the unfused
    HIGHEST-precision core (first verified worker job_012/013)."""
    from birefnet_tpu.ops.pallas import flash_window_attn
    rng = np.random.default_rng(0)
    d = c // heads
    qkv = jnp.asarray(rng.normal(size=(b_, N7, 3 * c)) * 0.3, jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(heads, N7, N7)) * 0.1, jnp.bfloat16)
    nw = min(b_, 4)
    mask = (jnp.asarray(rng.integers(0, 2, size=(nw, N7, N7)) * -100.0,
                        jnp.bfloat16) if masked else None)
    out = np.asarray(flash_window_attn.flash_window_attention_qkv(
        qkv, bias, mask, heads, interpret=False), np.float32)
    assert out.shape == (b_, N7, c) and np.isfinite(out).all()
    # unfused f32 reference
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    def hs(t):
        return t.reshape(b_, N7, heads, d).transpose(0, 2, 1, 3)
    qh, kh, vh = map(hs, (q, k, v))
    s = jnp.einsum("bhnd,bhmd->bhnm", qh * d ** -0.5, kh,
                   precision=jax.lax.Precision.HIGHEST)
    s = s + bias.astype(jnp.float32)[None]
    if mask is not None:
        s = s.reshape(b_ // nw, nw, heads, N7, N7) \
            + mask.astype(jnp.float32)[None, :, None]
        s = s.reshape(b_, heads, N7, N7)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhnm,bhmd->bhnd", p, vh,
                     precision=jax.lax.Precision.HIGHEST)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(b_, N7, c))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, f"rel diff {rel}"


@requires_tpu
def test_fused_mlp_ws7_c96_compiles():
    """MIDDLE tier: the fused MLP at the swin_t stage-0 channel width."""
    from birefnet_tpu.ops.pallas import fused_mlp
    from birefnet_tpu.ops import layers as L
    rng = np.random.default_rng(0)
    c = 96
    x = jnp.asarray(rng.normal(size=(1, 56, 56, c)) * 0.1, jnp.bfloat16)
    n2 = {"scale": jnp.ones((c,), jnp.float32),
          "bias": jnp.zeros((c,), jnp.float32)}
    mlp = {"fc1": {"kernel": jnp.asarray(
                       rng.normal(0, .05, size=(c, 4 * c)), jnp.bfloat16),
                   "bias": jnp.zeros((4 * c,), jnp.float32)},
           "fc2": {"kernel": jnp.asarray(
                       rng.normal(0, .05, size=(4 * c, c)), jnp.bfloat16),
                   "bias": jnp.zeros((c,), jnp.float32)}}
    out = fused_mlp.fused_mlp_residual(x, n2, mlp, interpret=False)
    assert out is not None
    got = np.asarray(out, np.float32)
    hn = L.layer_norm(n2, x.astype(jnp.float32))
    hid = jax.nn.gelu(hn @ mlp["fc1"]["kernel"].astype(jnp.float32)
                      + mlp["fc1"]["bias"], approximate=False)
    ref = np.asarray(
        x.astype(jnp.float32)
        + hid @ mlp["fc2"]["kernel"].astype(jnp.float32)
        + mlp["fc2"]["bias"], np.float32)
    assert np.isfinite(got).all()
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2, f"rel diff {rel}"


@requires_tpu
def test_f32_kernel_precision_gate():
    """f32 PRECISION gate (round 4): Mosaic's DEFAULT f32 dot is a single
    bf16 pass (~1e-2 rel — worker job_014/015); every kernel dot must pass
    precision=HIGHEST for f32 operands. This test fails at ~1e-2 if the
    precision plumbing regresses, and passes at f32 roundoff (~1e-6) with
    it in place."""
    from birefnet_tpu.ops.pallas import flash_window_attn, fused_mlp
    from birefnet_tpu.ops import layers as L
    rng = np.random.default_rng(0)

    # packed-qkv at the C=96 shape where the defect was first seen
    b_, c, heads = 32, 96, 3
    d = c // heads
    qkv = jnp.asarray(rng.standard_normal((b_, N7, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, N7, N7)) * 0.1,
                       jnp.float32)
    out = np.asarray(flash_window_attn.flash_window_attention_qkv(
        qkv, bias, None, heads, interpret=False), np.float64)
    q, k, v = np.split(np.asarray(qkv, np.float64), 3, axis=-1)
    def hs(t):
        return t.reshape(b_, N7, heads, d).transpose(0, 2, 1, 3)
    qh, kh, vh = map(hs, (q, k, v))
    s = (qh * d ** -0.5) @ kh.swapaxes(-1, -2) \
        + np.asarray(bias, np.float64)[None]
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = (p @ vh).transpose(0, 2, 1, 3).reshape(b_, N7, c)
    err = np.abs(out - ref).max()
    assert err < 1e-4, f"packed-qkv f32 lost precision: max|err| {err}"

    # fused MLP f32 at C=192
    c = 192
    x = jnp.asarray(rng.standard_normal((1, 24, 24, c)) * 0.5, jnp.float32)
    n2 = {"scale": jnp.ones((c,), jnp.float32),
          "bias": jnp.zeros((c,), jnp.float32)}
    mlp = {"fc1": {"kernel": jnp.asarray(
                       rng.normal(0, .05, size=(c, 4 * c)), jnp.float32),
                   "bias": jnp.zeros((4 * c,), jnp.float32)},
           "fc2": {"kernel": jnp.asarray(
                       rng.normal(0, .05, size=(4 * c, c)), jnp.float32),
                   "bias": jnp.zeros((c,), jnp.float32)}}
    got = fused_mlp.fused_mlp_residual(x, n2, mlp, interpret=False)
    assert got is not None
    hn = L.layer_norm(n2, x)
    hid = jax.nn.gelu(
        jnp.einsum("bhwc,cd->bhwd", hn, mlp["fc1"]["kernel"],
                   precision=jax.lax.Precision.HIGHEST)
        + mlp["fc1"]["bias"], approximate=False)
    ref = x + jnp.einsum("bhwd,dc->bhwc", hid, mlp["fc2"]["kernel"],
                         precision=jax.lax.Precision.HIGHEST) \
        + mlp["fc2"]["bias"]
    err = np.abs(np.asarray(got, np.float64)
                 - np.asarray(ref, np.float64)).max()
    assert err < 1e-4, f"fused MLP f32 lost precision: max|err| {err}"

    # fused block kernel f32 at a small ws=12 geometry: flash vs unfused
    # (pre-fix this diverged at 9.6e-3 — worker job_015/017)
    from birefnet_tpu.configs import ComputeConfig
    from birefnet_tpu.models import swin as bswin
    c, heads = 192, 6
    n = 144
    def rp(*shape):
        return jnp.asarray(rng.normal(0, .05, size=shape), jnp.float32)
    bp = {"norm1": {"scale": 1.0 + rp(c), "bias": rp(c)},
          "norm2": {"scale": 1.0 + rp(c), "bias": rp(c)},
          "attn": {"qkv": {"kernel": rp(c, 3 * c), "bias": rp(3 * c)},
                   "proj": {"kernel": rp(c, c), "bias": rp(c)},
                   "cached_bias": rp(heads, n, n)},
          "mlp": {"fc1": {"kernel": rp(c, 4 * c), "bias": rp(4 * c)},
                  "fc2": {"kernel": rp(4 * c, c), "bias": rp(c)}}}
    xb = jnp.asarray(rng.standard_normal((2, 24, 24, c)) * 0.5, jnp.float32)
    of = bswin.swin_block_forward(bp, xb, 12, 0, heads, None,
                                  ComputeConfig(use_flash_attention=True))
    op = bswin.swin_block_forward(bp, xb, 12, 0, heads, None,
                                  ComputeConfig())
    err = np.abs(np.asarray(of, np.float64)
                 - np.asarray(op, np.float64)).max()
    assert err < 1e-4, f"fused block f32 lost precision: max|err| {err}"


@requires_tpu
@pytest.mark.parametrize("h,c", [(256, 192), (128, 384), (64, 768),
                                 (32, 1536), (128, 192), (64, 384),
                                 (32, 768), (16, 1536),
                                 (56, 96)])  # swin_t s0 (middle tier)
def test_row_ln_compiles(h, c):
    """Compile + execute the Pallas row-LN (stage-output norms,
    models/swin.py) at every full/half-scale stage geometry."""
    from birefnet_tpu.ops.pallas import row_ln
    from birefnet_tpu.ops import layers as L
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, h, c)) * 0.5, jnp.bfloat16)
    params = {"scale": jnp.asarray(rng.normal(1, .1, size=(c,)), jnp.float32),
              "bias": jnp.asarray(rng.normal(0, .1, size=(c,)), jnp.float32)}
    got = np.asarray(row_ln.layer_norm_rows(params, x, interpret=False),
                     np.float32)
    ref = np.asarray(L.layer_norm(params, x.astype(jnp.float32)), np.float32)
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() < 2e-2


@requires_tpu
def test_swin_t_ws7_runs_on_tpu_with_flash_requested():
    """A non-L preset (ws=7) with flash REQUESTED must run on the TPU.
    Round 4: this now exercises the MIDDLE tier (partitioned windows +
    packed-qkv flash core + fused MLP — swin_forward's geometry guard;
    the strip-reading block kernel stays ws=12-only, its ws=7 Mosaic
    shape-cast failure measured 2026-08-18). Parity vs the unfused f32
    path is asserted per stage."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_swin_standalone import init_swin_params
    from birefnet_tpu.configs import SwinConfig, ComputeConfig
    from birefnet_tpu.models import swin as bswin

    cfg = SwinConfig.swin_t()
    params = init_swin_params(cfg, seed=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (1, 128, 128, 3)), jnp.bfloat16)
    compute = ComputeConfig(dtype=jnp.bfloat16, use_flash_attention=True)
    outs = jax.jit(lambda p, t: bswin.swin_forward(p, cfg, t, compute))(
        params, x)
    ref = bswin.swin_forward(params, cfg, x.astype(jnp.float32),
                             ComputeConfig())
    for i, (o, r) in enumerate(zip(outs, ref)):
        o = np.asarray(o, np.float32)
        r = np.asarray(r, np.float32)
        rel = np.abs(o - r).max() / (np.abs(r).max() + 1e-9)
        assert np.isfinite(o).all()
        assert rel < 2e-2, f"stage {i}: rel {rel}"


@requires_tpu
@pytest.mark.parametrize("size,b", [(1024, 2), (512, 1)])
def test_tap_conv_compiles(size, b):
    """Compile + execute the tap-accumulation conv (folded ipt1 5x5 head,
    models/decoder.py::_composed_pair_conv) at full-resolution geometry."""
    from birefnet_tpu.ops.pallas import tap_conv
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, size, size, 3)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, .1, size=(5, 5, 3, 1)), jnp.float32)
    bias = jnp.asarray([0.2], jnp.float32)
    got = np.asarray(tap_conv.tap_conv_same(x, k, bias, interpret=False),
                     np.float32)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0] + 0.2
    ref = np.asarray(ref, np.float32)
    assert got.shape == (b, size, size)
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() < 2e-2
