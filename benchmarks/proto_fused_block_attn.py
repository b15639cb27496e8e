#!/usr/bin/env python
"""PROTOTYPE (round-2 candidate): fully-fused window-block attention.

One Pallas kernel computing qkv matmul + all-heads attention + proj matmul
per window block, so neither the [B_, N, 3C] qkv projection nor the
[B_, N, C] attention output ever round-trips HBM.

Measured on TPU v5e (bf16, device-busy, vs the current packed-qkv path
including its XLA qkv/proj dots):
    stage0 (484 win, 6 heads):  0.86 -> 0.88 ms (0.97x — slightly worse)
    stage1 (121 win, 12 heads): 0.57 -> 0.45 ms (1.27x)
    stage2 ( 36 win, 24 heads): 0.33 -> 0.29 ms (1.14x)
Integrating it selectively for stages 1-2 is worth ~1.2 ms/img (~+0.6 img/s);
stage3 needs weight-VMEM care (qkv W alone is 14MB at C=1536).
Run via the TPU worker (see benchmarks/tpu_worker.py) or adapt main().
"""
import sys, os, glob, gzip, json, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
for m in list(sys.modules):
    if m.startswith("birefnet_tpu"): del sys.modules[m]
from birefnet_tpu.ops.pallas import flash_window_attn as fwa
from birefnet_tpu.ops import layers as L

rng = np.random.default_rng(0)


def fused_block_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                       bias_ref, mask_ref, o_ref, *, heads, d, scale, masked):
    x = x_ref[...]  # [bw, n, C]
    bw, n, c = x.shape
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    attn_out = jnp.zeros((bw, n, c), jnp.float32)
    outs = []
    for h in range(heads):
        q = qkv[:, :, h * d:(h + 1) * d] * scale
        k = qkv[:, :, c + h * d:c + (h + 1) * d]
        v = qkv[:, :, 2 * c + h * d:2 * c + (h + 1) * d]
        extra = bias_ref[h][None].astype(jnp.float32)
        if masked:
            extra = extra + mask_ref[...].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) + extra
        mx = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, -1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype))
    attn = jnp.concatenate(outs, axis=-1)  # [bw, n, C]
    y = jax.lax.dot_general(attn, wproj_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (y + bproj_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads",))
def fused_block(x, wqkv, bqkv, wproj, bproj, bias, mask, heads):
    b_, n, c = x.shape
    d = c // heads
    nw = mask.shape[0]
    cap = max(1, (2 * 1024 * 1024) // (n * 3 * c * 2))
    bw = 1
    for cand in range(1, min(16, cap) + 1):
        if b_ % cand == 0 and nw % cand == 0:
            bw = cand
    period = nw // bw
    return pl.pallas_call(
        functools.partial(fused_block_kernel, heads=heads, d=d,
                          scale=d ** -0.5, masked=True),
        out_shape=jax.ShapeDtypeStruct((b_, n, c), x.dtype),
        grid=(b_ // bw,),
        in_specs=[
            pl.BlockSpec((bw, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, n, n), lambda i: (i % period, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bw, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, wqkv, bqkv, wproj, bproj, bias, mask)


def busy(fn, *args, n=6):
    _ = np.asarray(fn(*args)[:1, :1, :1])
    logdir = "/tmp/trace_fb"; os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    outs = [fn(*args) for _ in range(n)]
    _ = np.asarray(outs[-1][:1, :1, :1])
    jax.profiler.stop_trace()
    f = glob.glob(f"{logdir}/**/perfetto_trace.json.gz", recursive=True)[0]
    with gzip.open(f) as fh:
        data = json.load(fh)
    ev = data["traceEvents"] if isinstance(data, dict) else data
    pids = {e["pid"] for e in ev if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")}
    return sum(e.get("dur", 0) for e in ev if e.get("ph") == "X"
               and e.get("pid") in pids
               and e.get("name", "").startswith("jit")) / 1e3 / n


for b_, heads in ((484, 6), (121, 12), (36, 24)):
    n, d = 144, 32
    c = heads * d
    x = jnp.asarray(rng.normal(size=(b_, n, c)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(0, 0.05, size=(c, 3 * c)), jnp.bfloat16)
    bqkv = jnp.asarray(rng.normal(size=(3 * c,)), jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(0, 0.05, size=(c, c)), jnp.bfloat16)
    bproj = jnp.asarray(rng.normal(size=(c,)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(heads, n, n)), jnp.bfloat16)
    mask = jnp.asarray(rng.integers(0, 2, size=(b_, n, n)) * -100.0, jnp.bfloat16)

    # reference: current path = XLA qkv dot + packed kernel + XLA proj dot
    def current(x):
        qkv = L.linear({"kernel": wqkv, "bias": bqkv}, x)
        o = fwa.flash_window_attention_qkv(qkv, bias, mask, heads)
        return L.linear({"kernel": wproj, "bias": bproj}, o)
    cur = jax.jit(current)

    try:
        a = np.asarray(cur(x), np.float32)
        b = np.asarray(fused_block(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                   heads), np.float32)
        diff = np.abs(a - b).max()
        t_cur = busy(cur, x)
        t_fused = busy(lambda t: fused_block(t, wqkv, bqkv, wproj, bproj,
                                             bias, mask, heads), x)
        print(f"B_={b_:3d} h={heads:2d}: current {t_cur:6.3f} ms  "
              f"fused {t_fused:6.3f} ms  ({t_cur / t_fused:4.2f}x)  "
              f"maxdiff {diff:.4f}")
    except Exception as e:
        print(f"B_={b_:3d} h={heads:2d}: FAIL {str(e)[:140]}")
