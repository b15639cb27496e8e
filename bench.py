#!/usr/bin/env python
"""Headline benchmark: BiRefNet Swin-L images/sec/chip at 1024x1024.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline is measured-throughput / 150 img/s/chip (the BASELINE.md target for
TPU v5e bf16; the reference publishes no numbers of its own — see BASELINE.md).

The benchmark measures the fully fused pipeline (uint8 in -> uint8 mask out,
preprocess + both backbone passes + decoder + postprocess in one jitted
program), mirroring the reference's bench_inference end-to-end shape
(reference: examples/bench_inference.rs) but with device-side pre/post.

Env overrides: BENCH_BATCH (default 2), BENCH_SIZE (default 1024),
BENCH_DTYPE (bfloat16|float32), BENCH_ITERS (default 360),
BENCH_FLASH / BENCH_PALLAS_DEFORM (default 1 on TPU),
BENCH_DEFORM_MODE (regular|deformable|deformable-local|auto — auto probes
max|offset| on the bench batch and dispatches each site's calibrated local
kernel), BENCH_INT8_MLP (1 = selective W8A8 MLP at the wide stages).
"""

import json
import os
import sys
import time

import numpy as np


def _ensure_tpu_or_reexec(max_attempts: int = 8) -> None:
    """The TPU claim through this environment's relay is sporadically refused
    at process start; backend registration is once-per-process, so on failure
    we re-exec ourselves after a pause."""
    import jax
    try:
        jax.devices()
        return
    except RuntimeError as e:
        attempt = int(os.environ.get("BENCH_TPU_ATTEMPT", "0"))
        if attempt >= max_attempts:
            raise
        print(f"[bench] TPU init failed ({e}); retry {attempt + 1}",
              file=sys.stderr)
        time.sleep(30)
        os.environ["BENCH_TPU_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> int:
    batch = int(os.environ.get("BENCH_BATCH", "2"))
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    # In-flight width: the single fence's ~28 ms tunnel round trip amortizes
    # over the queue (measured: n=40 -> 37.19, n=80 -> 37.43, n=120 ->
    # 37.56 img/s, round 3c; n=240 -> 37.66, n=360 -> 37.69 at 37.79
    # device-busy, round-4 worker job_022 — ~76 s/measured run at 360).
    iters = int(os.environ.get("BENCH_ITERS", "360"))

    import jax
    _ensure_tpu_or_reexec()
    import jax.numpy as jnp
    # Persistent compile cache: the full-model XLA compile is expensive in
    # this environment; cache hits make repeat bench runs fast.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import birefnet_tpu as bt
    from birefnet_tpu import pipeline

    on_tpu = jax.default_backend() == "tpu"
    use_flash = os.environ.get("BENCH_FLASH", "1") == "1" and on_tpu
    use_pallas_deform = (
        os.environ.get("BENCH_PALLAS_DEFORM", "1") == "1" and on_tpu)
    # "regular" matches the candle CPU reference the MAE baseline compares
    # against (see ComputeConfig.deform_mode); "deformable" is the faithful
    # Metal-path semantics and is gather-bound on TPU.
    deform_mode = os.environ.get("BENCH_DEFORM_MODE", "regular")

    # Selective W8A8 MLP at the wide stages (ComputeConfig.int8_mlp).
    # DEFAULT ON for the headline (round 5): it passes the pinned
    # BASELINE.md accuracy gate with ~18x margin (adds max 6.1e-5 /
    # mean 4.6e-8 to the mask on top of the bf16 control, whose own
    # gate error is 1.765e-4 MAE vs f32 — worker job_008) and lifts the
    # measured headline 52.92 -> 47.66 ms/b2 device-busy (1.11x). The
    # JSON records int8_mlp so the row is never mistaken for pure bf16;
    # BENCH_INT8_MLP=0 reproduces the bf16-only control.
    int8_mlp = os.environ.get("BENCH_INT8_MLP", "1" if on_tpu else "0") == "1"
    # Same scheme on the attention qkv/proj projections (the other 1/3 of
    # the wide-stage block MACs); measured record in ROADMAP round 5.
    int8_attn = os.environ.get(
        "BENCH_INT8_ATTN", "1" if on_tpu else "0") == "1"

    cfg = bt.BiRefNetConfig.swin_l()
    compute = bt.ComputeConfig(
        dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
        use_flash_attention=use_flash,
        use_pallas_deform=use_pallas_deform,
        # "auto" is resolved below (calibrate.py) once the bench frames
        # exist; the placeholder matches serve.py's --deform-mode auto.
        deform_mode="deformable" if deform_mode == "auto" else deform_mode,
        unroll_deep_stage=os.environ.get("BENCH_UNROLL", "1") == "1" and on_tpu,
        int8_mlp=int8_mlp,
        int8_attn=int8_attn,
    )

    print(f"[bench] backend={jax.default_backend()} batch={batch} "
          f"size={size} dtype={dtype_name} flash={use_flash} "
          f"pallas_deform={use_pallas_deform} deform_mode={deform_mode} "
          f"int8_mlp={int8_mlp} int8_attn={int8_attn}", file=sys.stderr)

    params = bt.init_params(cfg, seed=0)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(batch, size, size, 3), dtype=np.uint8))

    site_radii = None
    if deform_mode == "auto":
        # Runtime offset-radius calibration (calibrate.py): one exact
        # forward probes max|offset| at all 20 deformable sites, then
        # each site compiles as deformable-local at its OWN ceil(max)+1
        # radius (sites over the cap keep exact sampling individually) —
        # exact for the probed data, at MXU-sampling speed (serve.py
        # --deform-mode auto is the serving analog).
        from birefnet_tpu import calibrate
        compute, maxima, site_radii = calibrate.auto_deform_compute(
            params, cfg, frames, compute)
        print(f"[bench] auto deform: probed max|offset| "
              f"max={maxima.max():.2f}px median={np.median(maxima):.2f}px"
              f" -> {compute.deform_mode} site_radii={site_radii}",
              file=sys.stderr)

    staged = os.environ.get("BENCH_STAGED", "1") == "1"
    t0 = time.time()
    if staged:
        # The monolithic 1024^2 program exceeds what this environment's
        # remote-compile service can build; the staged path compiles in
        # minutes with negligible steady-state cost (see staged.py).
        # BENCH_AOT=1 (default): AOT-warm the units at construction and
        # persist the compiled executables (staged.make_staged_infer_fn
        # aot_dir) so later runs skip trace+lower+compile entirely.
        from birefnet_tpu import staged as staged_mod
        aot = os.environ.get("BENCH_AOT", "1") == "1"
        infer = staged_mod.make_staged_infer_fn(
            params, cfg, compute,
            warmup_batch=batch if aot else None,
            aot_dir=os.environ.get("BENCH_AOT_DIR", ".jax_cache/aot")
            if aot else None)
        if aot:
            print(f"[bench] AOT units loaded from disk: "
                  f"{infer._aot['loaded_from_disk']}", file=sys.stderr)
    else:
        infer = pipeline.make_infer_fn(params, cfg, compute)

    out = infer(frames)
    _ = np.asarray(out)  # real completion fence (readback)
    print(f"[bench] compile+first run: {time.time() - t0:.1f}s "
          f"out={out.shape} {out.dtype}", file=sys.stderr)

    # Throughput methodology: enqueue `iters` independent inference calls
    # (the serving pattern — many requests in flight), then fence with ONE
    # scalar readback that depends on every output. block_until_ready is not
    # a reliable fence through this environment's device tunnel, and bulk
    # mask readback runs at ~20 MB/s through it (a tunnel artifact that a
    # real TPU host does not have), so masks stay on device and the fence is
    # a sum over all of them. Measured dispatch model (round 3): host
    # enqueue (~3.3 ms/iter) fully OVERLAPS device execution; the scalar
    # fence costs one ~28 ms tunnel round trip per measured run, so
    # steady-state throughput needs enough in-flight iters to amortize it
    # (n=10 -> 59.4 ms/iter vs n=40 -> 56.9 at 56.05 device-busy).
    fence = jax.jit(lambda outs: sum(jnp.sum(o.astype(jnp.uint32))
                                     for o in outs))

    def run_pipelined(n):
        outs = [infer(frames) for _ in range(n)]
        return int(fence(outs))

    run_pipelined(iters)  # compile the fence at the measured width
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_pipelined(iters)
        reps.append((time.perf_counter() - t0) / iters)
    median = sorted(reps)[len(reps) // 2]
    imgs_per_sec = batch / median

    print(f"[bench] per-iter over {iters} chained: best={min(reps) * 1e3:.1f}ms "
          f"median={median * 1e3:.1f}ms -> {imgs_per_sec:.2f} img/s",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"images/sec/chip at {size}x{size} Swin-L {dtype_name}",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / 150.0, 4),
        # regular = candle-CPU semantics (offsets ignored), the MAE baseline's
        # reference behavior; "deformable" (faithful sampling) is slower —
        # see BENCH_DEFORM_MODE and ROADMAP.md.
        "deform_mode": deform_mode,
        # The mode the run actually compiled (differs from deform_mode
        # when "auto" resolved — a null site_radii under auto then means
        # every probed site exceeded the cap and the run took the slow
        # exact path, distinguishable from a misconfiguration).
        "resolved_deform_mode": compute.deform_mode,
        # set when deform_mode=auto resolved to per-site local radii
        # (null entries = that site kept exact sampling)
        "calibrated_site_radii": (list(site_radii)
                                  if site_radii is not None else None),
        "int8_mlp": int8_mlp,
        "int8_attn": int8_attn,
        "batch": batch,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
