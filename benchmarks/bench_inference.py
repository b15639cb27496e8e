#!/usr/bin/env python
"""Per-stage inference benchmark.

Mirrors the reference's bench_inference example (reference:
examples/bench_inference.rs:38-93): wall-clock for backbone (full scale),
backbone (half scale), squeeze module, decoder, and the end-to-end forward,
at 1x3x1024x1024.

Env: BENCH_SIZE (default 1024), BENCH_DTYPE (bfloat16|float32),
BENCH_FLASH / BENCH_PALLAS_DEFORM (default 1 on TPU).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.common import device_busy_ms, ensure_tpu_or_reexec  # noqa: E402
import birefnet_tpu as bt  # noqa: E402
from birefnet_tpu.models import swin as bswin  # noqa: E402
from birefnet_tpu.models import birefnet as bmodel  # noqa: E402
from birefnet_tpu.models import decoder as bdec  # noqa: E402
from birefnet_tpu.ops.resize import resize_bilinear_align_corners  # noqa


def main():
    ensure_tpu_or_reexec()
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    on_tpu = jax.default_backend() == "tpu"
    compute = bt.ComputeConfig(
        dtype=dtype,
        use_flash_attention=os.environ.get("BENCH_FLASH", "1") == "1" and on_tpu,
        use_pallas_deform=(
            os.environ.get("BENCH_PALLAS_DEFORM", "1") == "1" and on_tpu),
        deform_mode=os.environ.get("BENCH_DEFORM_MODE", "deformable"),
    )
    cfg = bt.BiRefNetConfig.swin_l()
    swin_cfg = cfg.swin_config()
    params = bt.init_params(cfg, seed=0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, size, size, 3)), dtype)

    print(f"backend={jax.default_backend()} size={size} dtype={dtype_name} "
          f"deform_mode={compute.deform_mode} "
          f"flash={compute.use_flash_attention} "
          f"pallas_deform={compute.use_pallas_deform}")

    t = device_busy_ms(
        jax.jit(lambda p, x: bswin.swin_forward(p, swin_cfg, x, compute)),
        params["bb"], x)
    print(f"backbone (full scale) : {t:9.1f} ms")

    x_half = resize_bilinear_align_corners(x, size // 2, size // 2)
    t = device_busy_ms(
        jax.jit(lambda p, x: bswin.swin_forward(p, swin_cfg, x, compute)),
        params["bb"], x_half)
    print(f"backbone (half scale) : {t:9.1f} ms")

    # Squeeze input: 5760 x (size/32)^2 (reference: src/birefnet.rs:56-61).
    g = size // 32
    sq_in = jnp.asarray(rng.normal(size=(1, g, g, cfg.x4_channels())), dtype)
    t = device_busy_ms(
        jax.jit(lambda p, x: bmodel.squeeze_module_forward(p, x, compute)),
        params["squeeze_module"], sq_in)
    print(f"squeeze module        : {t:9.1f} ms")

    lat = cfg.lateral_channels()
    feats = [
        jnp.asarray(rng.normal(size=(1, size // 4, size // 4, lat[0])), dtype),
        jnp.asarray(rng.normal(size=(1, size // 8, size // 8, lat[1])), dtype),
        jnp.asarray(rng.normal(size=(1, size // 16, size // 16, lat[2])), dtype),
        jnp.asarray(rng.normal(size=(1, g, g, lat[3])), dtype),
    ]
    t = device_busy_ms(
        jax.jit(lambda p, x, f1, f2, f3, f4: bdec.decoder_forward(
            p, cfg, x, f1, f2, f3, f4, compute)),
        params["decoder"], x, *feats)
    print(f"decoder               : {t:9.1f} ms")

    from birefnet_tpu import staged
    infer = staged.make_staged_infer_fn(params, cfg, compute)
    frames = jnp.asarray((np.clip(np.asarray(x, np.float32), 0, 1) * 255
                          ).astype(np.uint8))
    t = device_busy_ms(infer, frames) / 1e3
    print(f"TOTAL e2e (staged)    : {t * 1e3:9.1f} ms "
          f"({1.0 / t:.2f} img/s device-busy)")


if __name__ == "__main__":
    main()
