#!/usr/bin/env python
"""Backbone-variant benchmark: full BiRefNet on swin_t/s/b (and l).

The reference names the backbone in its config but always instantiates
swin_l (reference: src/birefnet.rs:380-388, src/swin.rs:27-52); here
`BiRefNetConfig.for_backbone` honors the name with config-derived decoder
channels (configs.py). This measures each variant's staged pipeline at the
headline shape so every preset has a hardware throughput row, device-busy
when a profiler trace is available, chained-wall otherwise.

Env: BENCH_VAR_BACKBONES (comma list, default "swin_v1_t,swin_v1_s,swin_v1_b"),
BENCH_VAR_SIZE (1024), BENCH_VAR_BATCH (2), BENCH_VAR_DTYPE (bfloat16).
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from benchmarks.common import device_busy_ms, ensure_tpu_or_reexec  # noqa: E402


def main():
    ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp
    import birefnet_tpu as bt
    from birefnet_tpu import staged

    names = os.environ.get(
        "BENCH_VAR_BACKBONES", "swin_v1_t,swin_v1_s,swin_v1_b").split(",")
    size = int(os.environ.get("BENCH_VAR_SIZE", "1024"))
    batch = int(os.environ.get("BENCH_VAR_BATCH", "2"))
    dtype = (jnp.bfloat16
             if os.environ.get("BENCH_VAR_DTYPE", "bfloat16") == "bfloat16"
             else jnp.float32)
    on_tpu = jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(batch, size, size, 3), dtype=np.uint8))

    for name in names:
        cfg = dataclasses.replace(
            bt.BiRefNetConfig.for_backbone(name.strip()), size=(size, size))
        compute = bt.ComputeConfig(
            dtype=dtype, use_flash_attention=on_tpu,
            use_pallas_deform=on_tpu, deform_mode="regular")
        params = bt.init_params(cfg, seed=0)
        t0 = time.time()
        infer = staged.make_staged_infer_fn(
            params, cfg, compute, warmup_batch=batch)
        out = infer(frames)
        m = np.asarray(out)
        print(f"[{name}] construct+first {time.time() - t0:.1f}s "
              f"out={m.shape} mask_mean={m.mean():.3f}")
        if on_tpu:
            ms = device_busy_ms(infer, frames, iters=6)
            print(f"[{name}] device-busy {ms:.2f} ms/b{batch} = "
                  f"{batch * 1e3 / ms:.2f} img/s")
        del infer, params
    return 0


if __name__ == "__main__":
    sys.exit(main())
