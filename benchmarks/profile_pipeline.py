#!/usr/bin/env python
"""Per-unit / per-op device-busy profile of the staged pipeline.

The round-3 optimization loop ran this attribution by hand for every
experiment (ROADMAP round-3 sessions); this productizes it. Prints each jit
unit's device-busy ms/call and its top ops, from a perfetto trace (wall
clocks carry tunnel latency here — see benchmarks/common.py).

Usage: python benchmarks/profile_pipeline.py [--batch 2] [--size 1024]
           [--dtype bfloat16] [--iters 6] [--top 15]
Env: same knobs as bench.py (BENCH_DEFORM_MODE etc. are NOT read — flags only).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--deform-mode", default="regular")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--unroll", action="store_true",
                    help="unroll the deep stage (bench.py's TPU default)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from common import ensure_tpu_or_reexec
    ensure_tpu_or_reexec()
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import birefnet_tpu as bt
    from birefnet_tpu import staged
    from birefnet_tpu.utils.profiling import device_op_profile

    on_tpu = jax.default_backend() == "tpu"
    cfg = bt.BiRefNetConfig.swin_l()
    compute = bt.ComputeConfig(
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        use_flash_attention=on_tpu,
        deform_mode=args.deform_mode,
        unroll_deep_stage=args.unroll and on_tpu,
    )
    params = bt.init_params(cfg, seed=0)
    infer = staged.make_staged_infer_fn(params, cfg, compute,
                                        warmup_batch=args.batch)
    frames = jnp.zeros((args.batch, args.size, args.size, 3), jnp.uint8)

    units, ops = device_op_profile(infer, frames, iters=args.iters)
    total = sum(units.values())
    for unit in sorted(units, key=units.get, reverse=True):
        print(f"===== {unit}: {units[unit]:.3f} ms/call =====")
        for ms, n, op in ops.get(unit, [])[:args.top]:
            print(f"  {ms:8.3f} x{n:6.1f}  {op[:100]}")
    print(f"TOTAL {total:.3f} ms/call -> "
          f"{args.batch * 1e3 / total:.2f} img/s device-busy")
    return 0


if __name__ == "__main__":
    sys.exit(main())
