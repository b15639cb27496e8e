#!/usr/bin/env python
"""High-resolution (2048x2048) variant benchmark.

BASELINE.json config: "High-res variant: BiRefNet-HR/matting checkpoints at
2048x2048, activations sharded across a v5e-8 mesh". On a multi-chip mesh
this uses parallel.make_sharded_infer_fn (batch + spatial H sharding); on a
single chip it measures the unsharded staged path.

Env: BENCH_HR_SIZE (2048), BENCH_HR_BATCH (2), BENCH_DEFORM_MODE (regular).
Batch default measured round 4 (worker job_005): b2 8.78 img/s device-busy
vs b1 8.50 — the same b1->b2 pipelining gain as at 1024^2; fits HBM.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from benchmarks.common import ensure_tpu_or_reexec  # noqa: E402


def main():
    ensure_tpu_or_reexec()
    import jax
    import jax.numpy as jnp
    import birefnet_tpu as bt
    from birefnet_tpu import staged
    from birefnet_tpu.parallel import mesh as pmesh, sharding as pshard

    size = int(os.environ.get("BENCH_HR_SIZE", "2048"))
    batch = int(os.environ.get("BENCH_HR_BATCH", "2"))
    mode = os.environ.get("BENCH_DEFORM_MODE", "regular")

    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(size, size))
    on_tpu = jax.default_backend() == "tpu"
    compute = bt.ComputeConfig(
        dtype=jnp.bfloat16, use_flash_attention=on_tpu,
        use_pallas_deform=on_tpu, deform_mode=mode)
    params = bt.init_params(cfg, seed=0)
    n_dev = len(jax.devices())

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(batch, size, size, 3), dtype=np.uint8))

    if n_dev > 1:
        mesh = pmesh.make_mesh(n_dev, spatial=2 if n_dev % 2 == 0 else 1)
        infer = pshard.make_sharded_infer_fn(mesh, params, cfg, compute)
        label = f"{dict(zip(mesh.axis_names, mesh.devices.shape))} mesh"
    else:
        infer = staged.make_staged_infer_fn(params, cfg, compute)
        label = "single chip"

    fence = jax.jit(lambda outs: sum(jnp.sum(o.astype(jnp.uint32))
                                     for o in outs))

    def run(n):
        outs = [infer(frames) for _ in range(n)]
        return int(fence(outs))

    t0 = time.time()
    run(16)
    print(f"[bench_hr] {label} size={size} batch={batch} mode={mode} "
          f"compile+warm {time.time() - t0:.1f}s", file=sys.stderr)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(16)
        ts.append((time.perf_counter() - t0) / 16)
    t = sorted(ts)[1]
    print(f"HR {size} ({label}): {t * 1e3:.1f} ms/iter -> "
          f"{batch / t:.2f} img/s")


if __name__ == "__main__":
    main()
