#!/usr/bin/env python
"""Training-step benchmark: full fwd+bwd+AdamW steps/s on the real chip.

The reference is inference-only; this measures the training subsystem
(train.py) with the same methodology as the inference benches: chained
data-dependent steps (the carried TrainState makes every step depend on
the previous one), a loss readback as the fence, and perfetto
device-busy as the authoritative per-step time.

Env: BENCH_SIZE (default 128 — the plain path's on-TPU compile ceiling;
use BENCH_REMAT=1 for larger sizes), BENCH_BATCH (1), BENCH_ACCUM (1),
BENCH_REMAT (0), BENCH_BB_SCALE (1.0), BENCH_ITERS (10).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.common import device_busy_ms, ensure_tpu_or_reexec  # noqa: E402
import birefnet_tpu as bt  # noqa: E402
from birefnet_tpu import pipeline, train  # noqa: E402


def main():
    ensure_tpu_or_reexec()
    import dataclasses

    size = int(os.environ.get("BENCH_SIZE", "128"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    accum = int(os.environ.get("BENCH_ACCUM", "1"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    bb_scale = float(os.environ.get("BENCH_BB_SCALE", "1.0"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    cfg = dataclasses.replace(bt.BiRefNetConfig.swin_l(), size=(size, size))
    compute = train.validate_train_compute(
        bt.ComputeConfig(remat_blocks=remat))
    tcfg = train.TrainConfig(learning_rate=1e-4, accum_steps=accum,
                             backbone_lr_scale=bb_scale)
    step = train.make_train_step(cfg, compute, tcfg)
    state = train.init_train_state(bt.init_params(cfg, seed=0), tcfg)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, size=(batch, size, size, 3),
                                      dtype=np.uint8))
    x = jax.jit(lambda f: pipeline.preprocess(f, cfg.size,
                                              dtype=compute.dtype))(frames)
    yy, xx = np.mgrid[:size, :size]
    labels = jnp.asarray(
        np.broadcast_to((((yy - size // 2) ** 2 + (xx - size // 2) ** 2)
                         < (size // 3) ** 2), (batch, size, size))
        .astype(np.float32))

    print(f"backend={jax.default_backend()} size={size} batch={batch} "
          f"accum={accum} remat={remat} bb_scale={bb_scale}", flush=True)

    t0 = time.time()
    state, metrics = step(state, x, labels)
    l0 = float(metrics["loss"])
    print(f"compile+step1: {time.time() - t0:.1f}s loss {l0:.4f}",
          flush=True)

    # Wall: chained steps (state carry = data dependence), loss readback
    # as the fence.
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, x, labels)
    lN = float(metrics["loss"])
    wall_ms = (time.time() - t0) / iters * 1e3

    # Device-busy (authoritative on this tunnel-latency platform).
    cell = [state]

    def one(x, labels):
        s, m = step(cell[0], x, labels)
        cell[0] = s
        return jnp.reshape(m["loss"], (1,))

    busy_ms = device_busy_ms(one, x, labels, iters=iters)
    print(f"loss {l0:.4f} -> {lN:.4f} over {iters + 1} steps", flush=True)
    print(f"wall+readback {wall_ms:.1f} ms/step | device-busy "
          f"{busy_ms:.1f} ms/step = {batch * 1e3 / busy_ms:.2f} img/s "
          f"trained", flush=True)


if __name__ == "__main__":
    main()
