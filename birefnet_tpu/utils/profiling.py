"""Profiling and observability helpers.

The reference's observability is `Instant` spans with read-back syncs and
min/max/mean printouts (reference: examples/bench_inference.rs:9-12,
examples/infer_image.rs:79-90). TPU-native equivalents: `jax.profiler` traces
for the real picture, readback-fenced wall-clock spans for quick numbers, and
the same stats printout (the de-facto health check for a correct port).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

import numpy as np
import jax

log = logging.getLogger("birefnet_tpu")


def tensor_stats(x: jax.Array, name: str = "tensor") -> Dict[str, float]:
    """min/max/mean health-check stats (reference:
    examples/infer_image.rs:79-90)."""
    xf = np.asarray(x, dtype=np.float32)
    stats = {"min": float(xf.min()), "max": float(xf.max()),
             "mean": float(xf.mean())}
    log.info("%s stats - min: %.4f, max: %.4f, mean: %.4f",
             name, stats["min"], stats["max"], stats["mean"])
    return stats


@contextlib.contextmanager
def span(name: str, result_holder: Optional[dict] = None) -> Iterator[None]:
    """Wall-clock span with a device fence on exit.

    The fence is a readback (`np.asarray` of whatever the caller stored in
    `result_holder['out']`), the reliable sync in this environment — the
    analog of the reference's `sum_all().to_scalar()` idiom
    (reference: examples/bench_inference.rs:9-12).
    """
    t0 = time.perf_counter()
    holder = result_holder if result_holder is not None else {}
    yield
    out = holder.get("out")
    if out is not None:
        jax.tree.map(np.asarray, out)
    dt = time.perf_counter() - t0
    log.info("%s: %.1f ms", name, dt * 1e3)
    holder["seconds"] = dt


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/birefnet_trace") -> Iterator[str]:
    """jax.profiler trace context; open the result with TensorBoard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
