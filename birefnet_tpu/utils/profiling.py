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


def device_op_profile(fn, *args, iters: int = 6,
                      logdir: str = "/tmp/birefnet_prof"):
    """Per-jit-unit and per-XLA-op device-busy attribution from a perfetto
    trace (the authoritative timing on this platform — see
    benchmarks/common.py::device_busy_ms for why wall clocks lie here).

    Runs `fn(*args)` `iters` times under the profiler and returns
    (units, ops) where units maps jit-module name -> ms/call and ops maps
    jit-module name -> [(ms/call, count/call, op_name), ...] sorted by
    cost, attributed by enclosing-span timestamps. NOTE: `while` op
    durations include their nested body ops (which also appear as separate
    entries) — don't sum a while with its body. Attribution is keyed per
    device pid, so multi-chip traces don't cross-attribute; on an N-chip
    run each unit's ms/call is summed over chips (device-busy, not
    wall-clock).
    """
    import bisect
    import collections
    import glob
    import gzip
    import json
    import shutil

    out = fn(*args)
    _ = jax.tree.map(np.asarray, jax.tree.leaves(out)[0][:1])
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    outs = [fn(*args) for _ in range(iters)]
    _ = jax.tree.map(np.asarray, jax.tree.leaves(outs[-1])[0][:1])
    jax.profiler.stop_trace()

    path = glob.glob(f"{logdir}/**/perfetto_trace.json.gz", recursive=True)[0]
    with gzip.open(path) as fh:
        data = json.load(fh)
    events = data["traceEvents"] if isinstance(data, dict) else data
    pids = {e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")}
    tids = {}
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("pid") in pids):
            tids[(e["pid"], e["tid"])] = e["args"]["name"]

    # Spans and ops are keyed per device pid: on a multi-device run each
    # chip's trace is a separate process, and a timestamp-only bisect over
    # one merged span list would cross-attribute concurrently executing
    # modules between chips.
    spans_by_pid = collections.defaultdict(list)
    raw_ops = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        nm, t0, dur = e.get("name", ""), e.get("ts", 0), e.get("dur", 0)
        tname = tids.get((e["pid"], e["tid"]), "")
        if nm.startswith("jit") and tname == "XLA Modules":
            # Keep a short executable-hash suffix: same-named jit units
            # (the full- and half-scale backbone) stay distinguishable.
            base, _, suffix = nm.partition("(")
            spans_by_pid[e["pid"]].append((t0, t0 + dur,
                                           f"{base}[{suffix[:6]}]"))
        elif tname == "XLA Ops":
            raw_ops.append((e["pid"], t0, dur, nm))
    starts_by_pid = {}
    for pid, spans in spans_by_pid.items():
        spans.sort()
        starts_by_pid[pid] = [s for s, _, _ in spans]

    units: Dict[str, float] = collections.defaultdict(float)
    per = collections.defaultdict(lambda: collections.defaultdict(
        lambda: [0.0, 0]))
    for spans in spans_by_pid.values():
        for s, t, nm in spans:
            units[nm] += (t - s) / 1e3 / iters
    for pid, t0, dur, nm in raw_ops:
        spans = spans_by_pid.get(pid, [])
        i = bisect.bisect_right(starts_by_pid.get(pid, []), t0) - 1
        if i < 0 or t0 > spans[i][1]:
            continue
        cell = per[spans[i][2]][nm]
        cell[0] += dur / 1e3 / iters
        cell[1] += 1
    ops = {u: sorted(((ms, n / iters, op) for op, (ms, n) in d.items()),
                     reverse=True)
           for u, d in per.items()}
    return dict(units), ops


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
