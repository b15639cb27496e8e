"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
`xla_force_host_platform_device_count` to emulate an 8-device mesh on CPU,
as recommended for testing pjit/shard_map programs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # The virtual 8-device mesh runs one SPMD participant thread per
    # device on however few host cores exist (CI here has ONE). XLA:CPU's
    # in-process collectives abort the whole process if any participant
    # misses the rendezvous by 40s — a pure scheduling flake at this
    # core count (observed: 7/8 threads arrive, CHECK-abort inside
    # test_parallel's full-model sharded infers). Give starved threads
    # room instead.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900"
              " --xla_cpu_collective_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

if os.environ.get("BIREFNET_TEST_TPU", "0") != "1":
    # The environment force-registers the TPU backend via sitecustomize;
    # jax.config wins over the env var.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: kernel-legality tier, needs the real TPU chip "
        "(run with BIREFNET_TEST_TPU=1)")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    jit caches keep every compiled program alive for the life of the
    process; by the time the full suite reaches the heavy sharded
    full-model tests (test_parallel.py) the accumulated executables plus
    the 512² test's ~17 GB working set abort the XLA CPU runtime
    (observed: 'Fatal Python error: Aborted' inside Array._value at
    test_hr_sharded_512_matches_dense — the test passes in isolation).
    Per-module recompiles of shared helpers cost a little wall-clock and
    bound the footprint instead."""
    yield
    jax.clear_caches()
