"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
`xla_force_host_platform_device_count` to emulate an 8-device mesh on CPU,
as recommended for testing pjit/shard_map programs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
