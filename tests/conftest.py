"""Test harness: force the XLA:CPU backend with 8 virtual devices.

Mirrors the reference's distributed-test strategy (tests/cpu/run_distributed_test.sh:
multi-rank on localhost over oneCCL SHM): we emulate an 8-chip TPU slice with
xla_force_host_platform_device_count so sharding tests run without hardware.

NOTE: this environment pre-imports jax at interpreter startup (TPU plugin
sitecustomize) with JAX_PLATFORMS pinned to the hardware backend, so setting the
env var here is not enough — ``jax.config.update`` is what actually redirects the
backend (it is still safe: backends initialize lazily at first use, which is after
conftest import).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_tp_mesh():
    """Engines register their mesh process-globally for shard-aware kernel
    dispatch (dispatch.set_tp_mesh); clear it between tests so a TP test's
    mesh never leaks into single-device ones."""
    yield
    from lia_tpu.ops import dispatch

    dispatch.set_tp_mesh(None)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running tests")
