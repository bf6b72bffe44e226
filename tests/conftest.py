"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The suite validates numerical parity against the float64 C++ reference, so we
force the CPU backend (deterministic, fast compiles) with 8 virtual devices
for multi-chip sharding tests, and enable x64. Production code paths are
dtype-agnostic; TPU benchmarking uses float32/bfloat16 via bench.py.
"""

import os

# NOTE: the environment bakes in JAX_PLATFORMS=axon (TPU) and a sitecustomize
# that registers the backend at interpreter start, so we must override —
# not setdefault — and also set the config knob (jax may already be imported).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TEST_DATA = "/root/reference/test_data"


@pytest.fixture(scope="session")
def test_data_dir():
    return REFERENCE_TEST_DATA


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
