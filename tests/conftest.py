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

import signal  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TEST_DATA = "/root/reference/test_data"


def pytest_configure(config):
    # pytest-timeout is not installed in this environment; provide a minimal
    # SIGALRM-based implementation so @pytest.mark.timeout(N) is enforced
    # rather than a silent unknown-mark no-op.
    config.addinivalue_line(
        "markers",
        "timeout(seconds): fail the test if it runs longer than `seconds` "
        "(SIGALRM-based stand-in for the absent pytest-timeout plugin)",
    )


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    if marker is None or not hasattr(signal, "SIGALRM"):
        return (yield)
    seconds = int(marker.args[0])

    def _on_timeout(signum, frame):
        raise TimeoutError(f"test exceeded timeout mark of {seconds}s")

    old_handler = signal.signal(signal.SIGALRM, _on_timeout)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old_handler)


@pytest.fixture(scope="session")
def test_data_dir():
    return REFERENCE_TEST_DATA


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
