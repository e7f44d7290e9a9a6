"""Test harness bootstrap.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported
anywhere, so every test exercises the same multi-chip sharding code paths
the driver validates (the reference repo's analog is its mock audio
backend + loopback sockets; reference: backend/tests/conftest.py:15-154).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Hard-override: the ambient environment points JAX at the real TPU tunnel
# (JAX_PLATFORMS=axon, re-asserted through jax.config by the site's PJRT
# bootstrap at interpreter start) — correctness tests always run on the
# virtual CPU mesh, so both the env var and the config knob must be forced.
if os.environ.get("JANUS_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running sanity tests (still run by default)")


@pytest.fixture(autouse=True)
def _reset_engine_state():
    """Reset global control state and queues between tests
    (reference: backend/tests/conftest.py:157-175)."""
    from janus_tpu.common import state

    state.reset_queues()
    yield
    state.reset_queues()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
