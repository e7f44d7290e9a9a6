"""Test harness bootstrap.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported
anywhere, so every test exercises the same multi-chip sharding code paths
the driver validates (the reference repo's analog is its mock audio
backend + loopback sockets; reference: backend/tests/conftest.py:15-154).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


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
