"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip sharding is tested on a virtual CPU mesh
(--xla_force_host_platform_device_count), the strategy the reference never
had (it hard-requires one CUDA GPU per test, e.g. tests/test_gae.py:7).
Set DIHPC_TEST_TPU=1 to run the suite on the real TPU backend instead.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

if not os.environ.get("DIHPC_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(1234)
