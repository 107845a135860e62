"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is exercised in CI the way the reference could not
test its cluster (its clustering suite ran single-node —
reference test/clustering_SUITE.erl:85-87): JAX's host-platform device count
gives us a real 8-device mesh on CPU.  Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def registry():
    from erlvectordb_tpu.core import StoreRegistry

    return StoreRegistry()
