"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is exercised in CI the way the reference could not
test its cluster (its clustering suite ran single-node —
reference test/clustering_SUITE.erl:85-87): JAX's virtual CPU devices give us
a real 8-device mesh.  Note: this sandbox's sitecustomize pins
JAX_PLATFORMS=axon (a tunneled real TPU), so the env-var route is overridden;
we must force the platform through jax.config before first backend use.
"""

import os

import jax

if os.environ.get("EVDB_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
# else: keep the real backend so tests/test_tpu_hardware.py runs on-chip:
#   EVDB_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def registry():
    from erlvectordb_tpu.core import StoreRegistry

    return StoreRegistry()
