"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/mesh tests run on
8 virtual CPU devices (the analogue of the reference validating concurrency
with real goroutine storms in-process — inverted_index_test.go:84-138).

NOTE: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so this
must FORCE-overwrite — a setdefault is silently ignored and every jit then
compiles over the tunnel (~60s each). Must run before jax initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# The load-aware host-route fallback reads the machine's loadavg, which the
# test run itself saturates on this 1-vCPU host — pin it off so routing
# tests are deterministic (test_serving_routing re-enables it with a faked
# loadavg to test the policy itself).
os.environ.setdefault("TPI_HOST_BUSY_LOAD", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
