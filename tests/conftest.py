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
# persistent XLA compile cache (shared across processes/backends; entries
# key on HLO + compile options, so CPU-mesh test programs and the bench's
# TPU programs coexist) — repeat suite runs skip every slow compile
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
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
