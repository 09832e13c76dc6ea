"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/mesh tests run on
8 virtual CPU devices (the analogue of the reference validating concurrency
with real goroutine storms in-process — inverted_index_test.go:84-138).

NOTE: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel) AND its
sitecustomize preimports jax at interpreter startup, so jax env vars set
here are read TOO LATE — every jax config (platform, compilation cache)
must go through jax.config.update, not os.environ. (A setdefault of
JAX_PLATFORMS is silently ignored and every jit then compiles over the
tunnel at ~60 s each; JAX_COMPILATION_CACHE_DIR set here was silently
ignored the same way.) XLA_FLAGS is the exception: the CPU backend parses
it at first backend init, which happens after conftest runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache (shared across processes/backends; entries
# key on HLO + compile options, so CPU-mesh test programs and the bench's
# TPU programs coexist) — repeat suite runs skip every slow compile
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The XLA CPU runtime JIT-allocates a few small mappings per compiled
# executable and never coalesces them; the suite compiles thousands of
# programs (hundreds of engines x shapes x 8 devices), crossing the
# kernel's default vm.max_map_count (65530) ~30 min in — at which point an
# mmap failure inside LLVM surfaces as a SIGSEGV in backend_compile_and_load
# (reproduced: map count 60.5k and climbing ~1k/min at the crash). Two
# layers of defense: raise the ceiling (best-effort; works as root), and a
# per-test relief valve below that drops the jit caches when the process
# nears the limit (measured: clear_caches+gc 4164 -> 579 maps after one
# heavy module; with the persistent cache above, recompiles are fast
# replays).
try:
    with open("/proc/sys/vm/max_map_count", "w") as f:
        f.write("1048576")
except OSError:
    pass

# The load-aware host-route fallback reads the machine's loadavg, which the
# test run itself saturates on this 1-vCPU host — pin it off so routing
# tests are deterministic (test_serving_routing re-enables it with a faked
# loadavg to test the policy itself).
os.environ.setdefault("TPI_HOST_BUSY_LOAD", "0")

import gc

import numpy as np
import pytest

_MAP_RELIEF_AT = 45_000


def _n_maps() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _jit_map_relief():
    yield
    if _n_maps() > _MAP_RELIEF_AT:
        jax.clear_caches()
        gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
