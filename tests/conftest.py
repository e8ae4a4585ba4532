"""Test config: run on CPU with 8 virtual devices so sharding tests work.

The container's sitecustomize registers the remote-TPU 'axon' backend and
forces jax_platforms='axon,cpu' at interpreter start; per-op tunnel latency
makes that unusable for unit tests. Flip the config back to local CPU before
any test imports touch a backend (mirrors the reference's CPU-wavefront
'fake backend' idea — SURVEY.md §4: run the TPU code paths on a virtual CPU
mesh).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the fast tier's wall time on this 1-core
# container is DOMINATED by XLA/Mosaic compiles (a single wavefront-render
# jit costs 40-80 s; the per-module jax.clear_caches() below re-pays them
# in-memory). The on-disk cache survives both clear_caches() and process
# restarts, so the pre-commit tier runs warm after its first execution
# (measured: a 4 s CPU compile reloads in <0.1 s).
_cache_dir = os.environ.get("VSPG_TEST_COMPILE_CACHE",
                            "/root/.jax_test_cache")
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Long single-process runs accumulate ~100 compiled executables; on this
    container that ends in a segfault (observed at ~97% of the full suite).
    Dropping caches between modules keeps memory bounded."""
    yield
    jax.clear_caches()
