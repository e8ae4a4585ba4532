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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Long single-process runs accumulate ~100 compiled executables; on this
    container that ends in a segfault (observed at ~97% of the full suite).
    Dropping caches between modules keeps memory bounded."""
    yield
    jax.clear_caches()
