"""RNG statistical tests (analog of reference util/rng_test.cpp idioms)."""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.utils import rng


def _draws(n=1 << 16, dim=0, seed=7):
    pid = jnp.arange(n, dtype=jnp.uint32)
    return np.asarray(
        rng.uniform1(jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(dim))
    )


def test_range_and_determinism():
    u = _draws()
    assert u.min() >= 0.0 and u.max() < 1.0
    assert np.array_equal(u, _draws())
    assert not np.array_equal(u, _draws(seed=8))


def test_uniformity_chi2():
    u = _draws(1 << 18)
    nbins = 64
    counts, _ = np.histogram(u, bins=nbins, range=(0, 1))
    expected = len(u) / nbins
    chi2 = np.sum((counts - expected) ** 2 / expected)
    # dof=63; 99.9% quantile ~ 103
    assert chi2 < 110, chi2


def test_mean_variance():
    u = _draws(1 << 18)
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 1e-3


def test_dimension_decorrelation():
    n = 1 << 16
    pid = jnp.arange(n, dtype=jnp.uint32)
    a = np.asarray(rng.uniform1(jnp.uint32(1), pid, jnp.uint32(0), jnp.uint32(0)))
    b = np.asarray(rng.uniform1(jnp.uint32(1), pid, jnp.uint32(0), jnp.uint32(1)))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.02, corr


def test_uniform2_lanes_independent():
    n = 1 << 16
    pid = jnp.arange(n, dtype=jnp.uint32)
    u2 = np.asarray(rng.uniform2(jnp.uint32(3), pid, jnp.uint32(5), jnp.uint32(2)))
    corr = np.corrcoef(u2[:, 0], u2[:, 1])[0, 1]
    assert abs(corr) < 0.02, corr


def test_hash_u32_varies():
    x = np.asarray(rng.hash_u32(jnp.arange(1024, dtype=jnp.uint32), jnp.uint32(0)))
    # essentially no collisions expected in 1024 draws from 2^32
    assert len(np.unique(x)) > 1020
