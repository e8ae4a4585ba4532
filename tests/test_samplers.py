"""Sampler statistics (samplers_test.cpp idiom: stratification + uniformity
+ variance-reduction checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.samplers import LaneSampler
from vspg_pbrt_v4_tpu.utils.lowdiscrepancy import (
    permutation_element, sobol_dim0, sobol_dim1, u32_to_unit_float)


def _collect(kind, spp, n_pix=64, dims=2, dim_idx=0):
    """(n_pix, spp) draws of dimension dim_idx."""
    out = np.zeros((n_pix, spp, dims), np.float32)
    for s in range(spp):
        smp = LaneSampler.start(7, jnp.arange(n_pix, dtype=jnp.uint32), s,
                                kind=kind, spp=spp)
        for d in range(dim_idx + 1):
            if dims == 2:
                smp, u = smp.get_2d()
            else:
                smp, u = smp.get_1d()
                u = u[..., None]
        out[:, s] = np.asarray(u)[:, :dims]
    return out


def test_permutation_element_is_permutation():
    for n in (7, 16, 64, 100):
        idx = permutation_element(jnp.arange(n, dtype=jnp.uint32),
                                  jnp.uint32(n), jnp.uint32(123))
        got = sorted(np.asarray(idx).tolist())
        assert got == list(range(n)), (n, got[:10])


def test_sobol_dims_are_01_sequences():
    # first 2^m points of each dimension are stratified in every dyadic bin
    n = 256
    idx = jnp.arange(n, dtype=jnp.uint32)
    for gen in (sobol_dim0, sobol_dim1):
        u = np.asarray(u32_to_unit_float(gen(idx)))
        for m in (4, 16, 64, 256):
            counts = np.histogram(u, bins=m, range=(0, 1))[0]
            assert (counts == n // m).all(), (gen.__name__, m, counts)


def test_sobol_2d_low_discrepancy():
    # dims (0,1) pairs: every 16x16 stratum of the first 256 points has 1 pt
    n = 256
    idx = jnp.arange(n, dtype=jnp.uint32)
    x = np.asarray(u32_to_unit_float(sobol_dim0(idx)))
    y = np.asarray(u32_to_unit_float(sobol_dim1(idx)))
    h = np.histogram2d(x, y, bins=16, range=((0, 1), (0, 1)))[0]
    assert (h == 1).all()


@pytest.mark.parametrize("kind", ["independent", "stratified", "paddedsobol"])
def test_sampler_uniform_and_decorrelated(kind):
    u = _collect(kind, spp=64, n_pix=128)
    flat = u.reshape(-1, 2)
    assert flat.min() >= 0 and flat.max() < 1
    assert abs(flat.mean() - 0.5) < 5e-3
    corr = np.corrcoef(flat[:, 0], flat[:, 1])[0, 1]
    assert abs(corr) < 0.03, (kind, corr)
    # different pixels decorrelated
    c2 = np.corrcoef(u[0, :, 0], u[1, :, 0])[0, 1]
    assert abs(c2) < 0.3, c2


@pytest.mark.parametrize("kind,bound", [("stratified", 1.01), ("paddedsobol", 1.01)])
def test_stratification_within_pixel(kind, bound):
    """Each pixel's spp draws of one dim cover every stratum ~once."""
    spp = 64
    u = _collect(kind, spp=spp, n_pix=16)
    for p in range(16):
        counts = np.histogram(u[p, :, 0], bins=spp, range=(0, 1))[0]
        assert counts.max() <= 2 and (counts >= 0).all()
        assert (counts > 0).mean() > 0.75, (kind, p, counts)


@pytest.mark.slow
def test_variance_reduction_vs_independent():
    """Integrating a smooth function: stratified & sobol beat independent."""
    spp = 64
    f = lambda u: np.sin(np.pi * u[..., 0]) * u[..., 1] ** 2  # noqa: E731
    true_val = (2 / np.pi) * (1 / 3)
    errs = {}
    for kind in ("independent", "stratified", "paddedsobol"):
        u = _collect(kind, spp=spp, n_pix=256)
        est = f(u).mean(1)  # per-pixel estimate
        errs[kind] = ((est - true_val) ** 2).mean()
    assert errs["stratified"] < 0.5 * errs["independent"], errs
    assert errs["paddedsobol"] < 0.35 * errs["independent"], errs


def _collect_nx(kind, spp, n_pix=64, nx=8):
    out = np.zeros((n_pix, spp, 2), np.float32)
    for s in range(spp):
        smp = LaneSampler.start(7, jnp.arange(n_pix, dtype=jnp.uint32), s,
                                kind=kind, spp=spp, nx=nx)
        smp, u = smp.get_2d()
        out[:, s] = np.asarray(u)
    return out


def test_halton_radical_inverse_stratified():
    from vspg_pbrt_v4_tpu.utils.lowdiscrepancy import (
        radical_inverse, scrambled_radical_inverse)
    n = 243
    idx = jnp.arange(n, dtype=jnp.uint32)
    u = np.asarray(radical_inverse(1, idx))  # base 3
    counts = np.histogram(u, bins=27, range=(0, 1))[0]
    assert (counts == n // 27).all()
    # scrambling keeps the stratification (Owen property)
    us = np.asarray(scrambled_radical_inverse(1, idx, jnp.uint32(99)))
    counts = np.histogram(us, bins=27, range=(0, 1))[0]
    assert (counts == n // 27).all()
    assert len(set(us.tolist())) == n


def test_halton_sampler_stratification_per_pixel():
    spp = 64
    u = _collect_nx("halton", spp, n_pix=32)
    # per-pixel: 64 base-2 x draws fill every 1/64 stratum exactly once;
    # base-3 y draws fill every 1/16 stratum within 1 (64 = 3^k mismatch)
    for pix in range(8):
        cx = np.histogram(u[pix, :, 0], bins=64, range=(0, 1))[0]
        assert (cx == 1).all(), (pix, cx)
        cy = np.histogram(u[pix, :, 1], bins=9, range=(0, 1))[0]
        assert cy.max() - cy.min() <= 3, (pix, cy)
    # decorrelated across pixels
    c = np.corrcoef(u[:, :, 0])
    off = c - np.diag(np.diag(c))
    assert np.abs(off).mean() < 0.15


def test_zsobol_sampler_stratification():
    spp = 16
    u = _collect_nx("zsobol", spp, n_pix=64, nx=8)
    assert ((u >= 0) & (u < 1)).all()
    for pix in range(8):
        cx = np.histogram(u[pix, :, 0], bins=16, range=(0, 1))[0]
        cy = np.histogram(u[pix, :, 1], bins=16, range=(0, 1))[0]
        assert (cx == 1).all(), (pix, cx)
        assert (cy == 1).all(), (pix, cy)
    # variance reduction vs independent on a smooth integrand
    ind = _collect_nx("independent", spp, n_pix=64, nx=8)

    def integrand_var(us):
        f = np.sin(np.pi * us[..., 0]) * us[..., 1] ** 2
        return np.var(f.mean(1))

    assert integrand_var(u) < 0.5 * integrand_var(ind)


# -- full-dimensional Sobol (generated matrices; samplers.h SobolSampler) ----


def test_sobol_full_matrices_stratify_every_dim():
    """First 256 points of every generated dimension are a (0,1)-sequence:
    all 256 dyadic bins hit exactly once."""
    from vspg_pbrt_v4_tpu.utils.lowdiscrepancy import sobol_u32

    idx = jnp.arange(256, dtype=jnp.uint32)
    for d in (0, 1, 2, 3, 17, 101, 511, 1023):
        v = np.asarray(sobol_u32(idx, jnp.full(256, d, jnp.int32)))
        assert len(set((v >> 24).tolist())) == 256, d


def test_sobol_full_sampler_uniform_and_beats_independent():
    u = _collect("sobol", spp=64, n_pix=128)
    flat = u.reshape(-1, 2)
    assert flat.min() >= 0 and flat.max() < 1
    assert abs(flat.mean() - 0.5) < 5e-3
    f = lambda u: np.sin(np.pi * u[..., 0]) * u[..., 1] ** 2  # noqa: E731
    true_val = (2 / np.pi) * (1 / 3)
    est = f(u).mean(1)
    err_sobol = ((est - true_val) ** 2).mean()
    ui = _collect("independent", spp=64, n_pix=128)
    err_ind = ((f(ui).mean(1) - true_val) ** 2).mean()
    assert err_sobol < 0.35 * err_ind, (err_sobol, err_ind)


@pytest.mark.slow
def test_sobol_full_deep_dimensions_stratified():
    """Dimensions consumed deep into a path (dim counter > 0) still come
    from real generator matrices: per-pixel spp draws stratify."""
    spp = 64
    n_pix = 8
    out = np.zeros((n_pix, spp, 2), np.float32)
    for s in range(spp):
        smp = LaneSampler.start(3, jnp.arange(n_pix, dtype=jnp.uint32), s,
                                kind="sobol", spp=spp)
        for _ in range(5):  # burn 5 dims
            smp, _u = smp.get_2d()
        _, u2 = smp.get_2d()
        out[:, s] = np.asarray(u2)
    for p in range(n_pix):
        counts = np.histogram(out[p, :, 0], bins=spp, range=(0, 1))[0]
        assert counts.max() == 1, (p, counts.max())  # exact (0,1)-net


def test_pmj02_table_is_02_net():
    """Every elementary (0,2) interval of every power-of-two prefix holds
    exactly the right number of points (the defining pmj02 property)."""
    from vspg_pbrt_v4_tpu.utils.lowdiscrepancy import generate_pmj02_table

    pts = np.asarray(generate_pmj02_table(256, seed=5))
    for m in (2, 4, 6, 8):  # prefix sizes 4, 16, 64, 256
        n = 1 << m
        p = pts[:n]
        # all splits a+b=m: grid of 2^a x 2^b cells must have exactly 1 pt
        for a in range(m + 1):
            b = m - a
            ix = (p[:, 0] * (1 << a)).astype(int)
            iy = (p[:, 1] * (1 << b)).astype(int)
            cells = ix * (1 << b) + iy
            assert len(np.unique(cells)) == n, (n, a, b)


def test_pmj02bn_sampler_stratifies_pixels():
    spp = 64
    u = _collect("pmj02bn", spp=spp, n_pix=16)
    for p in range(16):
        counts = np.histogram(u[p, :, 0], bins=spp, range=(0, 1))[0]
        assert counts.max() == 1  # exact 1D stratification
    # variance reduction vs independent
    f = lambda u: np.sin(np.pi * u[..., 0]) * u[..., 1] ** 2  # noqa: E731
    true_val = (2 / np.pi) * (1 / 3)
    err = ((f(u).mean(1) - true_val) ** 2).mean()
    ui = _collect("independent", spp=spp, n_pix=16)
    err_i = ((f(ui).mean(1) - true_val) ** 2).mean()
    assert err < 0.35 * err_i
