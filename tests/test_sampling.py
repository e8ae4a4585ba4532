"""Sampling-warp statistical tests.

Replicates the reference's chi-squared idiom (util/sampling_test.cpp,
bsdfs_test.cpp): validate each sampler against its pdf by integrating the pdf
over histogram bins and chi-squared-testing observed counts.
"""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.utils import rng, sampling
from vspg_pbrt_v4_tpu.utils.math import PI
from vspg_pbrt_v4_tpu.utils.vecmath import dot


def _u2(n, seed=0, dim=0):
    pid = jnp.arange(n, dtype=jnp.uint32)
    return rng.uniform2(jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(dim))


def _u1(n, seed=0, dim=0):
    pid = jnp.arange(n, dtype=jnp.uint32)
    return rng.uniform1(jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(dim))


def _chi2_direction_test(dirs, pdf_fn, nbins_theta=8, nbins_phi=16):
    """Chi² of sampled unit directions against pdf(w) over a theta/phi grid."""
    d = np.asarray(dirs)
    n = len(d)
    ct = np.clip(d[:, 2], -1, 1)
    theta = np.arccos(ct)
    phi = np.arctan2(d[:, 1], d[:, 0]) % (2 * np.pi)
    ti = np.minimum((theta / np.pi * nbins_theta).astype(int), nbins_theta - 1)
    pi_ = np.minimum((phi / (2 * np.pi) * nbins_phi).astype(int), nbins_phi - 1)
    counts = np.zeros((nbins_theta, nbins_phi))
    np.add.at(counts, (ti, pi_), 1)
    # integrate pdf over each bin numerically
    expected = np.zeros_like(counts)
    sub = 16
    for i in range(nbins_theta):
        th = (i + (np.arange(sub) + 0.5) / sub) * np.pi / nbins_theta
        for j in range(nbins_phi):
            ph = (j + (np.arange(sub) + 0.5) / sub) * 2 * np.pi / nbins_phi
            th_g, ph_g = np.meshgrid(th, ph, indexing="ij")
            w = np.stack(
                [np.sin(th_g) * np.cos(ph_g), np.sin(th_g) * np.sin(ph_g), np.cos(th_g)],
                axis=-1,
            )
            p = pdf_fn(w) * np.sin(th_g)
            dA = (np.pi / nbins_theta / sub) * (2 * np.pi / nbins_phi / sub)
            expected[i, j] = p.sum() * dA * n
    mask = expected > 5
    chi2 = np.sum((counts[mask] - expected[mask]) ** 2 / expected[mask])
    dof = mask.sum() - 1
    # loose bound: mean + 5*sqrt(2 dof)
    assert chi2 < dof + 5 * np.sqrt(2 * dof), (chi2, dof)


def test_uniform_sphere():
    d = sampling.sample_uniform_sphere(_u2(1 << 16))
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)
    _chi2_direction_test(d, lambda w: np.full(w.shape[:-1], 1 / (4 * np.pi)))


def test_cosine_hemisphere():
    d = sampling.sample_cosine_hemisphere(_u2(1 << 16, seed=1))
    dn = np.asarray(d)
    assert (dn[:, 2] >= 0).all()
    _chi2_direction_test(
        d, lambda w: np.where(w[..., 2] > 0, w[..., 2] / np.pi, 0.0)
    )


def test_henyey_greenstein_sampling_matches_pdf():
    for g in (-0.5, 0.0, 0.3, 0.85):
        wo = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1 << 16, 1))
        wi, pdf = sampling.sample_henyey_greenstein(wo, g, _u2(1 << 16, seed=2))
        # returned pdf must equal the HG phase value at the sampled angle
        ct = np.clip(np.asarray(dot(wo, wi)), -1, 1)
        p_ref = np.asarray(sampling.henyey_greenstein(jnp.asarray(ct), g))
        assert np.allclose(np.asarray(pdf), p_ref, rtol=2e-3, atol=1e-6)
        _chi2_direction_test(
            wi,
            lambda w: np.asarray(
                sampling.henyey_greenstein(jnp.asarray(w[..., 2]), g)
            ),
        )


def test_hg_normalization():
    # integral of HG over sphere == 1
    ct = np.linspace(-1, 1, 100001)
    for g in (-0.7, 0.0, 0.9):
        p = np.asarray(sampling.henyey_greenstein(jnp.asarray(ct), g))
        integral = 2 * np.pi * np.trapezoid(p, ct)
        assert abs(integral - 1.0) < 1e-3, (g, integral)


def test_hg_mean_cosine():
    # <cos> w.r.t. the propagation direction (-wo) == g; pbrt's convention has
    # wo pointing back toward the camera, so E[dot(wo, wi)] == -g.
    u2 = _u2(1 << 18, seed=3)
    for g in (0.0, 0.5, 0.877):
        wo = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (1 << 18, 1))
        wi, _ = sampling.sample_henyey_greenstein(wo, g, u2)
        mean_ct = float(np.mean(np.asarray(dot(-wo, wi))))
        assert abs(mean_ct - g) < 0.01, (g, mean_ct)


def test_sample_exponential():
    a = 2.5
    x = np.asarray(sampling.sample_exponential(_u1(1 << 18, seed=4), a))
    assert (x >= 0).all()
    assert abs(x.mean() - 1 / a) < 0.01


def test_sample_discrete():
    w = jnp.tile(jnp.asarray([1.0, 2.0, 3.0, 4.0]), (1 << 16, 1))
    u = _u1(1 << 16, seed=5)
    idx, pmf, u_new = sampling.sample_discrete(w, u)
    idx_n = np.asarray(idx)
    counts = np.bincount(idx_n, minlength=4) / len(idx_n)
    assert np.allclose(counts, [0.1, 0.2, 0.3, 0.4], atol=0.01)
    assert np.allclose(np.asarray(pmf), np.asarray([0.1, 0.2, 0.3, 0.4])[idx_n], atol=1e-6)
    un = np.asarray(u_new)
    assert un.min() >= 0 and un.max() < 1
    # remapped u stays uniform
    assert abs(un.mean() - 0.5) < 5e-3


def test_power_heuristic():
    assert float(sampling.power_heuristic(1.0, 2.0, 1.0, 2.0)) == 0.5
    assert float(sampling.power_heuristic(1.0, 1.0, 1.0, 0.0)) == 1.0


def test_sample_uniform_triangle():
    b = np.asarray(sampling.sample_uniform_triangle(_u2(1 << 16, seed=6)))
    assert np.allclose(b.sum(-1), 1.0, atol=1e-6)
    assert (b >= 0).all()
    assert abs(b.mean(0) - 1 / 3).max() < 5e-3


def test_concentric_disk():
    p = np.asarray(sampling.sample_uniform_disk_concentric(_u2(1 << 16, seed=7)))
    r2 = (p**2).sum(-1)
    assert r2.max() <= 1.0 + 1e-6
    # uniform on disk: E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 5e-3


def test_piecewise_constant_1d():
    func = [1.0, 2.0, 4.0, 1.0]
    dist = sampling.PiecewiseConstant1D(func)
    u = _u1(1 << 16, seed=8)
    x, pdf, _ = dist.sample(u)
    xn = np.asarray(x)
    counts, _ = np.histogram(xn, bins=4, range=(0, 1))
    assert np.allclose(counts / len(xn), np.asarray(func) / 8.0, atol=0.01)
    # E_x~pdf[pdf(x)] = integral of pdf^2 = (0.25+1+4+0.25)/4 = 1.375
    assert abs(np.asarray(pdf).mean() - 1.375) < 0.02


def test_piecewise_constant_2d():
    """Sampling density matches pdf(); integral of pdf is 1."""
    import numpy as np

    from vspg_pbrt_v4_tpu.utils.sampling import PiecewiseConstant2D

    rng = np.random.default_rng(8)
    f = rng.random((8, 16)) + 0.1
    dist = PiecewiseConstant2D(f)
    # pdf integrates to 1 over the domain
    xs = (np.arange(16) + 0.5) / 16
    ys = (np.arange(8) + 0.5) / 8
    X, Y = np.meshgrid(xs, ys)
    pdf = np.asarray(dist.pdf(jnp.asarray(np.stack([X, Y], -1))))
    assert abs(pdf.mean() - 1.0) < 1e-4  # mean of pdf over unit domain = 1
    # empirical histogram matches func shape
    u2 = jnp.asarray(rng.random((200_000, 2), np.float32))
    p, pdf_s = dist.sample(u2)
    p = np.asarray(p)
    h = np.histogram2d(p[:, 1], p[:, 0], bins=(8, 16),
                       range=((0, 1), (0, 1)), density=True)[0]
    ref = f / f.mean()
    assert np.abs(h - ref).max() < 0.15 * ref.max(), np.abs(h - ref).max()
    # reported pdf equals pdf() at the samples
    pdf_q = np.asarray(dist.pdf(jnp.asarray(p)))
    assert np.allclose(np.asarray(pdf_s), pdf_q, rtol=1e-5)


def test_alias_table():
    """AliasTable: exact pmf reproduction + remapped-u uniformity."""
    import numpy as np

    from vspg_pbrt_v4_tpu.utils.sampling import AliasTable

    w = np.asarray([1.0, 5.0, 0.2, 3.0, 0.0, 2.5])
    at = AliasTable(w)
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.random(500_000, np.float32))
    idx, pmf, u2 = at.sample(u)
    idx = np.asarray(idx)
    freq = np.bincount(idx, minlength=6) / len(idx)
    expect = w / w.sum()
    assert np.abs(freq - expect).max() < 2e-3, freq
    assert np.allclose(np.asarray(pmf), expect[idx], rtol=1e-5)
    u2 = np.asarray(u2)
    # remapped u stays uniform (chi-square-ish)
    h = np.histogram(u2, bins=16, range=(0, 1))[0] / len(u2)
    assert np.abs(h - 1 / 16).max() < 3e-3, h
