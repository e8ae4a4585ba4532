"""Guiding-field unit tests: vMF math, EM fitting, radiance propagation."""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.guiding import field as gfield
from vspg_pbrt_v4_tpu.models.guiding import recording, vmf
from vspg_pbrt_v4_tpu.utils import rng, sampling
from vspg_pbrt_v4_tpu.utils.vecmath import dot, normalize


def _u2(n, seed=0, dim=0):
    pid = jnp.arange(n, dtype=jnp.uint32)
    return rng.uniform2(jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(dim))


def _u1(n, seed=0, dim=0):
    pid = jnp.arange(n, dtype=jnp.uint32)
    return rng.uniform1(jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(dim))


def test_vmf_pdf_normalized():
    n = 1 << 17
    w = sampling.sample_uniform_sphere(_u2(n))
    mu = jnp.asarray([0.3, -0.5, 0.81])
    mu = mu / jnp.linalg.norm(mu)
    for kappa in (0.0, 0.5, 5.0, 50.0):
        p = vmf.vmf_pdf(w, mu, jnp.full((n,), kappa))
        integral = float(jnp.mean(p) * 4 * np.pi)
        assert abs(integral - 1.0) < 0.02, (kappa, integral)


def test_vmf_sample_matches_pdf():
    n = 1 << 16
    mu = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    for kappa in (1.0, 10.0):
        w = vmf.vmf_sample(mu, jnp.full((n,), kappa), _u2(n, seed=1))
        # mean resultant length check
        rho_emp = float(jnp.linalg.norm(jnp.mean(w, 0)))
        rho_true = float(vmf.kappa_to_rho(jnp.asarray(kappa)))
        assert abs(rho_emp - rho_true) < 0.01, (kappa, rho_emp, rho_true)
        # cos-theta histogram vs pdf marginal
        ct = np.asarray(w[:, 2])
        counts, edges = np.histogram(ct, bins=32, range=(-1, 1))
        centers = 0.5 * (edges[:-1] + edges[1:])
        p_marg = np.asarray(
            vmf.vmf_pdf(
                jnp.stack([jnp.sqrt(jnp.clip(1 - jnp.asarray(centers) ** 2, 0, 1)),
                           jnp.zeros(32), jnp.asarray(centers)], -1),
                jnp.asarray([0.0, 0, 1.0]), jnp.full((32,), kappa),
            )
        ) * 2 * np.pi * (edges[1] - edges[0])
        expected = p_marg * n
        mask = expected > 20
        chi2 = np.sum((counts[mask] - expected[mask]) ** 2 / expected[mask])
        dof = mask.sum()
        assert chi2 < dof + 5 * np.sqrt(2 * dof), (kappa, chi2, dof)


def test_rho_kappa_roundtrip():
    kappas = jnp.asarray([0.1, 1.0, 5.0, 20.0, 100.0])
    rho = vmf.kappa_to_rho(kappas)
    back = vmf.rho_to_kappa(rho)
    assert np.allclose(np.asarray(back), np.asarray(kappas), rtol=0.12)


def test_vmf_product():
    """Product weights/lobes must satisfy w' * vMF'(x) == vMF1(x)*vMF2(x)."""
    n = 256
    w0 = jnp.ones((n, 1))
    mu1 = normalize(jnp.asarray([[0.2, 0.3, 0.93]]))
    mu1 = jnp.tile(mu1, (n, 1))[:, None, :]
    k1 = jnp.full((n, 1), 4.0)
    mu2 = jnp.tile(normalize(jnp.asarray([[-0.5, 0.1, 0.86]])), (n, 1))
    k2 = jnp.full((n,), 7.0)
    w_new, mu_new, k_new = vmf.product_with_vmf(w0, mu1, k1, mu2, k2)
    # compare pointwise at random directions; ratio should be constant = the
    # renormalization factor
    x = sampling.sample_uniform_sphere(_u2(n, seed=2))
    lhs = np.asarray(vmf.vmf_pdf(x, mu1[:, 0], k1[:, 0]) * vmf.vmf_pdf(x, mu2, k2))
    rhs = np.asarray(w_new[:, 0] * vmf.vmf_pdf(x, mu_new[:, 0], k_new[:, 0]))
    ratio = lhs / np.maximum(rhs, 1e-20)
    ratio = ratio[lhs > 1e-8]
    assert ratio.std() / ratio.mean() < 1e-3, ratio.std() / ratio.mean()


def test_mixture_sample_pdf_consistent():
    n = 1 << 16
    K = 4
    weights = jnp.tile(jnp.asarray([0.4, 0.3, 0.2, 0.1]), (n, 1))
    mus = normalize(jnp.asarray(
        [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [-1.0, 0, 0]]))
    mu = jnp.tile(mus[None], (n, 1, 1))
    kappa = jnp.tile(jnp.asarray([2.0, 8.0, 20.0, 1.0]), (n, 1))
    w, pdf = vmf.mixture_sample(weights, mu, kappa, _u1(n, seed=3), _u2(n, seed=4))
    # MC integral of pdf over sphere = 1 using uniform dirs
    xu = sampling.sample_uniform_sphere(_u2(n, seed=5))
    p_at = vmf.mixture_pdf(xu, weights, mu, kappa)
    assert abs(float(jnp.mean(p_at)) * 4 * np.pi - 1.0) < 0.03
    # E[1/pdf] over sampled dirs = area of sphere
    inv = 1.0 / np.maximum(np.asarray(pdf), 1e-9)
    assert abs(inv.mean() - 4 * np.pi) < 0.3, inv.mean()


@pytest.mark.slow
def test_em_fits_two_lobes():
    """EM over samples from a 2-lobe target recovers directions/weights."""
    f = gfield.GuidingField.make((-1, -1, -1), (1, 1, 1), res=2, n_lobes=4)
    target_mu = np.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    target_w = np.asarray([0.7, 0.3])
    n = 1 << 15
    half = f.volume
    for it in range(8):
        pick = np.asarray(_u1(n, seed=10 + it)) < target_w[0]
        mu_s = jnp.asarray(np.where(pick[:, None], target_mu[0], target_mu[1]))
        dirs = vmf.vmf_sample(mu_s, jnp.full((n,), 30.0), _u2(n, seed=20 + it))
        cell = jnp.zeros((n,), jnp.int32)
        sw, ss, w, mu, kap = vmf.em_update(
            half.stats_w, half.stats_s, half.weights, half.mu, half.kappa,
            cell, half.weights.shape[0], dirs, jnp.ones((n,)), decay=1.0,
        )
        half = half.replace(stats_w=sw, stats_s=ss, weights=w, mu=mu, kappa=kap)
    # the fitted mixture in cell 0 should put ~70% of its mass near +z
    w0 = np.asarray(half.weights[0])
    mu0 = np.asarray(half.mu[0])
    near_z = mu0[:, 2] > 0.8
    near_x = mu0[:, 0] > 0.8
    assert near_z.any() and near_x.any(), mu0
    wz = w0[near_z].sum()
    wx = w0[near_x].sum()
    assert abs(wz - 0.7) < 0.1, (wz, wx, w0)
    assert abs(wx - 0.3) < 0.1, (wz, wx)
    # fitted pdf close to target pdf at test dirs
    xt = sampling.sample_uniform_sphere(_u2(4096, seed=99))
    p_fit = np.asarray(vmf.mixture_pdf(
        xt, jnp.tile(half.weights[0], (4096, 1)),
        jnp.tile(half.mu[0], (4096, 1, 1)), jnp.tile(half.kappa[0], (4096, 1))))
    p_true = np.asarray(
        0.7 * vmf.vmf_pdf(xt, jnp.asarray(target_mu[0]), jnp.full((4096,), 30.0))
        + 0.3 * vmf.vmf_pdf(xt, jnp.asarray(target_mu[1]), jnp.full((4096,), 30.0)))
    # guiding-quality criterion: the fit must be a usable importance
    # sampler for the target — bounded density ratio where the target has
    # mass (variance of target/fit stays finite and modest), and much more
    # mass in the target region than uniform.
    m = p_true > 0.01
    ratio = p_true[m] / np.maximum(p_fit[m], 1e-9)
    assert np.percentile(ratio, 99) < 25.0, np.percentile(ratio, 99)
    mean_logp = np.log(np.maximum(p_fit[m], 1e-12)).mean()
    assert mean_logp > np.log(1.0 / (4 * np.pi)) + 1.0, mean_logp


def test_propagate_backward_recursion():
    """Hand-built 3-vertex path: Li must follow the backward recursion."""
    R, D = 2, 4
    rec = recording.SegmentRecord.make(R, D, jnp.zeros(R))
    m_all = jnp.ones(R, bool)
    # vertex 0 at origin, weight 0.5, direct 0.1 added after
    rec = recording.record_vertex(
        rec, m_all, jnp.zeros((R, 3)), jnp.tile(jnp.asarray([0.0, 0, 1.0]), (R, 1)),
        jnp.full((R, 3), 0.5), jnp.ones(R), jnp.zeros(R, bool))
    rec = recording.record_direct(rec, m_all, jnp.full((R, 3), 0.1))
    rec = recording.record_edge_distance(rec, m_all, jnp.full(R, 2.0))
    # vertex 1: volume vertex, weight 0.8, direct 0.3
    rec = recording.record_vertex(
        rec, m_all, jnp.ones((R, 3)), jnp.tile(jnp.asarray([1.0, 0, 0.0]), (R, 1)),
        jnp.full((R, 3), 0.8), jnp.ones(R), jnp.ones(R, bool))
    rec = recording.record_direct(rec, m_all, jnp.full((R, 3), 0.3))
    # edge from vertex 1 hits an emitter: emission 2.0
    rec = recording.record_emission(rec, m_all, jnp.full((R, 3), 2.0), jnp.full(R, 5.0))
    batch = recording.propagate(rec)
    li = np.asarray(batch.radiance).reshape(R, D, 3)
    # Li_1 = emission_1 = 2.0 ; Li_0 = 0 + direct_1 + w_1 * Li_1 = 0.3+0.8*2=1.9
    assert np.allclose(li[0, 1], 2.0), li[0, 1]
    assert np.allclose(li[0, 0], 1.9), li[0, 0]
    valid = np.asarray(batch.valid).reshape(R, D)
    assert valid[0, 0] and valid[0, 1] and not valid[0, 2]
    # vertex 0's next event is a volume vertex: all scattered light counts
    # as volume contribution
    c_vol = np.asarray(batch.c_vol).reshape(R, D)
    c_surf = np.asarray(batch.c_surf).reshape(R, D)
    assert np.isclose(c_vol[0, 0], 1.9), c_vol[0, 0]
    assert np.isclose(c_surf[0, 1], 2.0) and np.isclose(c_vol[0, 1], 0.0)


@pytest.mark.slow
def test_field_update_and_query():
    """End-to-end: train the volume field toward +z in one cell; the
    queried distribution concentrates there and VSP reflects observations."""
    f = gfield.GuidingField.make((-1, -1, -1), (1, 1, 1), res=4, n_lobes=4)
    n = 1 << 14
    pos = jnp.zeros((n, 3)) + 0.1
    mu_t = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))
    for it in range(4):
        dirs = vmf.vmf_sample(mu_t, jnp.full((n,), 20.0), _u2(n, seed=30 + it))
        batch = gfield.TrainBatch(
            pos=pos, wi=dirs, weight=jnp.ones(n),
            radiance=jnp.ones((n, 3)), distance=jnp.full(n, 3.0),
            is_volume=jnp.ones(n, bool),
            c_vol=jnp.full(n, 0.8), c_surf=jnp.full(n, 0.2),
            valid=jnp.ones(n, bool),
        )
        f = gfield.field_update(f, batch)
    assert int(f.iteration) == 4
    q = jnp.asarray([[0.1, 0.1, 0.1]])
    d = gfield.volume_distribution(f, q, jnp.asarray([[0.0, 0, -1.0]]),
                                   jnp.zeros(1), apply_hg=False)
    assert bool(d.valid[0])
    # sampled directions concentrate near +z
    wi, pdf = gfield.dist_sample(d, jnp.asarray([0.37]), jnp.asarray([[0.3, 0.6]]))
    p_up = float(gfield.dist_pdf(d, jnp.asarray([[0.0, 0.0, 1.0]]))[0])
    p_down = float(gfield.dist_pdf(d, jnp.asarray([[0.0, 0.0, -1.0]]))[0])
    assert p_up > 20 * p_down, (p_up, p_down)
    # VSP estimate (contribution criterion ~0.8 given constant observations)
    vsp = float(d.vsp[0])
    assert 0.6 < vsp <= 1.0, vsp
