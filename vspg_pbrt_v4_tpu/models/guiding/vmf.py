"""von Mises-Fisher mixture math for the guiding field.

TPU re-implementation of the directional-distribution core that the reference
consumes from OpenPGL (SURVEY.md §2.4: PARALLAX_AWARE_VMM — kd-tree of vMF
mixtures fit by weighted EM). Everything here is branchless batched math:
mixtures are (..., K) arrays of weights/kappas and (..., K, 3) directions.

Numerically stable vMF forms: pdf uses exp(kappa*(mu.w - 1)) with
normalizer kappa / (2*pi*(1 - exp(-2*kappa))); kappa<->mean-resultant-length
uses the Banerjee et al. approximation (standard in OpenPGL-class fitters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils.math import INV_4PI, PI
from ...utils.vecmath import coordinate_system, dot, normalize

MAX_KAPPA = 2e3
MIN_KAPPA = 1e-2
# vMF approximation of the clamped-cosine lobe (OpenPGL's cosine product)
COSINE_KAPPA = 2.18853


def vmf_pdf(w, mu, kappa):
    """vMF density at w: (...,3),(...,3),(...) -> (...). kappa ~ 0 => uniform."""
    c = kappa / (2.0 * PI * (1.0 - jnp.exp(-2.0 * kappa)))
    val = c * jnp.exp(kappa * (dot(w, mu) - 1.0))
    return jnp.where(kappa < MIN_KAPPA, INV_4PI, val)


def vmf_sample(mu, kappa, u2):
    """Sample w ~ vMF(mu, kappa). Stable Jakob (2012) inversion."""
    u0, u1 = u2[..., 0], u2[..., 1]
    # cos(theta) = 1 + log(u + (1-u) e^{-2 kappa}) / kappa
    safe_kappa = jnp.maximum(kappa, MIN_KAPPA)
    cos_theta = 1.0 + jnp.log1p(-(1.0 - jnp.exp(-2.0 * safe_kappa)) * (1.0 - u0)) / safe_kappa
    cos_theta = jnp.where(kappa < MIN_KAPPA, 1.0 - 2.0 * u0, cos_theta)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PI * u1
    t1, t2 = coordinate_system(mu)
    return (
        (sin_theta * jnp.cos(phi))[..., None] * t1
        + (sin_theta * jnp.sin(phi))[..., None] * t2
        + cos_theta[..., None] * mu
    )


def kappa_to_rho(kappa):
    """Mean resultant length rho = coth(kappa) - 1/kappa."""
    k = jnp.maximum(kappa, MIN_KAPPA)
    return jnp.where(
        kappa < MIN_KAPPA, kappa / 3.0, 1.0 / jnp.tanh(k) - 1.0 / k
    )


def rho_to_kappa(rho):
    """Banerjee et al. inversion, clamped."""
    rho = jnp.clip(rho, 0.0, 0.9999)
    k = rho * (3.0 - rho * rho) / jnp.maximum(1.0 - rho * rho, 1e-6)
    return jnp.clip(k, 0.0, MAX_KAPPA)


def _log_c(kappa):
    """log normalizer log(kappa / (2 pi (1 - e^{-2 kappa}))) with the
    exp(-kappa) reference point folded in: pdf = C * exp(kappa*(mu.w - 1))."""
    k = jnp.maximum(kappa, MIN_KAPPA)
    return jnp.log(k) - jnp.log(2.0 * PI) - jnp.log1p(-jnp.exp(-2.0 * k))


# -- mixtures ---------------------------------------------------------------


def mixture_pdf(w, weights, mu, kappa):
    """(...,3), (...,K), (...,K,3), (...,K) -> (...)."""
    p = vmf_pdf(w[..., None, :], mu, kappa)  # (...,K)
    return jnp.sum(weights * p, axis=-1)


def mixture_sample(weights, mu, kappa, u_sel, u2):
    """Pick lobe ~ weights then sample its vMF. Returns (w, pdf)."""
    cdf = jnp.cumsum(weights, axis=-1)
    total = cdf[..., -1:]
    cdf = cdf / jnp.maximum(total, 1e-12)
    k_idx = jnp.sum((u_sel[..., None] >= cdf).astype(jnp.int32), axis=-1)
    k_idx = jnp.clip(k_idx, 0, weights.shape[-1] - 1)
    mu_k = jnp.take_along_axis(mu, k_idx[..., None, None], axis=-2)[..., 0, :]
    kap_k = jnp.take_along_axis(kappa, k_idx[..., None], axis=-1)[..., 0]
    w = vmf_sample(mu_k, kap_k, u2)
    return w, mixture_pdf(w, weights, mu, kappa)


def product_with_vmf(weights, mu, kappa, mu_b, kappa_b):
    """Multiply every mixture lobe by a single vMF lobe (analytic product).

    vMF(mu1,k1) * vMF(mu2,k2) = s * vMF(mu', k') with k'mu' = k1 mu1 + k2 mu2
    and s the integral of the (unnormalized) product — this is how OpenPGL's
    ApplyCosineProduct / ApplySingleLobeHenyeyGreensteinProduct reshape the
    sampling distribution. Returns updated (weights, mu, kappa), weights
    renormalized to sum to the prior total.
    """
    kmu = kappa[..., None] * mu + kappa_b[..., None, None] * mu_b[..., None, :]
    k_new = jnp.sqrt(jnp.maximum(jnp.sum(kmu * kmu, axis=-1), 1e-12))
    mu_new = kmu / jnp.maximum(k_new, 1e-8)[..., None]
    # scale factor: C(k1) C(k2) / C(k') * exp(k' - k1 - k2)  (all in the
    # exp(k(mu.w - 1)) parameterization)
    log_s = (
        _log_c(kappa)
        + _log_c(kappa_b)[..., None]
        - _log_c(k_new)
        + (k_new - kappa - kappa_b[..., None])
    )
    w_new = weights * jnp.exp(jnp.clip(log_s, -60.0, 60.0))
    total_old = jnp.sum(weights, axis=-1, keepdims=True)
    total_new = jnp.sum(w_new, axis=-1, keepdims=True)
    w_new = w_new * total_old / jnp.maximum(total_new, 1e-20)
    k_new = jnp.clip(k_new, 0.0, MAX_KAPPA)
    return w_new, mu_new, k_new


def hg_lobe(wo, g):
    """vMF approximation of the HG lobe around the propagation direction.

    Matches mean cosine: resultant length rho = |g| about -wo (pbrt
    convention: wo points back toward the camera). g=0 -> kappa=0 (uniform).
    """
    mu = -wo * jnp.sign(g)[..., None]
    mu = jnp.where(jnp.abs(g)[..., None] < 1e-5, -wo, mu)
    kappa = rho_to_kappa(jnp.abs(g))
    return mu, kappa


# -- weighted incremental EM -------------------------------------------------


def em_update(stats_w, stats_s, weights, mu, kappa, cell_id, n_cells,
              sample_dir, sample_w, decay=1.0, prior_w=0.1):
    """One incremental weighted-EM step over a batch of directional samples.

    stats_w: (C,K) accumulated responsibility mass; stats_s: (C,K,3)
    accumulated weighted direction sums (the sufficient statistics).
    cell_id: (N,) spatial cell per sample; sample_dir: (N,3); sample_w: (N,).
    Returns (stats_w, stats_s, weights, mu, kappa) with the mixture
    parameters recomputed from the decayed+updated statistics.

    This is the batched analog of OpenPGL's per-leaf VMM updates
    (Field::Update, SURVEY.md §3.3): E-step responsibilities against the
    current mixture, M-step via segment-sum scatter into per-cell stats.
    """
    K = weights.shape[-1]
    # robust weight clamp: a single 1/r^2 outlier must not rank-1-collapse
    # a cell's mixture (collapsed lobes then reject all future data)
    w_cap = 10.0 * jnp.quantile(jnp.where(sample_w > 0, sample_w, 0.0), 0.99) + 1e-6
    sample_w = jnp.minimum(sample_w, w_cap)

    # E-step: responsibilities under current per-cell mixtures, with a
    # uniform floor so degenerate mixtures still accept data
    w_g = weights[cell_id]  # (N,K)
    mu_g = mu[cell_id]  # (N,K,3)
    kap_g = kappa[cell_id]  # (N,K)
    p = vmf_pdf(sample_dir[..., None, :], mu_g, kap_g)  # (N,K)
    resp = w_g * p + 1e-4 * INV_4PI
    resp = resp / jnp.maximum(jnp.sum(resp, -1, keepdims=True), 1e-20)
    wr = resp * sample_w[..., None]  # (N,K)

    # M-step: scatter-add into per-cell sufficient statistics
    batch_w = jnp.zeros_like(stats_w).at[cell_id].add(wr)
    batch_s = jnp.zeros_like(stats_s).at[cell_id].add(
        wr[..., None] * sample_dir[..., None, :]
    )
    stats_w = stats_w * decay + batch_w
    stats_s = stats_s * decay + batch_s

    # parameter recomputation (with a weak uniform prior for stability)
    tot = jnp.sum(stats_w, -1, keepdims=True)
    new_weights = (stats_w + prior_w) / (tot + K * prior_w)
    s_norm = jnp.sqrt(jnp.maximum(jnp.sum(stats_s * stats_s, -1), 1e-20))
    new_mu = stats_s / s_norm[..., None]
    rho = s_norm / jnp.maximum(stats_w, 1e-12)
    new_kappa = rho_to_kappa(rho)
    # cells/lobes with no data keep their old parameters
    has_data = stats_w > 1e-8
    weights = jnp.where(has_data, new_weights, weights)
    mu = jnp.where(has_data[..., None], new_mu, mu)
    kappa = jnp.where(has_data, new_kappa, kappa)
    # renormalize weights
    weights = weights / jnp.maximum(jnp.sum(weights, -1, keepdims=True), 1e-12)
    return stats_w, stats_s, weights, mu, kappa
