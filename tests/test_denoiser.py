"""Learned ISGB denoiser (guiding/denoiser.py) — kernel-predicting U-Net
trained self-supervised (noise2noise) on ISGB split halves.

Test idiom (SURVEY §4): statistical validation against analytic
expectations — the untrained head must reproduce its Gaussian
initialization exactly, training must beat the noisy input on held-out
clean data, and the full ISGB integration must keep estimates finite and
in-range."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.guiding import denoiser as dn
from vspg_pbrt_v4_tpu.models.guiding.isgb import (ISGB, isgb_add_samples,
                                                  isgb_update)


def _clean_image(ny=32, nx=32):
    y, x = np.mgrid[0:ny, 0:nx] / ny
    img = np.stack([0.2 + 0.8 * (x > 0.5), 0.5 + 0.4 * np.sin(6 * y),
                    0.3 + 0.1 * x * y], -1)
    return jnp.asarray(img, jnp.float32)


@pytest.mark.slow
def test_untrained_head_is_gaussian():
    """Zero head weights + log-Gaussian bias => predicted kernels equal
    the init Gaussian everywhere, regardless of trunk activations."""
    params = dn.init_params(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, dn._NFEAT))
    kern = dn.predict_kernels(params, feats)
    g = jax.nn.softmax(dn._gaussian_log_bias())
    assert np.allclose(np.asarray(kern[0, 3, 5]), np.asarray(g), atol=1e-5)
    # kernels are convex combinations
    assert np.allclose(np.asarray(kern.sum(-1)), 1.0, atol=1e-5)


def test_apply_kernels_preserves_constants():
    """A convex-combination filter maps a constant image to itself (edge
    padding included)."""
    params = dn.init_params()
    img = jnp.full((1, 12, 12, 3), 0.7)
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 12, dn._NFEAT))
    out = dn.apply_kernels(dn.predict_kernels(params, feats), img)
    assert np.allclose(np.asarray(out), 0.7, atol=1e-5)


@pytest.mark.slow
def test_noise2noise_training_beats_noisy_input():
    """Train on two independent noisy halves; the denoised full buffer
    must be closer to the clean image than the noisy buffer is."""
    clean = _clean_image()
    ny, nx, _ = clean.shape
    key = jax.random.PRNGKey(3)
    ka, kb = jax.random.split(key)
    noise_a = clean * (1.0 + 0.6 * jax.random.normal(ka, clean.shape))
    noise_b = clean * (1.0 + 0.6 * jax.random.normal(kb, clean.shape))
    full = 0.5 * (noise_a + noise_b)
    albedo = clean
    normal = jnp.zeros_like(clean).at[..., 2].set(1.0)
    n1 = jnp.ones((ny, nx))
    vsp = jnp.full((ny, nx), 0.5)
    params = dn.init_params(jax.random.PRNGKey(4))
    params, opt, out_c, out_v = dn.train_and_denoise(
        params, None, noise_a, n1, noise_b, n1, full, 2 * n1, albedo,
        normal, vsp, steps=60, lr=4e-3)
    mse_out = float(jnp.mean((out_c - clean) ** 2))
    mse_in = float(jnp.mean((full - clean) ** 2))
    assert np.isfinite(np.asarray(out_c)).all()
    assert mse_out < 0.6 * mse_in, (mse_out, mse_in)
    # jointly-filtered constant VSP stays constant
    assert np.allclose(np.asarray(out_v), 0.5, atol=1e-4)


def test_training_skipped_when_half_empty():
    """First wave: B half empty -> lax.cond skips training, params
    unchanged, output falls back to the Gaussian-init filter."""
    clean = _clean_image(16, 16)
    n1 = jnp.ones((16, 16))
    n0 = jnp.zeros((16, 16))
    params = dn.init_params()
    albedo = clean
    normal = jnp.zeros_like(clean)
    p2, _, out_c, _ = dn.train_and_denoise(
        params, None, clean, n1, jnp.zeros_like(clean), n0, clean, n1,
        albedo, normal, jnp.full((16, 16), -1.0), steps=8)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(out_c)).all()


@pytest.mark.slow
def test_isgb_unet_integration():
    """ISGB with denoiser='unet': split-half accumulation + update keeps
    estimates finite; vsp in [0,1] where sampled."""
    res = (16, 16)
    buf = ISGB.make(res, "variance", denoiser="unet")
    P = res[0] * res[1]
    pid = jnp.arange(P)
    key = jax.random.PRNGKey(5)
    for wave in range(2):
        L = 0.5 + 0.2 * jax.random.normal(
            jax.random.fold_in(key, wave), (P, 3))
        alb = jnp.full((P, 3), 0.6)
        nrm = jnp.zeros((P, 3)).at[:, 2].set(1.0)
        fv = (jax.random.uniform(jax.random.fold_in(key, 10 + wave),
                                 (P,)) < 0.7)
        buf = isgb_add_samples(buf, pid, jnp.maximum(L, 0.0), alb, nrm, fv,
                               jnp.ones((P,), bool), half=wave % 2)
    assert float(buf.n_a.sum()) == P  # only wave 0 went to the A half
    buf = isgb_update(buf)
    assert bool(buf.ready)
    c = np.asarray(buf.contrib_est)
    v = np.asarray(buf.vsp_est)
    assert np.isfinite(c).all() and (c >= 0).all()
    assert ((v >= -1.0) & (v <= 1.0)).all()
    assert (v >= 0).any()
