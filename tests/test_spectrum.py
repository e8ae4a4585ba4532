"""Spectral (N=4) machinery: wavelength sampling pdfs, Smits uplift
round-trip through the CIE sensor, hero-channel helpers."""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.utils import spectrum as sp


def test_visible_sampling_pdf_normalized():
    # pdf integrates to 1 over the visible range
    lam = jnp.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, 4001)
    pdf = np.asarray(sp.visible_wavelengths_pdf(lam))
    integral = np.trapezoid(pdf, np.asarray(lam))
    assert abs(integral - 1.0) < 1e-3, integral
    # sampling matches its pdf (chi^2-style histogram check)
    u = jnp.asarray(np.random.default_rng(0).random(200_000, np.float32))
    lam_s, pdf_s = sp.sample_wavelengths_visible(u, n=1)
    lam_s = np.asarray(lam_s)[:, 0]
    hist, edges = np.histogram(lam_s, bins=47,
                               range=(sp.LAMBDA_MIN, sp.LAMBDA_MAX),
                               density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    ref = np.asarray(sp.visible_wavelengths_pdf(jnp.asarray(centers)))
    assert np.allclose(hist, ref, atol=2e-4), np.abs(hist - ref).max()


def test_hero_rotation_covers_range():
    lam, pdf = sp.sample_wavelengths_uniform(jnp.asarray([0.1]), n=4)
    lam = np.asarray(lam)[0]
    assert len(set(np.round(lam, 3))) == 4
    assert ((lam >= sp.LAMBDA_MIN) & (lam <= sp.LAMBDA_MAX)).all()


def test_smits_uplift_roundtrip():
    """rgb -> spectrum -> CIE integration -> rgb stays close (Smits' fit is
    a few % accurate for reflectances; we check against D65-less flat
    illuminant so tolerances are loose but the mapping must be monotone and
    near-diagonal)."""
    rng = np.random.default_rng(1)
    rgbs = np.concatenate([
        np.eye(3, dtype=np.float32) * 0.8,
        np.asarray([[0.5, 0.5, 0.5], [0.9, 0.6, 0.1], [0.1, 0.4, 0.8]],
                   np.float32),
        rng.random((8, 3)).astype(np.float32)], 0)
    # dense uniform wavelength sampling for an accurate integral
    lam = jnp.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, 472)
    pdf = jnp.full(lam.shape, 1.0 / (sp.LAMBDA_MAX - sp.LAMBDA_MIN))
    refl = sp.rgb_to_spectrum(jnp.asarray(rgbs)[:, None, :].repeat(472, 1)
                              .reshape(-1, 472, 3)[:, 0, :],
                              jnp.broadcast_to(lam, (len(rgbs), 472)))
    assert (np.asarray(refl) >= 0).all()
    assert np.asarray(refl).max() < 1.2
    xyz = sp.spectrum_to_xyz(refl, jnp.broadcast_to(lam, refl.shape),
                             jnp.broadcast_to(pdf, refl.shape))
    got = np.asarray(sp.xyz_to_rgb(xyz))
    # normalize by the white response (flat illuminant, not D65)
    white = sp.rgb_to_spectrum(jnp.ones((1, 3)),
                               jnp.broadcast_to(lam, (1, 472)))
    wx = sp.spectrum_to_xyz(white, jnp.broadcast_to(lam, (1, 472)),
                            jnp.broadcast_to(pdf, (1, 472)))
    wrgb = np.asarray(sp.xyz_to_rgb(wx))[0]
    got = got / wrgb
    err = np.abs(got - rgbs)
    assert err.max() < 0.15, (err.max(), got[err.max(-1).argmax()],
                              rgbs[err.max(-1).argmax()])
    # grey stays grey
    assert np.abs(got[3] - 0.5).max() < 0.03, got[3]


def test_terminate_secondary():
    pdf = jnp.ones((2, 4)) * 0.25
    t = np.asarray(sp.terminate_secondary(pdf))
    assert np.allclose(t[:, 0], 0.25 / 4)
    assert (t[:, 1:] == 0).all()


def test_sigmoid_polynomial_uplift_beats_smits():
    """The fitted sigmoid-polynomial table (tools/rgb2spec.py — the
    reference's rgb2spec_opt.cpp spectral upsampling) round-trips
    saturated albedos with lower error than the Smits fallback."""
    import numpy as np

    from vspg_pbrt_v4_tpu.utils import spectrum as sp

    tab = sp._sigmoid_table()
    assert tab is not None, "rgb2spec table missing — run tools/rgb2spec"
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(np.concatenate([
        rng.random((64, 3)).astype(np.float32),
        np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0],
                    [0.9, 0.05, 0.02], [0.5, 0.5, 0.5], [0, 0, 0],
                    [1, 1, 1]], np.float32)]))
    lam = jnp.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX,
                       95)[None, :].repeat(rgb.shape[0], 0)
    pdf = jnp.full_like(lam, 1.0 / (sp.LAMBDA_MAX - sp.LAMBDA_MIN))
    back = sp.spectral_to_sensor_rgb(
        sp.rgb_to_spectrum_sigmoid(rgb, lam, tab), lam, pdf)
    err_sig = float(jnp.abs(back - rgb).max())
    old = sp._SIGMOID_TABLE_CACHE
    sp._SIGMOID_TABLE_CACHE = None
    try:
        back2 = sp.spectral_to_sensor_rgb(
            sp.rgb_to_spectrum(rgb, lam), lam, pdf)
    finally:
        sp._SIGMOID_TABLE_CACHE = old
    err_smits = float(jnp.abs(back2 - rgb).max())
    assert err_sig < 0.02, err_sig
    assert err_sig < 0.5 * err_smits, (err_sig, err_smits)
    # reflectance stays physical
    vals = sp.rgb_to_spectrum_sigmoid(rgb, lam, tab)
    assert float(vals.min()) >= 0.0 and float(vals.max()) <= 1.0 + 1e-4
