"""Spectra in RGB rendering mode (N=3), the reference fork's default.

The reference renders with ``PBRT_RGB_RENDERING`` (CMakeLists.txt:119-123):
``SampledSpectrum`` holds 3 RGB channels (util/spectrum.h:40-43) and
``SampledWavelengths`` degenerates to a per-path *hero channel index*
``ChannelIdx() = min(floor(u*3), 2)`` (util/spectrum.h:380-391) used wherever
the volume algebra needs one scalar pdf channel. Here a SampledSpectrum is
just a ``(..., 3)`` float32 array and the hero channel an int32 array; all
spectral data (blackbody, named illuminants) are reduced to RGB host-side.

Full 4-wavelength spectral mode is a later parity phase; the r_u/r_l MIS
algebra is written channel-generically so it carries over.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

N_SPECTRUM_SAMPLES = 3
LAMBDA_MIN, LAMBDA_MAX = 360.0, 830.0
CIE_Y_INTEGRAL = 106.856895


def sample_hero_channel(u):
    """Hero channel index from the wavelength-sample u (spectrum.h:383)."""
    return jnp.minimum(jnp.floor(u * 3.0).astype(jnp.int32), 2)


def hero(s, channel_idx):
    """Select the hero channel of a (...,3) spectrum -> (...)."""
    return jnp.take_along_axis(s, channel_idx[..., None], axis=-1)[..., 0]


def average(s):
    return jnp.mean(s, axis=-1)


def max_component(s):
    return jnp.max(s, axis=-1)


def safe_div_spectrum(a, b):
    return jnp.where(b != 0.0, a / jnp.where(b == 0.0, 1.0, b), 0.0)


def constant(value, shape=()):
    return jnp.full(shape + (N_SPECTRUM_SAMPLES,), value, jnp.float32)


def from_rgb(r, g, b):
    return jnp.stack(
        [jnp.asarray(r, jnp.float32), jnp.asarray(g, jnp.float32), jnp.asarray(b, jnp.float32)],
        axis=-1,
    )


# -- host-side spectral -> RGB reduction -------------------------------------


def blackbody(lam_nm, T):
    """Planck's law, W/(m^2 sr nm-ish scale); numpy host-side."""
    lam = np.asarray(lam_nm, np.float64) * 1e-9
    c, h, kb = 299792458.0, 6.62606957e-34, 1.3806488e-23
    with np.errstate(over="ignore"):
        le = (2 * h * c * c) / (lam**5 * (np.exp((h * c) / (lam * kb * T)) - 1))
    return np.where(T <= 0, 0.0, le)


def blackbody_normalized_rgb(T):
    """Blackbody emission reduced to (linear sRGB) RGB, peak-normalized.

    Host-side stand-in for BlackbodySpectrum -> ToRGBUnbounded in RGB mode.
    """
    lam_max = 2.8977721e-3 / max(T, 1e-6) * 1e9
    norm = 1.0 / blackbody(lam_max, T)
    lams = np.arange(360.0, 831.0, 5.0)
    vals = blackbody(lams, T) * norm
    from .colorspace import spectrum_samples_to_rgb

    return spectrum_samples_to_rgb(lams, vals)


# ---------------------------------------------------------------------------
# Full spectral (N=4) machinery — hero-wavelength sampling, uplift, sensor
# (util/spectrum.h SampledWavelengths:300-378, SampleVisible,
# RGBAlbedoSpectrum). The wavefront integrators run in RGB mode by default;
# these primitives are the N=4 building blocks (spectral film / dispersion).
# ---------------------------------------------------------------------------

N_SPECTRAL = 4


def sample_wavelengths_uniform(u, n=N_SPECTRAL):
    """Hero wavelength uniform in [LAMBDA_MIN, LAMBDA_MAX), secondaries
    rotated by i/n (SampledWavelengths::SampleUniform)."""
    u = jnp.asarray(u)
    span = LAMBDA_MAX - LAMBDA_MIN
    ui = (u[..., None] + jnp.arange(n) / n) % 1.0
    lam = LAMBDA_MIN + ui * span
    pdf = jnp.full(lam.shape, 1.0 / span)
    return lam, pdf


def visible_wavelengths_pdf(lam):
    """pdf of SampleVisibleWavelengths (spectrum.h:166-178)."""
    x = 0.0072 * (lam - 538.0)
    pdf = 0.0039398042 / jnp.cosh(x) ** 2
    return jnp.where((lam >= LAMBDA_MIN) & (lam <= LAMBDA_MAX), pdf, 0.0)


def sample_wavelengths_visible(u, n=N_SPECTRAL):
    """Importance-sample the visible range by a smooth luminosity proxy
    (spectrum.h SampleVisibleWavelengths), hero + rotated secondaries."""
    u = jnp.asarray(u)
    ui = (u[..., None] + jnp.arange(n) / n) % 1.0
    lam = 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * ui)
    lam = jnp.clip(lam, LAMBDA_MIN, LAMBDA_MAX)
    return lam, visible_wavelengths_pdf(lam)


# -- Smits (1999) RGB reflectance -> smooth spectrum basis -------------------
# 10 bins spanning 380-720nm (published basis of "An RGB to Spectrum
# Conversion for Reflectances"; the reference instead ships the Jakob-Hanika
# sigmoid coefficient tables — same role, different fit).

_SMITS_LAM0, _SMITS_LAM1 = 380.0, 720.0
_SMITS = {
    "white": (1.0000, 1.0000, 0.9999, 0.9993, 0.9992, 0.9998, 1.0000,
              1.0000, 1.0000, 1.0000),
    "cyan": (0.9710, 0.9426, 1.0007, 1.0007, 1.0007, 1.0007, 0.1564,
             0.0000, 0.0000, 0.0000),
    "magenta": (1.0000, 1.0000, 0.9685, 0.2229, 0.0000, 0.0458, 0.8369,
                1.0000, 1.0000, 0.9959),
    "yellow": (0.0001, 0.0000, 0.1088, 0.6651, 1.0000, 1.0000, 0.9996,
               0.9586, 0.9685, 0.9840),
    "red": (0.1012, 0.0515, 0.0000, 0.0000, 0.0000, 0.0000, 0.8325,
            1.0149, 1.0149, 1.0149),
    "green": (0.0000, 0.0000, 0.0273, 0.7937, 1.0000, 0.9418, 0.1719,
              0.0000, 0.0000, 0.0025),
    "blue": (1.0000, 1.0000, 0.8916, 0.3323, 0.0000, 0.0000, 0.0003,
             0.0369, 0.0483, 0.0496),
}
# numpy on purpose: module-level jnp.asarray would initialise a JAX backend
# at import time, which breaks the driver's CPU-pinned multichip dryrun.
_SMITS_ARR = np.asarray(
    [_SMITS[k] for k in
     ("white", "cyan", "magenta", "yellow", "red", "green", "blue")],
    np.float32)  # (7, 10)


def _smits_eval(weights, lam):
    """weights: (...,7); lam: (...,N) -> (...,N) reflectance."""
    t = (lam - _SMITS_LAM0) / (_SMITS_LAM1 - _SMITS_LAM0) * 10.0 - 0.5
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, 9)
    i1 = jnp.clip(i0 + 1, 0, 9)
    f = jnp.clip(t - i0, 0.0, 1.0)
    b0 = _SMITS_ARR.T[i0]  # (...,N,7)
    b1 = _SMITS_ARR.T[i1]
    basis = (1 - f)[..., None] * b0 + f[..., None] * b1
    return jnp.sum(weights[..., None, :] * basis, axis=-1)


_SIGMOID_TABLE_CACHE = "unloaded"


def _sigmoid_table():
    """Lazy-load the fitted sigmoid-polynomial coefficient table
    (tools/rgb2spec.py — the reference's RGBToSpectrumTable analog,
    cmd/rgb2spec_opt.cpp + util/spectrum.cpp). None if not generated."""
    global _SIGMOID_TABLE_CACHE
    if isinstance(_SIGMOID_TABLE_CACHE, str):
        try:
            from ..tools.rgb2spec import load_table

            _SIGMOID_TABLE_CACHE = load_table()
        except Exception:
            _SIGMOID_TABLE_CACHE = None
    return _SIGMOID_TABLE_CACHE


def rgb_to_spectrum_sigmoid(rgb, lam, table):
    """Sigmoid-polynomial reflectance uplift (util/color.h
    RGBSigmoidPolynomial + util/spectrum.cpp RGBAlbedoSpectrum): trilinear
    coefficient fetch from the fitted table, then
    s(c0 t^2 + c1 t + c2) at t = (lam-360)/470."""
    res = table.shape[1]
    tab = jnp.asarray(table)  # (3, res, res, res, 3)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.argmax(rgb, axis=-1)
    m = jnp.max(rgb, axis=-1)
    c1 = jnp.take_along_axis(rgb, ((maxc + 1) % 3)[..., None], -1)[..., 0]
    c2v = jnp.take_along_axis(rgb, ((maxc + 2) % 3)[..., None], -1)[..., 0]
    safe_m = jnp.maximum(m, 1e-8)
    zf = jnp.clip(m, 0.0, 1.0) * (res - 1)
    xf = jnp.clip(c1 / safe_m, 0.0, 1.0) * (res - 1)
    yf = jnp.clip(c2v / safe_m, 0.0, 1.0) * (res - 1)
    z0 = jnp.clip(jnp.floor(zf).astype(jnp.int32), 0, res - 2)
    x0 = jnp.clip(jnp.floor(xf).astype(jnp.int32), 0, res - 2)
    y0 = jnp.clip(jnp.floor(yf).astype(jnp.int32), 0, res - 2)
    wz, wx, wy = zf - z0, xf - x0, yf - y0
    coef = 0.0
    for dz, wz_ in ((0, 1.0 - wz), (1, wz)):
        for dx_, wx_ in ((0, 1.0 - wx), (1, wx)):
            for dy_, wy_ in ((0, 1.0 - wy), (1, wy)):
                c = tab[maxc, z0 + dz, x0 + dx_, y0 + dy_]  # (...,3)
                coef = coef + (wz_ * wx_ * wy_)[..., None] * c
    t = (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)  # (...,N)
    p = (coef[..., 0:1] * t * t + coef[..., 1:2] * t + coef[..., 2:3])
    s = 0.5 + p / (2.0 * jnp.sqrt(1.0 + p * p))
    return jnp.where(m[..., None] > 0, s, 0.0)


def rgb_to_spectrum(rgb, lam):
    """Evaluate a smooth reflectance spectrum matching `rgb` at wavelengths
    lam (...,N): the fitted sigmoid-polynomial table when generated
    (tools/rgb2spec.py, the reference's spectral upsampling), else Smits'
    white + cyan/magenta/yellow + r/g/b basis decomposition."""
    table = _sigmoid_table()
    if table is not None:
        return rgb_to_spectrum_sigmoid(rgb, lam, table)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    lo = jnp.minimum(jnp.minimum(r, g), b)
    hi = jnp.maximum(jnp.maximum(r, g), b)
    mid = r + g + b - lo - hi
    # white = min; the complement basis of the SMALLEST channel gets
    # (mid - min); the basis of the LARGEST channel gets (max - mid)
    # (Smits' six orderings, written branchless)
    is_min_r = (r <= g) & (r <= b)
    is_min_g = ~is_min_r & (g <= b)
    is_min_b = ~is_min_r & ~is_min_g
    is_max_r = (r >= g) & (r >= b)
    is_max_g = ~is_max_r & (g >= b)
    is_max_b = ~is_max_r & ~is_max_g
    sec = mid - lo
    pri = hi - mid
    weights = jnp.stack([
        lo,
        jnp.where(is_min_r, sec, 0.0),   # cyan
        jnp.where(is_min_g, sec, 0.0),   # magenta
        jnp.where(is_min_b, sec, 0.0),   # yellow
        jnp.where(is_max_r, pri, 0.0),   # red
        jnp.where(is_max_g, pri, 0.0),   # green
        jnp.where(is_max_b, pri, 0.0),   # blue
    ], -1)
    return jnp.maximum(_smits_eval(weights, lam), 0.0)


def uplift_unbounded(rgb, lam):
    """Uplift an unbounded RGB quantity (radiance, sigma_t) to spectral
    samples at lam: normalize by the max channel, uplift the normalized
    reflectance-like RGB, rescale (the role of RGBUnboundedSpectrum /
    RGBIlluminantSpectrum, util/spectrum.h; equal-energy illuminant
    convention — see spectral_to_sensor_rgb for the matching sensor)."""
    m = jnp.max(rgb, axis=-1, keepdims=True)
    norm = jnp.where(m > 0, rgb / jnp.where(m > 0, m, 1.0), 0.0)
    return m * rgb_to_spectrum(norm, lam)


def spectrum_to_xyz(values, lam, pdf):
    """MC sensor integration: values/pdf against the CIE curves -> XYZ
    (spectrum.h SampledSpectrum::ToXYZ)."""
    from .colorspace import cie_x, cie_y, cie_z

    w = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-20), 0.0) / values.shape[-1]
    X = jnp.sum(cie_x(lam) * values * w, -1)
    Y = jnp.sum(cie_y(lam) * values * w, -1)
    Z = jnp.sum(cie_z(lam) * values * w, -1)
    return jnp.stack([X, Y, Z], -1) / CIE_Y_INTEGRAL


_XYZ2RGB = np.asarray([[3.2406, -1.5372, -0.4986],
                       [-0.9689, 1.8758, 0.0415],
                       [0.0557, -0.2040, 1.0570]], np.float32)


def xyz_to_rgb(xyz):
    return xyz @ _XYZ2RGB.T


def spectral_to_sensor_rgb(values, lam, pdf):
    """Spectral MC samples -> output linear RGB with equal-energy white
    balance: a flat unit spectrum maps to exactly (1,1,1), so RGB scenes
    uplifted with the equal-energy convention (uplift_unbounded /
    rgb_to_spectrum) round-trip gray values exactly (the role of
    PixelSensor white balancing, film.h:36)."""
    rgb = xyz_to_rgb(spectrum_to_xyz(values, lam, pdf))
    return rgb / _rgb_of_flat()


def _np_g(x, alpha, mu, s1, s2):
    # numpy mirror of colorspace._g: this runs lazily on FIRST USE, which
    # can be inside a jit trace — jnp there would produce tracers that
    # np.trapezoid cannot consume (and import-time jnp is banned: the
    # CPU-pinned multichip dryrun)
    s = np.where(x < mu, s1, s2)
    return alpha * np.exp(-0.5 * ((x - mu) / s) ** 2)


def _np_cie_x(lam):
    return (_np_g(lam, 1.056, 599.8, 37.9, 31.0)
            + _np_g(lam, 0.362, 442.0, 16.0, 26.7)
            + _np_g(lam, -0.065, 501.1, 20.4, 26.2))


def _np_cie_y(lam):
    return (_np_g(lam, 0.821, 568.8, 46.9, 40.5)
            + _np_g(lam, 0.286, 530.9, 16.3, 31.1))


def _np_cie_z(lam):
    return (_np_g(lam, 1.217, 437.0, 11.8, 36.0)
            + _np_g(lam, 0.681, 459.0, 26.0, 13.8))


def _compute_rgb_of_flat():
    """sensor RGB of a flat unit spectrum (dense quadrature, host-side)."""
    lam = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1e-3, 1.0, dtype=np.float64)
    X = float(np.trapezoid(_np_cie_x(lam), lam))
    Y = float(np.trapezoid(_np_cie_y(lam), lam))
    Z = float(np.trapezoid(_np_cie_z(lam), lam))
    xyz = np.asarray([X, Y, Z]) / CIE_Y_INTEGRAL
    return np.asarray(xyz @ np.asarray(_XYZ2RGB).T, np.float32)


_RGB_OF_FLAT_CACHE = None


def _rgb_of_flat():
    """Lazy: computing this runs jnp ops, which must not happen at import
    time (the driver pins jax_platforms *after* importing the package)."""
    global _RGB_OF_FLAT_CACHE
    if _RGB_OF_FLAT_CACHE is None:
        _RGB_OF_FLAT_CACHE = _compute_rgb_of_flat()
    return _RGB_OF_FLAT_CACHE


def terminate_secondary(pdf):
    """Collapse to the hero wavelength after dispersion
    (SampledWavelengths::TerminateSecondary): hero pdf /= N, others 0."""
    n = pdf.shape[-1]
    out = jnp.zeros_like(pdf)
    return out.at[..., 0].set(pdf[..., 0] / n)
