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
