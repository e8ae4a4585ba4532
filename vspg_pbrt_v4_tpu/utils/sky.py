"""Analytic daylight sky models for `imgtool makesky`.

Role of the reference's makesky (cmd/imgtool.cpp:170, backed by the vendored
ArHosek skymodel in src/ext/skymodel). Two models:

- **Hosek-Wilkie 2012** (default, the reference's model): the RGB
  tristimulus variant driven by the paper's published coefficient fits
  (data/hosek_rgb.npz), validated against the vendored C implementation
  (tests/test_tools.py golden values).
- **Preetham 1999** (the predecessor, kept for comparison): five-parameter
  Perez luminance/chromaticity distribution.

Output is an equal-area octahedral map (the renderer's ImageInfiniteLight
parameterization, vecmath.h EqualAreaSquareToSphere).
"""

from __future__ import annotations

import numpy as np

from .vecmath import equal_area_square_to_sphere


def _perez(theta, gamma, A, B, C, D, E):
    cos_t = np.clip(np.cos(theta), 1e-3, 1.0)
    return ((1.0 + A * np.exp(B / cos_t))
            * (1.0 + C * np.exp(D * gamma) + E * np.cos(gamma) ** 2))


def _xyY_to_rgb(x, y, Y):
    yy = np.maximum(y, 1e-6)
    X = x * Y / yy
    Z = (1.0 - x - y) * Y / yy
    r = 3.2406 * X - 1.5372 * Y - 0.4986 * Z
    g = -0.9689 * X + 1.8758 * Y + 0.0415 * Z
    b = 0.0557 * X - 0.2040 * Y + 1.0570 * Z
    return np.stack([r, g, b], -1).clip(0.0, None)


def sky_radiance(d, sun_dir, turbidity=3.0):
    """Preetham sky radiance for directions d (...,3), z-up convention
    internally; returns linear RGB (...,3) roughly in cd/m^2 * 1e-4."""
    T = float(turbidity)
    up = np.asarray([0.0, 1.0, 0.0])
    cos_theta = np.clip(d @ up, -1.0, 1.0)
    theta = np.arccos(np.clip(cos_theta, 1e-4, 1.0))
    cos_gamma = np.clip(d @ sun_dir, -1.0, 1.0)
    gamma = np.arccos(cos_gamma)
    theta_s = np.arccos(np.clip(sun_dir @ up, 1e-4, 1.0))

    # Perez coefficients (Preetham Table 2)
    AY = 0.1787 * T - 1.4630
    BY = -0.3554 * T + 0.4275
    CY = -0.0227 * T + 5.3251
    DY = 0.1206 * T - 2.5771
    EY = -0.0670 * T + 0.3703
    Ax = -0.0193 * T - 0.2592
    Bx = -0.0665 * T + 0.0008
    Cx = -0.0004 * T + 0.2125
    Dx = -0.0641 * T - 0.8989
    Ex = -0.0033 * T + 0.0452
    Ay = -0.0167 * T - 0.2608
    By = -0.0950 * T + 0.0092
    Cy = -0.0079 * T + 0.2102
    Dy = -0.0441 * T - 1.6537
    Ey = -0.0109 * T + 0.0529

    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2.0 * theta_s)
    Yz = (4.0453 * T - 4.9710) * np.tan(chi) - 0.2155 * T + 2.4192  # kcd/m2
    ts = theta_s
    tv = np.asarray([ts**2, ts, 1.0])
    xz = (np.asarray([0.00166, -0.00375, 0.00209, 0.0]) @ np.asarray(
        [ts**3, ts**2, ts, 1.0])) * T**2 + (np.asarray(
            [-0.02903, 0.06377, -0.03202, 0.00394]) @ np.asarray(
                [ts**3, ts**2, ts, 1.0])) * T + (np.asarray(
                    [0.11693, -0.21196, 0.06052, 0.25886]) @ np.asarray(
                        [ts**3, ts**2, ts, 1.0]))
    yz = (np.asarray([0.00275, -0.00610, 0.00317, 0.0]) @ np.asarray(
        [ts**3, ts**2, ts, 1.0])) * T**2 + (np.asarray(
            [-0.04214, 0.08970, -0.04153, 0.00516]) @ np.asarray(
                [ts**3, ts**2, ts, 1.0])) * T + (np.asarray(
                    [0.15346, -0.26756, 0.06670, 0.26688]) @ np.asarray(
                        [ts**3, ts**2, ts, 1.0]))
    del tv

    def ratio(A, B, C, D, E, zenith):
        num = _perez(theta, gamma, A, B, C, D, E)
        den = _perez(0.0, theta_s, A, B, C, D, E)
        return zenith * num / np.maximum(den, 1e-9)

    Y = ratio(AY, BY, CY, DY, EY, Yz)
    x = ratio(Ax, Bx, Cx, Dx, Ex, xz)
    y = ratio(Ay, By, Cy, Dy, Ey, yz)
    rgb = _xyY_to_rgb(x, y, np.maximum(Y, 0.0))
    # below-horizon: fade to ground black
    rgb = np.where((cos_theta < 0.0)[..., None], 0.0, rgb)
    # sun disk (~0.27 deg radius, simple constant radiance patch)
    sun = gamma < np.radians(0.27)
    rgb = np.where(sun[..., None], rgb + np.asarray([4e3, 3.6e3, 3.2e3]),
                   rgb)
    return rgb


# -- Hosek-Wilkie 2012 ("An Analytic Model for Full Spectral Sky-Dome
# Radiance") — the model the reference's makesky uses (cmd/imgtool.cpp:326,
# src/ext/skymodel/ArHosekSkyModel.c). This is the RGB tristimulus variant
# (arhosek_tristim_skymodel_radiance); the reference evaluates the spectral
# variant at 13 wavelengths and converts through ACES2065-1 — same model,
# same coefficient fits, different integration path. The coefficient
# datasets (data/hosek_rgb.npz) are the paper's published fits extracted
# from the vendored ArHosekSkyModelData_RGB.h (numeric data, not code).

_HOSEK_TABLES = None


def _hosek_tables():
    global _HOSEK_TABLES
    if _HOSEK_TABLES is None:
        import os

        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "hosek_rgb.npz")
        z = np.load(path)
        _HOSEK_TABLES = (np.asarray(z["config"], np.float64),
                         np.asarray(z["radiance"], np.float64))
    return _HOSEK_TABLES


def _hosek_config(turbidity, albedo, solar_elevation):
    """ArHosekSkyModel_CookConfiguration (ArHosekSkyModel.c:147): quintic
    Bezier over elevation^(1/3), linear blends over the integer-turbidity
    bracket and the two albedo datasets. Returns (cfg (3,9), rad (3,))."""
    cfg_t, rad_t = _hosek_tables()  # (3,2,10,6,9), (3,2,10,6)
    T = float(np.clip(turbidity, 1.0, 10.0))
    a = float(np.clip(albedo, 0.0, 1.0))
    it = min(int(T), 9)  # bracket [it, it+1], dataset index it-1
    rem = T - it
    x = (max(float(solar_elevation), 0.0) / (np.pi / 2.0)) ** (1.0 / 3.0)
    # quintic Bernstein weights over the 6 elevation knots
    w = np.asarray([(1 - x) ** 5,
                    5 * (1 - x) ** 4 * x,
                    10 * (1 - x) ** 3 * x ** 2,
                    10 * (1 - x) ** 2 * x ** 3,
                    5 * (1 - x) * x ** 4,
                    x ** 5])

    def blend(tab):  # tab: (3, 2, 10, 6, ...) -> (3, ...)
        lo = np.tensordot(tab[:, :, it - 1], w, axes=([2], [0]))
        hi = (np.tensordot(tab[:, :, min(it, 9)], w, axes=([2], [0]))
              if rem > 0 else lo)
        per_albedo = lo * (1.0 - rem) + hi * rem  # (3, 2, ...)
        return per_albedo[:, 0] * (1.0 - a) + per_albedo[:, 1] * a

    return blend(cfg_t), blend(rad_t)


def hosek_sky_radiance(d, sun_dir, turbidity=3.0, albedo=0.5,
                       sun_disc=True):
    """Hosek-Wilkie RGB sky radiance for directions d (...,3), y-up.
    Below-horizon directions return 0 (imgtool.cpp:385 skips the downward
    hemisphere). The 9-coefficient distribution follows
    ArHosekSkyModel_GetRadianceInternal (ArHosekSkyModel.c:291)."""
    d = np.asarray(d, np.float64)
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    up = np.asarray([0.0, 1.0, 0.0])
    sun_dir = np.asarray(sun_dir, np.float64)
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    cos_theta = np.clip(d @ up, -1.0, 1.0)
    cos_gamma = np.clip(d @ sun_dir, -1.0, 1.0)
    gamma = np.arccos(cos_gamma)
    solar_elev = np.pi / 2.0 - np.arccos(np.clip(sun_dir @ up, -1.0, 1.0))
    cfg, rad = _hosek_config(turbidity, albedo, solar_elev)  # (3,9), (3,)

    ct = np.maximum(cos_theta, 0.0)[..., None]  # (...,1) broadcast vs (3,)
    cg = cos_gamma[..., None]
    g = gamma[..., None]
    A, B, C, D, E, F, G, H, I = (cfg[:, i] for i in range(9))
    expM = np.exp(E * g)
    rayM = cg * cg
    mieM = (1.0 + cg * cg) / np.power(1.0 + I * I - 2.0 * I * cg, 1.5)
    zenith = np.sqrt(ct)
    L = ((1.0 + A * np.exp(B / (ct + 0.01)))
         * (C + D * expM + F * rayM + G * mieM + H * zenith)) * rad
    L = np.where((cos_theta <= 0.0)[..., None], 0.0, L)
    if sun_disc:
        # limb-darkened solar disc (arhosekskymodel_solar_radiance path;
        # 0.51 deg diameter). The spectral solar dataset isn't vendored
        # here, so the disc radiance is derived physically instead:
        # extraterrestrial solar spectral radiance E0/omega_sun attenuated
        # by the Preetham/Iqbal direct-beam transmittance (Rayleigh +
        # aerosol + ozone at the RGB primaries' representative
        # wavelengths) — the same units (W m^-2 sr^-1 nm^-1) as the Hosek
        # RGB radiance dataset the sky term blends.
        sr = np.radians(0.255)
        disc_L = solar_disc_radiance(solar_elev, turbidity)
        ld = np.sqrt(np.clip(1.0 - (g / sr) ** 2, 0.0, 1.0))
        # disc-area mean of (0.35 + 0.65 ld) is 0.35 + 0.65*(2/3): divide
        # it out so the profile preserves the disc's mean radiance
        prof = (0.35 + 0.65 * ld) / (0.35 + 0.65 * (2.0 / 3.0))
        disc = (g < sr) & (cos_theta > 0.0)[..., None]
        L = np.where(disc, L + disc_L * prof, L)
    return np.clip(L, 0.0, None)


def solar_disc_radiance(solar_elev, turbidity=3.0):
    """Mean solar-disc RGB radiance (W m^-2 sr^-1 nm^-1) at the given
    solar elevation (radians) and turbidity.

    Direct-beam transmittance follows Preetham App. A / Iqbal: relative
    air mass m = 1/(cos ths + 0.15 (93.885 - ths_deg)^-1.253), Rayleigh
    tau_R = 0.008735 lam^-4.08, aerosol tau_A = beta lam^-1.3 with
    beta = 0.04608 T - 0.04586, ozone tau_O = k_o * 0.35 cm; evaluated at
    612/549/465 nm for R/G/B. Extraterrestrial spectral irradiance at
    those wavelengths (Wehrli 1985): ~(1.69, 1.90, 2.05) W m^-2 nm^-1;
    dividing by the sun's solid angle 2 pi (1 - cos 0.255 deg) gives the
    unattenuated disc radiance.

    Units: the Hosek RGB dataset is BAND-INTEGRATED spectral radiance
    (each channel tiles ~1/3 of the ~340 nm visible range), so the
    per-nm solar irradiance is scaled by that band width to land in the
    same units as the sky term (cross-check: the resulting direct-to-
    diffuse horizontal irradiance ratio is ~2 at T=3, elev 30 deg —
    the measured clear-sky range)."""
    band_nm = 340.0 / 3.0  # per-channel visible band width
    lam = np.asarray([0.612, 0.549, 0.465])  # um
    E0 = np.asarray([1.69, 1.90, 2.05]) * band_nm  # W m^-2 per band
    omega_sun = 2.0 * np.pi * (1.0 - np.cos(np.radians(0.255)))
    theta_s = np.clip(np.pi / 2.0 - solar_elev, 0.0, np.radians(90.0))
    m = 1.0 / (np.cos(theta_s)
               + 0.15 * (93.885 - np.degrees(theta_s)) ** -1.253)
    beta = 0.04608 * turbidity - 0.04586
    tau_r = 0.008735 * lam ** -4.08
    tau_a = beta * lam ** -1.3
    k_o = np.asarray([0.124, 0.095, 0.008])  # Chappuis band, cm^-1
    tau_o = k_o * 0.35
    trans = np.exp(-m * (tau_r + tau_a + tau_o))
    return E0 / omega_sun * trans


def make_sky_equal_area(resolution, elevation_deg, turbidity=3.0,
                        albedo=0.5, model="hosek"):
    """Equal-area sky env map (S,S,3) — imgtool makesky
    (cmd/imgtool.cpp:326). model='hosek' (the reference's ArHosek path) or
    'preetham' (the 1999 predecessor kept for comparison)."""
    S = int(resolution)
    u = (np.arange(S) + 0.5) / S
    U, V = np.meshgrid(u, u, indexing="xy")
    sq = np.stack([U, V], -1).reshape(-1, 2)
    d = np.asarray(equal_area_square_to_sphere(sq))
    elev = np.radians(elevation_deg)
    sun_dir = np.asarray([0.0, np.sin(elev), -np.cos(elev)])
    if model == "hosek":
        rgb = hosek_sky_radiance(d, sun_dir, turbidity, albedo)
        return rgb.reshape(S, S, 3).astype(np.float32)
    rgb = sky_radiance(d, sun_dir, turbidity)
    # ground: albedo-scaled average sky radiance
    up_mask = d[:, 1] > 0
    if up_mask.any():
        ground = albedo * rgb[up_mask].mean(0) / np.pi
        rgb = np.where(up_mask[:, None], rgb, ground)
    return rgb.reshape(S, S, 3)
