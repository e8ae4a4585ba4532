"""Analytic daylight sky model for `imgtool makesky`.

Role of the reference's makesky (cmd/imgtool.cpp:170, backed by the vendored
ArHosek skymodel in src/ext/skymodel). This implementation uses the
Preetham et al. 1999 analytic sky (the Hosek-Wilkie predecessor): the
five-parameter Perez luminance/chromaticity distribution driven by
turbidity, with a simple sun disk. Output is an equal-area octahedral map
(the renderer's ImageInfiniteLight parameterization, vecmath.h
EqualAreaSquareToSphere).
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


def make_sky_equal_area(resolution, elevation_deg, turbidity=3.0,
                        albedo=0.5):
    """Equal-area sky env map (S,S,3). `albedo` lifts the below-horizon
    hemisphere with a constant ambient bounce (the reference passes ground
    albedo to the Hosek model)."""
    S = int(resolution)
    u = (np.arange(S) + 0.5) / S
    U, V = np.meshgrid(u, u, indexing="xy")
    sq = np.stack([U, V], -1).reshape(-1, 2)
    d = np.asarray(equal_area_square_to_sphere(sq))
    elev = np.radians(elevation_deg)
    sun_dir = np.asarray([0.0, np.sin(elev), -np.cos(elev)])
    rgb = sky_radiance(d, sun_dir, turbidity)
    # ground: albedo-scaled average sky radiance
    up_mask = d[:, 1] > 0
    if up_mask.any():
        ground = albedo * rgb[up_mask].mean(0) / np.pi
        rgb = np.where(up_mask[:, None], rgb, ground)
    return rgb.reshape(S, S, 3)
