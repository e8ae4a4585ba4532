"""Hosek-Wilkie sky vs the reference's vendored C implementation.

Golden values computed with src/ext/skymodel/ArHosekSkyModel.c
(arhosek_rgb_skymodelstate_alloc_init + arhosek_tristim_skymodel_radiance)
compiled in this container; view direction fixed at 40 deg zenith angle,
25 deg solar-relative azimuth (ref: cmd/imgtool.cpp:326 makesky)."""

import numpy as np

from vspg_pbrt_v4_tpu.utils.sky import hosek_sky_radiance, make_sky_equal_area

# (sun elevation deg, turbidity, albedo, R, G, B)
GOLDEN = [
    (5, 2, 0, 1.49655, 2.24022, 3.04196),
    (5, 2, 0.5, 1.58852, 2.39462, 3.21952),
    (5, 2, 1, 1.6763, 2.54886, 3.39029),
    (5, 3, 0, 1.6524, 2.36636, 3.06452),
    (5, 3, 0.5, 1.74802, 2.5196, 3.2375),
    (5, 3, 1, 1.84372, 2.6743, 3.40363),
    (5, 6, 0, 2.43633, 2.90172, 3.23756),
    (5, 6, 0.5, 2.52056, 3.01267, 3.35823),
    (5, 6, 1, 2.60513, 3.12027, 3.47303),
    (10, 2, 0, 1.79552, 3.05997, 4.74606),
    (10, 2, 0.5, 2.00205, 3.4059, 5.18684),
    (10, 2, 1, 2.2025, 3.7511, 5.61627),
    (10, 3, 0, 2.12181, 3.30538, 4.8288),
    (10, 3, 0.5, 2.31567, 3.64218, 5.26267),
    (10, 3, 1, 2.5082, 3.97825, 5.68761),
    (10, 6, 0, 3.67292, 4.4699, 5.2436),
    (10, 6, 0.5, 3.8562, 4.73537, 5.61674),
    (10, 6, 1, 4.03904, 4.99426, 5.96591),
    (30, 2, 0, 3.31192, 5.48649, 9.41826),
    (30, 2, 0.5, 4.0095, 6.69366, 11.5181),
    (30, 2, 1, 4.5704, 7.75368, 13.4013),
    (30, 3, 0, 4.8089, 6.9116, 10.4545),
    (30, 3, 0.5, 5.56103, 8.15224, 12.4902),
    (30, 3, 1, 6.12788, 9.16231, 14.2739),
    (30, 6, 0, 12.1943, 13.2428, 14.3665),
    (30, 6, 0.5, 13.0589, 14.5508, 16.4542),
    (30, 6, 1, 13.4883, 15.4695, 18.2348),
    (60, 2, 0, 5.02248, 7.41141, 13.4112),
    (60, 2, 0.5, 6.44458, 10.1448, 17.8855),
    (60, 2, 1, 7.23262, 11.8737, 21.2787),
    (60, 3, 0, 8.48261, 11.0736, 16.2662),
    (60, 3, 0.5, 10.3956, 14.1702, 21.0022),
    (60, 3, 1, 10.907, 15.4673, 24.1132),
    (60, 6, 0, 24.5928, 27.0569, 29.6346),
    (60, 6, 0.5, 28.5944, 31.5735, 34.6654),
    (60, 6, 1, 27.1767, 31.6366, 36.7742),
]


def _view():
    theta = np.radians(40.0)
    return np.array([np.sin(theta) * np.sin(np.radians(25)), np.cos(theta),
                     -np.sin(theta) * np.cos(np.radians(25))])


def test_hosek_matches_reference_c():
    v = _view()
    for elev_d, turb, alb, r, g, b in GOLDEN:
        elev = np.radians(elev_d)
        sun = np.array([0.0, np.sin(elev), -np.cos(elev)])
        mine = np.asarray(hosek_sky_radiance(v, sun, turb, alb,
                                             sun_disc=False))
        gold = np.array([r, g, b])
        rel = np.max(np.abs(mine - gold) / gold)
        assert rel < 1e-3, (elev_d, turb, alb, mine, gold)


def test_hosek_below_horizon_and_disc():
    sun = np.array([0.0, np.sin(np.radians(30)), -np.cos(np.radians(30))])
    down = np.array([0.3, -0.5, 0.2])
    down /= np.linalg.norm(down)
    assert np.all(hosek_sky_radiance(down, sun) == 0.0)
    at_sun = hosek_sky_radiance(sun, sun, sun_disc=True)
    near = hosek_sky_radiance(sun + np.array([0.02, 0, 0]), sun,
                              sun_disc=True)
    assert float(at_sun[0]) > 10.0 * float(near[0])  # bright limb-darkened disc


def test_makesky_equal_area_hosek():
    img = make_sky_equal_area(32, elevation_deg=20.0, turbidity=3.0,
                              albedo=0.5, model="hosek")
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img)) and img.max() > 1.0
    # equal-area map: the corner texels map below the horizon -> black
    assert float(img[0, 0].sum()) == 0.0


def test_solar_disc_radiance_physical():
    """Disc radiance = E0/omega * Preetham direct-beam transmittance:
    check physically meaningful behavior (ADVICE r3: the disc level must
    derive from a solar-radiance model, not an ad-hoc constant)."""
    from vspg_pbrt_v4_tpu.utils.sky import solar_disc_radiance

    omega_sun = 2.0 * np.pi * (1.0 - np.cos(np.radians(0.255)))
    L30 = solar_disc_radiance(np.radians(30.0), turbidity=3.0)
    # direct normal spectral irradiance at T=3, elev 30: a clear-sky
    # 0.8-1.6 W/m^2/nm per channel (Iqbal); red transmits best
    E = L30 * omega_sun  # band-integrated W/m^2 per channel
    assert np.all(E > 50.0) and np.all(E < 250.0), E
    assert E[0] / 1.69 > E[2] / 2.05  # redder than exo-atmospheric
    # more turbid -> dimmer sun; lower sun -> dimmer sun
    assert np.all(solar_disc_radiance(np.radians(30.0), 6.0) < L30)
    assert np.all(solar_disc_radiance(np.radians(5.0), 3.0) < L30)
    # disc irradiance dominates the sky's diffuse component (clear sky:
    # direct/diffuse > 2 at elev 30, T=3)
    sun = np.array([0.0, np.sin(np.radians(30)), -np.cos(np.radians(30))])
    rng = np.random.default_rng(1)
    d = rng.standard_normal((4096, 3))
    d[:, 1] = np.abs(d[:, 1])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sky = hosek_sky_radiance(d, sun, 3.0, 0.5, sun_disc=False)
    # hemisphere MC of horizontal diffuse irradiance
    e_diff = float(np.mean(sky[:, 1] * d[:, 1]) * 2 * np.pi)
    e_dir = float(E[1]) * np.sin(np.radians(30.0))
    assert e_dir > 1.0 * e_diff, (e_dir, e_diff)
