"""End-to-end volpath integrator tests against analytic expectations.

Replicates the reference's analytic-scene integration idiom
(cpu/integrators_test.cpp:67-447: render full frames, compare image averages
to closed-form values) for the volumetric slice.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.media import HomogeneousMedia
from vspg_pbrt_v4_tpu.utils import transform as tr

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def _fog_box_scene(sigma_a, sigma_s, g=0.0, env_L=None, point=None):
    pt = None if point is None else (point[0], point[1])
    return volpath.make_fog_box_scene(sigma_a, sigma_s, g=g, env_L=env_L,
                                      point=pt)


def _camera(res=32):
    c2w = tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=30.0, resolution=(res, res))


def test_vacuum_env_passthrough():
    """No extinction -> every ray escapes to the uniform env: image == env_L."""
    scene = _fog_box_scene([0, 0, 0], [0, 0, 0], env_L=[0.7, 0.8, 0.9])
    img = volpath.render(scene, _camera(), RGBFilm.make((32, 32)), spp=4)
    assert np.allclose(np.asarray(img), [0.7, 0.8, 0.9], atol=1e-4), np.asarray(img).mean((0, 1))


def test_absorption_beer_lambert():
    """Pure absorber: center-pixel L = env * exp(-sigma_a * chord).

    The camera looks through the 2-unit-thick fog cube at a uniform
    background; delta tracking must reproduce Beer-Lambert in expectation.
    """
    sigma_a = [0.5, 1.0, 2.0]
    scene = _fog_box_scene(sigma_a, [0, 0, 0], env_L=[1.0, 1.0, 1.0])
    img = np.asarray(
        volpath.render(scene, _camera(64), RGBFilm.make((64, 64)), spp=256, seed=3)
    )
    center = img[28:36, 28:36].mean((0, 1))  # central rays: chord ~= 2.0
    expected = np.exp(-np.asarray(sigma_a) * 2.0)
    assert np.allclose(center, expected, rtol=0.05), (center, expected)


def test_scattering_furnace():
    """White furnace: purely scattering medium in a uniform radiance field.

    With albedo 1 and uniform env L0, radiance everywhere is exactly L0 —
    any energy leak in the delta-tracking/NEE/MIS algebra shows up here.
    """
    L0 = 0.6
    scene = _fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0], g=0.4, env_L=[L0] * 3)
    img = np.asarray(
        volpath.render(scene, _camera(32), RGBFilm.make((32, 32)), spp=128, seed=1)
    )
    mean = img.mean()
    assert abs(mean - L0) < 0.02 * L0, mean
    # per-channel too
    assert np.allclose(img.mean((0, 1)), L0, rtol=0.03), img.mean((0, 1))


def test_rgb_channels_decoupled():
    """Channel-dependent extinction with hero-channel MIS stays unbiased."""
    sigma_a = [0.2, 0.7, 1.5]
    scene = _fog_box_scene(sigma_a, [0, 0, 0], env_L=[1.0, 1.0, 1.0])
    img = np.asarray(
        volpath.render(scene, _camera(32), RGBFilm.make((32, 32)), spp=512, seed=7)
    )
    center = img[13:19, 13:19].mean((0, 1))
    expected = np.exp(-np.asarray(sigma_a) * 2.0)
    assert np.allclose(center, expected, rtol=0.08), (center, expected)


def test_point_light_single_scatter_positive():
    """Fog + point light: image is positive where the fog is, finite everywhere."""
    scene = _fog_box_scene(
        [0.02, 0.02, 0.02], [0.4, 0.4, 0.4], g=0.3, point=((0, 0.5, 0), (4.0, 3.0, 2.0))
    )
    img = np.asarray(
        volpath.render(scene, _camera(32), RGBFilm.make((32, 32)), spp=64, seed=2)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3
    # light is white-ish: channel ratios follow intensity ratios roughly
    ch = img.mean((0, 1))
    assert ch[0] > ch[1] > ch[2]


def test_emissive_medium():
    """Emissive absorbing medium against black background.

    For a ray with chord length l: L = Le * (1 - exp(-sigma_a l)) when
    sigma_a == sigma_t (blackbody-style emitter).
    """
    scene = volpath.make_fog_box_scene(
        [1.0, 1.0, 1.0], [0.0, 0.0, 0.0], Le=[2.0, 2.0, 2.0]
    )
    img = np.asarray(
        volpath.render(scene, _camera(64), RGBFilm.make((64, 64)), spp=256, seed=5)
    )
    center = img[28:36, 28:36].mean((0, 1))
    expected = 2.0 * (1.0 - np.exp(-2.0))
    assert np.allclose(center, expected, rtol=0.05), (center, expected)


def test_persistent_wavefront_matches_analytic():
    """render_persistent (ray-pool regeneration) stays unbiased: the
    scattering furnace is exact and pure absorption matches Beer-Lambert."""
    scene = _fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0], env_L=[1, 1, 1])
    img = np.asarray(volpath.render_persistent(
        scene, _camera(), RGBFilm.make((32, 32)), spp=48, seed=0))
    assert np.allclose(img.mean((0, 1)), 1.0, atol=0.02), img.mean((0, 1))
