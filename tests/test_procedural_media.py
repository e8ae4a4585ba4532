"""Procedural media: CloudMedium (stock pbrt) + EarthMedium (the fork's,
media.h:755-966). Both are bounded procedural-density media with a constant
(homogeneous-iterator) majorant — checked here for majorant conservativeness,
density semantics, and unbiased transport through the delta tracker.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import CloudMedium, EarthMedium, Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr


def _scene_with(media, box=((-1, -1, -1), (1, 1, 1)), med_id=0, env=(1, 1, 1)):
    lights = Lights.make(env_L=list(env), world_radius=100.0)
    geom = Geometry.build(boxes=[dict(bmin=box[0], bmax=box[1], mat=-1,
                                      light=-1, med_in=med_id, med_out=-1)])
    return volpath.Scene(geom, Materials.build([]), media, lights)


def _camera(res=32):
    c2w = tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=30.0, resolution=(res, res))


def test_cloud_density_range_and_majorant():
    cm = CloudMedium.make(p0=(0, 0, 0), p1=(1, 1, 1), density=1.0,
                          wispiness=1.0, frequency=5.0)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(0, 1, (4096, 3)), jnp.float32)
    d = np.asarray(cm.density_at(p))
    assert d.min() >= 0.0 and d.max() <= 1.0
    assert d.std() > 0.01  # actually varies
    # outside bounds -> zero
    d_out = np.asarray(cm.density_at(p + 5.0))
    assert np.all(d_out == 0.0)
    # majorant conservative: sigma_t(p) <= majorant everywhere
    sa, ss = cm.sigma_at(p)
    st = np.asarray(sa + ss)
    assert np.all(st <= np.asarray(cm.majorant_rgb()) + 1e-6)


@pytest.mark.slow
def test_cloud_furnace():
    """Albedo-1 cloud in a unit furnace: energy conserved regardless of the
    density field (the TPU delta tracker must stay unbiased on procedural
    density)."""
    cm = CloudMedium.make(sigma_a=(0, 0, 0), sigma_s=(4, 4, 4),
                          p0=(-1, -1, -1), p1=(1, 1, 1), density=1.0)
    media = Media.make(procedurals=(cm,))
    scene = _scene_with(media)
    img = np.asarray(volpath.render(scene, _camera(), RGBFilm.make((32, 32)),
                                    spp=64))
    assert np.allclose(img.mean((0, 1)), 1.0, atol=0.03), img.mean((0, 1))


def test_earth_density_profile():
    em = EarthMedium.make(sigma_a_atm=(1, 1, 1), sigma_s_atm=(0, 0, 0),
                          p0=(-3, -3, -3), p1=(3, 3, 3),
                          inner_r_atm=1.0, outer_r_atm=2.0, decay=0.5)
    # exponential falloff from the planet surface
    d_surface = float(em._exp_density(jnp.asarray([1.0, 0.0, 0.0])))
    d_high = float(em._exp_density(jnp.asarray([2.0, 0.0, 0.0])))
    assert abs(d_surface - 1.0) < 1e-5
    assert abs(d_high - np.exp(-1.0 / 0.5)) < 1e-5
    # density offset shifts everything
    em2 = EarthMedium.make(p0=(-3,) * 3, p1=(3,) * 3, inner_r_atm=1.0,
                           outer_r_atm=2.0, decay=0.5, density_offset=0.25)
    d2 = float(em2._exp_density(jnp.asarray([2.0, 0.0, 0.0])))
    assert abs(d2 - (np.exp(-2.0) + 0.25)) < 1e-5


def test_earth_cloud_shell_heightmap():
    hm = np.full((8, 8), 0.5, np.float32)  # shell radius halfway
    em = EarthMedium.make(sigma_a_cloud=(1, 1, 1), sigma_s_cloud=(0, 0, 0),
                          sigma_a_atm=(0, 0, 0), sigma_s_atm=(0, 0, 0),
                          p0=(-3,) * 3, p1=(3,) * 3,
                          inner_r_cloud=1.0, outer_r_cloud=2.0, heightmap=hm)
    # shell outer radius = 1 + 0.5*(2-1) = 1.5: inside at r=1.2, outside 1.8
    sa_in, _ = em.sigma_at(jnp.asarray([[1.2, 0.0, 0.0]]))
    sa_out, _ = em.sigma_at(jnp.asarray([[1.8, 0.0, 0.0]]))
    assert float(sa_in[0, 0]) == 1.0
    assert float(sa_out[0, 0]) == 0.0


@pytest.mark.slow
def test_earth_furnace():
    """Scattering-only earth atmosphere in a furnace conserves energy."""
    em = EarthMedium.make(sigma_a_atm=(0, 0, 0), sigma_s_atm=(3, 3, 3),
                          p0=(-1, -1, -1), p1=(1, 1, 1), center=(0, 0, 0),
                          inner_r_atm=0.2, outer_r_atm=2.0, decay=0.6)
    media = Media.make(procedurals=(em,))
    scene = _scene_with(media)
    img = np.asarray(volpath.render(scene, _camera(), RGBFilm.make((32, 32)),
                                    spp=64))
    assert np.allclose(img.mean((0, 1)), 1.0, atol=0.03), img.mean((0, 1))


def test_parser_cloud_medium():
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string

    txt = """
    Camera "perspective" "float fov" [40]
    Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    MakeNamedMedium "mycloud" "string type" "cloud"
        "rgb sigma_s" [2 2 2] "rgb sigma_a" [0.1 0.1 0.1]
        "float density" [0.8] "float frequency" [3]
        "point3 p0" [-1 -1 -1] "point3 p1" [1 1 1]
    AttributeBegin
      MediumInterface "mycloud" ""
      Material ""
      Shape "sphere" "float radius" [1]
    AttributeEnd
    LightSource "infinite" "rgb L" [1 1 1]
    """
    setup = build_render_setup(parse_pbrt_string(txt))
    assert len(setup.scene.media.procedurals) == 1
    cm = setup.scene.media.procedurals[0]
    assert float(cm.frequency) == 3.0
