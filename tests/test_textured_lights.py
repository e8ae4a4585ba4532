"""Goniometric + projection lights (lights.h Goniometric:633,
Projection:698): a uniform goniometric map must reduce exactly to a point
light; projection illuminates only inside its frustum."""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import lightpath, volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr


def _setup():
    tris = [dict(p0=(-3, -1, -3), p1=(3, -1, -3), p2=(3, -1, 3), mat=0,
                 light=-1),
            dict(p0=(-3, -1, -3), p1=(3, -1, 3), p2=(-3, -1, 3), mat=0,
                 light=-1)]
    geom = Geometry.build(triangles=tris)
    mats = Materials.build([dict(albedo=(0.6, 0.6, 0.6))])
    cam = PerspectiveCamera.make(
        tr.look_at((0, 1.5, -5), (0, -0.5, 0), (0, 1, 0)), fov_deg=40.0,
        resolution=(24, 24))
    return geom, mats, cam, RGBFilm.make((24, 24))


@pytest.mark.slow
def test_uniform_gonio_equals_point():
    geom, mats, cam, film = _setup()
    I = [4.0, 3.0, 2.0]
    lp = Lights.make(point_p=[[0, 1, 0]], point_I=[I], world_radius=20.0)
    lg = Lights.make(gonios=[dict(p=[0, 1, 0], I=I,
                                  img=np.ones((4, 4, 3), np.float32))],
                     world_radius=20.0)
    out = {}
    for tag, lights in (("point", lp), ("gonio", lg)):
        scene = volpath.Scene(geom, mats, Media.make(), lights)
        out[tag] = np.asarray(volpath.render(
            scene, cam, film, spp=32, seed=3, spp_per_pass=8,
            cfg=volpath.VolPathConfig(max_depth=2)))
    assert np.allclose(out["point"], out["gonio"], rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_projection_frustum_and_lightpath_parity():
    geom, mats, cam, film = _setup()
    I = [4.0, 3.0, 2.0]
    # light at y=1 looking straight down (-y -> light +z)
    rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)
    lights = Lights.make(
        projections=[dict(p=[0, 1, 0], I=I,
                          img=np.ones((4, 4, 3), np.float32),
                          fov_deg=90.0, rot=rot)], world_radius=20.0)
    scene = volpath.Scene(geom, mats, Media.make(), lights)
    ref = np.asarray(volpath.render(scene, cam, film, spp=64, seed=3,
                                    spp_per_pass=8,
                                    cfg=volpath.VolPathConfig(max_depth=2)))
    assert np.isfinite(ref).all() and ref.mean() > 0
    # lightpath through SampleLe for the projection light agrees
    img = np.asarray(lightpath.render(scene, cam, film, spp=256, seed=5,
                                      spp_per_pass=8,
                                      cfg=volpath.VolPathConfig(max_depth=2)))
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.06, (img.mean(), ref.mean(), rel)
