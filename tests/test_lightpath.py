"""Light tracing (particle) integrator: cross-check against volpath.

The two integrators estimate the same measurement with adjoint transport
directions — agreement validates SampleLe throughputs, the camera importance
We, and splat normalization in one shot (the reference validates lightpath
the same way: integrators_test.cpp includes it in the furnace matrix).
"""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import lightpath, volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr
import pytest

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def _box_scene(light="area"):
    tris = [
        # floor
        dict(p0=(-2, -1, -2), p1=(2, -1, -2), p2=(2, -1, 2), mat=0, light=-1),
        dict(p0=(-2, -1, -2), p1=(2, -1, 2), p2=(-2, -1, 2), mat=0, light=-1),
        # back wall
        dict(p0=(-2, -1, 2), p1=(2, -1, 2), p2=(2, 2, 2), mat=1, light=-1),
        dict(p0=(-2, -1, 2), p1=(2, 2, 2), p2=(-2, 2, 2), mat=1, light=-1),
    ]
    area, pts, Is = None, None, None
    if light == "area":
        c = np.array([-0.4, 1.4, 0.2])
        e1 = np.array([0.8, 0.0, 0.0])
        e2 = np.array([0.0, 0.0, 0.8])
        L = (12.0, 10.0, 8.0)
        area = [dict(p0=c, p1=c + e1, p2=c + e2, L=L, twosided=True)]
        tris.append(dict(p0=c, p1=c + e1, p2=c + e2, mat=-1, light=0))
    else:
        pts = [[0.0, 1.2, 0.0]]
        Is = [[6.0, 5.0, 4.0]]
    geom = Geometry.build(triangles=tris)
    mats = Materials.build([dict(albedo=(0.7, 0.5, 0.3)),
                            dict(albedo=(0.4, 0.6, 0.7))])
    lights = Lights.make(point_p=pts, point_I=Is, area_tris=area,
                         world_radius=20.0)
    return volpath.Scene(geom, mats, Media.make(), lights)


def _cam(res=24):
    return PerspectiveCamera.make(
        tr.look_at((0, 0.6, -4.5), (0, 0, 0.5), (0, 1, 0)), fov_deg=45.0,
        resolution=(res, res))


def test_lightpath_matches_volpath_area():
    scene = _box_scene("area")
    cam = _cam()
    film = RGBFilm.make((24, 24))
    ref = np.asarray(volpath.render(scene, cam, film, spp=128, seed=4,
                                    spp_per_pass=8,
                                    cfg=volpath.VolPathConfig(max_depth=5)))
    img = np.asarray(lightpath.render(scene, cam, film, spp=256, seed=5,
                                      spp_per_pass=8,
                                      cfg=volpath.VolPathConfig(max_depth=5)))
    assert np.isfinite(img).all()
    # lightpath never sees the light directly through the camera (the
    # emitter triangle is an interface here), so compare on wall+floor
    # pixels: overall mean of the diffuse transport
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.06, (img.mean(), ref.mean(), rel)


def test_lightpath_matches_volpath_point_fog():
    scene = volpath.make_fog_box_scene([0.02] * 3, [0.4, 0.5, 0.6], g=0.3,
                                       point=((0.0, 0.5, 0.0), (5.0, 4.0, 3.0)))
    cam = _cam()
    film = RGBFilm.make((24, 24))
    ref = np.asarray(volpath.render(scene, cam, film, spp=96, seed=7,
                                    spp_per_pass=8, camera_medium=-1,
                                    cfg=volpath.VolPathConfig(max_depth=8)))
    img = np.asarray(lightpath.render(scene, cam, film, spp=192, seed=8,
                                      spp_per_pass=8, light_medium=0,
                                      cfg=volpath.VolPathConfig(max_depth=8)))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.08, (img.mean(), ref.mean(), rel)
