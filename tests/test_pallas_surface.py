"""Surface megakernel (ops/pallas_surface) vs the jnp volpath estimator.

Interpret-mode Pallas on CPU doubles as the cross-backend correctness
check (SURVEY.md §4 pallas-vs-jnp idiom)."""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.ops import pallas_surface as ps
from vspg_pbrt_v4_tpu.utils import transform as tr

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def _quad(p00, p10, p11, p01, mat, light=-1):
    """Two triangles for the quad p00-p10-p11-p01 (consistent winding)."""
    return [
        dict(p0=p00, p1=p10, p2=p11, mat=mat, light=light),
        dict(p0=p00, p1=p11, p2=p01, mat=mat, light=light),
    ]


def _floor_scene(albedo=(0.7, 0.7, 0.7), env=1.0):
    tris = _quad((-10, 0, -10), (10, 0, -10), (10, 0, 10), (-10, 0, 10),
                 mat=0)
    geom = Geometry.build(triangles=tris, use_bvh=False)
    mats = Materials.build([dict(type=0, albedo=albedo)])
    lights = Lights.make(env_L=[env] * 3, world_radius=100.0)
    return volpath.Scene(geom, mats, Media.make(), lights)


def _cornell_scene(Le=12.0):
    return volpath.make_cornell_box_scene(Le)


def _camera(res, eye=(0, 1.0, 3.2), at=(0, 1.0, 0)):
    return PerspectiveCamera.make(tr.look_at(eye, at, (0, 1, 0)), 45.0,
                                  (res, res))


def test_supports():
    res = 32
    scene = _cornell_scene()
    cam = _camera(res)
    film = RGBFilm.make((res, res))
    cfg = volpath.VolPathConfig(max_depth=6, max_events=16)
    assert ps.supports(scene, cam, film, cfg)
    fog = volpath.make_fog_box_scene([0.1] * 3, [0.4] * 3,
                                     env_L=[0.1] * 3)
    assert not ps.supports(fog, cam, film, cfg)


def test_floor_furnace():
    """Lambertian plane under a uniform env: reflected radiance is exactly
    albedo * L_env for every pixel that sees the floor."""
    res = 32
    scene = _floor_scene(albedo=(0.7, 0.5, 0.3), env=1.0)
    cam = _camera(res, eye=(0, 2.0, 0.01), at=(0, 0, 0))
    film = RGBFilm.make((res, res))
    cfg = volpath.VolPathConfig(max_depth=8, max_events=16)
    img = np.asarray(ps.render_surface_pallas(
        scene, cam, film, spp=96, cfg=cfg, seed=3, interpret=True))
    assert np.isfinite(img).all()
    mean = img.reshape(-1, 3).mean(0)
    assert np.allclose(mean, [0.7, 0.5, 0.3], atol=0.03), mean


def test_matches_volpath_cornell():
    res = 32
    scene = _cornell_scene()
    cam = _camera(res)
    film = RGBFilm.make((res, res))
    cfg = volpath.VolPathConfig(max_depth=5, max_events=12)
    img_k = np.asarray(ps.render_surface_pallas(
        scene, cam, film, spp=64, cfg=cfg, seed=5, interpret=True))
    img_j = np.asarray(volpath.render(scene, cam, film, spp=64, cfg=cfg,
                                      seed=11))
    assert np.isfinite(img_k).all() and np.isfinite(img_j).all()
    mk, mj = img_k.mean(), img_j.mean()
    assert mk > 0.01 and mj > 0.01
    assert abs(mk - mj) / mj < 0.05, (mk, mj)
    # per-channel means agree too (red/green wall bleeding)
    ck = img_k.reshape(-1, 3).mean(0)
    cj = img_j.reshape(-1, 3).mean(0)
    assert np.all(np.abs(ck - cj) / cj < 0.08), (ck, cj)
