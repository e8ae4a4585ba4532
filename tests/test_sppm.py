"""SPPM: cross-check against volpath on a diffuse box (the reference
validates SPPM the same way via the furnace render matrix)."""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import sppm, volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr
import pytest

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def _scene():
    tris = [
        dict(p0=(-2, -1, -2), p1=(2, -1, -2), p2=(2, -1, 2), mat=0, light=-1),
        dict(p0=(-2, -1, -2), p1=(2, -1, 2), p2=(-2, -1, 2), mat=0, light=-1),
        dict(p0=(-2, -1, 2), p1=(2, -1, 2), p2=(2, 2, 2), mat=1, light=-1),
        dict(p0=(-2, -1, 2), p1=(2, 2, 2), p2=(-2, 2, 2), mat=1, light=-1),
    ]
    c = np.array([-0.4, 1.6, 0.2])
    e1 = np.array([0.8, 0.0, 0.0])
    e2 = np.array([0.0, 0.0, 0.8])
    L = (10.0, 9.0, 8.0)
    area = [dict(p0=c, p1=c + e1, p2=c + e2, L=L, twosided=True)]
    tris.append(dict(p0=c, p1=c + e1, p2=c + e2, mat=-1, light=0))
    geom = Geometry.build(triangles=tris)
    mats = Materials.build([dict(albedo=(0.7, 0.5, 0.3)),
                            dict(albedo=(0.4, 0.6, 0.7))])
    lights = Lights.make(area_tris=area, world_radius=20.0)
    return volpath.Scene(geom, mats, Media.make(), lights)


def test_sppm_matches_volpath():
    scene = _scene()
    cam = PerspectiveCamera.make(
        tr.look_at((0, 0.6, -4.5), (0, 0, 0.5), (0, 1, 0)), fov_deg=45.0,
        resolution=(24, 24))
    film = RGBFilm.make((24, 24))
    ref = np.asarray(volpath.render(scene, cam, film, spp=128, seed=4,
                                    spp_per_pass=8,
                                    cfg=volpath.VolPathConfig(max_depth=5)))
    img = np.asarray(sppm.render(scene, cam, film, iterations=24, seed=5,
                                 scfg=sppm.SPPMConfig(max_depth=5,
                                                      initial_radius=0.25)))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.08, (img.mean(), ref.mean(), rel)
    # pixel-level structure agrees too (photon flux actually lands where
    # the light does): correlation of the two images
    a = img.reshape(-1, 3).mean(-1)
    b = ref.reshape(-1, 3).mean(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.97, corr
