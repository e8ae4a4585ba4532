"""Realistic (lens-system) camera: focus, image formation, orientation."""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera, RealisticCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr


def test_singlet_focuses_on_axis():
    cam = RealisticCamera.simple_lens(tr.identity(), (64, 64), focal=0.05,
                                      aperture_diameter=0.01,
                                      focus_distance=2.0)
    n = 64
    pr = jnp.tile(jnp.asarray([[32.0, 32.0]]), (n, 1))
    u = jnp.stack([jnp.linspace(0.02, 0.98, n), jnp.full(n, 0.5)], -1)
    o, d, w = cam.generate_rays(pr, u)
    o, d, w = map(np.asarray, (o, d, w))
    assert (w > 0).mean() > 0.9
    ok = w > 0
    tx = -o[ok, 0] / np.where(np.abs(d[ok, 0]) < 1e-12, 1e-12, d[ok, 0])
    z_cross = o[ok, 2] + tx * d[ok, 2]
    # center-film rays converge near the 2 m focus plane (thick-lens +
    # spherical aberration tolerance)
    assert abs(z_cross.mean() - 2.0) < 0.35, z_cross.mean()
    assert z_cross.std() < 0.25, z_cross.std()


@pytest.mark.slow
def test_realistic_image_matches_perspective_layout():
    """A small emissive quad right of center: the realistic camera must put
    it on the same side as the perspective camera (the film flip cancels
    the lens inversion) with correlated structure."""
    c = np.array([0.18, 0.02, 0.0])
    e1 = np.array([0.25, 0.0, 0.0])
    e2 = np.array([0.0, 0.25, 0.0])
    tris = [dict(p0=c, p1=c + e1, p2=c + e2, mat=-1, light=0)]
    area = [dict(p0=c, p1=c + e1, p2=c + e2, L=(30.0,) * 3, twosided=True)]
    geom = Geometry.build(triangles=tris)
    scene = volpath.Scene(geom, Materials.build([]), Media.make(),
                          Lights.make(area_tris=area, world_radius=20.0))
    c2w = tr.look_at((0, 0, -2), (0, 0, 0), (0, 1, 0))
    film = RGBFilm.make((32, 32))
    persp = PerspectiveCamera.make(c2w, fov_deg=45.0, resolution=(32, 32))
    # fov of the singlet: 2*atan(film_w/2 / film_gap); pick focal to land
    # near 45deg: film_w=0.0286 at gap ~0.0505 -> ~31deg; close enough for
    # layout comparison
    real = RealisticCamera.simple_lens(c2w, (32, 32), focal=0.05,
                                       aperture_diameter=0.004,
                                       focus_distance=2.0)
    ip = np.asarray(volpath.render(scene, persp, film, spp=16, seed=1,
                                   spp_per_pass=8,
                                   cfg=volpath.VolPathConfig(max_depth=1)))
    ir = np.asarray(volpath.render(scene, real, film, spp=64, seed=2,
                                   spp_per_pass=8,
                                   cfg=volpath.VolPathConfig(max_depth=1)))
    assert np.isfinite(ir).all()
    assert ir.max() > 0
    # the bright quad must land on the same horizontal side
    def centroid_x(img):
        s = img.mean(-1)
        xs = np.arange(img.shape[1])
        return (s.sum(0) * xs).sum() / max(s.sum(), 1e-9)

    cx_p = centroid_x(ip)
    cx_r = centroid_x(ir)
    assert (cx_p - 16) * (cx_r - 16) > 0, (cx_p, cx_r)
    # vertical: quad is above center in world (+y of e2): same side too
    def centroid_y(img):
        s = img.mean(-1)
        ys = np.arange(img.shape[0])
        return (s.sum(1) * ys).sum() / max(s.sum(), 1e-9)

    cy_p = centroid_y(ip)
    cy_r = centroid_y(ir)
    assert (cy_p - 16) * (cy_r - 16) > 0, (cy_p, cy_r)
