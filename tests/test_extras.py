"""Extra integrators: AO, random walk, simple path, gbuffer.

simplepath is the independent cross-check of the MIS machinery: for the
same scene its converged result must equal volpath's.
"""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import extras, volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import DIFFUSE, Materials
from vspg_pbrt_v4_tpu.models.media import Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr


def _camera(res=32):
    return PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (res, res))


def _sphere_on_floor():
    geom = Geometry.build(
        triangles=[
            dict(p0=(-5, -1, -5), p1=(5, -1, -5), p2=(5, -1, 5), mat=0,
                 light=-1, med_in=-1, med_out=-1),
            dict(p0=(-5, -1, -5), p1=(5, -1, 5), p2=(-5, -1, 5), mat=0,
                 light=-1, med_in=-1, med_out=-1),
        ],
        spheres=[dict(c=(0, 0, 0), r=1.0, mat=0, light=-1, med_in=-1,
                      med_out=-1)])
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0.6, 0.6, 0.6))])
    lights = Lights.make(env_L=[1.0, 1.0, 1.0], world_radius=100.0)
    return volpath.Scene(geom, mats, Media.make(), lights)


@pytest.mark.slow
def test_ao():
    img = np.asarray(extras.render_ao(_sphere_on_floor(), _camera(),
                                      RGBFilm.make((32, 32)), spp=32, seed=1))
    assert np.isfinite(img).all()
    assert img.min() >= 0 and img.max() <= 1.0 + 1e-5
    # sky pixels fully unoccluded would be 0 (no hit); floor near sphere darker
    # than floor far from sphere
    near = img[26, 16].mean()   # floor under the sphere silhouette
    far = img[31, 2].mean()
    assert far > near, (near, far)


@pytest.mark.slow
def test_simplepath_matches_volpath():
    """BSDF-only estimator converges to the NEE+MIS estimator's result."""
    scene = _sphere_on_floor()
    cam = _camera(24)
    film = RGBFilm.make((24, 24))
    a = np.asarray(extras.render_simplepath(scene, cam, film, spp=256, seed=2,
                                            spp_per_pass=8))
    b = np.asarray(volpath.render(scene, cam, film, spp=256, seed=3,
                                  cfg=volpath.VolPathConfig(max_depth=5),
                                  spp_per_pass=8))
    assert abs(a.mean() - b.mean()) / b.mean() < 0.03, (a.mean(), b.mean())


@pytest.mark.slow
def test_randomwalk_furnace():
    """Diffuse sphere furnace via pure random walk: rho*L0 at the sphere."""
    from vspg_pbrt_v4_tpu.models.shapes import Geometry as G

    geom = G.build(spheres=[dict(c=(0, 0, 0), r=1.0, mat=0, light=-1,
                                 med_in=-1, med_out=-1)])
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0.5, 0.5, 0.5))])
    lights = Lights.make(env_L=[1.0] * 3, world_radius=100.0)
    scene = volpath.Scene(geom, mats, Media.make(), lights)
    img = np.asarray(extras.render_randomwalk(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=512, seed=4,
        spp_per_pass=8, cfg=volpath.VolPathConfig(max_depth=8)))
    center = img[10:14, 10:14].mean()
    assert abs(center - 0.5) < 0.04, center


def test_gbuffer():
    scene = _sphere_on_floor()
    alb, nrm, depth, pid = [np.asarray(x) for x in
                            extras.render_gbuffer(scene, _camera(32),
                                                  RGBFilm.make((32, 32)))]
    # center pixel: the sphere, facing the camera
    assert np.allclose(alb[16, 16], 0.6, atol=1e-5)
    assert nrm[16, 16, 2] < -0.9  # normal toward camera (-z)
    assert 2.7 < depth[16, 16] < 3.2
    assert pid[16, 16] == 2  # sphere is global prim id 2 (after 2 tris)
    assert pid[0, 0] == -1  # sky


def test_function_integrator_convergence():
    """FunctionIntegrator harness: estimates center on the analytic value
    and low-discrepancy samplers converge faster than independent."""
    import jax.numpy as jnp
    import numpy as np

    from vspg_pbrt_v4_tpu.models.film import RGBFilm
    from vspg_pbrt_v4_tpu.models.integrators import extras

    film = RGBFilm.make((16, 16))
    img_i, exact = extras.render_function(film, "gaussian", spp=64, seed=1,
                                          sampler_kind="independent")
    img_s, _ = extras.render_function(film, "gaussian", spp=64, seed=1,
                                      sampler_kind="paddedsobol")
    err_i = float(jnp.mean((img_i[..., 0] - exact) ** 2))
    err_s = float(jnp.mean((img_s[..., 0] - exact) ** 2))
    assert abs(float(img_i.mean()) - exact) < 0.01
    assert err_s < 0.5 * err_i, (err_s, err_i)


def test_simplevolpath_matches_volpath_fog():
    """SimpleVolPath (no NEE/MIS) is unbiased for env-lit media: matches
    the MIS volpath's furnace exactly."""
    from vspg_pbrt_v4_tpu.models.integrators import extras

    scene = volpath.make_fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0],
                                       env_L=[1, 1, 1])
    img = np.asarray(extras.render_simplevolpath(
        scene, _camera(), RGBFilm.make((32, 32)), spp=48))
    assert np.allclose(img.mean((0, 1)), 1.0, atol=0.03), img.mean((0, 1))
