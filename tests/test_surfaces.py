"""Surface path-tracing tests against analytic expectations.

Furnace idiom from the reference (cpu/integrators_test.cpp): any
energy-conserving BSDF inside a uniform radiance field must return exactly
that radiance; a convex lambertian body with albedo rho reflects rho * L0.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import (
    CONDUCTOR, DIELECTRIC, DIFFUSE, Materials,
)
from vspg_pbrt_v4_tpu.models.media import HomogeneousMedia
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr


def _camera(res=32, dist=4.0):
    c2w = tr.look_at((0, 0, -dist), (0, 0, 0), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=30.0, resolution=(res, res))


def _scene(geometry, materials, lights):
    return volpath.Scene(geometry, materials, HomogeneousMedia.make(
        jnp.zeros((1, 3)), jnp.zeros((1, 3))), lights)


def _sphere_scene(mat, env_L=1.0, r=1.0):
    geom = Geometry.build(spheres=[dict(c=(0, 0, 0), r=r, mat=0, light=-1,
                                        med_in=-1, med_out=-1)])
    mats = Materials.build([mat])
    lights = Lights.make(env_L=[env_L] * 3, world_radius=100.0)
    return _scene(geom, mats, lights)


def test_diffuse_sphere_furnace():
    """Convex lambertian body, albedo rho, uniform env L0 -> rho * L0."""
    rho = 0.6
    scene = _sphere_scene(dict(type=DIFFUSE, albedo=(rho, rho, rho)))
    img = np.asarray(volpath.render(scene, _camera(48), RGBFilm.make((48, 48)),
                                    spp=128, seed=1))
    center = img[20:28, 20:28].mean((0, 1))
    assert np.allclose(center, rho, rtol=0.03), center
    # background = env
    corner = img[:4, :4].mean((0, 1))
    assert np.allclose(corner, 1.0, atol=1e-3), corner


def test_diffuse_rgb_albedo():
    rho = np.array([0.8, 0.5, 0.2])
    scene = _sphere_scene(dict(type=DIFFUSE, albedo=tuple(rho)))
    img = np.asarray(volpath.render(scene, _camera(48), RGBFilm.make((48, 48)),
                                    spp=128, seed=2))
    center = img[20:28, 20:28].mean((0, 1))
    assert np.allclose(center, rho, rtol=0.05), center


@pytest.mark.slow
def test_dielectric_sphere_furnace():
    """Glass sphere in a white furnace: reflection+refraction conserve energy
    -> image is L0 everywhere (tests Fresnel split, refraction, eta^2
    radiance scaling, and RR algebra through many specular bounces)."""
    L0 = 0.8
    scene = _sphere_scene(dict(type=DIELECTRIC, eta=1.5, roughness=0.0),
                          env_L=L0)
    img = np.asarray(volpath.render(scene, _camera(40), RGBFilm.make((40, 40)),
                                    spp=64, seed=3,
                                    cfg=volpath.VolPathConfig(max_depth=64)))
    assert np.isfinite(img).all()
    assert np.allclose(img.mean((0, 1)), L0, rtol=0.03), img.mean((0, 1))


@pytest.mark.slow
def test_mirror_sphere_furnace():
    """Perfect mirror (F0=1) in uniform env: image = env everywhere."""
    L0 = 0.5
    scene = _sphere_scene(dict(type=CONDUCTOR, albedo=(1.0, 1.0, 1.0),
                               roughness=0.0), env_L=L0)
    img = np.asarray(volpath.render(scene, _camera(40), RGBFilm.make((40, 40)),
                                    spp=32, seed=4))
    assert np.allclose(img, L0, rtol=0.02), img.mean((0, 1))


def test_rough_conductor_furnace():
    """Rough mirror (F0=1, GGX) in uniform env: energy within a few % of L0
    (single-scattering microfacet model loses a little energy at high
    roughness — same as the reference's ConductorBxDF)."""
    L0 = 1.0
    scene = _sphere_scene(dict(type=CONDUCTOR, albedo=(1.0, 1.0, 1.0),
                               roughness=0.2), env_L=L0)
    img = np.asarray(volpath.render(scene, _camera(40), RGBFilm.make((40, 40)),
                                    spp=128, seed=5))
    center = img[17:23, 17:23].mean()
    assert 0.88 < center <= 1.02, center


@pytest.mark.slow
def test_emissive_triangle_direct():
    """Camera staring at an emissive quad: pixel == Le."""
    Le = (2.0, 3.0, 4.0)
    s = 2.0
    tris = [
        dict(p0=(-s, -s, 0), p1=(s, -s, 0), p2=(s, s, 0), mat=0, light=0,
             med_in=-1, med_out=-1),
        dict(p0=(-s, -s, 0), p1=(s, s, 0), p2=(-s, s, 0), mat=0, light=1,
             med_in=-1, med_out=-1),
    ]
    geom = Geometry.build(triangles=tris)
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0, 0, 0))])
    lights = Lights.make(
        area_tris=[
            dict(p0=tris[0]["p0"], p1=tris[0]["p1"], p2=tris[0]["p2"], L=Le,
                 twosided=True),
            dict(p0=tris[1]["p0"], p1=tris[1]["p1"], p2=tris[1]["p2"], L=Le,
                 twosided=True),
        ],
        world_radius=100.0,
    )
    scene = _scene(geom, mats, lights)
    img = np.asarray(volpath.render(scene, _camera(32), RGBFilm.make((32, 32)),
                                    spp=8, seed=6))
    center = img[14:18, 14:18].mean((0, 1))
    assert np.allclose(center, Le, rtol=1e-3), center


@pytest.mark.slow
def test_area_light_illumination_unbiased():
    """Diffuse floor lit by an emissive quad overhead: NEE+BSDF MIS estimate
    must match a brute-force quadrature of the form-factor integral."""
    # floor at y=0 spanning [-2,2]^2, light quad at y=2 spanning [-0.5,0.5]^2
    Le = 5.0
    floor = [
        dict(p0=(-2, 0, -2), p1=(2, 0, -2), p2=(2, 0, 2), mat=0, light=-1,
             med_in=-1, med_out=-1),
        dict(p0=(-2, 0, -2), p1=(2, 0, 2), p2=(-2, 0, 2), mat=0, light=-1,
             med_in=-1, med_out=-1),
    ]
    lt = [
        dict(p0=(-0.5, 2, -0.5), p1=(0.5, 2, -0.5), p2=(0.5, 2, 0.5), mat=1,
             light=0, med_in=-1, med_out=-1),
        dict(p0=(-0.5, 2, -0.5), p1=(0.5, 2, 0.5), p2=(-0.5, 2, 0.5), mat=1,
             light=1, med_in=-1, med_out=-1),
    ]
    geom = Geometry.build(triangles=floor + lt)
    mats = Materials.build([
        dict(type=DIFFUSE, albedo=(0.7, 0.7, 0.7)),
        dict(type=DIFFUSE, albedo=(0.0, 0.0, 0.0)),
    ])
    lights = Lights.make(
        area_tris=[dict(p0=t["p0"], p1=t["p1"], p2=t["p2"], L=(Le,) * 3)
                   for t in lt],
        world_radius=100.0,
    )
    scene = _scene(geom, mats, lights)
    # camera looking straight down at the floor center
    c2w = tr.look_at((0, 1.0, -2.5), (0, 0, 0), (0, 1, 0))
    cam = PerspectiveCamera.make(c2w, fov_deg=20.0, resolution=(32, 32))
    img = np.asarray(volpath.render(scene, cam, RGBFilm.make((32, 32)),
                                    spp=256, seed=7))
    center = img[14:18, 14:18].mean()

    # quadrature of L_out(0) = rho/pi * int_light Le cos0 cosl / r^2 dA
    xs = np.linspace(-0.5, 0.5, 201)
    X, Z = np.meshgrid(xs, xs)
    r2 = X**2 + Z**2 + 4.0
    cos0 = 2.0 / np.sqrt(r2)
    cosl = cos0
    dA = (xs[1] - xs[0]) ** 2
    E = (Le * cos0 * cosl / r2 * dA).sum()
    expected = 0.7 / np.pi * E
    assert abs(center - expected) / expected < 0.05, (center, expected)


@pytest.mark.slow
def test_shadowing():
    """Opaque blocker between light and floor casts a dark shadow."""
    floor = [
        dict(p0=(-3, 0, -3), p1=(3, 0, -3), p2=(3, 0, 3), mat=0, light=-1,
             med_in=-1, med_out=-1),
        dict(p0=(-3, 0, -3), p1=(3, 0, 3), p2=(-3, 0, 3), mat=0, light=-1,
             med_in=-1, med_out=-1),
    ]
    geom_open = Geometry.build(triangles=floor)
    blocker = [dict(c=(0, 1.0, 0), r=0.4, mat=0, light=-1, med_in=-1,
                    med_out=-1)]
    geom_blocked = Geometry.build(triangles=floor, spheres=blocker)
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0.8, 0.8, 0.8))])
    lights = Lights.make(point_p=[(0, 2.0, 0)], point_I=[(10.0,) * 3],
                         world_radius=100.0)
    cam = PerspectiveCamera.make(
        tr.look_at((0, 2.0, -3.0), (0, 0, 0), (0, 1, 0)), 25.0, (32, 32))
    img_o = np.asarray(volpath.render(_scene(geom_open, mats, lights), cam,
                                      RGBFilm.make((32, 32)), spp=32, seed=8))
    img_b = np.asarray(volpath.render(_scene(geom_blocked, mats, lights), cam,
                                      RGBFilm.make((32, 32)), spp=32, seed=8))
    c_o = img_o[14:18, 14:18].mean()
    c_b = img_b[14:18, 14:18].mean()
    assert c_o > 0.1, c_o
    assert c_b < 0.25 * c_o, (c_o, c_b)


@pytest.mark.slow
def test_power_light_sampler_unbiased():
    """Power-proportional light selection must not change the estimate
    (PowerLightSampler analog): two very unequal area lights over a floor."""
    floor = [
        dict(p0=(-3, 0, -3), p1=(3, 0, -3), p2=(3, 0, 3), mat=0, light=-1,
             med_in=-1, med_out=-1),
        dict(p0=(-3, 0, -3), p1=(3, 0, 3), p2=(-3, 0, 3), mat=0, light=-1,
             med_in=-1, med_out=-1),
    ]
    lt = []
    quads = [((-1.2, 2, -0.4), 0.4, 30.0), ((1.0, 2, 0.3), 0.15, 1.0)]
    area_tris = []
    for (cx, cy, cz), h, Lv in quads:
        p = [(cx - h, cy, cz - h), (cx + h, cy, cz - h), (cx + h, cy, cz + h),
             (cx - h, cy, cz + h)]
        for tri in ([0, 1, 2], [0, 2, 3]):
            lt.append(dict(p0=p[tri[0]], p1=p[tri[1]], p2=p[tri[2]], mat=1,
                           light=len(area_tris), med_in=-1, med_out=-1))
            area_tris.append(dict(p0=p[tri[0]], p1=p[tri[1]], p2=p[tri[2]],
                                  L=(Lv,) * 3))
    geom = Geometry.build(triangles=floor + lt)
    mats = Materials.build([
        dict(type=DIFFUSE, albedo=(0.7, 0.7, 0.7)),
        dict(type=DIFFUSE, albedo=(0.0, 0.0, 0.0)),
    ])
    cam = PerspectiveCamera.make(
        tr.look_at((0, 1.2, -2.8), (0, 0, 0), (0, 1, 0)), 28.0, (24, 24))
    film = RGBFilm.make((24, 24))
    from vspg_pbrt_v4_tpu.models.media import Media

    imgs = {}
    for sk in ("uniform", "power"):
        lights = Lights.make(area_tris=area_tris, world_radius=100.0,
                             sampler=sk)
        scene = volpath.Scene(geom, mats, Media.make(), lights)
        imgs[sk] = np.asarray(volpath.render(scene, cam, film, spp=256,
                                             seed=9, spp_per_pass=8))
    mu, mp_ = imgs["uniform"].mean(), imgs["power"].mean()
    assert abs(mu - mp_) / mu < 0.03, (mu, mp_)
    # and power sampling should not be noisier (usually less)
    v_u = imgs["uniform"].var()
    v_p = imgs["power"].var()
    assert np.isfinite(v_p) and v_p < v_u * 1.5


@pytest.mark.slow
def test_spot_light_cone():
    """Spot light: inside-cone floor lit, outside-cone floor dark."""
    floor = [
        dict(p0=(-3, 0, -3), p1=(3, 0, -3), p2=(3, 0, 3), mat=0, light=-1,
             med_in=-1, med_out=-1),
        dict(p0=(-3, 0, -3), p1=(3, 0, 3), p2=(-3, 0, 3), mat=0, light=-1,
             med_in=-1, med_out=-1),
    ]
    geom = Geometry.build(triangles=floor)
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0.8, 0.8, 0.8))])
    lights = Lights.make(
        spots=[dict(p=(0, 2.0, 0), I=(20.0,) * 3, dir=(0, -1, 0),
                    cos_total=np.cos(np.radians(20)),
                    cos_start=np.cos(np.radians(15)))],
        world_radius=100.0)
    from vspg_pbrt_v4_tpu.models.media import Media

    scene = volpath.Scene(geom, mats, Media.make(), lights)
    cam = PerspectiveCamera.make(
        tr.look_at((0, 2.5, -3.5), (0, 0, 0), (0, 1, 0)), 40.0, (32, 32))
    img = np.asarray(volpath.render(scene, cam, RGBFilm.make((32, 32)),
                                    spp=32, seed=3, spp_per_pass=8))
    # spot center under the light (image center-ish) bright; corner dark
    assert img.max() > 0.3
    bright = img[14:20, 14:20].mean()
    dark = img[16:22, 1:5].mean()
    assert bright > 8 * max(dark, 1e-5), (bright, dark)


@pytest.mark.slow
def test_image_env_light_furnace_and_direction():
    """Equal-area image env light: constant map reproduces the uniform
    furnace; a single bright texel lights the scene from its direction."""
    from vspg_pbrt_v4_tpu.models.media import Media

    # constant map == uniform furnace
    env = np.full((16, 16, 3), 0.7, np.float32)
    geom = Geometry.build(spheres=[dict(c=(0, 0, 0), r=1.0, mat=0, light=-1,
                                        med_in=-1, med_out=-1)])
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0.6,) * 3)])
    lights = Lights.make(env_img=env, world_radius=100.0)
    scene = volpath.Scene(geom, mats, Media.make(), lights)
    img = np.asarray(volpath.render(scene, _camera(24), RGBFilm.make((24, 24)),
                                    spp=64, seed=4, spp_per_pass=8))
    center = img[10:14, 10:14].mean()
    assert abs(center - 0.6 * 0.7) < 0.03, center
    corner = img[:3, :3].mean()
    assert abs(corner - 0.7) < 1e-3, corner

    # directional: bright texel at direction +y
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.utils.vecmath import equal_area_sphere_to_square

    env2 = np.full((32, 32, 3), 0.01, np.float32)
    sq = np.asarray(equal_area_sphere_to_square(jnp.asarray([[0.0, 1.0, 0.0]])))[0]
    ty, tx = int(sq[1] * 32), int(sq[0] * 32)
    env2[ty - 1:ty + 2, tx - 1:tx + 2] = 50.0
    floor = [dict(p0=(-3, 0, -3), p1=(3, 0, -3), p2=(3, 0, 3), mat=0,
                  light=-1, med_in=-1, med_out=-1),
             dict(p0=(-3, 0, -3), p1=(3, 0, 3), p2=(-3, 0, 3), mat=0,
                  light=-1, med_in=-1, med_out=-1)]
    geom2 = Geometry.build(triangles=floor)
    lights2 = Lights.make(env_img=env2, world_radius=100.0)
    scene2 = volpath.Scene(geom2, mats, Media.make(), lights2)
    cam = PerspectiveCamera.make(
        tr.look_at((0, 2.0, -4.0), (0, 0, 0), (0, 1, 0)), 35.0, (24, 24))
    img2 = np.asarray(volpath.render(scene2, cam, RGBFilm.make((24, 24)),
                                     spp=64, seed=5, spp_per_pass=8))
    assert np.isfinite(img2).all()
    # the floor is lit from straight above: visible brightness
    assert img2[12:18, 8:16].mean() > 0.02, img2.mean()


def test_disk_shape():
    """Disk: hit within radius, miss outside, annulus hole respected."""
    from vspg_pbrt_v4_tpu.models.media import Media

    geom = Geometry.build(disks=[dict(c=(0, 0, 0), n=(0, 0, -1), r=1.0,
                                      ri=0.3, mat=0, light=-1, med_in=-1,
                                      med_out=-1)])
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0.9, 0.1, 0.1))])
    lights = Lights.make(env_L=[1.0] * 3, world_radius=100.0)
    scene = volpath.Scene(geom, mats, Media.make(), lights)
    from vspg_pbrt_v4_tpu.models.integrators import extras

    alb, nrm, depth, pid = [np.asarray(x) for x in extras.render_gbuffer(
        scene, _camera(48), RGBFilm.make((48, 48)))]
    # center pixel looks through the annulus hole -> miss
    assert pid[24, 24] == -1
    # mid-radius hits the disk
    hits = pid >= 0
    assert hits.sum() > 100
    assert np.allclose(alb[hits][0], [0.9, 0.1, 0.1], atol=1e-5)


def test_cylinder_and_bilinear_patch_hits():
    """New shapes: analytic hit positions + normals, shadowing, parity
    between intersect and intersect_p (shapes.h Cylinder:551 +
    BilinearPatch via the Reshetov solve)."""
    import numpy as np
    from vspg_pbrt_v4_tpu.models.shapes import Geometry

    geom = Geometry.build(
        cylinders=[dict(c=(0, -1, 0), a=(0, 1, 0), r=0.5, h=2.0, mat=0,
                        light=-1, med_in=-1, med_out=-1)],
        patches=[dict(p00=(-1, -1, 3), p10=(1, -1, 3), p01=(-1, 1, 3),
                      p11=(1, 1, 4), mat=0, light=-1, med_in=-1,
                      med_out=-1)],
    )
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, -3.0],
                     [0.0, 2.5, -3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.6, 0.8, 0.0],
                     [0.0, 0.0, 1.0]], jnp.float32)
    h = geom.intersect(o, d, jnp.full((3,), jnp.inf))
    h_hit = np.asarray(h.hit)
    # ray 0: hits the cylinder wall at z=-0.5 -> t=2.5
    assert h_hit[0] and abs(float(h.t[0]) - 2.5) < 1e-3
    assert np.allclose(np.asarray(h.n[0]), [0, 0, -1], atol=1e-3)
    # ray 1: leaves sideways, misses cylinder (above in y eventually) but
    # direction has no z -> never reaches patch: may miss entirely
    # ray 2: passes above the cylinder (y=2.5 > top 1.0), hits the patch?
    # patch spans y in [-1,1] at x=0 -> miss; so no hit
    assert not h_hit[2]
    # straight ray at the patch center from beyond (avoids the cylinder):
    # patch center z = (3+3+3+4)/4 = 3.25, so from z=5 along -z t = 1.75
    o2 = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    d2 = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    h2 = geom.intersect(o2, d2, jnp.full((1,), jnp.inf))
    assert bool(h2.hit[0]) and abs(float(h2.t[0]) - 1.75) < 1e-3
    assert abs(float(h2.uv[0, 0]) - 0.5) < 1e-3
    assert abs(float(h2.uv[0, 1]) - 0.5) < 1e-3
    # occlusion parity
    occ = geom.intersect_p(o, d, jnp.full((3,), 10.0))
    assert bool(occ[0]) and not bool(occ[2])
