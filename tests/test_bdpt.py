"""BDPT cross-estimator tests.

The reference validates BDPT in the analytic-furnace render matrix
(cpu/integrators_test.cpp). Here the primary check is the independent-
estimator idiom: BDPT and the forward path tracer (volpath with no media)
are both unbiased, so their images must agree within MC noise on area- and
point-lit interiors — including paths the two estimators sample very
differently (bright indirect, delta lights).
"""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import bdpt, volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import CONDUCTOR, DIFFUSE, Materials
from vspg_pbrt_v4_tpu.models.media import HomogeneousMedia
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr
import pytest

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def _quad(p0, p1, p2, p3, mat=-1, light=-1):
    """Two triangles covering the quad p0-p1-p2-p3."""
    base = dict(mat=mat, light=light, med_in=-1, med_out=-1)
    return [dict(p0=p0, p1=p1, p2=p2, **base),
            dict(p0=p0, p1=p2, p2=p3, **base)]


def _box_scene(light_kind="area", wall_albedo=0.7, L=8.0,
               mirror_wall=False):
    """Closed 2x2x2 box interior; camera inside looking +z."""
    s = 1.0
    tris = []
    # floor (y=-1), ceiling (y=+1), back (z=+1), left (x=-1), right (x=+1),
    # front (z=-1, behind the camera)
    tris += _quad((-s, -s, -s), (s, -s, -s), (s, -s, s), (-s, -s, s), mat=0)
    tris += _quad((-s, s, -s), (-s, s, s), (s, s, s), (s, s, -s), mat=0)
    tris += _quad((-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s), mat=0)
    tris += _quad((-s, -s, -s), (-s, -s, s), (-s, s, s), (-s, s, -s), mat=0)
    right_mat = 1 if mirror_wall else 0
    tris += _quad((s, -s, -s), (s, s, -s), (s, s, s), (s, -s, s),
                  mat=right_mat)
    tris += _quad((-s, -s, -s), (-s, s, -s), (s, s, -s), (s, -s, -s), mat=0)

    area_tris = None
    point_p = point_I = None
    if light_kind == "area":
        # emissive quad under the ceiling, facing DOWN (-y normal)
        h = 0.95
        e = 0.4
        l0, l1, l2, l3 = ((-e, h, -e), (e, h, -e), (e, h, e), (-e, h, e))
        area_tris = [dict(p0=l0, p1=l1, p2=l2, L=(L, L, L)),
                     dict(p0=l0, p1=l2, p2=l3, L=(L, L, L))]
        # geometry for the emitter (so it is visible / occludes)
        tris += [dict(p0=l0, p1=l1, p2=l2, mat=0, light=0, med_in=-1,
                      med_out=-1),
                 dict(p0=l0, p1=l2, p2=l3, mat=0, light=1, med_in=-1,
                      med_out=-1)]
    spots = None
    if light_kind == "area":
        pass
    elif light_kind == "spot":
        # wide downward cone from near the ceiling
        spots = [dict(p=(0.0, 0.8, 0.0), I=(L / 3, L / 3, L / 3),
                      dir=(0.0, -1.0, 0.0),
                      cos_total=0.3, cos_start=0.8)]
    else:
        point_p = [(0.0, 0.8, 0.0)]
        point_I = [(L / 4, L / 4, L / 4)]

    geom = Geometry.build(triangles=tris)
    mats = [dict(type=DIFFUSE, albedo=(wall_albedo,) * 3)]
    if mirror_wall:
        mats.append(dict(type=CONDUCTOR, albedo=(0.9, 0.9, 0.9),
                         roughness=0.0))
    lights = Lights.make(area_tris=area_tris, point_p=point_p,
                         point_I=point_I, spots=spots, world_radius=10.0)
    media = HomogeneousMedia.make(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    return volpath.Scene(geom, Materials.build(mats), media, lights)


def _camera(res):
    c2w = tr.look_at((0, 0, -0.9), (0, 0, 1), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=70.0, resolution=(res, res))


def _render_pair(scene, res=16, spp_pt=192, spp_bdpt=64, max_depth=4):
    cam = _camera(res)
    film = RGBFilm.make((res, res))
    # rr_start_depth=99 disables Russian roulette: the reference estimate
    # stays low-variance (RR survivors are heavy-tailed)
    img_pt = np.asarray(volpath.render(
        scene, cam, film, spp=spp_pt,
        cfg=volpath.VolPathConfig(max_depth=max_depth, rr_start_depth=99)))
    img_bd = np.asarray(bdpt.render(scene, cam, film, spp=spp_bdpt,
                                    max_depth=max_depth))
    return img_pt, img_bd


def test_bdpt_matches_path_area_light():
    scene = _box_scene("area")
    img_pt, img_bd = _render_pair(scene)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.03, (m_pt, m_bd)
    # per-region agreement (quarters), not just global mean
    for sl in (np.s_[:8, :8], np.s_[8:, 8:], np.s_[:8, 8:]):
        a, b = img_pt[sl].mean(), img_bd[sl].mean()
        assert abs(b - a) / a < 0.06, (sl, a, b)


def test_bdpt_matches_path_point_light():
    scene = _box_scene("point")
    img_pt, img_bd = _render_pair(scene)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.06, (m_pt, m_bd)


def test_bdpt_matches_path_spot_light():
    """Spot emitters exercise _sample_le_detailed's cone sampling and the
    s=1 per-type PDF_Le patch (regression: spot picks used to produce
    valid=False light subpaths, silently darkening the render)."""
    scene = _box_scene("spot")
    img_pt, img_bd = _render_pair(scene)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.06, (m_pt, m_bd)


def test_bdpt_mirror_wall():
    """Specular chains exercise the delta-aware MIS bookkeeping."""
    scene = _box_scene("area", mirror_wall=True)
    img_pt, img_bd = _render_pair(scene, spp_pt=256, spp_bdpt=96,
                                  max_depth=5)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.07, (m_pt, m_bd)


def _open_env_scene(env_img=False, with_area=False):
    """Diffuse floor + short blocker wall under an infinite light: escaped
    camera rays (s=0), env NEE (s=1), and env light subpaths (SampleLe)
    all contribute."""
    tris = _quad((-2, -0.5, -2), (2, -0.5, -2), (2, -0.5, 2), (-2, -0.5, 2),
                 mat=0)
    tris += _quad((-0.8, -0.5, 0.6), (0.8, -0.5, 0.6), (0.8, 0.2, 0.6),
                  (-0.8, 0.2, 0.6), mat=0)
    area_tris = None
    if with_area:
        l0, l1, l2, l3 = ((-0.3, 0.6, -0.3), (0.3, 0.6, -0.3),
                          (0.3, 0.6, 0.3), (-0.3, 0.6, 0.3))
        area_tris = [dict(p0=l0, p1=l1, p2=l2, L=(4.0,) * 3),
                     dict(p0=l0, p1=l2, p2=l3, L=(4.0,) * 3)]
        tris += [dict(p0=l0, p1=l1, p2=l2, mat=0, light=0, med_in=-1,
                      med_out=-1),
                 dict(p0=l0, p1=l2, p2=l3, mat=0, light=1, med_in=-1,
                      med_out=-1)]
    geom = Geometry.build(triangles=tris)
    mats = [dict(type=DIFFUSE, albedo=(0.6, 0.6, 0.6))]
    if env_img:
        S = 8
        rng = np.random.default_rng(3)
        img = (0.2 + 1.5 * rng.random((S, S, 3))).astype(np.float32)
        lights = Lights.make(env_img=img, area_tris=area_tris,
                             world_radius=8.0)
    else:
        lights = Lights.make(env_L=[1.0, 0.9, 0.8], area_tris=area_tris,
                             world_radius=8.0)
    media = HomogeneousMedia.make(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    return volpath.Scene(geom, Materials.build(mats), media, lights)


def _env_camera(res):
    c2w = tr.look_at((0, 0.6, -2.2), (0, -0.2, 0), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=60.0, resolution=(res, res))


def _render_env_pair(scene, res=16, spp_pt=192, spp_bdpt=64, max_depth=4):
    cam = _env_camera(res)
    film = RGBFilm.make((res, res))
    img_pt = np.asarray(volpath.render(
        scene, cam, film, spp=spp_pt,
        cfg=volpath.VolPathConfig(max_depth=max_depth, rr_start_depth=99)))
    img_bd = np.asarray(bdpt.render(scene, cam, film, spp=spp_bdpt,
                                    max_depth=max_depth))
    return img_pt, img_bd


def _open_distant_scene(with_area=False, with_env=False):
    """Diffuse floor + blocker wall under a distant (delta-direction)
    light — contributions come only from s=1 NEE and disk-origin light
    subpaths (escaped camera rays see nothing from a distant light)."""
    tris = _quad((-2, -0.5, -2), (2, -0.5, -2), (2, -0.5, 2), (-2, -0.5, 2),
                 mat=0)
    tris += _quad((-0.8, -0.5, 0.6), (0.8, -0.5, 0.6), (0.8, 0.2, 0.6),
                  (-0.8, 0.2, 0.6), mat=0)
    area_tris = None
    if with_area:
        l0, l1, l2, l3 = ((-0.3, 0.6, -0.3), (0.3, 0.6, -0.3),
                          (0.3, 0.6, 0.3), (-0.3, 0.6, 0.3))
        area_tris = [dict(p0=l0, p1=l1, p2=l2, L=(4.0,) * 3),
                     dict(p0=l0, p1=l2, p2=l3, L=(4.0,) * 3)]
        tris += [dict(p0=l0, p1=l1, p2=l2, mat=0, light=0, med_in=-1,
                      med_out=-1),
                 dict(p0=l0, p1=l2, p2=l3, mat=0, light=1, med_in=-1,
                      med_out=-1)]
    geom = Geometry.build(triangles=tris)
    mats = [dict(type=DIFFUSE, albedo=(0.6, 0.6, 0.6))]
    lights = Lights.make(
        distant_dir=[(0.3, -1.0, 0.25)], distant_L=[(2.0, 1.9, 1.8)],
        env_L=[0.3, 0.3, 0.3] if with_env else None,
        area_tris=area_tris, world_radius=8.0)
    media = HomogeneousMedia.make(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    return volpath.Scene(geom, Materials.build(mats), media, lights)


def test_bdpt_distant_light():
    """Distant (delta-direction) emitters: disk-origin SampleLe subpaths
    with infinite-endpoint MIS semantics (Vertex::IsInfiniteLight covers
    LightType::DeltaDirection, integrators.cpp:1714-1718) against the
    forward path tracer."""
    scene = _open_distant_scene()
    img_pt, img_bd = _render_env_pair(scene)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert m_pt > 0.01  # the light actually reaches the floor
    assert abs(m_bd - m_pt) / m_pt < 0.05, (m_pt, m_bd)
    for sl in (np.s_[:8, :8], np.s_[8:, 8:], np.s_[:8, 8:]):
        a, b = img_pt[sl].mean(), img_bd[sl].mean()
        assert abs(b - a) / max(a, 1e-3) < 0.09, (sl, a, b)


def test_bdpt_distant_plus_env_area():
    """Distant + env + area emitters together: the subpath pmf table now
    includes the distant entry, and the three endpoint flavors (finite
    area, infinite env, infinite delta-direction) must keep consistent
    MIS densities."""
    scene = _open_distant_scene(with_area=True, with_env=True)
    img_pt, img_bd = _render_env_pair(scene, spp_pt=256, spp_bdpt=96)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.05, (m_pt, m_bd)


def test_bdpt_uniform_env():
    """Uniform infinite light: escaped s=0 vertices, env s=1 resampling,
    env SampleLe subpaths and the InfiniteLightDensity MIS corrections
    (integrators.cpp:1994-2006, 2272) against the forward path tracer."""
    scene = _open_env_scene(env_img=False)
    img_pt, img_bd = _render_env_pair(scene)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.04, (m_pt, m_bd)
    for sl in (np.s_[:8, :8], np.s_[8:, 8:], np.s_[:8, 8:]):
        a, b = img_pt[sl].mean(), img_bd[sl].mean()
        assert abs(b - a) / a < 0.08, (sl, a, b)


def test_bdpt_image_env():
    """Image infinite light: the equal-area texel pmf must agree between
    sample_env_dir, env_pdf_dir and the escape-capture MIS weights."""
    scene = _open_env_scene(env_img=True)
    img_pt, img_bd = _render_env_pair(scene)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.05, (m_pt, m_bd)


def test_bdpt_env_plus_area():
    """Env + finite emitters together: the renormalized subpath pmf table
    must stay consistent across s=0/s=1 PDFLightOrigin evaluations
    (regression: the old table dropped env, biasing mixed scenes)."""
    scene = _open_env_scene(env_img=False, with_area=True)
    img_pt, img_bd = _render_env_pair(scene, spp_pt=256, spp_bdpt=96)
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.05, (m_pt, m_bd)


def _fog_box_scene(sigma_s=0.35, sigma_a=0.03, g=0.0, L=8.0):
    """Closed box interior filled with homogeneous fog (a box interface
    med_in=0) under a downward area light: exercises VT_MEDIUM vertices,
    HG phase connections and ratio-tracked connection Tr."""
    scene0 = _box_scene("area", L=L)
    tris = None
    # rebuild with a fog volume box just inside the walls
    s = 1.0
    tris = []
    tris += _quad((-s, -s, -s), (s, -s, -s), (s, -s, s), (-s, -s, s), mat=0)
    tris += _quad((-s, s, -s), (-s, s, s), (s, s, s), (s, s, -s), mat=0)
    tris += _quad((-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s), mat=0)
    tris += _quad((-s, -s, -s), (-s, -s, s), (-s, s, s), (-s, s, -s), mat=0)
    tris += _quad((s, -s, -s), (s, s, -s), (s, s, s), (s, -s, s), mat=0)
    tris += _quad((-s, -s, -s), (-s, s, -s), (s, s, -s), (s, -s, -s), mat=0)
    h, e = 0.95, 0.4
    l0, l1, l2, l3 = ((-e, h, -e), (e, h, -e), (e, h, e), (-e, h, e))
    area_tris = [dict(p0=l0, p1=l1, p2=l2, L=(L, L, L)),
                 dict(p0=l0, p1=l2, p2=l3, L=(L, L, L))]
    tris += [dict(p0=l0, p1=l1, p2=l2, mat=0, light=0, med_in=-1,
                  med_out=-1),
             dict(p0=l0, p1=l2, p2=l3, mat=0, light=1, med_in=-1,
                  med_out=-1)]
    geom = Geometry.build(
        triangles=tris,
        boxes=[dict(bmin=(-0.99, -0.99, -0.99), bmax=(0.99, 0.99, 0.99),
                    mat=-1, light=-1, med_in=0, med_out=-1)])
    mats = [dict(type=DIFFUSE, albedo=(0.7, 0.7, 0.7))]
    lights = Lights.make(area_tris=area_tris, world_radius=10.0)
    media = HomogeneousMedia.make(jnp.full((1, 3), sigma_a),
                                  jnp.full((1, 3), sigma_s), g=[g])
    return volpath.Scene(geom, Materials.build(mats), media, lights)


def test_bdpt_fog_area_light():
    """Fog-filled box, downward area light: BDPT with medium vertices vs
    the forward volpath (RandomWalk SampleT_maj + Vertex::CreateMedium,
    integrators.cpp:2028-2100)."""
    scene = _fog_box_scene()
    cam = _camera(16)
    film = RGBFilm.make((16, 16))
    img_pt = np.asarray(volpath.render(
        scene, cam, film, spp=256,
        cfg=volpath.VolPathConfig(max_depth=4, rr_start_depth=99),
        camera_medium=0))
    img_bd = np.asarray(bdpt.render(scene, cam, film, spp=96, max_depth=4,
                                    camera_medium=0, light_medium=0))
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.06, (m_pt, m_bd)


def test_bdpt_fog_env_light():
    """Fog slab over the floor under a uniform env light (VERDICT round-1
    item 9: bdpt vs volpath on a fog scene with an env light)."""
    scene0 = _open_env_scene(env_img=False)
    tris = []
    tris += _quad((-2, -0.5, -2), (2, -0.5, -2), (2, -0.5, 2), (-2, -0.5, 2),
                  mat=0)
    tris += _quad((-0.8, -0.5, 0.6), (0.8, -0.5, 0.6), (0.8, 0.2, 0.6),
                  (-0.8, 0.2, 0.6), mat=0)
    geom = Geometry.build(
        triangles=tris,
        boxes=[dict(bmin=(-1.2, -0.49, -1.2), bmax=(1.2, 0.5, 1.2),
                    mat=-1, light=-1, med_in=0, med_out=-1)])
    mats = [dict(type=DIFFUSE, albedo=(0.6, 0.6, 0.6))]
    lights = Lights.make(env_L=[1.0, 0.9, 0.8], world_radius=8.0)
    media = HomogeneousMedia.make(jnp.full((1, 3), 0.02),
                                  jnp.full((1, 3), 0.4), g=[0.2])
    scene = volpath.Scene(geom, Materials.build(mats), media, lights)
    cam = _env_camera(16)
    film = RGBFilm.make((16, 16))
    img_pt = np.asarray(volpath.render(
        scene, cam, film, spp=256,
        cfg=volpath.VolPathConfig(max_depth=4, rr_start_depth=99)))
    img_bd = np.asarray(bdpt.render(scene, cam, film, spp=96, max_depth=4))
    m_pt, m_bd = img_pt.mean(), img_bd.mean()
    assert np.isfinite(img_bd).all()
    assert abs(m_bd - m_pt) / m_pt < 0.06, (m_pt, m_bd)
