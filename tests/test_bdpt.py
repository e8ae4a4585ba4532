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
