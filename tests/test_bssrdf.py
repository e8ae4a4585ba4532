"""Subsurface scattering (separable BSSRDF with Burley diffusion profile).

Checks the profile's normalization/invertibility, the probe-ray exit
sampling on a flat slab, and end-to-end energy behavior: an A=1 subsurface
half-space re-emits what it receives (furnace idiom), A<1 darkens.
"""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models import bssrdf as B
from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import SUBSURFACE, Materials
from vspg_pbrt_v4_tpu.models.media import HomogeneousMedia
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr
import pytest

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def test_sr_area_pdf_normalized():
    for d in (0.2, 1.0, 3.0):
        r = np.linspace(1e-5, 40.0 * d, 400001)
        pdf = np.asarray(B.sr_area_pdf(jnp.asarray(r), jnp.asarray(d)))
        assert abs(np.trapezoid(pdf, r) - 1.0) < 1e-3


def test_sample_sr_matches_pdf():
    rng = np.random.default_rng(0)
    d = 0.7
    n = 200000
    r = np.asarray(B.sample_sr(jnp.asarray(rng.uniform(0, 1, n), jnp.float32),
                               jnp.asarray(rng.uniform(0, 1, n), jnp.float32),
                               jnp.asarray(d)))
    # histogram vs analytic pdf
    hist, edges = np.histogram(r, bins=50, range=(0, 8 * d), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    pdf = np.asarray(B.sr_area_pdf(jnp.asarray(centers), jnp.asarray(d)))
    mask = pdf > 0.05
    assert np.abs(hist[mask] / pdf[mask] - 1.0).max() < 0.12


def test_probe_exit_on_flat_slab():
    """Exit points on a large flat floor cluster around the entry with mean
    radius ~ the profile's mean (2.5 d for the two-exp mixture)."""
    geom = Geometry.build(triangles=[
        dict(p0=(-50, 0, -50), p1=(50, 0, -50), p2=(50, 0, 50), mat=0,
             light=-1, med_in=-1, med_out=-1),
        dict(p0=(-50, 0, -50), p1=(50, 0, 50), p2=(-50, 0, 50), mat=0,
             light=-1, med_in=-1, med_out=-1)])
    R = 4096
    rng = np.random.default_rng(1)
    p = jnp.zeros((R, 3))
    ns = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (R, 3))
    t1 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (R, 3))
    t2 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
    d = 0.5
    ok, p_x, n_x, r_s, cos_x = B.sample_exit_point(
        geom, p, ns, t1, t2, jnp.zeros(R, jnp.int32), jnp.full(R, d),
        jnp.asarray(rng.uniform(0, 1, R), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, R), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, R), jnp.float32),
        jnp.ones(R, bool))
    ok = np.asarray(ok)
    assert ok.mean() > 0.98
    r = np.linalg.norm(np.asarray(p_x)[ok][:, [0, 2]], axis=-1)
    # E[r] for the mixture = 0.25*d + 0.75*3d = 2.5 d
    assert abs(r.mean() - 2.5 * d) / (2.5 * d) < 0.1, r.mean()
    assert np.allclose(np.asarray(n_x)[ok][:, 1], 1.0, atol=1e-4)


def _slab_scene(A, d=0.3):
    tris = []
    for q in ((( -8, 0, -8), (8, 0, -8), (8, 0, 8)),
              ((-8, 0, -8), (8, 0, 8), (-8, 0, 8))):
        tris.append(dict(p0=q[0], p1=q[1], p2=q[2], mat=0, light=-1,
                         med_in=-1, med_out=-1))
    geom = Geometry.build(triangles=tris)
    mats = Materials.build([dict(type=SUBSURFACE, albedo=(A, A, A),
                                 albedo2=(d, d, d), eta=1.33)])
    lights = Lights.make(env_L=[1.0, 1.0, 1.0], world_radius=100.0)
    media = HomogeneousMedia.make(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    return volpath.Scene(geom, mats, media, lights)


def _camera(res=24):
    c2w = tr.look_at((0, 3, -3), (0, 0, 0), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=40.0, resolution=(res, res))


def test_sss_furnace_white():
    """A=1 subsurface slab in a unit furnace: what goes in comes out
    (within the flat-geometry estimator's tolerance)."""
    scene = _slab_scene(1.0)
    img = np.asarray(volpath.render(
        scene, _camera(), RGBFilm.make((24, 24)), spp=96,
        cfg=volpath.VolPathConfig(sss=True, max_depth=16)))
    assert np.isfinite(img).all()
    m = img.mean()
    assert 0.85 < m < 1.08, m


def test_sss_albedo_darkens():
    imgs = {}
    for A in (1.0, 0.3):
        scene = _slab_scene(A)
        imgs[A] = np.asarray(volpath.render(
            scene, _camera(16), RGBFilm.make((16, 16)), spp=64,
            cfg=volpath.VolPathConfig(sss=True, max_depth=16))).mean()
    assert imgs[0.3] < 0.75 * imgs[1.0], imgs


def test_parser_subsurface():
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string

    txt = """
    Camera "perspective" "float fov" [40]
    Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    Material "subsurface" "rgb sigma_s" [2 2 2] "rgb sigma_a" [0.02 0.1 0.4]
    Shape "sphere" "float radius" [1]
    LightSource "infinite" "rgb L" [1 1 1]
    """
    setup = build_render_setup(parse_pbrt_string(txt))
    assert int(setup.scene.materials.mat_type[-1]) == SUBSURFACE or \
        int(setup.scene.materials.mat_type[0]) == SUBSURFACE
