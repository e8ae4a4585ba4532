"""Portal-image infinite light (lights.h PortalImageInfiniteLight:700)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import DIFFUSE, Materials
from vspg_pbrt_v4_tpu.models.media import HomogeneousMedia
from vspg_pbrt_v4_tpu.models.portal_light import PortalLight
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr

CORNERS = [(-1, -1, 2), (1, -1, 2), (1, 1, 2), (-1, 1, 2)]


def _const_portal(res=64, value=1.0):
    return PortalLight.make(lambda d: np.full((len(d), 3), value), CORNERS,
                            res=res)


@pytest.mark.slow
def test_portal_pdf_normalized_and_samples_inside():
    pl = _const_portal()
    rng = np.random.default_rng(0)
    N = 100000
    z = rng.uniform(-1, 1, N)
    ph = rng.uniform(0, 2 * np.pi, N)
    r = np.sqrt(1 - z * z)
    d = jnp.asarray(np.stack([r * np.cos(ph), r * np.sin(ph), z], -1),
                    jnp.float32)
    p = jnp.zeros((N, 3))
    pdf = np.asarray(pl.pdf_li(p, d))
    assert abs(pdf.mean() * 4 * np.pi - 1.0) < 0.04
    # all sampled directions pass through the portal quad
    u2 = jnp.asarray(rng.uniform(0, 1, (4096, 2)), jnp.float32)
    wi, L, pdfs, ok = pl.sample_li(jnp.zeros((4096, 3)), u2)
    wi_n = np.asarray(wi)[np.asarray(ok)]
    t = 2.0 / wi_n[:, 2]
    hit = wi_n * t[:, None]
    assert ((np.abs(hit[:, 0]) <= 1.01) & (np.abs(hit[:, 1]) <= 1.01)).all()


def test_portal_importance_follows_image():
    """A bright spot in the portal image attracts samples."""
    def env(dirs):
        # bright where direction x-component > 0.2
        w = np.where(dirs[:, 0] > 0.2, 50.0, 1.0)
        return np.stack([w, w, w], -1)

    pl = PortalLight.make(env, CORNERS, res=64)
    rng = np.random.default_rng(1)
    u2 = jnp.asarray(rng.uniform(0, 1, (8192, 2)), jnp.float32)
    wi, L, pdf, ok = pl.sample_li(jnp.zeros((8192, 3)), u2)
    frac_bright = (np.asarray(wi)[np.asarray(ok)][:, 0] > 0.2).mean()
    assert frac_bright > 0.6, frac_bright


@pytest.mark.slow
def test_portal_render_vs_open_env():
    """A diffuse floor under a portal window: the portal render equals a
    plain env render where the env is masked to the portal cone (the two
    scenes describe the same illumination; estimators differ)."""
    # floor at y=0, portal overhead (z=2 plane rotated: use CORNERS in +z)
    tris = [dict(p0=(-5, 0, -5), p1=(5, 0, -5), p2=(5, 0, 5), mat=0,
                 light=-1, med_in=-1, med_out=-1),
            dict(p0=(-5, 0, -5), p1=(5, 0, 5), p2=(-5, 0, 5), mat=0,
                 light=-1, med_in=-1, med_out=-1)]
    geom = Geometry.build(triangles=tris)
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0.6, 0.6, 0.6))])
    media = HomogeneousMedia.make(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    # winding chosen so the portal frame's z faces DOWN toward the floor
    # (pbrt's convention: directions to the light need w.z > 0 in the
    # portal frame)
    pl = PortalLight.make(lambda d: np.ones((len(d), 3)),
                          [(-1, 2, -1), (-1, 2, 1), (1, 2, 1), (1, 2, -1)],
                          res=64)
    lights_portal = Lights.make(env_L=[1.0, 1, 1],
                                world_radius=50.0).replace(portal=pl)
    scene = volpath.Scene(geom, mats, media, lights_portal)
    c2w = tr.look_at((0, 1.0, -3), (0, 0, 0), (0, 1, 0))
    cam = PerspectiveCamera.make(c2w, fov_deg=40.0, resolution=(16, 16))
    img = np.asarray(volpath.render(scene, cam, RGBFilm.make((16, 16)),
                                    spp=96, seed=1))
    assert np.isfinite(img).all()
    # brute-force reference: irradiance over the portal cone at the floor
    # point below the portal center: E = int cos dw over the window
    rng = np.random.default_rng(2)
    N = 400000
    z = rng.uniform(0, 1, N)
    ph = rng.uniform(0, 2 * np.pi, N)
    r = np.sqrt(1 - z * z)
    d = np.stack([r * np.cos(ph), z, r * np.sin(ph)], -1)  # upper hemi
    t = 2.0 / np.maximum(d[:, 1], 1e-9)
    hit = d * t[:, None]
    through = (np.abs(hit[:, 0]) <= 1) & (np.abs(hit[:, 2]) <= 1)
    E = (through * d[:, 1]).mean() * 2 * np.pi  # int cos over hemi
    expect = 0.6 * E / np.pi
    # the camera centers exactly on the floor point below the portal
    center = img[7:9, 7:9].mean()
    assert abs(center - expect) / expect < 0.15, (center, expect)


@pytest.mark.slow
def test_portal_guided_matches_unguided():
    """Portal-lit floor with guiding: guided_volpath's escaped-ray MIS must
    pass the previous vertex to pdf_li_escaped (portal pdfs depend on the
    reference point; regression: ref_p was omitted, biasing escape weights)."""
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp

    tris = [dict(p0=(-5, 0, -5), p1=(5, 0, -5), p2=(5, 0, 5), mat=0,
                 light=-1, med_in=-1, med_out=-1),
            dict(p0=(-5, 0, -5), p1=(5, 0, 5), p2=(-5, 0, 5), mat=0,
                 light=-1, med_in=-1, med_out=-1)]
    geom = Geometry.build(triangles=tris)
    mats = Materials.build([dict(type=DIFFUSE, albedo=(0.6, 0.6, 0.6))])
    media = HomogeneousMedia.make(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    pl = PortalLight.make(lambda d: np.ones((len(d), 3)),
                          [(-1, 2, -1), (-1, 2, 1), (1, 2, 1), (1, 2, -1)],
                          res=64)
    lights_portal = Lights.make(env_L=[1.0, 1, 1],
                                world_radius=50.0).replace(portal=pl)
    scene = volpath.Scene(geom, mats, media, lights_portal)
    c2w = tr.look_at((0, 1.0, -3), (0, 0, 0), (0, 1, 0))
    cam = PerspectiveCamera.make(c2w, fov_deg=40.0, resolution=(16, 16))
    film = RGBFilm.make((16, 16))
    ref = np.asarray(volpath.render(scene, cam, film, spp=128, seed=3))
    img, field = gvp.render_guided(
        scene, cam, film, spp=128,
        gopt=gvp.GuidingOptions(mode="mis", field_res=8, record_depth=4,
                                min_train_weight=16.0),
        seed=4, spp_per_pass=8)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.04, (img.mean(), ref.mean())


def test_parser_portal():
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string

    txt = """
    Camera "perspective" "float fov" [40]
    Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    LightSource "infinite" "rgb L" [1 1 1]
        "point3 portal" [-1 -1 2  1 -1 2  1 1 2  -1 1 2]
    Shape "sphere" "float radius" [0.5]
    """
    setup = build_render_setup(parse_pbrt_string(txt))
    assert setup.scene.lights.portal is not None
