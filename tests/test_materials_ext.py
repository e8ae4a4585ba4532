"""Extended material families: thin dielectric, coated diffuse/conductor, mix.

Validation idiom from the reference's bsdfs_test.cpp: sample/pdf consistency
(the hemispherical reflectance estimated by BSDF importance sampling must
match an independent uniform-direction estimate), reciprocity, and energy
conservation bounds — plus a render-level furnace for the delta family.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models import materials as M
from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.media import Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr
from vspg_pbrt_v4_tpu.utils.sampling import sample_uniform_sphere


def _lanes(mtype, n, **kw):
    mats = M.Materials.build([dict(type=mtype, **kw)])
    return mats.gather(jnp.zeros(n, jnp.int32))


def _rho_two_ways(mtype, wo_z=0.6, n=200_000, seed=0, **kw):
    """Hemispherical reflectance of f via (a) BSDF sampling f*cos/pdf and
    (b) uniform-sphere MC of f*cos — must agree if sample/pdf/f are
    consistent."""
    rng = np.random.default_rng(seed)
    lanes = _lanes(mtype, n, **kw)
    s = np.sqrt(1 - wo_z**2)
    wo = jnp.tile(jnp.asarray([[s, 0.0, wo_z]], jnp.float32), (n, 1))
    u_lobe = jnp.asarray(rng.random(n, np.float32))
    u2 = jnp.asarray(rng.random((n, 2), np.float32))
    bs = M.bsdf_sample(lanes, wo, u_lobe, u2)
    w = np.asarray(jnp.where(
        (bs.valid & (bs.pdf > 0) & ~bs.is_specular)[..., None],
        bs.f * jnp.abs(bs.wi[..., 2:3]) / jnp.maximum(bs.pdf, 1e-30)[..., None],
        0.0))
    rho_sample = w.mean(0)

    u2b = jnp.asarray(rng.random((n, 2), np.float32))
    wi_u = sample_uniform_sphere(u2b)
    f = M.bsdf_f(lanes, wo, wi_u)
    rho_uniform = np.asarray(
        f * jnp.abs(wi_u[..., 2:3]) * (4 * np.pi)).mean(0)
    return rho_sample, rho_uniform


@pytest.mark.slow
def test_coated_diffuse_sample_pdf_consistent():
    a, b = _rho_two_ways(M.COATED_DIFFUSE, albedo=(0.8, 0.6, 0.4),
                         roughness=0.2, eta=1.5)
    assert np.all(np.abs(a - b) < 0.02 + 0.05 * b), (a, b)
    assert np.all(a <= 1.01), a  # energy conservation


def test_coated_conductor_sample_pdf_consistent():
    a, b = _rho_two_ways(M.COATED_CONDUCTOR, albedo=(0.9, 0.7, 0.4),
                         roughness=0.3, roughness2=0.1, eta=1.5, seed=1)
    assert np.all(np.abs(a - b) < 0.02 + 0.05 * b), (a, b)
    assert np.all(a <= 1.01), a


def test_cooktorrance_sample_pdf_consistent():
    """Fork's CookTorranceMaterial (materials.h:555, bxdfs.cpp:78-183):
    Fresnel-weighted glossy+diffuse reflection — BSDF-sampled rho must
    match the uniform-sphere estimate, and stay under 1."""
    a, b = _rho_two_ways(M.COOK_TORRANCE, albedo=(0.8, 0.5, 0.3),
                         roughness=0.2, eta=1.5, seed=5)
    assert np.all(np.abs(a - b) < 0.02 + 0.05 * b), (a, b)
    assert np.all(a <= 1.01), a


def test_cooktorrance_reciprocity_and_grazing():
    n = 1000
    rng = np.random.default_rng(11)
    lanes = _lanes(M.COOK_TORRANCE, n, albedo=(0.7, 0.5, 0.3),
                   roughness=0.1, eta=1.5)
    wo = np.array(sample_uniform_sphere(jnp.asarray(
        rng.random((n, 2), np.float32))))
    wi = np.array(sample_uniform_sphere(jnp.asarray(
        rng.random((n, 2), np.float32))))
    wo[:, 2] = np.abs(wo[:, 2]) + 0.05
    wi[:, 2] = np.abs(wi[:, 2]) + 0.05
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    f_ab = np.asarray(M.bsdf_f(lanes, jnp.asarray(wo), jnp.asarray(wi)))
    f_ba = np.asarray(M.bsdf_f(lanes, jnp.asarray(wi), jnp.asarray(wo)))
    assert np.allclose(f_ab, f_ba, rtol=1e-4, atol=1e-6)
    assert np.isfinite(f_ab).all()


def test_cooktorrance_parser():
    """Material "cooktorrance" parses through the .pbrt builder."""
    from vspg_pbrt_v4_tpu.scene.builder import build_render_setup
    from vspg_pbrt_v4_tpu.scene.parser import parse_pbrt_string

    txt = """
    Camera "perspective" "float fov" [40]
    Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
    WorldBegin
    Material "cooktorrance" "rgb reflectance" [0.6 0.4 0.2]
        "float roughness" [0.2] "float eta" [1.4]
    Shape "sphere" "float radius" [1]
    LightSource "infinite" "rgb L" [0.5 0.5 0.5]
    """
    setup = build_render_setup(parse_pbrt_string(txt))
    mats = setup.scene.materials
    types = np.asarray(mats.mat_type)
    (idx,) = np.nonzero(types == M.COOK_TORRANCE)
    assert idx.size == 1, types  # the builder prepends a default slot
    i = int(idx[0])
    assert abs(float(mats.eta[i]) - 1.4) < 1e-6
    assert abs(float(mats.roughness[i]) - 0.2) < 1e-6


def test_coated_reciprocity():
    n = 1000
    rng = np.random.default_rng(7)
    lanes = _lanes(M.COATED_DIFFUSE, n, albedo=(0.7, 0.5, 0.3),
                   roughness=0.15, eta=1.4)
    wo = np.array(sample_uniform_sphere(jnp.asarray(
        rng.random((n, 2), np.float32))))
    wi = np.array(sample_uniform_sphere(jnp.asarray(
        rng.random((n, 2), np.float32))))
    wo[:, 2] = np.abs(wo[:, 2]) + 0.05
    wi[:, 2] = np.abs(wi[:, 2]) + 0.05
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    f_ab = np.asarray(M.bsdf_f(lanes, jnp.asarray(wo), jnp.asarray(wi)))
    f_ba = np.asarray(M.bsdf_f(lanes, jnp.asarray(wi), jnp.asarray(wo)))
    assert np.allclose(f_ab, f_ba, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_thin_dielectric_energy():
    """R + T == 1 per sample set: a thin glass pane in a furnace keeps the
    env radiance exact (all-specular, straight-through transmission)."""
    L0 = 0.8
    pane = [
        dict(p0=(-3, -3, 0), p1=(3, -3, 0), p2=(3, 3, 0), mat=0, light=-1),
        dict(p0=(-3, -3, 0), p1=(3, 3, 0), p2=(-3, 3, 0), mat=0, light=-1),
    ]
    geom = Geometry.build(triangles=pane)
    mats = M.Materials.build([dict(type=M.THIN_DIELECTRIC, eta=1.5)])
    lights = Lights.make(env_L=[L0] * 3, world_radius=50.0)
    scene = volpath.Scene(geom, mats, Media.make(), lights)
    cam = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), fov_deg=40.0,
        resolution=(24, 24))
    img = np.asarray(volpath.render(scene, cam, RGBFilm.make((24, 24)),
                                    spp=64, seed=3, spp_per_pass=8,
                                    cfg=volpath.VolPathConfig(max_depth=16)))
    assert np.isfinite(img).all()
    assert abs(img.mean() - L0) < 0.02 * L0, img.mean()


def test_mix_resolution_statistics():
    mats = M.Materials.build([
        dict(type=M.DIFFUSE, albedo=(1, 0, 0)),
        dict(type=M.DIFFUSE, albedo=(0, 1, 0)),
        dict(type=M.MIX, mix_m1=0, mix_m2=1, mix_amount=0.3),
    ])
    n = 100_000
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.uniform(-10, 10, (n, 3)).astype(np.float32))
    mid = mats.resolve_mix(jnp.full((n,), 2, jnp.int32), p)
    mid = np.asarray(mid)
    assert set(np.unique(mid)) == {0, 1}
    frac = (mid == 0).mean()
    assert abs(frac - 0.3) < 0.01, frac
    # deterministic in position
    mid2 = np.asarray(mats.resolve_mix(jnp.full((n,), 2, jnp.int32), p))
    assert (mid == mid2).all()
