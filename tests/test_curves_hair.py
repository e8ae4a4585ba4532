"""Curve shape + hair BSDF.

Statistical idiom from the reference's bxdfs_test.cpp (hair white furnace,
sampling consistency, pdf normalization) plus curve intersection oracles
(shapes_test.cpp style) and a parser roundtrip.
"""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models import materials as M
from vspg_pbrt_v4_tpu.models.shapes import Geometry


def _sphere_dirs(rng, n):
    z = rng.uniform(-1, 1, n)
    ph = rng.uniform(0, 2 * np.pi, n)
    r = np.sqrt(1 - z * z)
    return jnp.asarray(np.stack([r * np.cos(ph), r * np.sin(ph), z], -1),
                       jnp.float32)


def _hair_lanes(R, rng, sigma_a=(0, 0, 0), beta=0.3):
    return M.BSDFLanes(
        mat_type=jnp.full(R, M.HAIR, jnp.int32),
        albedo=jnp.zeros((R, 3)),
        albedo2=jnp.broadcast_to(jnp.asarray(sigma_a, jnp.float32), (R, 3)),
        eta=jnp.full(R, 1.55),
        roughness=jnp.full(R, beta),
        roughness2=jnp.full(R, beta),
        alpha=jnp.zeros(R),
        h=jnp.asarray(rng.uniform(-0.99, 0.99, R), jnp.float32),
    )


# -- curve intersection ------------------------------------------------------


def test_curve_straight_segment_hits():
    geom = Geometry.build(curves=[dict(
        cp=[(-1, 0, 0), (-0.33, 0, 0), (0.33, 0, 0), (1, 0, 0)],
        width0=0.2, width1=0.2, n_segs=4, mat=0)])
    o = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 0.05, -2.0], [0.0, 0.2, -2.0],
                     [0.5, -0.05, -2.0]], jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape)
    h = geom.intersect(o, d, jnp.full(4, jnp.inf))
    assert np.asarray(h.hit).tolist() == [True, True, False, True]
    assert np.allclose(np.asarray(h.t)[[0, 1, 3]], 2.0, atol=1e-3)
    # u runs along the curve; ray at x=0.5 -> u ~ 0.75
    assert abs(float(h.uv[3, 0]) - 0.75) < 0.05
    # v is across the ribbon: centered ray -> 0.5, off-center shifts
    assert abs(float(h.uv[0, 1]) - 0.5) < 1e-3
    assert abs(float(h.uv[1, 1]) - 0.5) > 0.2
    # tangent along +-x, normal faces the ray
    assert abs(abs(float(h.tangent[0, 0])) - 1.0) < 1e-4
    assert float(h.n[0, 2]) < -0.99
    occ = geom.intersect_p(o, d, jnp.full(4, 10.0))
    assert np.asarray(occ).tolist() == [True, True, False, True]


def test_curve_bezier_arc_follows_control_points():
    """Rays shot at points on the exact Bezier hit the flattened curve."""
    cp = np.asarray([(-1, 0, 0), (-0.5, 0.8, 0), (0.5, 0.8, 0), (1, 0, 0)],
                    np.float64)
    geom = Geometry.build(curves=[dict(cp=cp, width0=0.1, width1=0.1,
                                       n_segs=16, mat=0)])
    u = np.linspace(0.05, 0.95, 12)
    b = ((1 - u)[:, None] ** 3 * cp[0] + 3 * (1 - u)[:, None] ** 2
         * u[:, None] * cp[1] + 3 * (1 - u)[:, None] * u[:, None] ** 2
         * cp[2] + u[:, None] ** 3 * cp[3])
    o = jnp.asarray(np.concatenate([b[:, :2], np.full((12, 1), -2.0)], -1),
                    jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape)
    h = geom.intersect(o, d, jnp.full(12, jnp.inf))
    assert np.asarray(h.hit).all()
    # u parameter approximately recovered
    assert np.abs(np.asarray(h.uv[:, 0]) - u).max() < 0.08


# -- hair BSDF statistics ----------------------------------------------------


def test_hair_white_furnace():
    """Lossless fiber (sigma_a=0): f*|cos| integrates to ~1 over the sphere
    (bxdfs_test.cpp HairWhiteFurnace idiom)."""
    rng = np.random.default_rng(1)
    R = 32768
    lanes = _hair_lanes(R, rng)
    wo = _sphere_dirs(rng, R)
    wi = _sphere_dirs(np.random.default_rng(2), R)
    f = np.asarray(M.hair_f(lanes, wo, wi))
    e = (f.mean(-1) * np.abs(np.asarray(wi[:, 2]))).mean() * 4 * np.pi
    assert 0.90 < e < 1.10, e


def test_hair_sampling_consistency():
    """f*|cos|/pdf == 1-ish for the model's own samples (perfect importance
    sampling of M*N*A up to the A luminance collapse)."""
    rng = np.random.default_rng(3)
    R = 16384
    lanes = _hair_lanes(R, rng, sigma_a=(0.2, 0.4, 0.8))
    wo = _sphere_dirs(rng, R)
    u_lobe = jnp.asarray(rng.uniform(0, 1, R), jnp.float32)
    u2 = jnp.asarray(rng.uniform(0, 1, (R, 2)), jnp.float32)
    wi, f, pdf = M.hair_sample(lanes, wo, u_lobe, u2)
    ok = np.asarray(pdf) > 1e-9
    w = (np.asarray(f).mean(-1) * np.abs(np.asarray(wi[:, 2]))
         / np.maximum(np.asarray(pdf), 1e-12))[ok]
    assert 0.3 < w.mean() < 1.05, w.mean()  # absorption makes w < 1
    assert w.max() < 1.5


def test_hair_pdf_normalized():
    rng = np.random.default_rng(4)
    R = 32768
    lanes = _hair_lanes(R, rng, beta=0.4)
    wo = jnp.broadcast_to(
        jnp.asarray([0.3, 0.5, np.sqrt(1 - 0.09 - 0.25)], jnp.float32),
        (R, 3))
    wi = _sphere_dirs(rng, R)
    pdf = np.asarray(M.hair_pdf(lanes, wo, wi))
    integ = pdf.mean() * 4 * np.pi
    assert 0.9 < integ < 1.1, integ


def test_hair_darker_with_absorption():
    rng = np.random.default_rng(5)
    R = 8192
    wo = _sphere_dirs(rng, R)
    wi = _sphere_dirs(np.random.default_rng(6), R)
    e = {}
    for name, sig in (("white", (0, 0, 0)), ("brown", (0.84, 1.39, 2.74))):
        lanes = _hair_lanes(R, rng, sigma_a=sig)
        f = np.asarray(M.hair_f(lanes, wo, wi))
        e[name] = (f.mean(-1) * np.abs(np.asarray(wi[:, 2]))).mean() * 4 * np.pi
    assert e["brown"] < 0.75 * e["white"], e


def test_sigma_a_from_reflectance_monotone():
    lo = M.hair_sigma_a_from_reflectance((0.8, 0.8, 0.8), 0.3)
    hi = M.hair_sigma_a_from_reflectance((0.1, 0.1, 0.1), 0.3)
    assert np.all(hi > lo)


def test_parser_curve_and_hair():
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string

    txt = """
    Camera "perspective" "float fov" [40]
    Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
    WorldBegin
    Material "hair" "float beta_m" [0.25] "float beta_n" [0.3]
        "rgb sigma_a" [0.84 1.39 2.74]
    Shape "curve" "point3 P" [-1 0 0  -0.5 0.5 0  0.5 0.5 0  1 0 0]
        "float width" [0.05] "string type" "flat"
    LightSource "infinite" "rgb L" [1 1 1]
    """
    setup = build_render_setup(parse_pbrt_string(txt))
    g = setup.scene.geometry
    assert g.n_crv == 8  # one bezier -> 8 segments
    from vspg_pbrt_v4_tpu.models.materials import HAIR

    assert int(setup.scene.materials.mat_type[0]) == HAIR or \
        int(setup.scene.materials.mat_type[-1]) == HAIR
