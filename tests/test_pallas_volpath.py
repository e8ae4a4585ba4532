"""Megakernel volpath (ops/pallas_volpath) vs the jnp wavefront path.

Cross-backend idiom (SURVEY §4): the Pallas kernel in interpret mode on CPU
must agree with the jnp volpath estimator within MC noise — same estimator,
independent sample streams.
"""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.ops import pallas_volpath as pv
from vspg_pbrt_v4_tpu.utils import transform as tr

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def _setup(res=64, sigma_a=(0.05, 0.05, 0.05), sigma_s=(0.5, 0.6, 0.7),
           g=0.3, env=(0.1, 0.12, 0.15), point=((0.0, 0.8, 0.0),
                                                (5.0, 5.0, 5.0))):
    scene = volpath.make_fog_box_scene(list(sigma_a), list(sigma_s), g=g,
                                       env_L=None if env is None else list(env),
                                       point=point)
    camera = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (res, res))
    film = RGBFilm.make((res, res))
    cfg = volpath.VolPathConfig(max_depth=32, max_events=128)
    return scene, camera, film, cfg


def test_supports_fogbox():
    scene, camera, film, cfg = _setup()
    assert pv.supports(scene, camera, film, cfg)


def test_rejects_spectral_and_geometry():
    scene, camera, film, cfg = _setup()
    cfg_sp = cfg._replace(spectral=True)
    assert not pv.supports(scene, camera, film, cfg_sp)
    # a scene with triangles is out of class
    from vspg_pbrt_v4_tpu.models.shapes import Geometry

    tri_geom = Geometry.build(triangles=[dict(
        p0=(0, 0, 0), p1=(1, 0, 0), p2=(0, 1, 0), mat=0, light=-1,
        med_in=-1, med_out=-1)])
    scene2 = scene._replace(geometry=tri_geom)
    assert not pv.supports(scene2, camera, film, cfg)


def test_megakernel_matches_volpath_fog_external_light():
    """Point light OUTSIDE the fog (bounded 1/r^2 kernel — an embedded
    light's in-scatter estimator is heavy-tailed and quadrant means vary
    several percent between seeds): megakernel and jnp volpath must agree
    tightly per quadrant."""
    scene, camera, film, cfg = _setup(
        res=64, point=((0.0, 1.8, 0.0), (8.0, 8.0, 8.0)))
    ref = np.asarray(volpath.render(scene, camera, film, spp=48, seed=3,
                                    spp_per_pass=8))
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48, cfg,
                                            seed=7, interpret=True))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.02, (img.mean(), ref.mean())
    # per-quadrant agreement, not just global mean
    for sl in (np.s_[:32, :32], np.s_[32:, 32:], np.s_[:32, 32:]):
        a, b = ref[sl].mean(), img[sl].mean()
        assert abs(b - a) / a < 0.05, (sl, a, b)


def test_megakernel_matches_volpath_bench_scene():
    """The exact bench config (embedded point light): global mean within the
    heavy-tailed MC noise band."""
    scene, camera, film, cfg = _setup(res=64)
    ref = np.asarray(volpath.render(scene, camera, film, spp=48, seed=3,
                                    spp_per_pass=8))
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48, cfg,
                                            seed=7, interpret=True))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.04, (img.mean(), ref.mean())


@pytest.mark.mid
def test_megakernel_scatter_furnace():
    """Pure-scattering fog in a uniform env furnace: every pixel must be
    exactly the env radiance (energy conservation of the closed-form
    homogeneous transport + env MIS)."""
    scene, camera, film, cfg = _setup(
        sigma_a=(0.0, 0.0, 0.0), sigma_s=(1.0, 1.0, 1.0), g=0.0,
        env=(0.7, 0.7, 0.7), point=None)
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 64, cfg,
                                            seed=1, interpret=True))
    assert np.isfinite(img).all()
    assert abs(img.mean() - 0.7) / 0.7 < 0.01, img.mean()
    # per-pixel MC noise at 64 spp: bound the tail loosely + the std tightly
    assert np.abs(img - 0.7).max() / 0.7 < 0.3, np.abs(img - 0.7).max()
    assert img.std() < 0.06, img.std()


@pytest.mark.skipif(
    not any(d.platform == "tpu" for d in __import__("jax").devices())
    if not __import__("os").environ.get("JAX_PLATFORMS", "").startswith("cpu")
    else True,
    reason="needs a real TPU (axon) device")
def test_megakernel_compiles_on_tpu():
    scene, camera, film, cfg = _setup(res=64)
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 8, cfg,
                                            seed=2))
    assert np.isfinite(img).all()
    assert img.mean() > 0


def _cloud_setup(res=32, sa=(0.1, 0.1, 0.1), ss=(1.5, 1.8, 2.1), g=0.3,
                 env=(0.3, 0.35, 0.4), point=((0.0, 1.8, 0.0), (6.0,) * 3),
                 n=16, maj_res=8):
    from vspg_pbrt_v4_tpu.models.lights import Lights
    from vspg_pbrt_v4_tpu.models.materials import Materials
    from vspg_pbrt_v4_tpu.models.media import GridMedium, Media
    from vspg_pbrt_v4_tpu.models.shapes import Geometry

    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0,
                   1).astype(np.float32) * 3.0
    gm = GridMedium.make(dens, list(sa), list(ss), (-1, -1, -1), (1, 1, 1),
                         g=g, maj_res=maj_res)
    media = Media.make(grids=(gm,))
    lights = Lights.make(
        point_p=None if point is None else [point[0]],
        point_I=None if point is None else [point[1]],
        env_L=None if env is None else list(env), world_radius=100.0)
    geom = Geometry.build(
        boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1), mat=-1, light=-1,
                    med_in=0, med_out=-1)])
    scene = volpath.Scene(geom, Materials.build([]), media, lights)
    camera = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (res, res))
    film = RGBFilm.make((res, res))
    cfg = volpath.VolPathConfig(max_depth=16, max_events=64)
    return scene, camera, film, cfg


def test_grid_megakernel_supported():
    scene, camera, film, cfg = _cloud_setup()
    c = pv.extract_constants(scene, camera, film, cfg)
    assert c is not None and c["kind"] == "grid"


def test_grid_megakernel_scatter_furnace():
    """Scattering-only cloud in a uniform env furnace: image == env
    everywhere (DDA majorant walk + delta-tracking weights must conserve
    energy exactly in expectation)."""
    scene, camera, film, cfg = _cloud_setup(
        sa=(0.0, 0.0, 0.0), ss=(2.0, 2.0, 2.0), g=0.0,
        env=(0.6, 0.6, 0.6), point=None)
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48, cfg,
                                            seed=1, interpret=True))
    assert np.isfinite(img).all()
    # ~1.2% of the furnace energy sits in paths deeper than max_depth=16
    # (measured: mean 0.593 at depth 16, 0.595 at depth 64 across seeds —
    # the reference truncates identically, integrators.cpp:1060), so the
    # unbiasedness budget is 2.5%: deep-truncation deficit + MC noise,
    # with real energy-accounting bugs still well outside it.
    assert abs(img.mean() - 0.6) / 0.6 < 0.025, img.mean()
    assert img.std() < 0.08, img.std()


def test_grid_megakernel_matches_volpath():
    """Cloud + external point + env: megakernel and the jnp DDA loop are
    the same estimator — means agree within MC noise."""
    scene, camera, film, cfg = _cloud_setup()
    ref = np.asarray(volpath.render(scene, camera, film, spp=48, seed=3,
                                    spp_per_pass=8))
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48, cfg,
                                            seed=7, interpret=True))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.03, (img.mean(), ref.mean())
    for sl in (np.s_[:16, :16], np.s_[16:, 16:], np.s_[:16, 16:]):
        a, b = ref[sl].mean(), img[sl].mean()
        assert abs(b - a) / a < 0.06, (sl, a, b)


def test_i8_quad_pack_roundtrip():
    """pack_i8_quads decodes to d_q with |d - d_q| <= scale/510 (density
    rounds to NEAREST since the round-5 bias fix — truncation rendered a
    thinner medium, +2-3% on point-lit scenes) and d_q <= the bf16-up
    supervoxel majorant, so null coefficients stay >= 0."""
    rng = np.random.default_rng(0)
    n, m = 16, 4
    d = (rng.random((n, n, n), dtype=np.float32) ** 2) * 5.0
    # majorant with halo like GridMedium.make
    from vspg_pbrt_v4_tpu.models.media import GridMedium

    gm = GridMedium.make(d, [0.1] * 3, [1.0] * 3, (-1,) * 3, (1,) * 3,
                         maj_res=m)
    maj = np.asarray(gm.majorant)
    packed = pv.pack_i8_quads(d, maj, (n, n, n), (m, m, m))
    words = packed.reshape(-1).view(np.uint32)
    q = np.stack([(words >> (8 * k)) & 255 for k in range(4)],
                 -1).reshape(-1)[: n * n * n].reshape(n, n, n)
    mu = maj.view(np.uint32).astype(np.uint64)
    m_up = ((np.minimum(mu + 0xFFFF, 0xFFFF_FFFF) >> 16) << 16) \
        .astype(np.uint32).view(np.float32)
    r = n // m
    scale = np.repeat(np.repeat(np.repeat(m_up, r, 0), r, 1), r, 2)
    d_q = q.astype(np.float32) * scale / 255.0
    assert (d_q <= scale + 1e-6).all()  # never above the walk majorant
    assert (np.abs(d - d_q) <= scale / 510.0 + 1e-5).all()


def test_grid_megakernel_stoch_trilerp_furnace():
    """Force stochastic one-corner density filtering: the scattering
    furnace must stay exact — E[corner] is the trilerp value and every
    walk factor is linear in the looked-up density, so the product
    expectation factorizes into the exact-trilerp estimator."""
    old = pv.STOCH_TRILERP_MAX_EXACT
    pv.STOCH_TRILERP_MAX_EXACT = 0
    pv._KERNEL_CACHE.clear()
    try:
        scene, camera, film, cfg = _cloud_setup(
            sa=(0.0, 0.0, 0.0), ss=(2.0, 2.0, 2.0), g=0.0,
            env=(0.6, 0.6, 0.6), point=None)
        img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48,
                                                cfg, seed=1,
                                                interpret=True))
        assert np.isfinite(img).all()
        assert abs(img.mean() - 0.6) / 0.6 < 0.02, img.mean()
    finally:
        pv.STOCH_TRILERP_MAX_EXACT = old
        pv._KERNEL_CACHE.clear()


def test_grid_megakernel_stoch_matches_volpath():
    """Stochastic filtering vs the exact-trilerp jnp loop on the lit
    cloud: means agree within MC noise (slightly wider tolerance — the
    corner sampling adds filtering variance)."""
    old = pv.STOCH_TRILERP_MAX_EXACT
    pv.STOCH_TRILERP_MAX_EXACT = 0
    pv._KERNEL_CACHE.clear()
    try:
        scene, camera, film, cfg = _cloud_setup()
        ref = np.asarray(volpath.render(scene, camera, film, spp=48,
                                        seed=3, spp_per_pass=8))
        img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48,
                                                cfg, seed=7,
                                                interpret=True))
        assert np.isfinite(img).all()
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.04, (img.mean(), ref.mean())
    finally:
        pv.STOCH_TRILERP_MAX_EXACT = old
        pv._KERNEL_CACHE.clear()


def test_grid_megakernel_i8_stoch_furnace():
    """uint8-quad density AND stochastic one-corner filtering together
    (the production combination for 32^3+ grids): furnace stays exact —
    the quantized corner value is used consistently in rates and
    weights, and its supervoxel scale still bounds it."""
    old_i8, old_st = pv.I8_THRESHOLD, pv.STOCH_TRILERP_MAX_EXACT
    pv.I8_THRESHOLD = 0
    pv.STOCH_TRILERP_MAX_EXACT = 0
    pv._KERNEL_CACHE.clear()
    try:
        scene, camera, film, cfg = _cloud_setup(
            sa=(0.0, 0.0, 0.0), ss=(2.0, 2.0, 2.0), g=0.0,
            env=(0.6, 0.6, 0.6), point=None)
        c = pv.extract_constants(scene, camera, film, cfg)
        assert c is not None and c["dens_pack"] == "i8"
        img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48,
                                                cfg, seed=2,
                                                interpret=True))
        assert np.isfinite(img).all()
        assert abs(img.mean() - 0.6) / 0.6 < 0.02, img.mean()
    finally:
        pv.I8_THRESHOLD, pv.STOCH_TRILERP_MAX_EXACT = old_i8, old_st
        pv._KERNEL_CACHE.clear()


def test_grid_megakernel_i8_matches_volpath():
    """Force the uint8-quad density path on the small test cloud: the
    quantized-field estimator agrees with the jnp DDA loop within MC
    noise (the <=0.4%-of-local-max rounding is far below MC tolerance)."""
    old = pv.I8_THRESHOLD
    pv.I8_THRESHOLD = 0
    try:
        scene, camera, film, cfg = _cloud_setup()
        c = pv.extract_constants(scene, camera, film, cfg)
        assert c is not None and c["dens_pack"] == "i8"
        ref = np.asarray(volpath.render(scene, camera, film, spp=48, seed=3,
                                        spp_per_pass=8))
        img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48,
                                                cfg, seed=7,
                                                interpret=True))
        assert np.isfinite(img).all()
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.03, (img.mean(), ref.mean())
    finally:
        pv.I8_THRESHOLD = old


@pytest.mark.mid
def test_grid_megakernel_mxu_stoch_furnace():
    """Force the MXU one-hot gather (production path for 4096+ voxel
    grids) together with stochastic one-corner filtering: the furnace
    must stay exact — the matmul gather returns the identical bf16
    truncated density the sweep path decodes, used consistently in rates
    and weights."""
    old_mx, old_st = pv.MXU_MIN_VOX, pv.STOCH_TRILERP_MAX_EXACT
    pv.MXU_MIN_VOX = 0
    pv.STOCH_TRILERP_MAX_EXACT = 0
    pv._KERNEL_CACHE.clear()
    try:
        scene, camera, film, cfg = _cloud_setup(
            sa=(0.0, 0.0, 0.0), ss=(2.0, 2.0, 2.0), g=0.0,
            env=(0.6, 0.6, 0.6), point=None)
        c = pv.extract_constants(scene, camera, film, cfg)
        assert c is not None and c["dens_pack"] == "mxu"
        img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48,
                                                cfg, seed=2,
                                                interpret=True))
        assert np.isfinite(img).all()
        assert abs(img.mean() - 0.6) / 0.6 < 0.02, img.mean()
    finally:
        pv.MXU_MIN_VOX, pv.STOCH_TRILERP_MAX_EXACT = old_mx, old_st
        pv._KERNEL_CACHE.clear()


@pytest.mark.mid
def test_grid_megakernel_mxu_matches_volpath():
    """MXU-gather path on the lit test cloud vs the jnp DDA loop: means
    agree within MC noise."""
    old_mx, old_st = pv.MXU_MIN_VOX, pv.STOCH_TRILERP_MAX_EXACT
    pv.MXU_MIN_VOX = 0
    pv.STOCH_TRILERP_MAX_EXACT = 0
    pv._KERNEL_CACHE.clear()
    try:
        scene, camera, film, cfg = _cloud_setup()
        c = pv.extract_constants(scene, camera, film, cfg)
        assert c is not None and c["dens_pack"] == "mxu"
        ref = np.asarray(volpath.render(scene, camera, film, spp=48,
                                        seed=3, spp_per_pass=8))
        img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48,
                                                cfg, seed=7,
                                                interpret=True))
        assert np.isfinite(img).all()
        rel = abs(img.mean() - ref.mean()) / ref.mean()
        assert rel < 0.04, (img.mean(), ref.mean())
    finally:
        pv.MXU_MIN_VOX, pv.STOCH_TRILERP_MAX_EXACT = old_mx, old_st
        pv._KERNEL_CACHE.clear()
