"""VSPG megakernel (ops/pallas_vspg) vs the XLA wave path.

Validation idiom (SURVEY §4): interpret-mode kernel on CPU must agree
with the jnp estimator within MC noise — same estimator algebra,
independent sample streams. The scattering furnace is the sharp test:
ANY sampling distribution (trained or handcrafted) must integrate back
to the env constant if the VSP/guiding MIS algebra is exact.
"""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.guiding.isgb import ISGB
from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp
from vspg_pbrt_v4_tpu.models.integrators import volpath, vspg
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import GridMedium, Media
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.ops import pallas_vspg as pk
from vspg_pbrt_v4_tpu.utils import transform as tr

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow

RES = 16  # npix = 256 (kernel wants npix % 128 == 0)


def _camera(res=RES):
    c2w = tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=30.0, resolution=(res, res))


def _grid_scene(density, sigma_a, sigma_s, g=0.0, env_L=None, point=None,
                maj_res=8):
    gm = GridMedium.make(density, sigma_a, sigma_s, (-1, -1, -1), (1, 1, 1),
                         g=g, maj_res=maj_res)
    media = Media.make(grids=(gm,))
    lights = Lights.make(
        point_p=None if point is None else [point[0]],
        point_I=None if point is None else [point[1]],
        env_L=env_L, world_radius=100.0)
    geom = Geometry.build(
        boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1), mat=-1, light=-1,
                    med_in=0, med_out=-1)])
    return volpath.Scene(geom, Materials.build([]), media, lights)


def _cloud_density(n=16, scale=3.0):
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0, 1)
    dens *= 0.75 + 0.25 * np.sin(5.1 * X) * np.sin(4.3 * Y + 1.0)
    return np.clip(dens, 0, None).astype(np.float32) * scale


_GOPT = gvp.GuidingOptions(field_res=8, record_depth=6,
                           min_train_weight=16.0)
_CFG = volpath.VolPathConfig(max_depth=24)


def test_supports_grid_scene():
    scene = _grid_scene(_cloud_density(), [0.1] * 3, [2.0] * 3, g=0.3,
                        env_L=[0.5] * 3)
    from vspg_pbrt_v4_tpu.models.guiding.field import GuidingField

    field = GuidingField.make((-1, -1, -1), (1, 1, 1), res=8, n_lobes=8)
    cam, film = _camera(), RGBFilm.make((RES, RES))
    assert pk.supports(scene, cam, film, _CFG, _GOPT, vspg.VSPGOptions(),
                       field)
    # off-class: 24x24 film (npix not a multiple of 128)
    assert not pk.supports(scene, _camera(24), RGBFilm.make((24, 24)),
                           _CFG, _GOPT, vspg.VSPGOptions(), field)


def test_kernel_untrained_matches_volpath():
    """Fresh field + ISGB: every lane takes the unguided delta route, so
    the kernel must match plain volpath on the cloud (per-quadrant)."""
    scene = _grid_scene(_cloud_density(), [0.1] * 3, [2.0] * 3, g=0.3,
                        env_L=[0.15, 0.18, 0.2],
                        point=((0.0, 1.8, 0.0), (8.0,) * 3))
    cam, film = _camera(), RGBFilm.make((RES, RES))
    from vspg_pbrt_v4_tpu.models.guiding.field import GuidingField

    field = GuidingField.make((-1, -1, -1), (1, 1, 1), res=8, n_lobes=8)
    isgb = ISGB.make((RES, RES), "variance")
    ref = np.asarray(volpath.render(scene, cam, film, spp=64, seed=11,
                                    spp_per_pass=8))
    img = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 64, _CFG, _GOPT, vspg.VSPGOptions(), field,
        isgb, seed=5, interpret=True))
    assert np.isfinite(img).all()
    h = RES // 2
    for sy in (slice(0, h), slice(h, RES)):
        for sx in (slice(0, h), slice(h, RES)):
            a = ref[sy, sx].mean()
            b = img[sy, sx].mean()
            assert abs(a - b) < 0.08 * max(a, 0.05), (a, b)


@pytest.mark.mid
def test_kernel_furnace_trained_field():
    """Scattering furnace with a TRAINED field + ready ISGB: the guided
    routes (VSP resampling + vMF direction MIS/RIS + guided RR) must keep
    the furnace exact — this catches any pdf/MIS algebra slip."""
    L0 = 0.7
    scene = _grid_scene(_cloud_density(), [0, 0, 0], [2.0] * 3, g=0.3,
                        env_L=[L0] * 3)
    cam, film = _camera(), RGBFilm.make((RES, RES))
    # train on the XLA path (use_pallas=False keeps this all-XLA)
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=8, cfg=_CFG, gopt=_GOPT,
        vopt=vspg.VSPGOptions(), seed=3, spp_per_pass=4, use_pallas=False)
    assert int(field.iteration) > 0
    img = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 64, _CFG, _GOPT, vspg.VSPGOptions(), field,
        isgb, seed=9, interpret=True))
    assert np.isfinite(img).all()
    assert abs(img.mean() - L0) < 0.05 * L0, img.mean()


@pytest.mark.mid
def test_kernel_trained_matches_xla_frozen():
    """Frozen-field render: kernel vs XLA wave path on the lit cloud."""
    scene = _grid_scene(_cloud_density(), [0.1] * 3, [2.0] * 3, g=0.3,
                        env_L=[0.15, 0.18, 0.2],
                        point=((0.0, 1.8, 0.0), (8.0,) * 3))
    cam, film = _camera(), RGBFilm.make((RES, RES))
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=8, cfg=_CFG, gopt=_GOPT,
        vopt=vspg.VSPGOptions(), seed=3, spp_per_pass=4, use_pallas=False)
    ref, _, _ = vspg.render_vspg(
        scene, cam, film, spp=64, cfg=_CFG, gopt=_GOPT,
        vopt=vspg.VSPGOptions(), seed=21, spp_per_pass=8, field=field,
        isgb=isgb, train=False, use_pallas=False)
    ref = np.asarray(ref)
    img = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 64, _CFG, _GOPT, vspg.VSPGOptions(), field,
        isgb, seed=33, interpret=True))
    a, b = ref.mean(), img.mean()
    assert abs(a - b) < 0.07 * max(a, 0.05), (a, b)


def test_render_vspg_auto_dispatch():
    """render_vspg(use_pallas='auto') trains on XLA then finishes in the
    kernel; result must agree with the all-XLA run."""
    L0 = 0.6
    scene = _grid_scene(_cloud_density(), [0, 0, 0], [1.5] * 3, g=0.2,
                        env_L=[L0] * 3)
    cam, film = _camera(), RGBFilm.make((RES, RES))
    gopt = _GOPT._replace(train_waves=1)
    img, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=24, cfg=_CFG, gopt=gopt,
        vopt=vspg.VSPGOptions(), seed=3, spp_per_pass=4,
        interpret_pallas=True)
    img = np.asarray(img)
    assert int(field.iteration) == 1
    assert np.isfinite(img).all()
    assert abs(img.mean() - L0) < 0.06 * L0, img.mean()


def test_kernel_sharded_matches_single_device():
    """render_vspg_pallas_sharded on an 8-CPU mesh must match the
    single-device kernel BIT-EXACTLY: identical per-pixel sample streams,
    just sharded over film-row blocks via the SMEM pixel base."""
    import jax

    from vspg_pbrt_v4_tpu.parallel import mesh as pmesh
    from vspg_pbrt_v4_tpu.models.guiding.field import GuidingField

    res = 32  # ny=32 shards over 8 devices into 128-pixel blocks
    scene = _grid_scene(_cloud_density(), [0.1] * 3, [2.0] * 3, g=0.3,
                        env_L=[0.2] * 3)
    cam, film = _camera(res), RGBFilm.make((res, res))
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=4, cfg=_CFG, gopt=_GOPT,
        vopt=vspg.VSPGOptions(), seed=3, spp_per_pass=4, use_pallas=False)
    # sub=1 matches the sharded tile decomposition: loop trip counts (and
    # so the per-lane dim streams) are tile-population-dependent, so only
    # identical tiles give identical streams
    single = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 8, _CFG, _GOPT, vspg.VSPGOptions(), field,
        isgb, seed=7, interpret=True, sub=1))
    mesh = pmesh.default_mesh(jax.devices("cpu")[:8])
    sharded = np.asarray(pmesh.render_vspg_pallas_sharded(
        scene, cam, film, 8, _CFG, _GOPT, vspg.VSPGOptions(), field,
        isgb, seed=7, mesh=mesh, interpret=True))
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_kernel_i8_density_furnace():
    """Scattering furnace with the uint8-quad density format forced: the
    quantized field is used consistently in rates AND weights, so the
    furnace stays exact."""
    from vspg_pbrt_v4_tpu.ops import pallas_volpath as pv

    old = pv.I8_THRESHOLD
    pv.I8_THRESHOLD = 0
    try:
        L0 = 0.7
        scene = _grid_scene(_cloud_density(), [0, 0, 0], [2.0] * 3, g=0.3,
                            env_L=[L0] * 3)
        cam, film = _camera(), RGBFilm.make((RES, RES))
        _, field, isgb = vspg.render_vspg(
            scene, cam, film, spp=8, cfg=_CFG, gopt=_GOPT,
            vopt=vspg.VSPGOptions(), seed=3, spp_per_pass=4,
            use_pallas=False)
        img = np.asarray(pk.render_vspg_pallas(
            scene, cam, film, 64, _CFG, _GOPT, vspg.VSPGOptions(), field,
            isgb, seed=9, interpret=True))
        assert np.isfinite(img).all()
        assert abs(img.mean() - L0) < 0.05 * L0, img.mean()
    finally:
        pv.I8_THRESHOLD = old


def test_kernel_tiled_lane_mapping_furnace():
    """res 32 film: the kernel runs the tiled 32x32 lane mapping (ISGB
    rows pre-permuted, output un-permuted) — the furnace and the
    pixel-estimate plumbing must survive the permutation exactly."""
    L0 = 0.7
    scene = _grid_scene(_cloud_density(), [0, 0, 0], [2.0] * 3, g=0.3,
                        env_L=[L0] * 3)
    res = 32
    cam, film = _camera(res), RGBFilm.make((res, res))
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=8, cfg=_CFG, gopt=_GOPT,
        vopt=vspg.VSPGOptions(), seed=3, spp_per_pass=4, use_pallas=False)
    img = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 48, _CFG, _GOPT, vspg.VSPGOptions(), field,
        isgb, seed=9, interpret=True))
    assert np.isfinite(img).all()
    assert abs(img.mean() - L0) < 0.05 * L0, img.mean()


def test_kernel_stoch_trilerp_furnace_trained():
    """Stochastic one-corner density filtering through ALL the guided
    routes (resampling walk, delta walk, ratio-tracked shadows) with a
    trained field: the furnace must stay exact — each walk factor is
    linear in the looked-up density, so expectations factorize into the
    exact-trilerp estimator."""
    old = pk.STOCH_TRILERP_MAX_EXACT
    pk.STOCH_TRILERP_MAX_EXACT = 0
    pk._KERNEL_CACHE.clear()
    try:
        L0 = 0.7
        scene = _grid_scene(_cloud_density(), [0, 0, 0], [2.0] * 3, g=0.3,
                            env_L=[L0] * 3)
        cam, film = _camera(), RGBFilm.make((RES, RES))
        _, field, isgb = vspg.render_vspg(
            scene, cam, film, spp=8, cfg=_CFG, gopt=_GOPT,
            vopt=vspg.VSPGOptions(), seed=3, spp_per_pass=4,
            use_pallas=False)
        img = np.asarray(pk.render_vspg_pallas(
            scene, cam, film, 64, _CFG, _GOPT, vspg.VSPGOptions(), field,
            isgb, seed=9, interpret=True))
        assert np.isfinite(img).all()
        assert abs(img.mean() - L0) < 0.05 * L0, img.mean()
    finally:
        pk.STOCH_TRILERP_MAX_EXACT = old
        pk._KERNEL_CACHE.clear()


@pytest.mark.mid
def test_kernel_mxu_gather_furnace_trained():
    """Force the MXU one-hot density gather (production path for 4096+
    voxel grids) through all the guided routes with a trained field: the
    furnace must stay exact — the matmul gather returns the identical
    bf16-truncated density the sweep decodes."""
    from vspg_pbrt_v4_tpu.ops import pallas_volpath as _pv

    old_mx, old_st = _pv.MXU_MIN_VOX, pk.STOCH_TRILERP_MAX_EXACT
    _pv.MXU_MIN_VOX = 0
    pk.STOCH_TRILERP_MAX_EXACT = 0
    pk._KERNEL_CACHE.clear()
    try:
        L0 = 0.7
        scene = _grid_scene(_cloud_density(), [0, 0, 0], [2.0] * 3, g=0.3,
                            env_L=[L0] * 3)
        cam, film = _camera(), RGBFilm.make((RES, RES))
        c = _pv.extract_constants(scene, cam, film, _CFG)
        assert c is not None and c["dens_pack"] == "mxu"
        _, field, isgb = vspg.render_vspg(
            scene, cam, film, spp=8, cfg=_CFG, gopt=_GOPT,
            vopt=vspg.VSPGOptions(), seed=3, spp_per_pass=4,
            use_pallas=False)
        img = np.asarray(pk.render_vspg_pallas(
            scene, cam, film, 64, _CFG, _GOPT, vspg.VSPGOptions(), field,
            isgb, seed=9, interpret=True))
        assert np.isfinite(img).all()
        assert abs(img.mean() - L0) < 0.05 * L0, img.mean()
    finally:
        _pv.MXU_MIN_VOX = old_mx
        pk.STOCH_TRILERP_MAX_EXACT = old_st
        pk._KERNEL_CACHE.clear()


def test_record_kernel_matches_plain_and_trains():
    """The TRAINING variant (record=True) must produce the IDENTICAL
    image to the plain kernel at the same seed (records are pure side
    outputs), and its SegmentRecord must train the field through the
    standard propagate/train_step pipeline (guiding.h:682-832 analog)."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.guiding import field as gfield
    from vspg_pbrt_v4_tpu.models.guiding import isgb as gisgb
    from vspg_pbrt_v4_tpu.models.guiding import recording as grec
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gv

    scene = _grid_scene(_cloud_density(), [0.2] * 3, [2.8] * 3, g=0.5,
                        env_L=[0.1] * 3, point=((0, 0.3, 2.5), (40.,) * 3))
    cam, film = _camera(), RGBFilm.make((RES, RES))
    vopt = vspg.VSPGOptions(vsp_criterion="variance")
    field = gfield.GuidingField.make((-1.1,) * 3, (1.1,) * 3, res=8,
                                     n_lobes=4)
    isgb = ISGB.make((RES, RES), "variance", "atrous")
    # wave 1 (untrained) + wave 2 (guided): records sane, image identical
    for w in range(2):
        (img_r, segrec, f_alb, f_nrm, f_vol, L_raw,
         _pk_tables) = pk.train_wave_pallas(
            scene, cam, film, _CFG, _GOPT, vopt, field, isgb,
            seed=jnp.uint32(w * 7919 + 1), interpret=True)
        img_p = pk.render_vspg_pallas(scene, cam, film, 1, _CFG, _GOPT,
                                      vopt, field, isgb,
                                      seed=jnp.uint32(w * 7919 + 1),
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_p),
                                   rtol=1e-6)
        pos, valid = np.asarray(segrec.pos), np.asarray(segrec.valid)
        assert valid.any()
        assert np.all(np.abs(pos[valid]) <= 1.001)  # vertices in the box
        assert np.all(np.asarray(segrec.pdf)[valid] > 0)
        assert np.allclose(
            np.linalg.norm(np.asarray(segrec.wi)[valid], axis=-1), 1.0,
            atol=2e-3)
        pid = jnp.arange(film.npix, dtype=jnp.int32)
        isgb = gisgb.isgb_add_samples(isgb, pid, L_raw, f_alb, f_nrm,
                                      f_vol, pid >= 0, half=w % 2)
        batch = grec.propagate(segrec)
        assert bool(jnp.isfinite(jnp.where(batch.valid, batch.weight,
                                           0.0)).all())
        field = gv.train_step(field, batch)
        isgb = gisgb.isgb_update(isgb)
    assert int(field.iteration) == 2
    assert float(np.asarray(field.volume.vsp_n).sum()) > 0


def _machines_scene(env_L=(0.12, 0.14, 0.16), point=((0.0, 0.4, 2.2),
                                                     (20.0,) * 3)):
    """Tiny transparent-machines proxy: glass + metal + diffuse cubes
    inside the test cloud (the teaser scene class,
    guidedvolpathvspgintegrator.cpp:262-630)."""
    from vspg_pbrt_v4_tpu.models import materials as M

    def cube(c, h, mat):
        cx, cy, cz = c
        v = {}
        for i in range(8):
            v[i] = (cx + (h if i & 1 else -h), cy + (h if i & 2 else -h),
                    cz + (h if i & 4 else -h))
        faces = [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5), (0, 4, 5),
                 (0, 5, 1), (2, 3, 7), (2, 7, 6), (0, 2, 6), (0, 6, 4),
                 (1, 5, 7), (1, 7, 3)]
        return [dict(p0=v[a], p1=v[b], p2=v[cc], mat=mat, light=-1,
                     med_in=-1, med_out=0) for (a, b, cc) in faces]

    mats = M.Materials.build([
        dict(type=M.DIFFUSE, albedo=(0.65, 0.3, 0.2)),
        dict(type=M.DIELECTRIC, eta=1.5, roughness=0.0),
        dict(type=M.CONDUCTOR, albedo=(0.9, 0.75, 0.5), roughness=0.0),
    ])
    tris = (cube((0.0, -0.2, 0.0), 0.3, 1) + cube((-0.4, 0.2, 0.1), 0.15, 2)
            + cube((0.4, 0.3, -0.2), 0.15, 0))
    gm = GridMedium.make(_cloud_density(), [0.1] * 3, [1.5] * 3,
                         (-1, -1, -1), (1, 1, 1), g=0.3, maj_res=8)
    geom = Geometry.build(
        triangles=tris,
        boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1), mat=-1, light=-1,
                    med_in=0, med_out=-1)])
    lights = Lights.make(point_p=[point[0]], point_I=[point[1]],
                         env_L=list(env_L), world_radius=100.0)
    return volpath.Scene(geom, mats, Media.make(grids=(gm,)), lights)


@pytest.mark.mid
def test_kernel_teaser_triangles_matches_xla():
    """VSPG megakernel on the teaser scene class (triangles in the
    medium, guided-BSDF surface sampling): the trained-frozen kernel and
    XLA renders are independent unbiased estimators of the same scene —
    per-half means must agree within MC noise. The paper's flagship
    configuration (VSPG on the transparent machines,
    guidedvolpathvspgintegrator.cpp:262-630) on the fast path."""
    scene = _machines_scene()
    cam, film = _camera(), RGBFilm.make((RES, RES))
    cfg = volpath.VolPathConfig(max_depth=16, max_events=64)
    gopt = gvp.GuidingOptions(mode="ris", field_res=4, record_depth=6,
                              min_train_weight=8.0)
    vopt = vspg.VSPGOptions(vsp_criterion="variance")
    from vspg_pbrt_v4_tpu.models.guiding.field import GuidingField

    assert GuidingField is not None
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=6, cfg=cfg, gopt=gopt, vopt=vopt, seed=0,
        spp_per_pass=1, use_pallas=False, train_pallas=False)
    assert pk.supports(scene, cam, film, cfg, gopt, vopt, field)
    img_k = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 96, cfg, gopt, vopt, field, isgb, seed=3,
        interpret=True))
    assert np.isfinite(img_k).all()
    ref = np.asarray(volpath.render(scene, cam, film, spp=192, seed=11,
                                    spp_per_pass=8, cfg=cfg))
    h = RES // 2
    for sy in (slice(0, h), slice(h, RES)):
        a = ref[sy].mean()
        b = img_k[sy].mean()
        assert abs(a - b) < 0.10 * max(a, 0.05), (a, b)


@pytest.mark.mid
def test_kernel_teaser_mis_surface_guiding_matches_xla():
    """mode='mis' + surface guiding on the teaser class: guided vMF
    draws land below the hemisphere with nonzero probability, which
    used to kill the lane BEFORE its deferred surface NEE was armed
    (dropping direct lighting, biasing dark — ADVICE r4). The TINY_G
    continuation fix must keep the kernel an unbiased estimator: means
    agree with the XLA volpath reference within MC noise."""
    scene = _machines_scene()
    cam, film = _camera(), RGBFilm.make((RES, RES))
    cfg = volpath.VolPathConfig(max_depth=16, max_events=64)
    gopt = gvp.GuidingOptions(mode="mis", field_res=4, record_depth=6,
                              min_train_weight=8.0)
    vopt = vspg.VSPGOptions(vsp_criterion="variance")
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=6, cfg=cfg, gopt=gopt, vopt=vopt, seed=0,
        spp_per_pass=1, use_pallas=False, train_pallas=False)
    assert pk.supports(scene, cam, film, cfg, gopt, vopt, field)
    img_k = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 96, cfg, gopt, vopt, field, isgb, seed=5,
        interpret=True))
    assert np.isfinite(img_k).all()
    ref = np.asarray(volpath.render(scene, cam, film, spp=192, seed=13,
                                    spp_per_pass=8, cfg=cfg))
    h = RES // 2
    for sy in (slice(0, h), slice(h, RES)):
        a = ref[sy].mean()
        b = img_k[sy].mean()
        assert abs(a - b) < 0.10 * max(a, 0.05), (a, b)


def _rough_machines_scene():
    """_machines_scene with Trowbridge-Reitz rough conductor and
    CookTorrance cubes (the r4-verdict gap: the VSPG kernel refused the
    rough teaser variants the volpath kernel serves)."""
    from vspg_pbrt_v4_tpu.models import materials as M

    base = _machines_scene()
    mats = M.Materials.build([
        dict(type=M.COOK_TORRANCE, albedo=(0.65, 0.3, 0.2), eta=1.5,
             roughness=0.3),
        dict(type=M.DIELECTRIC, eta=1.5, roughness=0.0),
        dict(type=M.CONDUCTOR, albedo=(0.9, 0.75, 0.5), roughness=0.25),
    ])
    return volpath.Scene(base.geometry, mats, base.media, base.lights)


@pytest.mark.mid
def test_kernel_teaser_rough_surfaces_matches_xla():
    """Rough conductor + CookTorrance in the VSPG megakernel (round 5:
    supports() no longer routes them to the XLA wave): TR VNDF
    continuation + per-channel deferred glossy NEE folds must keep the
    kernel an unbiased estimator — means agree with the XLA volpath
    reference within MC noise."""
    scene = _rough_machines_scene()
    cam, film = _camera(), RGBFilm.make((RES, RES))
    cfg = volpath.VolPathConfig(max_depth=16, max_events=64)
    gopt = gvp.GuidingOptions(mode="mis", field_res=4, record_depth=6,
                              min_train_weight=8.0)
    vopt = vspg.VSPGOptions(vsp_criterion="variance")
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=6, cfg=cfg, gopt=gopt, vopt=vopt, seed=0,
        spp_per_pass=1, use_pallas=False, train_pallas=False)
    assert pk.supports(scene, cam, film, cfg, gopt, vopt, field)
    img_k = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 96, cfg, gopt, vopt, field, isgb, seed=5,
        interpret=True))
    assert np.isfinite(img_k).all()
    ref = np.asarray(volpath.render(scene, cam, film, spp=192, seed=13,
                                    spp_per_pass=8, cfg=cfg))
    h = RES // 2
    for sy in (slice(0, h), slice(h, RES)):
        a = ref[sy].mean()
        b = img_k[sy].mean()
        assert abs(a - b) < 0.10 * max(a, 0.05), (a, b)


def test_record_kernel_triangles_trains():
    """Training records on the teaser scene class: surface vertices ride
    with is_volume=False (they train the surface half, guiding.h:786),
    first-event albedo comes from the material at surface first hits,
    and the training image equals the plain kernel image at the seed."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.guiding import field as gfield
    from vspg_pbrt_v4_tpu.models.guiding import recording as grec
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gv

    scene = _machines_scene()
    cam, film = _camera(), RGBFilm.make((RES, RES))
    cfg = volpath.VolPathConfig(max_depth=16, max_events=64)
    vopt = vspg.VSPGOptions(vsp_criterion="variance")
    field = gfield.GuidingField.make((-1.1,) * 3, (1.1,) * 3, res=4,
                                     n_lobes=4)
    isgb = ISGB.make((RES, RES), "variance", "atrous")
    (img_r, segrec, f_alb, f_nrm, f_vol, L_raw,
     _tabs) = pk.train_wave_pallas(
        scene, cam, film, cfg, _GOPT, vopt, field, isgb, seed=7,
        interpret=True)
    img_p = pk.render_vspg_pallas(scene, cam, film, 1, cfg, _GOPT, vopt,
                                  field, isgb, seed=7, interpret=True)
    np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_p),
                               rtol=1e-6)
    valid = np.asarray(segrec.valid)
    is_vol = np.asarray(segrec.is_volume)
    assert valid.any()
    assert (valid & ~is_vol).any()  # some diffuse surface vertices
    assert (valid & is_vol).any()
    # scatter weights at surface vertices carry the albedo tint
    sw = np.asarray(segrec.scatter_w)
    srf = valid & ~is_vol
    assert not np.allclose(sw[srf][:, 0], sw[srf][:, 1])
    batch = grec.propagate(segrec)
    assert bool(jnp.isfinite(jnp.where(batch.valid, batch.weight,
                                       0.0)).all())
    field2 = gv.train_step(field, batch)
    assert float(np.asarray(field2.surface.stats_w).sum()) >= 0.0


@pytest.mark.mid
def test_kernel_nds_furnace_trained():
    """sampling_method='nds' through the megakernel (round-5: the ODS
    walk + exact majorant-OD prepass run in-kernel,
    media_sampleTMaj.h:250-491): the scattering furnace must stay exact
    with a trained field — this sharply checks the truncated-exponential
    pdf bookkeeping (tp), the one-sample MIS factor r_u_factor and the
    defensive plain-exp mixture."""
    L0 = 0.7
    scene = _grid_scene(_cloud_density(), [0, 0, 0], [2.0] * 3, g=0.3,
                        env_L=[L0] * 3)
    cam, film = _camera(), RGBFilm.make((RES, RES))
    vopt = vspg.VSPGOptions(sampling_method="nds")
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=8, cfg=_CFG, gopt=_GOPT, vopt=vopt, seed=3,
        spp_per_pass=4, use_pallas=False)
    assert int(field.iteration) > 0
    assert pk.supports(scene, cam, film, _CFG, _GOPT, vopt, field)
    img = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 64, _CFG, _GOPT, vopt, field, isgb, seed=9,
        interpret=True))
    assert np.isfinite(img).all()
    assert abs(img.mean() - L0) < 0.05 * L0, img.mean()


@pytest.mark.mid
def test_kernel_nds_plus_matches_xla():
    """NDS+ (TrBuffer-biased primary collisions) kernel vs the XLA wave
    path on the lit cloud: independent unbiased estimators of the same
    scene — means agree within MC noise."""
    scene = _grid_scene(_cloud_density(), [0.1] * 3, [2.0] * 3, g=0.3,
                        env_L=[0.15, 0.18, 0.2],
                        point=((0.0, 1.8, 0.0), (8.0,) * 3))
    cam, film = _camera(), RGBFilm.make((RES, RES))
    vopt = vspg.VSPGOptions(sampling_method="nds+")
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=8, cfg=_CFG, gopt=_GOPT, vopt=vopt, seed=3,
        spp_per_pass=4, use_pallas=False)
    import jax.numpy as jnp

    tr = jnp.full((film.npix, 3), 0.6)  # nontrivial gamma bias
    img = np.asarray(pk.render_vspg_pallas(
        scene, cam, film, 64, _CFG, _GOPT, vopt, field, isgb, seed=33,
        interpret=True, tr_buffer=tr))
    assert np.isfinite(img).all()
    ref, _, _ = vspg.render_vspg(
        scene, cam, film, spp=64, cfg=_CFG, gopt=_GOPT, vopt=vopt,
        seed=21, spp_per_pass=8, field=field, isgb=isgb, train=False,
        use_pallas=False)
    ref = np.asarray(ref)
    a, b = ref.mean(), img.mean()
    assert abs(a - b) < 0.07 * max(a, 0.05), (a, b)
