"""VSPG integrator tests: unbiasedness of VSP-guided distance sampling.

The furnace idiom again: VSP guiding reshapes *where* the scatter-vs-surface
decision happens, so any error in the resampling weights / analytic warp /
r_u_factor algebra breaks energy conservation immediately.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.integrators import vspg
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import GridMedium, Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def _camera(res=24):
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


def test_vspg_homogeneous_furnace():
    """Analytic homogeneous VSP warp keeps the scattering furnace exact."""
    L0 = 0.6
    scene = volpath.make_fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0], g=0.4,
                                       env_L=[L0] * 3)
    img, field, isgb = vspg.render_vspg(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=48,
        cfg=volpath.VolPathConfig(max_depth=24),
        gopt=gvp.GuidingOptions(field_res=8, record_depth=6,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(),
        seed=3, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert bool(isgb.ready)
    assert abs(img.mean() - L0) < 0.035 * L0, img.mean()


def test_vspg_homogeneous_beer_lambert():
    """Pure absorber through the VSPG path (absorption-free formulation):
    transmitted env must stay Beer-Lambert."""
    sigma_a = [0.5, 1.0, 1.5]
    scene = volpath.make_fog_box_scene(sigma_a, [0, 0, 0],
                                       env_L=[1.0, 1.0, 1.0])
    img, field, isgb = vspg.render_vspg(
        scene, _camera(48), RGBFilm.make((48, 48)), spp=160,
        gopt=gvp.GuidingOptions(field_res=8, record_depth=4,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(),
        seed=5, spp_per_pass=8)
    img = np.asarray(img)
    center = img[20:28, 20:28].mean((0, 1))
    expected = np.exp(-np.asarray(sigma_a) * 2.0)
    assert np.allclose(center, expected, rtol=0.08), (center, expected)


def test_vspg_heterogeneous_resampling_furnace():
    """Cloud furnace through the resampling route stays exact."""
    n = 16
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0, 1).astype(np.float32) * 3.0
    L0 = 0.7
    scene = _grid_scene(dens, [0, 0, 0], [2.0, 2.0, 2.0], g=0.3,
                        env_L=[L0] * 3)
    img, field, isgb = vspg.render_vspg(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=48,
        cfg=volpath.VolPathConfig(max_depth=24),
        gopt=gvp.GuidingOptions(field_res=8, record_depth=6,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(),
        seed=7, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert abs(img.mean() - L0) < 0.04 * L0, img.mean()


def test_vspg_matches_unguided_cloud():
    """Cloud + external light: VSPG mean == volpath mean within noise."""
    n = 16
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0, 1).astype(np.float32) * 4.0
    scene = _grid_scene(dens, [0.1] * 3, [2.0] * 3, g=0.2,
                        point=((0.0, 1.8, 0.0), (8.0,) * 3))
    cam = _camera(24)
    film = RGBFilm.make((24, 24))
    ref = np.asarray(volpath.render(scene, cam, film, spp=160, seed=11,
                                    spp_per_pass=8))
    img, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=160,
        gopt=gvp.GuidingOptions(field_res=8, record_depth=6,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(),
        seed=12, spp_per_pass=8)
    img = np.asarray(img)
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.04, (img.mean(), ref.mean())


def test_isgb_estimates_sane():
    """ISGB VSP map: in [0,1] where defined; volume-dominated pixels high."""
    scene = volpath.make_fog_box_scene([0.0] * 3, [3.0] * 3, g=0.0,
                                       env_L=[0.5] * 3)
    img, field, isgb = vspg.render_vspg(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=32,
        gopt=gvp.GuidingOptions(field_res=8, record_depth=4,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(vsp_criterion="contribution"),
        seed=9, spp_per_pass=4)
    assert bool(isgb.ready)
    v = np.asarray(isgb.vsp_est).reshape(24, 24)
    defined = v >= 0
    assert defined.any()
    assert (v[defined] <= 1.0 + 1e-5).all()
    # dense scattering fog fills the frame center: its VSP must be high
    assert v[10:14, 10:14].mean() > 0.5, v[10:14, 10:14].mean()


def test_atrous_no_edge_wraparound():
    """The à-trous filter must use clamp-to-edge shifts: with wrap-around
    (jnp.roll) a hot right border used to bleed into left-edge pixels."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.guiding.isgb import _atrous

    ny = nx = 32
    img = np.zeros((ny, nx, 1), np.float32)
    img[:, -2:, :] = 100.0  # hot right border
    flat = np.zeros((ny, nx, 3), np.float32)
    out = np.asarray(_atrous(jnp.asarray(img), jnp.asarray(flat),
                             jnp.asarray(flat), steps=3))
    # left-edge pixels are >= 8 (2*stride_max) texels from the hot border:
    # any energy there can only have wrapped around
    assert out[:, :4, 0].max() < 1e-4, out[:, :4, 0].max()
    # sanity: the filter did spread the border inward a little
    assert out[:, -5, 0].max() > 1e-3


def test_vspg_nds_heterogeneous_furnace():
    """NDS optical-depth-space sampling keeps the cloud furnace exact: any
    error in the truncated-exp warp / tpScaleFactor / r_u_factor algebra
    (media_sampleTMaj.h:251-491) leaks energy immediately."""
    n = 16
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0, 1).astype(np.float32) * 3.0
    L0 = 0.7
    scene = _grid_scene(dens, [0, 0, 0], [2.0, 2.0, 2.0], g=0.3,
                        env_L=[L0] * 3)
    img, field, isgb = vspg.render_vspg(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=48,
        cfg=volpath.VolPathConfig(max_depth=24),
        gopt=gvp.GuidingOptions(field_res=8, record_depth=6,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(sampling_method="nds"),
        seed=7, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert abs(img.mean() - L0) < 0.04 * L0, img.mean()


def test_vspg_nds_plus_matches_unguided():
    """NDS+ (TrBuffer-biased collision probabilities with r_u compensation,
    guidedvolpathvspgintegrator.cpp:929-938,975-976,1073-1074) stays
    unbiased vs plain volpath on an absorbing+scattering cloud."""
    n = 16
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0, 1).astype(np.float32) * 4.0
    scene = _grid_scene(dens, [0.1] * 3, [2.0] * 3, g=0.2,
                        env_L=[0.6] * 3)
    cam = _camera(24)
    film = RGBFilm.make((24, 24))
    ref = np.asarray(volpath.render(scene, cam, film, spp=128, seed=21,
                                    spp_per_pass=8))
    img, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=128,
        gopt=gvp.GuidingOptions(field_res=8, record_depth=6,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(sampling_method="nds+"),
        seed=22, spp_per_pass=8)
    img = np.asarray(img)
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert np.isfinite(img).all()
    assert rel < 0.04, (img.mean(), ref.mean())
