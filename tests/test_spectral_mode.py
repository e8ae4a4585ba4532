"""N=4 hero-wavelength spectral rendering mode.

The reference's spectral path (util/spectrum.h SampledWavelengths:300-391,
SampleVisibleWavelengths:166-178) carries 4 wavelength samples per path with
rescaled-pdf MIS algebra; RGB scene data is uplifted to smooth spectra and
the film integrates against the CIE sensor (film.h PixelSensor). These tests
check the analytic furnaces still hold with `VolPathConfig(spectral=True)`
and that gray scenes round-trip the RGB-mode answer (equal-energy white
balance, utils/spectrum.spectral_to_sensor_rgb).
"""

import numpy as np

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.utils import transform as tr
import pytest

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow

CFG = volpath.VolPathConfig(spectral=True)


def _camera(res=32):
    c2w = tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=30.0, resolution=(res, res))


def test_spectral_env_passthrough():
    """Vacuum + uniform env: the uplifted env spectrum must integrate back
    to (approximately) its RGB value through the CIE sensor."""
    scene = volpath.make_fog_box_scene([0, 0, 0], [0, 0, 0],
                                       env_L=[0.7, 0.8, 0.9])
    img = np.asarray(volpath.render(scene, _camera(), RGBFilm.make((32, 32)),
                                    spp=32, cfg=CFG))
    assert np.allclose(img.mean((0, 1)), [0.7, 0.8, 0.9], atol=0.02), img.mean((0, 1))


def test_spectral_beer_lambert_gray():
    """Gray absorber: center pixel = env * exp(-sigma * chord) in every
    channel (the hero-channel delta tracking must stay unbiased with
    lambda[0] as the pdf channel)."""
    sigma = 0.5
    scene = volpath.make_fog_box_scene([sigma] * 3, [0, 0, 0], env_L=[1, 1, 1])
    img = np.asarray(volpath.render(scene, _camera(64), RGBFilm.make((64, 64)),
                                    spp=128, cfg=CFG))
    center = img[28:36, 28:36].mean()
    expect = np.exp(-sigma * 2.0)  # chord through the unit box = 2
    assert abs(center - expect) < 0.03, (center, expect)


def test_spectral_scattering_furnace():
    """Albedo-1 medium inside a unit-radiance furnace conserves energy at
    every wavelength -> sensor-integrated image == 1."""
    scene = volpath.make_fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0],
                                       env_L=[1, 1, 1])
    img = np.asarray(volpath.render(scene, _camera(), RGBFilm.make((32, 32)),
                                    spp=128, cfg=CFG))
    assert np.allclose(img.mean((0, 1)), 1.0, atol=0.03), img.mean((0, 1))


def test_spectral_colored_absorber_matches_rgb_mode():
    """Colored extinction: spectral mode agrees with RGB mode within the
    uplift smoothing error (the Smits basis broadens the box-RGB spectrum,
    so per-channel agreement is loose but the trend must match)."""
    scene = volpath.make_fog_box_scene([0.2, 0.5, 1.0], [0, 0, 0],
                                       env_L=[1, 1, 1])
    cam, film = _camera(), RGBFilm.make((32, 32))
    i_rgb = np.asarray(volpath.render(scene, cam, film, spp=64)).mean((0, 1))
    i_sp = np.asarray(volpath.render(scene, cam, film, spp=256,
                                     cfg=CFG)).mean((0, 1))
    assert np.all(np.abs(i_sp - i_rgb) < 0.08), (i_sp, i_rgb)
    # ordering preserved: R least attenuated, B most
    assert i_sp[0] > i_sp[1] > i_sp[2], i_sp


def test_spectral_guided_volpath_furnace():
    """Spectral (N=4) mode through the GUIDED volpath: the albedo-1 furnace
    must stay exact with guiding + training active (VERDICT r1 gap: the
    guided trio was RGB-only; lam now threads through guided_bounce)."""
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp

    scene = volpath.make_fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0], g=0.3,
                                       env_L=[0.8, 0.8, 0.8])
    img, field = gvp.render_guided(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=48, cfg=CFG,
        gopt=gvp.GuidingOptions(field_res=8, record_depth=4,
                                min_train_weight=16.0),
        seed=3, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert int(field.iteration) > 0  # training ran on bridged samples
    assert abs(img.mean() - 0.8) < 0.035 * 0.8, img.mean()


def test_spectral_guided_volpath_ris_furnace():
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp

    scene = volpath.make_fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0],
                                       env_L=[0.6, 0.6, 0.6])
    img, field = gvp.render_guided(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=48, cfg=CFG,
        gopt=gvp.GuidingOptions(mode="ris", field_res=8, record_depth=4,
                                min_train_weight=16.0),
        seed=5, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert abs(img.mean() - 0.6) < 0.035 * 0.6, img.mean()


def test_spectral_vspg_furnace():
    """Spectral (N=4) VSPG: analytic-homogeneous VSP warp + guiding +
    training must keep the scattering furnace exact (VERDICT r1 gap)."""
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp
    from vspg_pbrt_v4_tpu.models.integrators import vspg

    L0 = 0.6
    scene = volpath.make_fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0], g=0.4,
                                       env_L=[L0] * 3)
    img, field, isgb = vspg.render_vspg(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=48,
        cfg=volpath.VolPathConfig(max_depth=24, spectral=True),
        gopt=gvp.GuidingOptions(field_res=8, record_depth=4,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(),
        seed=3, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert bool(isgb.ready)
    assert abs(img.mean() - L0) < 0.04 * L0, img.mean()


def test_spectral_vspg_cloud_resampling_furnace():
    """Spectral heterogeneous resampling route through a cloud furnace."""
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp
    from vspg_pbrt_v4_tpu.models.integrators import vspg
    from vspg_pbrt_v4_tpu.models.lights import Lights
    from vspg_pbrt_v4_tpu.models.materials import Materials
    from vspg_pbrt_v4_tpu.models.media import GridMedium, Media
    from vspg_pbrt_v4_tpu.models.shapes import Geometry

    n = 16
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0,
                   1).astype(np.float32) * 3.0
    L0 = 0.7
    gm = GridMedium.make(dens, [0, 0, 0], [2.0, 2.0, 2.0], (-1, -1, -1),
                         (1, 1, 1), g=0.3, maj_res=8)
    media = Media.make(grids=(gm,))
    lights = Lights.make(env_L=[L0] * 3, world_radius=100.0)
    geom = Geometry.build(
        boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1), mat=-1, light=-1,
                    med_in=0, med_out=-1)])
    scene = volpath.Scene(geom, Materials.build([]), media, lights)
    img, field, isgb = vspg.render_vspg(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=48,
        cfg=volpath.VolPathConfig(max_depth=24, spectral=True),
        gopt=gvp.GuidingOptions(field_res=8, record_depth=4,
                                min_train_weight=16.0),
        vopt=vspg.VSPGOptions(),
        seed=7, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert abs(img.mean() - L0) < 0.045 * L0, img.mean()


def test_spectral_film_buckets_uniform_env():
    """SpectralFilm (film.h:498-563, round-5): a uniform white env in
    vacuum deposits ~flat spectral radiance, so every wavelength bucket
    converges to ~L * CIE_Y_integral (the reference's bucket algebra;
    our importance-sampled wavelengths are reweighted to the uniform-pdf
    estimator) and the RGB image stays ~L."""
    import numpy as np

    from vspg_pbrt_v4_tpu.models.film import SpectralFilm
    from vspg_pbrt_v4_tpu.models.integrators import volpath
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string
    from vspg_pbrt_v4_tpu.utils.spectrum import CIE_Y_INTEGRAL

    L0 = 0.8
    setup = build_render_setup(parse_pbrt_string('''
Film "spectral" "integer xresolution" [8] "integer yresolution" [8]
  "integer nbuckets" [12]
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [30]
WorldBegin
LightSource "infinite" "rgb L" [0.8 0.8 0.8]
'''))
    film = setup.film
    assert isinstance(film, SpectralFilm) and film.n_buckets == 12
    cfg = volpath.VolPathConfig(max_depth=4, max_events=8, spectral=True)
    fstate = film.init_state()
    for w in range(16):
        fstate, _ = volpath.render_pass(
            setup.scene, setup.camera, film, fstate, cfg, np.uint32(3),
            np.int32(w), -1, 4, "independent", 64)
    rgb = np.asarray(film.image(fstate))
    assert abs(rgb.mean() - L0) < 0.1 * L0, rgb.mean()
    sp = np.asarray(film.spectral_image(fstate))
    assert sp.shape == (8, 8, 12)
    names = film.spectral_channel_names()
    assert len(names) == 12 and names[0].endswith("nm")
    # interior visible buckets (skip the range edges where the Smits
    # uplift basis rolls off): ~flat at L0 * CIE_Y_integral
    exp = L0 * CIE_Y_INTEGRAL
    mid = sp[:, :, 3:9].mean((0, 1))
    assert np.all(np.abs(mid - exp) < 0.35 * exp), (mid, exp)
