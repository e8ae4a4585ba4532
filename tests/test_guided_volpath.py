"""Guided integrator tests: unbiasedness + variance behavior.

The fork validates guided integrators by equal-MSE comparison against the
unguided volpath (SURVEY.md §4); here the analytic furnaces double as exact
unbiasedness checks — any error in the one-sample-MIS / RIS pdf algebra
shows up as energy gain/loss.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import DIFFUSE, Materials
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr

# heavy statistical renders: full-suite tier (pytest -m "not slow" skips)
pytestmark = pytest.mark.slow


def _camera(res=24):
    c2w = tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0))
    return PerspectiveCamera.make(c2w, fov_deg=30.0, resolution=(res, res))


@pytest.mark.parametrize("mode", ["mis", "ris"])
def test_guided_volume_furnace_unbiased(mode):
    """Scattering fog in a uniform env stays a perfect furnace with
    directional guiding enabled and training running."""
    L0 = 0.6
    scene = volpath.make_fog_box_scene([0, 0, 0], [1.2, 1.2, 1.2], g=0.5,
                                       env_L=[L0] * 3)
    img, field = gvp.render_guided(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=48,
        cfg=volpath.VolPathConfig(max_depth=24),
        gopt=gvp.GuidingOptions(mode=mode, field_res=8, record_depth=6,
                                min_train_weight=16.0),
        seed=3, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert int(field.iteration) > 0, "training never ran"
    assert abs(img.mean() - L0) < 0.035 * L0, img.mean()


@pytest.mark.parametrize("mode", ["mis", "ris"])
def test_guided_surface_furnace_unbiased(mode):
    """Diffuse sphere furnace with surface guiding: rho * L0."""
    rho, L0 = 0.7, 1.0
    geom = Geometry.build(spheres=[dict(c=(0, 0, 0), r=1.0, mat=0, light=-1,
                                        med_in=-1, med_out=-1)])
    mats = Materials.build([dict(type=DIFFUSE, albedo=(rho,) * 3)])
    lights = Lights.make(env_L=[L0] * 3, world_radius=100.0)
    from vspg_pbrt_v4_tpu.models.media import Media

    scene = volpath.Scene(geom, mats, Media.make(), lights)
    img, field = gvp.render_guided(
        scene, _camera(32), RGBFilm.make((32, 32)), spp=48,
        gopt=gvp.GuidingOptions(mode=mode, field_res=8, record_depth=4,
                                min_train_weight=16.0),
        seed=5, spp_per_pass=4)
    img = np.asarray(img)
    center = img[13:19, 13:19].mean((0, 1))
    assert int(field.iteration) > 0
    assert np.allclose(center, rho * L0, rtol=0.05), center


def test_guided_matches_unguided_fog_light():
    """Fog + external point light: guided mean == unguided mean (unbiased).

    The light sits outside the fog so the 1/r^2 kernel is bounded — with an
    embedded light the estimator is heavy-tailed and means at moderate spp
    vary several percent between seeds, masking real bias."""
    scene = volpath.make_fog_box_scene(
        [0.05] * 3, [0.8] * 3, g=0.3, point=((0.0, 1.8, 0.0), (8.0, 8.0, 8.0)))
    cam = _camera(24)
    film = RGBFilm.make((24, 24))
    ref = np.asarray(volpath.render(scene, cam, film, spp=192, seed=11,
                                    spp_per_pass=8))
    img, field = gvp.render_guided(
        scene, cam, film, spp=192,
        gopt=gvp.GuidingOptions(mode="ris", field_res=8, record_depth=6,
                                min_train_weight=16.0),
        seed=12, spp_per_pass=8)
    img = np.asarray(img)
    assert int(field.iteration) > 0
    # means agree within MC noise
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.02, (img.mean(), ref.mean())


def test_field_learns_light_direction():
    """After training on the fog scene, the volume field's distribution at
    the box center concentrates probability toward the light."""
    from vspg_pbrt_v4_tpu.models.guiding import field as gfield

    scene = volpath.make_fog_box_scene(
        [0.02] * 3, [0.6] * 3, g=0.0, point=((0.0, 0.9, 0.0), (20.0,) * 3))
    img, field = gvp.render_guided(
        scene, _camera(24), RGBFilm.make((24, 24)), spp=64,
        gopt=gvp.GuidingOptions(field_res=8, record_depth=6,
                                min_train_weight=16.0),
        seed=7, spp_per_pass=4)
    q = jnp.asarray([[0.0, -0.5, 0.0]])  # below center; light is up
    d = gfield.volume_distribution(field, q, jnp.asarray([[0.0, 0, -1.0]]),
                                   jnp.zeros(1), apply_hg=False)
    p_up = float(gfield.dist_pdf(d, jnp.asarray([[0.0, 1.0, 0.0]]))[0])
    p_down = float(gfield.dist_pdf(d, jnp.asarray([[0.0, -1.0, 0.0]]))[0])
    assert bool(d.valid[0])
    assert p_up > 2.0 * p_down, (p_up, p_down)
