"""Multi-device sharding tests on the virtual 8-CPU mesh (conftest sets
--xla_force_host_platform_device_count=8).

Cross-backend idiom: the sharded drivers run the identical per-device code
under shard_map, so their images must agree with the single-device renders
within MC noise (RNG cohorts differ, so not bit-identical — see
utils/rng.py counter design).
"""

import jax
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.parallel import mesh as pmesh
from vspg_pbrt_v4_tpu.utils import transform as tr

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _scene():
    return volpath.make_fog_box_scene(
        [0.02] * 3, [0.6] * 3, g=0.3, env_L=[0.4, 0.4, 0.4],
        point=((0.0, 1.8, 0.0), (6.0, 6.0, 6.0)))


def _cam(res):
    return PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (res, res))


@pytest.mark.slow
def test_rays_sharded_matches_single_device():
    res = 32
    scene, cam, film = _scene(), _cam(res), RGBFilm.make((32, 32))
    cfg = volpath.VolPathConfig(max_depth=8, max_events=32)
    m = pmesh.default_mesh(jax.devices("cpu")[:8])
    img_s = np.asarray(pmesh.render_sharded(scene, cam, film, 64, cfg, 0,
                                            mesh=m))
    ref = np.asarray(volpath.render(scene, cam, film, spp=64, seed=0,
                                    cfg=cfg))
    assert np.isfinite(img_s).all()
    rel = abs(img_s.mean() - ref.mean()) / ref.mean()
    assert rel < 0.03, (img_s.mean(), ref.mean())


def test_spp_psum_matches_single_device():
    res = 32
    scene, cam, film = _scene(), _cam(res), RGBFilm.make((32, 32))
    cfg = volpath.VolPathConfig(max_depth=8, max_events=32)
    from jax.sharding import Mesh

    m = Mesh(np.asarray(jax.devices("cpu")[:8]), ("spp",))
    img_s = np.asarray(pmesh.render_spp_psum(scene, cam, film, 8, cfg, 0,
                                             mesh=m))
    ref = np.asarray(volpath.render(scene, cam, film, spp=64, seed=0,
                                    cfg=cfg))
    assert np.isfinite(img_s).all()
    rel = abs(img_s.mean() - ref.mean()) / ref.mean()
    assert rel < 0.03, (img_s.mean(), ref.mean())


@pytest.mark.slow
def test_vspg_sharded_matches_single_device():
    """The full VSPG wave sharded over 8 devices — film + ISGB rows
    sharded, TrainBatch reduced across devices for the field EM update —
    must agree with the single-device render_vspg (SURVEY §5 acceptance)."""
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp
    from vspg_pbrt_v4_tpu.models.integrators import vspg

    res = 16
    scene, cam, film = _scene(), _cam(res), RGBFilm.make((16, 16))
    cfg = volpath.VolPathConfig(max_depth=8, max_events=32)
    gopt = gvp.GuidingOptions(field_res=4, record_depth=4,
                              min_train_weight=16.0)
    vopt = vspg.VSPGOptions()
    spp = 48
    ref, field_ref, _ = vspg.render_vspg(
        scene, cam, film, spp=spp, cfg=cfg, gopt=gopt, vopt=vopt, seed=4,
        spp_per_pass=8)
    m = pmesh.default_mesh(jax.devices("cpu")[:8])
    img, field_sh, isgb = pmesh.render_vspg_sharded(
        scene, cam, film, spp, cfg=cfg, gopt=gopt, vopt=vopt, seed=5,
        mesh=m, spp_per_pass=8)
    img, ref = np.asarray(img), np.asarray(ref)
    assert np.isfinite(img).all()
    # the sharded run trained too (field statistics were reduced cross-dev)
    assert int(field_sh.iteration) > 0
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.04, (img.mean(), ref.mean())
