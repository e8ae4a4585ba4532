"""Fast-tier interpret-mode parity gate over the grid-kernel config matrix.

VERDICT r2 #10: every kernel variant — density-table format {bf16 sweep,
i8 quads, int8 MXU one-hot} x {exact trilerp, stochastic corner} — must be
exercised in the FAST tier at tiny shapes, so a Mosaic-facing or estimator
regression in a specific packing path cannot hide in the slow tier. The
heavy statistical validation (furnace energy, cross-estimator agreement at
high spp) stays in the slow modules (tests/test_pallas_volpath.py,
tests/test_pallas_vspg.py); this gate checks each variant runs, is finite,
and lands within a loose-but-real window of the analytic furnace value.

Reference idiom: the CPU-wavefront "fake backend" matrix (SURVEY.md §4).
"""

import numpy as np
import pytest

import vspg_pbrt_v4_tpu.ops.pallas_volpath as pv
from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import GridMedium, Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr


def _tiny_furnace(n=16, res=16):
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0,
                   1).astype(np.float32) * 2.0
    gm = GridMedium.make(dens, [0.0] * 3, [1.5] * 3, (-1, -1, -1),
                         (1, 1, 1), g=0.0, maj_res=8)
    scene = volpath.Scene(
        Geometry.build(boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1),
                                   mat=-1, light=-1, med_in=0,
                                   med_out=-1)]),
        Materials.build([]), Media.make(grids=(gm,)),
        Lights.make(env_L=[0.5] * 3, world_radius=100.0))
    camera = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (res, res))
    film = RGBFilm.make((res, res))
    cfg = volpath.VolPathConfig(max_depth=8, max_events=32)
    return scene, camera, film, cfg


# (dens_pack override knobs, stochastic-corner override) per variant
_VARIANTS = {
    "bf16_exact": dict(mxu_min=10**9, i8_thr=10**9, stoch=10**9),
    "bf16_stoch": dict(mxu_min=10**9, i8_thr=10**9, stoch=0),
    "i8_stoch": dict(mxu_min=10**9, i8_thr=0, stoch=0),
    "mxu_i8": dict(mxu_min=0, i8_thr=10**9, stoch=0),
}


@pytest.mark.parametrize("variant", sorted(_VARIANTS))
def test_grid_kernel_variant_furnace(variant):
    knobs = _VARIANTS[variant]
    old = (pv.MXU_MIN_VOX, pv.I8_THRESHOLD, pv.STOCH_TRILERP_MAX_EXACT)
    pv.MXU_MIN_VOX = knobs["mxu_min"]
    pv.I8_THRESHOLD = knobs["i8_thr"]
    pv.STOCH_TRILERP_MAX_EXACT = knobs["stoch"]
    pv._KERNEL_CACHE.clear()
    try:
        scene, camera, film, cfg = _tiny_furnace()
        c = pv.extract_constants(scene, camera, film, cfg)
        expect = {"bf16_exact": "bf16", "bf16_stoch": "bf16",
                  "i8_stoch": "i8", "mxu_i8": "mxu"}[variant]
        assert c["dens_pack"] == expect, (variant, c["dens_pack"])
        img = np.asarray(pv.render_homog_pallas(
            scene, camera, film, 8, cfg, seed=3, interpret=True))
        assert np.isfinite(img).all()
        # furnace = env everywhere; 8 spp on 16^2 -> generous MC window,
        # but a packing/decode bug (wrong parity, wrong scale) lands far
        # outside it
        assert abs(img.mean() - 0.5) / 0.5 < 0.06, (variant, img.mean())
    finally:
        (pv.MXU_MIN_VOX, pv.I8_THRESHOLD,
         pv.STOCH_TRILERP_MAX_EXACT) = old
        pv._KERNEL_CACHE.clear()


def test_vspg_kernel_variant_fast():
    """One tiny frozen-field VSPG kernel pass (interpret): runs, finite,
    non-black, with every GUIDED route live. The field is HAND-CRAFTED
    (the furnace idiom: any sampling distribution must integrate back)
    instead of trained through the XLA wave — the wave's jit compile
    alone cost ~60 s of fast-tier budget. Heavy VSPG validation lives in
    tests/test_pallas_vspg.py."""
    import jax.numpy as jnp

    import vspg_pbrt_v4_tpu.ops.pallas_vspg as pk
    from vspg_pbrt_v4_tpu.models.guiding.field import GuidingField
    from vspg_pbrt_v4_tpu.models.guiding.isgb import ISGB
    from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp
    from vspg_pbrt_v4_tpu.models.integrators import vspg

    scene, camera, film, cfg = _tiny_furnace()
    gopt = gvp.GuidingOptions(field_res=4, record_depth=4,
                              min_train_weight=1.0)
    vopt = vspg.VSPGOptions()
    field = GuidingField.make((-1.05,) * 3, (1.05,) * 3, res=4, n_lobes=4)
    L = 4 ** 3
    K = 4
    rng = np.random.default_rng(11)
    mu = rng.standard_normal((L, K, 3)).astype(np.float32)
    mu /= np.linalg.norm(mu, axis=-1, keepdims=True)
    vol = field.volume.replace(
        weights=jnp.full((L, K), 1.0 / K),
        mu=jnp.asarray(mu),
        kappa=jnp.full((L, K), 3.0),
        stats_w=jnp.full((L, K), 16.0),
        stats_dist=jnp.full((L, K), 16.0 * 0.5),
        vsp_n=jnp.full((L,), 32.0),
        vsp_c_vol=jnp.full((L,), 32.0 * 0.4),
        vsp_c_surf=jnp.full((L,), 32.0 * 0.3),
        vsp_c2_vol=jnp.full((L,), 32.0 * 0.4 ** 2 * 1.5),
        vsp_c2_surf=jnp.full((L,), 32.0 * 0.3 ** 2 * 1.5),
        vsp_lobe_vol=jnp.full((L, K), 8.0),
        vsp_lobe_surf=jnp.full((L, K), 4.0),
        flux=jnp.full((L, 3), 8.0),
        flux_w=jnp.full((L,), 16.0),
    )
    field = field.replace(volume=vol, iteration=jnp.int32(3))
    isgb = ISGB.make(film.resolution, "variance", "atrous")
    img = np.asarray(pk.render_vspg_pallas(
        scene, camera, film, 4, cfg, gopt, vopt, field, isgb, seed=1,
        interpret=True))
    assert np.isfinite(img).all()
    # furnace: the guided routes (VSP resampling walk, vMF RIS, guided
    # RR) must keep the env constant
    assert abs(img.mean() - 0.5) / 0.5 < 0.10, img.mean()
