"""Adaptive two-level guiding field (OpenPGL sample-adaptive kd-tree
analog, SURVEY §2.4 / VERDICT r1 item 10): dense coarse cells split into
2^3 children between waves; addressing stays O(1) gathers."""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.guiding import field as gf
from vspg_pbrt_v4_tpu.models.integrators import guided_volpath as gvp
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.utils import transform as tr


def test_refine_addressing():
    """Splitting a cell maps its octants to 8 fresh leaves; unrefined
    cells keep their identity; children inherit the parent distribution
    with 1/8 statistics."""
    f = gf.GuidingField.make((-1, -1, -1), (1, 1, 1), res=4, n_lobes=4,
                             n_extra=64)
    C = 4 ** 3
    cid = int(np.asarray(f.cell_id(jnp.asarray([[0.9, 0.9, 0.9]])))[0])
    sw = np.zeros((C + 64, 4), np.float32)
    sw[cid] = 200.0
    f = f.replace(surface=f.surface.replace(stats_w=jnp.asarray(sw)))
    f2 = gf.refine_field(f, threshold=100.0)
    assert int(f2.n_leaves) == C + 8
    assert int(np.asarray(f2.refined).sum()) == 1
    import itertools

    ps = [[ox, oy, oz]
          for ox, oy, oz in itertools.product([0.63, 0.88], repeat=3)]
    leaves = np.asarray(f2.cell_id(jnp.asarray(ps)))
    assert len(set(leaves.tolist())) == 8
    assert leaves.min() == C
    # inherited statistics: children together conserve the parent mass
    # (parent row = 200 per lobe x 4 lobes = 800; each child row = 1/8)
    assert np.allclose(np.asarray(f2.surface.stats_w)[C:C + 8].sum(),
                       800.0, rtol=1e-5)
    assert np.allclose(np.asarray(f2.surface.stats_w)[C].sum(), 100.0,
                       rtol=1e-5)
    # below-threshold field: no further splits
    f3 = gf.refine_field(f2, threshold=100.0)
    assert int(f3.n_leaves) == int(f2.n_leaves)
    # unrefined cell unchanged
    other = np.asarray(f2.cell_id(jnp.asarray([[-0.9, -0.9, -0.9]])))[0]
    assert other < C
    # capacity clamp: threshold 0 splits at most (extra)//8 more cells
    f4 = gf.refine_field(f2, threshold=0.0, max_splits=1000)
    assert int(f4.n_leaves) <= C + 64


@pytest.mark.slow
def test_adaptive_guided_render_unbiased():
    """Guided rendering with adaptive refinement ON stays unbiased (fog
    furnace) and actually refines where the samples concentrate."""
    scene = volpath.make_fog_box_scene([0, 0, 0], [1.0, 1.0, 1.0], g=0.3,
                                       env_L=[0.7] * 3)
    cam = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (24, 24))
    img, field = gvp.render_guided(
        scene, cam, RGBFilm.make((24, 24)), spp=48,
        gopt=gvp.GuidingOptions(field_res=4, record_depth=4,
                                min_train_weight=16.0,
                                adaptive_extra=256,
                                refine_threshold=64.0),
        seed=3, spp_per_pass=4)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert int(field.iteration) > 0
    assert int(field.n_leaves) > 4 ** 3  # refinement happened
    assert abs(img.mean() - 0.7) < 0.035 * 0.7, img.mean()


@pytest.mark.slow
def test_adaptive_field_in_kernel():
    """The VSPG megakernel consumes ADAPTIVE fields (VERDICT r2 #3): the
    packed table carries leaf centers + split-integer indirection rows,
    and the two-stage one-hot fetch resolves coarse cell -> leaf. The
    frozen-field kernel render must agree with the XLA frozen render of
    the SAME field within MC noise."""
    import vspg_pbrt_v4_tpu.ops.pallas_vspg as pk
    from vspg_pbrt_v4_tpu.models import materials as M
    from vspg_pbrt_v4_tpu.models.integrators import vspg
    from vspg_pbrt_v4_tpu.models.lights import Lights
    from vspg_pbrt_v4_tpu.models.media import GridMedium, Media
    from vspg_pbrt_v4_tpu.models.shapes import Geometry

    n = 16
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0,
                   1).astype(np.float32) * 2.0
    gm = GridMedium.make(dens, [0.02] * 3, [1.0] * 3, (-1, -1, -1),
                         (1, 1, 1), g=0.3, maj_res=8)
    scene = volpath.Scene(
        Geometry.build(boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1),
                                   mat=-1, light=-1, med_in=0,
                                   med_out=-1)]),
        M.Materials.build([]), Media.make(grids=(gm,)),
        Lights.make(point_p=[(0.0, 1.8, 0.0)], point_I=[(6.0,) * 3],
                    env_L=[0.4] * 3, world_radius=100.0))
    cam = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (16, 16))
    film = RGBFilm.make((16, 16))
    cfg = volpath.VolPathConfig(max_depth=8, max_events=48)
    gopt = gvp.GuidingOptions(field_res=4, record_depth=4,
                              min_train_weight=4.0, adaptive_extra=128,
                              refine_threshold=16.0)
    vopt = vspg.VSPGOptions()
    _, field, isgb = vspg.render_vspg(
        scene, cam, film, spp=8, cfg=cfg, gopt=gopt, vopt=vopt, seed=0,
        spp_per_pass=4, use_pallas=False)
    assert int(field.n_leaves) > 4 ** 3  # refinement actually happened
    assert pk.supports(scene, cam, film, cfg, gopt, vopt, field)
    img_x, _, _ = vspg.render_vspg(
        scene, cam, film, spp=32, cfg=cfg, gopt=gopt, vopt=vopt, seed=5,
        spp_per_pass=32, field=field, isgb=isgb, train=False,
        use_pallas=False)
    img_k = pk.render_vspg_pallas(scene, cam, film, 32, cfg, gopt, vopt,
                                  field, isgb, seed=9, interpret=True)
    img_x, img_k = np.asarray(img_x), np.asarray(img_k)
    assert np.isfinite(img_k).all()
    rel = abs(img_k.mean() - img_x.mean()) / max(float(img_x.mean()), 1e-9)
    assert rel < 0.04, (img_k.mean(), img_x.mean())
