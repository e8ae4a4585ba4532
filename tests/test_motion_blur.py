"""Motion blur end-to-end (round-5 verdict task 6): camera shutter +
per-lane ray time + animated-CTM shapes via animated instances
(cameras.h:131-149 shutter sampling; cpu/primitive.h:103
AnimatedPrimitive; transform.h AnimatedTransform TRS interpolation;
parser TransformTimes/ActiveTransform)."""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string


def test_parser_animated_directives():
    """TransformTimes + ActiveTransform EndTime produce an animated
    instance and a normalized camera shutter."""
    scene_txt = '''
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
TransformTimes 2 4
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
  "float shutteropen" [2] "float shutterclose" [4]
WorldBegin
ActiveTransform EndTime
Translate 0.5 0 0
ActiveTransform All
Shape "trianglemesh"
  "point3 P" [-0.2 -0.2 0  0.2 -0.2 0  0.2 0.2 0  -0.2 0.2 0]
  "integer indices" [0 1 2 0 2 3]
'''
    setup = build_render_setup(parse_pbrt_string(scene_txt))
    g = setup.scene.geometry
    assert g.inst is not None and g.inst.tl.anim is not None
    assert bool(np.asarray(g.inst.tl.anim[6])[0])  # animated flag
    # shutter normalized into TransformTimes space
    assert abs(setup.camera.shutter_open - 0.0) < 1e-6
    assert abs(setup.camera.shutter_close - 1.0) < 1e-6
    # end keyframe translation decoded
    T1 = np.asarray(g.inst.tl.anim[3])[0]
    assert np.allclose(T1, (0.5, 0, 0), atol=1e-5)


def test_interp_w2o_keyframes():
    """interp_w2o returns the exact inverse transforms at t=0/0.5/1 for
    a translating instance."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.shapes import Instances
    from vspg_pbrt_v4_tpu.ops.bvh import interp_w2o

    tris = [dict(p0=(-1, -1, 0), p1=(1, -1, 0), p2=(0, 1, 0))]
    m0 = np.eye(4)
    m1 = np.eye(4)
    m1[:3, 3] = (2.0, 0.0, 0.0)
    ins = Instances.build([tris], [dict(obj=0, o2w=m0, o2w_end=m1)])
    for t, ex in ((0.0, 0.0), (0.5, -1.0), (1.0, -2.0)):
        m = np.asarray(interp_w2o(ins.tl, jnp.asarray([0]),
                                  jnp.asarray([t])))[0]
        assert np.allclose(m[:, :3], np.eye(3), atol=1e-5)
        assert abs(m[0, 3] - ex) < 1e-5, (t, m)


@pytest.mark.slow
def test_moving_occluder_matches_analytic():
    """A black quad sweeping across an env-lit view during the shutter:
    E[pixel] = L0 * (1 - coverage) with coverage the analytic fraction
    of shutter times the quad blocks the pixel's center ray — the
    moving-shape smear vs closed form (verdict task 6's acceptance)."""
    L0 = 1.0
    res = 16
    scene_txt = '''
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [30]
  "float shutteropen" [0] "float shutterclose" [1]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "diffuse" "rgb reflectance" [0 0 0]
ActiveTransform All
Translate -0.3 0 0
ActiveTransform EndTime
Translate 0.6 0 0
ActiveTransform All
Shape "trianglemesh"
  "point3 P" [-0.2 -0.2 0  0.2 -0.2 0  0.2 0.2 0  -0.2 0.2 0]
  "integer indices" [0 1 2 0 2 3]
'''
    setup = build_render_setup(parse_pbrt_string(scene_txt))
    assert setup.scene.geometry.inst is not None
    img = np.asarray(volpath.render(
        setup.scene, setup.camera, setup.film, spp=256, seed=3,
        spp_per_pass=16,
        cfg=volpath.VolPathConfig(max_depth=4, max_events=16)))
    # analytic coverage per pixel-center ray crossing the z=0 plane
    tanf = np.tan(np.deg2rad(30.0) / 2.0)
    errs = []
    for j in range(res):
        for i in range(res):
            sx = ((i + 0.5) / res * 2 - 1) * tanf
            sy = (1 - (j + 0.5) / res * 2) * tanf
            # ray from (0,0,-4) through plane z=0: scale by 4
            px, py = 4.0 * sx, 4.0 * sy
            if abs(py) > 0.2:
                cov = 0.0
            else:
                # quad center x(t) = -0.3 + 0.6 t; covered iff
                # |px - x(t)| <= 0.2  =>  t in [a, b] clipped to [0,1]
                a = (px - 0.2 + 0.3) / 0.6
                b = (px + 0.2 + 0.3) / 0.6
                cov = max(0.0, min(b, 1.0) - max(a, 0.0))
            exp = L0 * (1.0 - cov)
            # the analytic value is for the pixel-CENTER ray; pixels
            # straddling the quad's y-edges mix covered/uncovered rays
            # (box filter), so the tight check is interior-only
            interior = abs(abs(py) - 0.2) > 0.14
            errs.append((img[j, i].mean() - exp, interior))
    e_all = np.asarray([e for e, _ in errs])
    e_int = np.asarray([e for e, inside in errs if inside])
    # mean abs error small; MC noise at 256 spp on a binary visibility
    # is ~ sqrt(p(1-p)/256) <= 0.031 per pixel
    assert np.abs(e_all).mean() < 0.02, np.abs(e_all).mean()
    assert np.abs(e_int).max() < 0.12, np.abs(e_int).max()
