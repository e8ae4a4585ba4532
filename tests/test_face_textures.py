"""Per-vertex mesh uv interpolation + per-face (ptex-analog) textures.

Reference behavior: pbrt trianglemesh "point2 uv" interpolation
(shapes.h Triangle InterpolateUV) and PtexTexture per-faceIndex lookup
(textures.h). Here faces bake into one atlas at build time with the mesh
corners rewritten to the face rects (models/textures.build_face_atlas)."""

import os

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.models.textures import (build_face_atlas,
                                              load_face_textures,
                                              save_face_textures)


def _quad_tris(uv=None):
    # unit quad in z=0 plane split into two triangles
    p = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)]
    idx = [(0, 1, 2), (0, 2, 3)]
    tris = []
    for t_i, (a, b, c) in enumerate(idx):
        d = dict(p0=p[a], p1=p[b], p2=p[c], mat=0, light=-1,
                 med_in=-1, med_out=-1)
        if uv is not None:
            d.update(uv0=uv[a], uv1=uv[b], uv2=uv[c])
        tris.append(d)
    return tris


def test_uv_interpolation_matches_bilinear():
    """Explicit quad uvs: hit uv must equal the planar (x,y)->(u,v) map."""
    uv = [(0, 0), (1, 0), (1, 1), (0, 1)]
    geom = Geometry.build(triangles=_quad_tris(uv))
    xs = np.asarray([-0.5, 0.25, 0.8, -0.9])
    ys = np.asarray([0.5, -0.75, 0.1, 0.9])
    o = jnp.asarray(np.stack([xs, ys, np.full_like(xs, -3.0)], -1))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape)
    h = geom.intersect(o, d, jnp.full(o.shape[:1], 1e9))
    assert bool(h.hit.all())
    exp_u = (xs + 1) / 2
    exp_v = (ys + 1) / 2
    np.testing.assert_allclose(np.asarray(h.uv[:, 0]), exp_u, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.uv[:, 1]), exp_v, atol=1e-5)


def test_default_uv_is_barycentric():
    geom = Geometry.build(triangles=_quad_tris())
    o = jnp.asarray([[0.5, -0.5, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = geom.intersect(o, d, jnp.full((1,), 1e9))
    uv = np.asarray(h.uv[0])
    assert bool(h.hit[0]) and 0 <= uv[0] <= 1 and 0 <= uv[1] <= 1


def test_face_atlas_rect_lookup():
    """Constant-color faces: sampling anywhere inside a face's rect must
    return exactly that face's color (texel-center rects, no bleeding)."""
    faces = [np.full((4, 4, 3), c, np.float32)
             for c in ((1.0, 0.1, 0.1), (0.1, 1.0, 0.1), (0.1, 0.1, 1.0))]
    atlas, rects = build_face_atlas(faces)
    H, W = atlas.shape[:2]
    for fi, (u0, v0, u1, v1) in enumerate(rects):
        for fu, fv in ((0.0, 0.0), (1.0, 1.0), (0.37, 0.81)):
            u = u0 + fu * (u1 - u0)
            v = v0 + fv * (v1 - v0)
            x = u * (W - 1)
            y = (1.0 - v) * (H - 1)
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            x1, y1 = min(x0 + 1, W - 1), min(y0 + 1, H - 1)
            fx, fy = x - x0, y - y0
            val = ((atlas[y0, x0] * (1 - fx) + atlas[y0, x1] * fx)
                   * (1 - fy)
                   + (atlas[y1, x0] * (1 - fx) + atlas[y1, x1] * fx) * fy)
            np.testing.assert_allclose(val, faces[fi][0, 0], atol=1e-6)


def test_ptex_scene_end_to_end(tmp_path):
    """.pbrt scene with a ptex-textured mesh: each triangle face carries
    its own constant color through the full parse->build->intersect->
    texture-eval chain."""
    from vspg_pbrt_v4_tpu.models.textures import eval_texture
    from vspg_pbrt_v4_tpu.scene.builder import build_render_setup
    from vspg_pbrt_v4_tpu.scene.parser import parse_pbrt_string

    ptx = os.path.join(str(tmp_path), "faces.npz")
    save_face_textures(ptx, [np.full((4, 4, 3), (0.9, 0.2, 0.1), np.float32),
                             np.full((4, 4, 3), (0.1, 0.8, 0.3), np.float32)])
    scene_txt = f"""
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
Camera "perspective" "float fov" [45]
WorldBegin
Texture "skin" "spectrum" "ptex" "string filename" ["{ptx}"]
Material "diffuse" "texture reflectance" ["skin"]
Shape "trianglemesh"
  "point3 P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
  "integer indices" [0 1 2  0 2 3]
"""
    setup = build_render_setup(parse_pbrt_string(scene_txt))
    geom = setup.scene.geometry
    assert geom.n_tri == 2
    # one probe inside each triangle of the quad
    o = jnp.asarray([[0.5, -0.5, -3.0], [-0.5, 0.5, -3.0]])
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape)
    h = geom.intersect(o, d, jnp.full((2,), 1e9))
    assert bool(h.hit.all())
    mats = setup.scene.materials
    tex_id = int(np.asarray(mats.albedo_tex)[np.asarray(h.mat_id)[0]]) \
        if hasattr(mats, "albedo_tex") else None
    tex = setup.scene.textures if hasattr(setup.scene, "textures") else None
    assert tex is not None and tex_id is not None and tex_id >= 0
    cols = np.asarray(eval_texture(tex, jnp.full((2,), tex_id, jnp.int32),
                                   h.uv))
    np.testing.assert_allclose(cols[0], (0.9, 0.2, 0.1), atol=0.02)
    np.testing.assert_allclose(cols[1], (0.1, 0.8, 0.3), atol=0.02)
