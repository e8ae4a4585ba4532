"""Raw Ptex (.ptx) reader/writer round-trips (tools/ptex.py) and the
builder integration (Texture "ptex" with a raw .ptx file).

Reference behavior: pbrt's PtexTexture (src/pbrt/textures.h) evaluates
per-face texel grids via the ptex library; here the faces are parsed by
the pure-numpy Ptex implementation and baked into the atlas."""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.tools import ptex


def _rand_faces(rng, shapes, c=3):
    return [rng.random((h, w, c)).astype(np.float32) for h, w in shapes]


@pytest.mark.parametrize("datatype,atol", [
    ("float", 0.0), ("half", 2e-3), ("uint16", 1e-4), ("uint8", 3e-3)])
def test_roundtrip_datatypes(tmp_path, datatype, atol):
    rng = np.random.default_rng(1)
    faces = _rand_faces(rng, [(8, 8), (4, 16), (32, 2), (1, 1)])
    p = tmp_path / "t.ptx"
    ptex.write_ptx(p, faces, datatype=datatype)
    back = ptex.read_ptx(p)
    assert back.datatype == ptex._DT_NAMES[datatype]
    assert len(back.faces) == len(faces)
    for a, b in zip(faces, back.faces):
        assert b.shape == a.shape
        np.testing.assert_allclose(b, a, atol=atol or 1e-6)


def test_diff_vs_plain_zip_identical(tmp_path):
    rng = np.random.default_rng(2)
    faces = _rand_faces(rng, [(16, 16), (8, 4)])
    pa, pb = tmp_path / "a.ptx", tmp_path / "b.ptx"
    ptex.write_ptx(pa, faces, datatype="uint16", diff=True)
    ptex.write_ptx(pb, faces, datatype="uint16", diff=False)
    fa, fb = ptex.read_ptx(pa).faces, ptex.read_ptx(pb).faces
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(a, b)


def test_constant_faces_use_constdata(tmp_path):
    faces = [np.full((8, 8, 3), 0.25, np.float32),
             np.linspace(0, 1, 4 * 4 * 3, dtype=np.float32
                         ).reshape(4, 4, 3)]
    p = tmp_path / "c.ptx"
    ptex.write_ptx(p, faces, datatype="float")
    back = ptex.read_ptx(p)
    assert back.faceinfo[0]["flags"] & ptex.FLAG_CONSTANT
    assert not back.faceinfo[1]["flags"] & ptex.FLAG_CONSTANT
    np.testing.assert_allclose(back.faces[0], faces[0], atol=1e-6)
    np.testing.assert_allclose(back.faces[1], faces[1], atol=1e-6)


def test_tiled_faces(tmp_path):
    rng = np.random.default_rng(3)
    faces = _rand_faces(rng, [(32, 64), (8, 8)])
    # second tile row constant to exercise constant tile blocks
    faces[0][16:, :] = 0.5
    p = tmp_path / "t.ptx"
    ptex.write_ptx(p, faces, datatype="float", tile_size=16)
    back = ptex.read_ptx(p)
    np.testing.assert_allclose(back.faces[0], faces[0], atol=1e-6)
    np.testing.assert_allclose(back.faces[1], faces[1], atol=1e-6)


def test_adjacency_and_meshtype(tmp_path):
    faces = _rand_faces(np.random.default_rng(4), [(4, 4)] * 3)
    adjf = [(1, 2, -1, -1), (0, 2, -1, -1), (0, 1, -1, -1)]
    adje = [(0, 1, 2, 3), (3, 2, 1, 0), (1, 1, 1, 1)]
    p = tmp_path / "adj.ptx"
    ptex.write_ptx(p, faces, meshtype=ptex.MESH_TRIANGLE, datatype="uint8",
                   adjfaces=adjf, adjedges=adje, alphachan=2)
    back = ptex.read_ptx(p)
    assert back.meshtype == ptex.MESH_TRIANGLE
    assert back.alphachan == 2
    for i in range(3):
        assert back.faceinfo[i]["adjfaces"] == adjf[i]
        assert back.faceinfo[i]["adjedges"] == adje[i]


def test_single_channel(tmp_path):
    faces = [np.random.default_rng(5).random((4, 8, 1)).astype(np.float32)]
    p = tmp_path / "g.ptx"
    ptex.write_ptx(p, faces, datatype="half")
    np.testing.assert_allclose(ptex.read_ptx(p).faces[0], faces[0],
                               atol=2e-3)


def test_rejects_bad_inputs(tmp_path):
    p = tmp_path / "bad.ptx"
    with pytest.raises(ValueError, match="power-of-2"):
        ptex.write_ptx(p, [np.zeros((3, 4, 3))])
    p.write_bytes(b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        ptex.read_ptx(p)


def test_builder_loads_raw_ptx_end_to_end(tmp_path):
    """Texture "ptex" with a RAW .ptx file: each triangle face carries its
    own color through parse -> build -> intersect -> texture eval
    (PtexTexture faceIndex semantics, textures.h)."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.textures import eval_texture
    from vspg_pbrt_v4_tpu.scene.builder import build_render_setup
    from vspg_pbrt_v4_tpu.scene.parser import parse_pbrt_string

    ptx = str(tmp_path / "faces.ptx")
    ptex.write_ptx(ptx, [np.full((4, 4, 3), (0.9, 0.2, 0.1), np.float32),
                         np.full((4, 4, 3), (0.1, 0.8, 0.3), np.float32)],
                   datatype="uint16")
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
    o = jnp.asarray([[0.5, -0.5, -3.0], [-0.5, 0.5, -3.0]])
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape)
    h = geom.intersect(o, d, jnp.full((2,), 1e9))
    assert bool(h.hit.all())
    mats = setup.scene.materials
    tex_id = int(np.asarray(mats.albedo_tex)[np.asarray(h.mat_id)[0]])
    cols = np.asarray(eval_texture(setup.scene.textures,
                                   jnp.full((2,), tex_id, jnp.int32), h.uv))
    np.testing.assert_allclose(cols[0], (0.9, 0.2, 0.1), atol=0.02)
    np.testing.assert_allclose(cols[1], (0.1, 0.8, 0.3), atol=0.02)
