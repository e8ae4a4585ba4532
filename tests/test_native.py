"""Native library tests: BVH builder parity, PLY loader roundtrip."""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu import native
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.ops.bvh import build_bvh
from vspg_pbrt_v4_tpu.utils import rng, sampling

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_native_bvh_matches_python_semantics():
    r = np.random.default_rng(2)
    n = 1000
    c = r.uniform(-5, 5, (n, 3)).astype(np.float32)
    ext = r.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    lo, hi = c - ext, c + ext
    nb = native.build_bvh_native(lo, hi)
    assert nb is not None
    # structural invariants
    counts = np.asarray(nb.count)
    rights = np.asarray(nb.right)
    assert sorted(np.asarray(nb.prim_ids).tolist()) == list(range(n))
    assert (counts <= 4).all()
    interior = counts == 0
    idx = np.arange(len(counts))
    assert (rights[interior] > idx[interior]).all()
    # parent bounds contain children
    bmin, bmax = np.asarray(nb.bmin), np.asarray(nb.bmax)
    for ni in np.where(interior)[0][:200]:
        l, rr = ni + 1, rights[ni]
        assert (bmin[ni] <= bmin[l] + 1e-5).all() and (bmax[ni] >= bmax[l] - 1e-5).all()
        assert (bmin[ni] <= bmin[rr] + 1e-5).all() and (bmax[ni] >= bmax[rr] - 1e-5).all()


def test_native_bvh_render_equivalent():
    """Closest hits identical through native-BVH and python-BVH geometry."""
    r = np.random.default_rng(3)
    n = 700  # > 512 so Geometry.build picks the native builder
    c = r.uniform(-3, 3, (n, 3)).astype(np.float32)
    e1 = r.normal(0, 0.3, (n, 3)).astype(np.float32)
    e2 = r.normal(0, 0.3, (n, 3)).astype(np.float32)
    tris = [dict(p0=c[i], p1=c[i] + e1[i], p2=c[i] + e2[i], mat=0, light=-1,
                 med_in=-1, med_out=-1) for i in range(n)]
    g_nat = Geometry.build(triangles=tris)  # auto -> native (n>512)
    g_py = Geometry.build(triangles=tris, use_bvh=False)
    pid = jnp.arange(4096, dtype=jnp.uint32)
    o = (rng.uniform3(jnp.uint32(1), pid, jnp.uint32(0), jnp.uint32(0)) - 0.5) * 12
    d = sampling.sample_uniform_sphere(
        rng.uniform2(jnp.uint32(1), pid, jnp.uint32(0), jnp.uint32(1)))
    t_max = jnp.full(4096, jnp.inf)
    h1 = g_nat.intersect(o, d, t_max)
    h2 = g_py.intersect(o, d, t_max)
    assert (np.asarray(h1.hit) == np.asarray(h2.hit)).all()
    m = np.asarray(h1.hit)
    assert np.allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-4)


def _write_ply_binary(path, P, idx, N=None):
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {len(P)}",
               "property float x", "property float y", "property float z"]
        if N is not None:
            hdr += ["property float nx", "property float ny", "property float nz"]
        hdr += [f"element face {len(idx)}",
                "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        for i, p in enumerate(P):
            f.write(struct.pack("<fff", *p))
            if N is not None:
                f.write(struct.pack("<fff", *N[i]))
        for t in idx:
            f.write(struct.pack("<Biii", 3, *t))


def test_ply_loader_binary(tmp_path):
    P = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    N = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    path = str(tmp_path / "quad.ply")
    _write_ply_binary(path, P, idx, N)
    m = native.load_ply(path)
    assert m is not None
    assert np.allclose(m["P"], P)
    assert np.allclose(m["N"], N)
    assert (m["indices"] == idx).all()


def test_ply_loader_ascii_with_quads(tmp_path):
    path = str(tmp_path / "a.ply")
    with open(path, "w") as f:
        f.write("""ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
4 0 1 2 3
""")
    m = native.load_ply(path)
    assert m is not None
    assert m["P"].shape == (4, 3)
    # quad fan-triangulated into 2 tris
    assert (m["indices"] == [[0, 1, 2], [0, 2, 3]]).all()


def test_plymesh_in_scene(tmp_path):
    """Shape plymesh through the parser/builder."""
    P = np.asarray([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    ply = str(tmp_path / "m.ply")
    _write_ply_binary(ply, P, idx)
    scene_txt = f'''
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective" "float fov" [45]
WorldBegin
Material "diffuse" "rgb reflectance" [.5 .5 .5]
Shape "plymesh" "string filename" "{ply}"
'''
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string

    setup = build_render_setup(parse_pbrt_string(scene_txt))
    assert setup.scene.geometry.n_tri == 2
