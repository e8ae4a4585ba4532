"""Vectorized mesh-bundle path: array bundles must produce the same
Geometry as the per-triangle dict path (and build in array time)."""

import time

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models.shapes import Geometry


def _mesh(n=50, seed=0):
    rng = np.random.default_rng(seed)
    P = rng.uniform(-2, 2, (n + 2, 3)).astype(np.float32)
    idx = np.stack([np.arange(n), np.arange(n) + 1, np.arange(n) + 2],
                   axis=1).astype(np.int32)
    N = rng.normal(size=(n + 2, 3)).astype(np.float32)
    N /= np.linalg.norm(N, axis=1, keepdims=True)
    UV = rng.uniform(0, 1, (n + 2, 2)).astype(np.float32)
    return P, idx, N, UV


def test_bundle_matches_dict_path():
    P, idx, N, UV = _mesh()
    tris = [dict(p0=P[a], p1=P[b], p2=P[c], n0=N[a], n1=N[b], n2=N[c],
                 uv0=UV[a], uv1=UV[b], uv2=UV[c], mat=3, med_in=1,
                 med_out=2) for a, b, c in idx]
    bund = dict(p0=P[idx[:, 0]], p1=P[idx[:, 1]], p2=P[idx[:, 2]],
                n0=N[idx[:, 0]], n1=N[idx[:, 1]], n2=N[idx[:, 2]],
                uv0=UV[idx[:, 0]], uv1=UV[idx[:, 1]], uv2=UV[idx[:, 2]],
                mat=3, med_in=1, med_out=2)
    g1 = Geometry.build(triangles=tris, use_bvh=False)
    g2 = Geometry.build(tri_meshes=[bund], use_bvh=False)
    for f in ("tri_p0", "tri_p1", "tri_p2", "tri_n0", "tri_n1", "tri_n2",
              "tri_uv0", "tri_uv1", "tri_uv2", "tri_mat", "tri_light",
              "tri_med_in", "tri_med_out"):
        np.testing.assert_array_equal(np.asarray(getattr(g1, f)),
                                      np.asarray(getattr(g2, f)), err_msg=f)


def test_bundle_concats_after_dict_triangles():
    P, idx, N, UV = _mesh(10, seed=1)
    tris = [dict(p0=(0, 0, 0), p1=(1, 0, 0), p2=(0, 1, 0), mat=0)]
    bund = dict(p0=P[idx[:, 0]], p1=P[idx[:, 1]], p2=P[idx[:, 2]], mat=1)
    g = Geometry.build(triangles=tris, tri_meshes=[bund], use_bvh=False)
    assert g.n_tri == 11
    assert int(g.tri_mat[0]) == 0 and int(g.tri_mat[5]) == 1
    # default shading normals of the bundle = geometric normals
    e1 = np.asarray(g.tri_p1[1:]) - np.asarray(g.tri_p0[1:])
    e2 = np.asarray(g.tri_p2[1:]) - np.asarray(g.tri_p0[1:])
    ng = np.cross(e1, e2)
    ng /= np.linalg.norm(ng, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(g.tri_n0[1:]), ng, atol=1e-6)
    # per-corner uv defaults map to barycentrics
    np.testing.assert_allclose(np.asarray(g.tri_uv0[1:]),
                               np.tile([[1, 0]], (10, 1)), atol=0)


def test_bundle_build_is_array_speed():
    """100k triangles through the bundle path must build in array time —
    no per-triangle Python loop (bound is generous for loaded CI boxes;
    the dict path takes ~10x longer and scales linearly in interpreter
    work)."""
    rng = np.random.default_rng(2)
    T = 100_000
    P0 = rng.uniform(-10, 10, (T, 3)).astype(np.float32)
    bund = dict(p0=P0, p1=P0 + (0.01, 0, 0), p2=P0 + (0, 0.01, 0), mat=0)
    t0 = time.perf_counter()
    g = Geometry.build(tri_meshes=[bund], use_bvh=False)
    dt = time.perf_counter() - t0
    assert g.n_tri == T
    assert dt < 8.0, f"bundle build took {dt:.2f}s"


def test_parser_plymesh_uses_bundles(tmp_path):
    """plymesh without an area light goes through the vectorized path and
    still renders/intersects."""
    from vspg_pbrt_v4_tpu.scene import builder, parse_pbrt_string
    from vspg_pbrt_v4_tpu.tools import plytool

    P = np.array([[-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0]],
                 np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    ply = tmp_path / "quad.ply"
    plytool.write_ply(str(ply), P, idx)
    txt = f"""
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
LightSource "infinite" "rgb L" [1 1 1]
Material "diffuse" "rgb reflectance" [0.5 0.5 0.5]
Shape "plymesh" "string filename" ["{ply}"]
"""
    setup = builder.build_render_setup(parse_pbrt_string(txt))
    g = setup.scene.geometry
    assert g.n_tri == 2
    h = g.intersect(jnp.asarray([[0.0, 0, -4]]), jnp.asarray([[0.0, 0, 1]]),
                    jnp.full((1,), 1e9))
    assert bool(h.hit[0]) and abs(float(h.t[0]) - 4.0) < 1e-3
