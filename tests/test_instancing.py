"""Two-level (TLAS/BLAS) instancing tests.

The instanced path (models/shapes.py Instances + ops/bvh.py
two_level_traverse) must agree with the brute-force oracle: the same
geometry flattened to world space (the reference's TransformedPrimitive,
cpu/primitive.h:83, vs baking — both must produce identical hits).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.shapes import Geometry, Instances


def _icosahedron():
    """12-vertex icosahedron triangle soup around the origin (radius ~1)."""
    phi = (1 + np.sqrt(5)) / 2
    v = np.array([
        [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
        [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
        [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
    ], np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], np.int32)
    return v, f


def _xf(translate=(0, 0, 0), scale=1.0, rot_y=0.0):
    c, s = np.cos(rot_y), np.sin(rot_y)
    m = np.eye(4)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]) * scale
    m[:3, 3] = translate
    return m


def _make_pair(mats=(0, 1)):
    """Returns (instanced geometry, flattened oracle geometry)."""
    v, f = _icosahedron()
    tris = [dict(p0=v[a], p1=v[b], p2=v[c], mat=mats[0],
                 n0=v[a], n1=v[b], n2=v[c])
            for a, b, c in f]
    # second object: a quad (two triangles) with the other material
    quad = [dict(p0=(-1, 0, -1), p1=(1, 0, -1), p2=(1, 0, 1), mat=mats[1]),
            dict(p0=(-1, 0, -1), p1=(1, 0, 1), p2=(-1, 0, 1), mat=mats[1])]
    xfs = [
        (0, _xf((0, 0, 0), 1.0, 0.0)),
        (0, _xf((2.5, 0.5, 0), 0.7, 0.9)),
        (0, _xf((-2, -0.5, 1), 1.4, 2.1)),
        (1, _xf((0, -1.5, 0), 3.0, 0.0)),
        (1, _xf((0, 2.0, 0), 2.0, 0.4)),
    ]
    geo_inst = Geometry.build(instanced=dict(
        objects=[tris, quad],
        instances=[dict(obj=oi, o2w=m) for oi, m in xfs]))

    flat_tris = []
    for oi, m in xfs:
        src = [tris, quad][oi]
        lin, t = m[:3, :3], m[:3, 3]
        nrm = np.linalg.inv(lin).T
        for tri in src:
            fl = dict(
                p0=np.asarray(tri["p0"]) @ lin.T + t,
                p1=np.asarray(tri["p1"]) @ lin.T + t,
                p2=np.asarray(tri["p2"]) @ lin.T + t,
                mat=tri["mat"])
            if "n0" in tri:
                for k in ("n0", "n1", "n2"):
                    n = np.asarray(tri[k]) @ nrm.T
                    fl[k] = n / np.linalg.norm(n)
            flat_tris.append(fl)
    geo_flat = Geometry.build(triangles=flat_tris, use_bvh=False)
    return geo_inst, geo_flat


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    # aim at jittered points near the scene center for a decent hit rate
    target = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_instanced_matches_flattened_closest_hit():
    geo_inst, geo_flat = _make_pair()
    o, d = _rays(512)
    t_max = jnp.full((512,), 1e9)
    hi = geo_inst.intersect(o, d, t_max)
    hf = geo_flat.intersect(o, d, t_max)
    assert bool(jnp.all(hi.hit == hf.hit))
    m = np.asarray(hi.hit)
    assert m.mean() > 0.2  # the rays actually hit things
    np.testing.assert_allclose(
        np.asarray(hi.t)[m], np.asarray(hf.t)[m], rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(hi.mat_id)[m], np.asarray(hf.mat_id)[m])
    # geometric normals agree up to sign-free direction
    dotn = np.abs(np.sum(np.asarray(hi.n)[m] * np.asarray(hf.n)[m], -1))
    assert dotn.min() > 0.999
    # shading normals (vertex normals transformed by inverse transpose)
    dots = np.abs(np.sum(np.asarray(hi.ns)[m] * np.asarray(hf.ns)[m], -1))
    assert dots.min() > 0.995
    np.testing.assert_allclose(
        np.asarray(hi.p)[m], np.asarray(hf.p)[m], rtol=1e-3, atol=1e-3)


def test_instanced_matches_flattened_occlusion():
    geo_inst, geo_flat = _make_pair()
    o, d = _rays(512, seed=3)
    t_max = jnp.full((512,), 6.0)
    oi = np.asarray(geo_inst.intersect_p(o, d, t_max))
    of = np.asarray(geo_flat.intersect_p(o, d, t_max))
    assert oi.mean() > 0.1
    np.testing.assert_array_equal(oi, of)


def test_instanced_memory_is_shared():
    """1000 instances of one mesh must not duplicate the vertex arrays."""
    v, f = _icosahedron()
    tris = [dict(p0=v[a], p1=v[b], p2=v[c], mat=0) for a, b, c in f]
    rng = np.random.default_rng(7)
    insts = [dict(obj=0, o2w=_xf(rng.uniform(-50, 50, 3),
                                 rng.uniform(0.5, 2.0),
                                 rng.uniform(0, 6.28)))
             for _ in range(1000)]
    geo = Geometry.build(instanced=dict(objects=[tris], instances=insts))
    assert geo.inst.n_tri == len(tris)  # not len(tris) * 1000
    assert geo.inst.n_inst == 1000
    o, d = _rays(64, seed=5)
    h = geo.inst and geo.intersect(o, d, jnp.full((64,), 1e9))
    assert bool(jnp.any(h.hit))


@pytest.mark.slow
def test_instances_mix_with_plain_geometry():
    """Instanced meshes coexist with regular (non-instanced) primitives;
    the closest of the two wins."""
    v, f = _icosahedron()
    tris = [dict(p0=v[a], p1=v[b], p2=v[c], mat=1) for a, b, c in f]
    geo = Geometry.build(
        spheres=[dict(c=(0, 0, 2.0), r=0.5, mat=0)],
        instanced=dict(objects=[tris],
                       instances=[dict(obj=0, o2w=_xf((0, 0, 5.0)))]))
    o = jnp.asarray([[0, 0, 0.0]] * 2)
    d = jnp.asarray([[0, 0, 1.0], [0, 0, -1.0]])
    h = geo.intersect(o, d, jnp.full((2,), 1e9))
    assert bool(h.hit[0]) and int(h.mat_id[0]) == 0  # sphere in front
    assert not bool(h.hit[1])
    # from behind the sphere the instance is hit
    o2 = jnp.asarray([[0, 0, 3.0]])
    d2 = jnp.asarray([[0, 0, 1.0]])
    h2 = geo.intersect(o2, d2, jnp.full((1,), 1e9))
    assert bool(h2.hit[0]) and int(h2.mat_id[0]) == 1


@pytest.mark.slow
def test_parser_trianglemesh_instances(tmp_path):
    """ObjectInstance of a trianglemesh object goes through the TLAS/BLAS
    path (geometry NOT duplicated), and the scene renders."""
    scene_file = tmp_path / "inst_tri.pbrt"
    scene_file.write_text("""
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
LookAt 0 0 -6  0 0 0  0 1 0
Camera "perspective" "float fov" [45]
WorldBegin
LightSource "infinite" "rgb L" [0.5 0.5 0.5]
ObjectBegin "quad"
  Material "diffuse" "rgb reflectance" [0.8 0.2 0.2]
  Shape "trianglemesh" "point3 P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
        "integer indices" [0 1 2  0 2 3]
ObjectEnd
ObjectInstance "quad"
AttributeBegin
  Translate -2.5 0 0
  Scale 0.5 0.5 0.5
  ObjectInstance "quad"
AttributeEnd
AttributeBegin
  Translate 2.5 0 0
  Rotate 30 0 1 0
  ObjectInstance "quad"
AttributeEnd
""")
    from vspg_pbrt_v4_tpu.scene import builder
    from vspg_pbrt_v4_tpu.scene.parser import parse_pbrt_file

    setup = builder.build_render_setup(parse_pbrt_file(str(scene_file)))
    g = setup.scene.geometry
    assert g.n_tri == 0  # nothing flattened
    assert g.inst is not None
    assert g.inst.n_tri == 2  # stored once
    assert g.inst.n_inst == 3
    # camera rays at the center hit the front instance
    o = jnp.asarray([[0.0, 0.0, -6.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = g.intersect(o, d, jnp.full((1,), 1e9))
    assert bool(h.hit[0]) and abs(float(h.t[0]) - 6.0) < 1e-3
    # and the whole scene renders finite through the API
    from vspg_pbrt_v4_tpu.models.integrators import volpath

    img = np.asarray(volpath.render(setup.scene, setup.camera, setup.film,
                                    spp=4, seed=1))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


@pytest.mark.parametrize("seed", [11, 12])
def test_two_level_traverse_deep_stack(seed):
    """Many overlapping instances exercise TLAS->BLAS stack switching."""
    v, f = _icosahedron()
    tris = [dict(p0=v[a], p1=v[b], p2=v[c], mat=0) for a, b, c in f]
    rng = np.random.default_rng(seed)
    xfs = [(0, _xf(rng.uniform(-1, 1, 3), rng.uniform(0.3, 1.5),
                   rng.uniform(0, 6.28))) for _ in range(24)]
    geo_inst = Geometry.build(instanced=dict(
        objects=[tris], instances=[dict(obj=oi, o2w=m) for oi, m in xfs]))
    flat = []
    for oi, m in xfs:
        lin, t = m[:3, :3], m[:3, 3]
        for tri in tris:
            flat.append(dict(p0=np.asarray(tri["p0"]) @ lin.T + t,
                             p1=np.asarray(tri["p1"]) @ lin.T + t,
                             p2=np.asarray(tri["p2"]) @ lin.T + t, mat=0))
    geo_flat = Geometry.build(triangles=flat, use_bvh=False)
    o, d = _rays(256, seed=seed)
    t_max = jnp.full((256,), 1e9)
    hi = geo_inst.intersect(o, d, t_max)
    hf = geo_flat.intersect(o, d, t_max)
    assert bool(jnp.all(hi.hit == hf.hit))
    m = np.asarray(hi.hit)
    np.testing.assert_allclose(
        np.asarray(hi.t)[m], np.asarray(hf.t)[m], rtol=3e-4, atol=3e-4)
