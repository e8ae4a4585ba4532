"""BVH build + traversal vs brute force (the correctness oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.ops.bvh import build_bvh
from vspg_pbrt_v4_tpu.utils import rng, sampling


def _random_tris(n, seed=0, spread=3.0):
    r = np.random.default_rng(seed)
    c = r.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = r.normal(0, 0.3, (n, 3)).astype(np.float32)
    e2 = r.normal(0, 0.3, (n, 3)).astype(np.float32)
    return [dict(p0=c[i], p1=c[i] + e1[i], p2=c[i] + e2[i], mat=i % 3,
                 light=-1, med_in=-1, med_out=-1) for i in range(n)]


def _random_rays(n, seed=1):
    pid = jnp.arange(n, dtype=jnp.uint32)
    o = (rng.uniform3(jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(0))
         - 0.5) * 12.0
    d = sampling.sample_uniform_sphere(
        rng.uniform2(jnp.uint32(seed), pid, jnp.uint32(0), jnp.uint32(1)))
    return o, d


def test_bvh_build_structure():
    tris = _random_tris(200)
    lo = np.stack([np.minimum(np.minimum(t["p0"], t["p1"]), t["p2"]) for t in tris])
    hi = np.stack([np.maximum(np.maximum(t["p0"], t["p1"]), t["p2"]) for t in tris])
    bvh = build_bvh(lo, hi)
    assert bvh.prim_ids.shape[0] == 200
    assert sorted(np.asarray(bvh.prim_ids).tolist()) == list(range(200))
    # every leaf count <= max_leaf, interior nodes have right > node index
    counts = np.asarray(bvh.count)
    rights = np.asarray(bvh.right)
    assert (counts <= 4).all()
    interior = counts == 0
    idx = np.arange(len(counts))
    assert (rights[interior] > idx[interior]).all()


def test_bvh_matches_brute_force_closest():
    tris = _random_tris(300, seed=3)
    g_bvh = Geometry.build(triangles=tris, use_bvh=True)
    g_brute = Geometry.build(triangles=tris, use_bvh=False)
    assert g_bvh.tri_bvh is not None and g_brute.tri_bvh is None
    o, d = _random_rays(2048)
    t_max = jnp.full(2048, jnp.inf)
    h1 = g_bvh.intersect(o, d, t_max)
    h2 = g_brute.intersect(o, d, t_max)
    hit1, hit2 = np.asarray(h1.hit), np.asarray(h2.hit)
    assert (hit1 == hit2).all(), (hit1.sum(), hit2.sum())
    assert hit1.sum() > 50  # scene dense enough to be a real test
    m = hit1
    assert np.allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-4)
    assert (np.asarray(h1.prim_id)[m] == np.asarray(h2.prim_id)[m]).mean() > 0.99
    assert (np.asarray(h1.mat_id)[m] == np.asarray(h2.mat_id)[m]).all()


def test_bvh_matches_brute_force_occlusion():
    tris = _random_tris(300, seed=5)
    g_bvh = Geometry.build(triangles=tris, use_bvh=True)
    g_brute = Geometry.build(triangles=tris, use_bvh=False)
    o, d = _random_rays(2048, seed=7)
    t_max = jnp.full(2048, 4.0)
    o1 = np.asarray(g_bvh.intersect_p(o, d, t_max))
    o2 = np.asarray(g_brute.intersect_p(o, d, t_max))
    assert (o1 == o2).all()
    assert o1.sum() > 20


@pytest.mark.slow
def test_bvh_render_matches_brute_force():
    """Cornell render identical through BVH and brute force (same RNG)."""
    import os

    from vspg_pbrt_v4_tpu.models.integrators import volpath
    from vspg_pbrt_v4_tpu.scene import build_render_setup
    from vspg_pbrt_v4_tpu.scene.parser import parse_pbrt_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = parse_pbrt_file(os.path.join(repo, "scenes/cornell.pbrt"))
    setup = build_render_setup(ds, spp_override=4, res_override=(24, 24))
    g = setup.scene.geometry
    tris = [dict(p0=np.asarray(g.tri_p0[i]), p1=np.asarray(g.tri_p1[i]),
                 p2=np.asarray(g.tri_p2[i]), mat=int(g.tri_mat[i]),
                 light=int(g.tri_light[i]), med_in=int(g.tri_med_in[i]),
                 med_out=int(g.tri_med_out[i])) for i in range(g.n_tri)]
    sph = [dict(c=np.asarray(g.sph_c[i]), r=float(g.sph_r[i]),
                mat=int(g.sph_mat[i]), light=int(g.sph_light[i]),
                med_in=int(g.sph_med_in[i]), med_out=int(g.sph_med_out[i]))
           for i in range(g.n_sph)]
    g1 = Geometry.build(triangles=tris, spheres=sph, use_bvh=True)
    g2 = Geometry.build(triangles=tris, spheres=sph, use_bvh=False)
    s1 = setup.scene._replace(geometry=g1)
    s2 = setup.scene._replace(geometry=g2)
    cfg = volpath.VolPathConfig(max_depth=5)
    i1 = np.asarray(volpath.render(s1, setup.camera, setup.film, spp=4,
                                   cfg=cfg, seed=3, spp_per_pass=4))
    i2 = np.asarray(volpath.render(s2, setup.camera, setup.film, spp=4,
                                   cfg=cfg, seed=3, spp_per_pass=4))
    assert np.allclose(i1, i2, atol=1e-4), np.abs(i1 - i2).max()


def test_hlbvh_matches_brute_force():
    """HLBVH (Morton/LBVH build) traverses to the same closest hits as
    brute force; shares bvh_traverse with the SAH build."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.ops.bvh import build_hlbvh, bvh_traverse
    from vspg_pbrt_v4_tpu.ops.intersect import ray_triangle

    rng = np.random.default_rng(7)
    n = 200
    c = rng.uniform(-3, 3, (n, 3))
    p0 = (c + rng.uniform(-0.3, 0.3, (n, 3))).astype(np.float32)
    p1 = (c + rng.uniform(-0.3, 0.3, (n, 3))).astype(np.float32)
    p2 = (c + rng.uniform(-0.3, 0.3, (n, 3))).astype(np.float32)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    bvh = build_hlbvh(lo, hi)
    R = 1024
    o = jnp.asarray(rng.uniform(-5, 5, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    p0j, p1j, p2j = jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2)

    def leaf_fn(pid, m, t_best, best):
        hit, t, _, _, _ = ray_triangle(o, d, t_best, p0j[pid], p1j[pid],
                                       p2j[pid])
        closer = m & hit
        return jnp.where(closer, t, t_best), jnp.where(closer, pid, best)

    t_h, k_h = bvh_traverse(bvh, o, d, jnp.full(R, jnp.inf), leaf_fn,
                            jnp.full(R, -1, jnp.int32))
    # brute force oracle
    ht, tt, _, _, _ = ray_triangle(o[:, None, :], d[:, None, :],
                                   jnp.full((R, 1), jnp.inf), p0j, p1j, p2j)
    tt = jnp.where(ht, tt, jnp.inf)
    t_b = jnp.min(tt, -1)
    hit_b = np.isfinite(np.asarray(t_b))
    hit_h = np.asarray(k_h) >= 0
    assert (hit_b == hit_h).all()
    assert np.allclose(np.asarray(t_h)[hit_b], np.asarray(t_b)[hit_b],
                       rtol=1e-4)


@pytest.mark.slow
def test_hlbvh_colocated_centroids_leaf_cap():
    """Primitives with identical quantized centroids exhaust the Morton bits;
    the build must median-split instead of emitting a leaf larger than the
    traversal unroll (regression: extra prims were silently never tested)."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.ops.bvh import build_hlbvh, bvh_traverse
    from vspg_pbrt_v4_tpu.ops.intersect import ray_triangle

    rng = np.random.default_rng(11)
    n = 32
    # all centroids at the origin => identical Morton codes
    half = rng.uniform(0.2, 0.5, (n, 3)).astype(np.float32)
    p0 = -half
    p1 = np.stack([half[:, 0], -half[:, 1], -half[:, 2]], -1)
    p2 = np.stack([-half[:, 0], half[:, 1], half[:, 2]], -1)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    bvh = build_hlbvh(lo, hi, max_leaf=4)
    assert int(np.asarray(bvh.count).max()) <= 4
    R = 512
    o = jnp.asarray(rng.uniform(-2, 2, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    p0j, p1j, p2j = jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2)

    def leaf_fn(pid, m, t_best, best):
        hit, t, _, _, _ = ray_triangle(o, d, t_best, p0j[pid], p1j[pid],
                                       p2j[pid])
        closer = m & hit
        return jnp.where(closer, t, t_best), jnp.where(closer, pid, best)

    t_h, k_h = bvh_traverse(bvh, o, d, jnp.full(R, jnp.inf), leaf_fn,
                            jnp.full(R, -1, jnp.int32))
    ht, tt, _, _, _ = ray_triangle(o[:, None, :], d[:, None, :],
                                   jnp.full((R, 1), jnp.inf), p0j, p1j, p2j)
    tt = jnp.where(ht, tt, jnp.inf)
    t_b = jnp.min(tt, -1)
    hit_b = np.isfinite(np.asarray(t_b))
    assert (hit_b == (np.asarray(k_h) >= 0)).all()
    assert np.allclose(np.asarray(t_h)[hit_b], np.asarray(t_b)[hit_b],
                       rtol=1e-4)
