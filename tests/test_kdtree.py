"""Kd-tree aggregate vs brute force (the reference's KdTreeAggregate,
cpu/aggregates.h:76). The BVH/brute-force closest hit is the oracle."""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.ops.intersect import ray_triangle
from vspg_pbrt_v4_tpu.ops.kdtree import build_kdtree, kdtree_traverse


def _tri_soup(n, rng, spread=4.0, size=0.4):
    c = rng.uniform(-spread, spread, (n, 3))
    a = c + rng.uniform(-size, size, (n, 3))
    b = c + rng.uniform(-size, size, (n, 3))
    d = c + rng.uniform(-size, size, (n, 3))
    return (np.asarray(a, np.float32), np.asarray(b, np.float32),
            np.asarray(d, np.float32))


def _closest_brute(o, d, t_max, p0, p1, p2):
    ht, tt, _, _, _ = ray_triangle(o[:, None, :], d[:, None, :],
                                   t_max[:, None], jnp.asarray(p0),
                                   jnp.asarray(p1), jnp.asarray(p2))
    tt = jnp.where(ht, tt, jnp.inf)
    k = jnp.argmin(tt, -1)
    t = jnp.take_along_axis(tt, k[:, None], -1)[:, 0]
    return jnp.where(jnp.isfinite(t), k, -1), t


def _closest_kd(kd, o, d, t_max, p0, p1, p2):
    p0j, p1j, p2j = jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2)

    def leaf_fn(pid, m, t_best, best_k):
        hit, t, _, _, _ = ray_triangle(o, d, t_best, p0j[pid], p1j[pid],
                                       p2j[pid])
        closer = m & hit
        return jnp.where(closer, t, t_best), jnp.where(closer, pid, best_k)

    t, k = kdtree_traverse(kd, o, d, t_max,
                           leaf_fn, jnp.full(o.shape[0], -1, jnp.int32))
    return k, t


def test_kdtree_matches_brute_force():
    rng = np.random.default_rng(0)
    p0, p1, p2 = _tri_soup(300, rng)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    kd = build_kdtree(lo, hi)
    R = 2048
    o = jnp.asarray(rng.uniform(-6, 6, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t_max = jnp.full(R, jnp.inf)
    kb, tb = _closest_brute(o, d, t_max, p0, p1, p2)
    kk, tk = _closest_kd(kd, o, d, t_max, p0, p1, p2)
    hit_b = np.asarray(kb) >= 0
    hit_k = np.asarray(kk) >= 0
    assert (hit_b == hit_k).all(), (hit_b.sum(), hit_k.sum())
    both = hit_b & hit_k
    assert np.allclose(np.asarray(tb)[both], np.asarray(tk)[both],
                       rtol=1e-4), "closest-hit t mismatch"


def test_kdtree_rays_from_inside():
    rng = np.random.default_rng(1)
    p0, p1, p2 = _tri_soup(150, rng, spread=2.0)
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    kd = build_kdtree(lo, hi)
    R = 1024
    o = jnp.asarray(rng.uniform(-1, 1, (R, 3)), jnp.float32)  # deep inside
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t_max = jnp.full(R, jnp.inf)
    kb, tb = _closest_brute(o, d, t_max, p0, p1, p2)
    kk, tk = _closest_kd(kd, o, d, t_max, p0, p1, p2)
    both = (np.asarray(kb) >= 0) & (np.asarray(kk) >= 0)
    assert ((np.asarray(kb) >= 0) == (np.asarray(kk) >= 0)).all()
    assert np.allclose(np.asarray(tb)[both], np.asarray(tk)[both], rtol=1e-4)


def test_kdtree_flat_prims_on_split_planes():
    """Zero-extent (axis-aligned flat) prims lying exactly on split planes
    must land in at least one child (regression: strict classification lost
    them — 40/80 prims vanished from prim_ids)."""
    rng = np.random.default_rng(2)
    n = 80
    # flat axis-aligned quad-ish triangles: zero extent on a random axis
    p0, p1, p2 = _tri_soup(n, rng, spread=3.0)
    for i in range(n):
        ax = i % 3
        v = p0[i, ax]
        p1[i, ax] = v
        p2[i, ax] = v
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    kd = build_kdtree(lo, hi)
    present = np.unique(np.asarray(kd.prim_ids))
    assert len(present) == n, f"{n - len(present)} prims missing from tree"
    R = 2048
    o = jnp.asarray(rng.uniform(-5, 5, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t_max = jnp.full(R, jnp.inf)
    kb, tb = _closest_brute(o, d, t_max, p0, p1, p2)
    kk, tk = _closest_kd(kd, o, d, t_max, p0, p1, p2)
    assert ((np.asarray(kb) >= 0) == (np.asarray(kk) >= 0)).all()
    both = (np.asarray(kb) >= 0)
    assert np.allclose(np.asarray(tb)[both], np.asarray(tk)[both], rtol=1e-4)


def test_kdtree_large_leaf_fully_tested():
    """Leaves larger than max_leaf (depth cutoff / co-located prims) must
    still test every prim (regression: traversal only unrolled the first
    max_leaf prims of each leaf)."""
    rng = np.random.default_rng(3)
    # co-located cluster => build cannot separate, leaf >> max_leaf
    n = 64
    c = np.zeros((n, 3), np.float32)
    a = c + rng.uniform(-0.01, 0.01, (n, 3)).astype(np.float32)
    b = c + rng.uniform(-0.01, 0.01, (n, 3)).astype(np.float32)
    e = c + rng.uniform(-0.01, 0.01, (n, 3)).astype(np.float32)
    # one far-away triangle that only appears late in its leaf's prim list
    far = np.asarray([[3.0, -0.5, -0.5], [3.0, 0.5, -0.5], [3.0, 0.0, 0.5]],
                     np.float32)
    p0 = np.concatenate([a, far[0:1]])
    p1 = np.concatenate([b, far[1:2]])
    p2 = np.concatenate([e, far[2:3]])
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    kd = build_kdtree(lo, hi, max_leaf=8)
    assert int(np.asarray(kd.count).max()) > 8  # premise: a big leaf exists
    R = 512
    o = jnp.asarray(rng.uniform(-4, 4, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t_max = jnp.full(R, jnp.inf)
    kb, tb = _closest_brute(o, d, t_max, p0, p1, p2)
    kk, tk = _closest_kd(kd, o, d, t_max, p0, p1, p2)
    assert ((np.asarray(kb) >= 0) == (np.asarray(kk) >= 0)).all()
    both = (np.asarray(kb) >= 0)
    assert np.allclose(np.asarray(tb)[both], np.asarray(tk)[both], rtol=1e-4)


def test_kdtree_degenerate_single_prim():
    p0 = np.asarray([[0, 0, 0]], np.float32)
    p1 = np.asarray([[1, 0, 0]], np.float32)
    p2 = np.asarray([[0, 1, 0]], np.float32)
    kd = build_kdtree(p0, np.maximum(p1, p2))
    o = jnp.asarray([[0.2, 0.2, -1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    k, t = _closest_kd(kd, o, d, jnp.full(1, jnp.inf), p0, p1, p2)
    assert int(k[0]) == 0 and abs(float(t[0]) - 1.0) < 1e-5


def test_kdtree_wired_as_scene_accelerator():
    """`Accelerator "kdtree"` flows parser -> builder -> Geometry.build
    and the kd-tree serves Geometry.intersect / intersect_p: the render
    aggregate matches the brute-force oracle (cpu/aggregates.h:76
    KdTreeAggregate, wired per round-4 verdict task 7)."""
    from vspg_pbrt_v4_tpu.models.shapes import Geometry
    from vspg_pbrt_v4_tpu.ops.kdtree import KdTree
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string

    rng = np.random.default_rng(5)
    p0, p1, p2 = _tri_soup(90, rng)
    tris = "\n".join(
        f'Shape "trianglemesh" "point3 P" [{a[0]} {a[1]} {a[2]} '
        f'{b[0]} {b[1]} {b[2]} {c[0]} {c[1]} {c[2]}] '
        '"integer indices" [0 1 2]'
        for a, b, c in zip(p0, p1, p2))
    scene_txt = ('Film "rgb" "integer xresolution" [8] '
                 '"integer yresolution" [8]\n'
                 'Camera "perspective" "float fov" [45]\n'
                 'Accelerator "kdtree"\n'
                 'WorldBegin\nMaterial "diffuse"\n' + tris)
    setup = build_render_setup(parse_pbrt_string(scene_txt))
    g = setup.scene.geometry
    assert isinstance(g.tri_bvh, KdTree)
    # same geometry, brute force (no accelerator) as oracle
    g_brute = g._replace(tri_bvh=None)
    R = 256
    o = jnp.asarray(rng.uniform(-4, 4, (R, 3)), jnp.float32)
    d = rng.normal(size=(R, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    t_max = jnp.full(R, jnp.inf)
    ha = g.intersect(o, d, t_max)
    hb = g_brute.intersect(o, d, t_max)
    assert (np.asarray(ha.hit) == np.asarray(hb.hit)).all()
    m = np.asarray(ha.hit)
    assert np.allclose(np.asarray(ha.t)[m], np.asarray(hb.t)[m], rtol=1e-4)
    assert (np.asarray(ha.prim_id)[m] == np.asarray(hb.prim_id)[m]).all()
    oa = np.asarray(g.intersect_p(o, d, t_max * 0 + 100.0))
    ob = np.asarray(g_brute.intersect_p(o, d, t_max * 0 + 100.0))
    assert (oa == ob).all()
