"""Pallas intersection kernel vs jnp brute force (interpret mode on CPU;
the same kernel compiles for TPU — SURVEY.md §4 cross-backend idiom)."""

import jax.numpy as jnp
import numpy as np

from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.ops.pallas_intersect import intersect_tris_pallas
from vspg_pbrt_v4_tpu.utils import rng, sampling


def _scene_and_rays(n_tri=300, n_rays=512, seed=0):
    r = np.random.default_rng(seed)
    c = r.uniform(-3, 3, (n_tri, 3)).astype(np.float32)
    e1 = r.normal(0, 0.4, (n_tri, 3)).astype(np.float32)
    e2 = r.normal(0, 0.4, (n_tri, 3)).astype(np.float32)
    p0, p1, p2 = c, c + e1, c + e2
    pid = jnp.arange(n_rays, dtype=jnp.uint32)
    o = (rng.uniform3(jnp.uint32(seed + 1), pid, jnp.uint32(0), jnp.uint32(0))
         - 0.5) * 12.0
    d = sampling.sample_uniform_sphere(
        rng.uniform2(jnp.uint32(seed + 1), pid, jnp.uint32(0), jnp.uint32(1)))
    return (jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2)), (o, d)


def test_pallas_matches_brute_force():
    (p0, p1, p2), (o, d) = _scene_and_rays()
    t, idx, b0, b1 = intersect_tris_pallas(o, d, p0, p1, p2, interpret=True)

    tris = [dict(p0=np.asarray(p0[i]), p1=np.asarray(p1[i]),
                 p2=np.asarray(p2[i]), mat=0, light=-1, med_in=-1, med_out=-1)
            for i in range(p0.shape[0])]
    g = Geometry.build(triangles=tris, use_bvh=False)
    h = g.intersect(o, d, jnp.full(o.shape[0], jnp.inf))

    hit_p = np.asarray(idx) >= 0
    hit_b = np.asarray(h.hit)
    assert (hit_p == hit_b).all(), (hit_p.sum(), hit_b.sum())
    assert hit_p.sum() > 25
    m = hit_p
    assert np.allclose(np.asarray(t)[m], np.asarray(h.t)[m], rtol=1e-4)
    agree = (np.asarray(idx)[m] == np.asarray(h.prim_id)[m])
    assert agree.mean() > 0.99  # coplanar ties may differ


def test_pallas_ray_padding():
    """Non-multiple-of-tile ray/tri counts behave identically."""
    (p0, p1, p2), (o, d) = _scene_and_rays(n_tri=77, n_rays=131, seed=3)
    t, idx, b0, b1 = intersect_tris_pallas(o, d, p0, p1, p2, interpret=True)
    assert t.shape == (131,)
    # padded tri ids never leak
    assert np.asarray(idx).max() < 77
