"""BVH light sampler tests.

The MIS-critical invariant: the pmf returned by sample() must equal the
pmf computed by the bit-trail replay (bvh_pmf) — any mismatch biases the
balance heuristic at emissive hits. Plus a render-level cross-check vs the
power sampler (reference validates BVH sampling only through renders too;
lightsamplers_test.cpp checks pmf/sample consistency the same way).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.lightsamplers import bvh_pmf, bvh_select
from vspg_pbrt_v4_tpu.models.materials import Materials
from vspg_pbrt_v4_tpu.models.media import Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr


def _many_lights(sampler):
    rng = np.random.default_rng(3)
    pts = rng.uniform(-5, 5, (6, 3)).astype(np.float32)
    Is = rng.uniform(0.2, 4.0, (6, 3)).astype(np.float32)
    tris = []
    for k in range(4):
        c = rng.uniform(-5, 5, 3)
        e1 = rng.uniform(-0.5, 0.5, 3)
        e2 = rng.uniform(-0.5, 0.5, 3)
        tris.append(dict(p0=c, p1=c + e1, p2=c + e2,
                         L=rng.uniform(0.5, 8.0, 3)))
    return Lights.make(point_p=pts, point_I=Is, area_tris=tris,
                       env_L=[0.05, 0.05, 0.05], world_radius=50.0,
                       sampler=sampler)


def test_bvh_select_pmf_consistency():
    """Empirical selection frequency == bit-trail pmf, per light."""
    lights = _many_lights("bvh")
    assert lights.bvh is not None
    N = 200_000
    rng = np.random.default_rng(11)
    p = jnp.tile(jnp.asarray([[1.0, -0.5, 2.0]], jnp.float32), (N, 1))
    u = jnp.asarray(rng.random(N, np.float32))
    idx, pmf, _ = bvh_select(lights.bvh, p, u)
    idx = np.asarray(idx)
    pmf = np.asarray(pmf)
    assert (pmf > 0).all()
    # pmf must be constant per light at a fixed query point
    one_p = jnp.asarray([[1.0, -0.5, 2.0]], jnp.float32)
    for light in np.unique(idx):
        freq = (idx == light).mean()
        ref = float(bvh_pmf(lights.bvh, one_p,
                            jnp.asarray([light], jnp.int32))[0])
        got = pmf[idx == light]
        assert np.allclose(got, ref, rtol=1e-4), (light, got[:3], ref)
        assert abs(freq - ref) < 4.0 * np.sqrt(ref * (1 - ref) / N) + 1e-4, (
            light, freq, ref)


def test_bvh_pmf_sums_to_one():
    """Sum of bvh_pmf over all finite lights == 1 from any query point."""
    lights = _many_lights("bvh")
    pts = jnp.asarray([[0.0, 0.0, 0.0], [4.0, 4.0, -4.0], [-6.0, 1.0, 2.0]],
                      jnp.float32)
    total = np.zeros(3)
    n_finite = lights.n_point + lights.n_area
    globals_ = list(range(lights.n_point)) + [
        lights.n_point + lights.n_spot + lights.n_distant + k
        for k in range(lights.n_area)]
    assert len(globals_) == n_finite
    for g in globals_:
        total += np.asarray(bvh_pmf(lights.bvh, pts,
                                    jnp.full((3,), g, jnp.int32)))
    assert np.allclose(total, 1.0, atol=1e-4), total


@pytest.mark.slow
def test_bvh_render_matches_power():
    """Diffuse box lit by several area+point lights: BVH and power sampler
    renders agree (MIS with position-dependent selection pmf is exact)."""
    rng = np.random.default_rng(5)
    tris = []
    # floor quad (two triangles), diffuse
    tris += [
        dict(p0=(-2, -1, -2), p1=(2, -1, -2), p2=(2, -1, 2), mat=0, light=-1),
        dict(p0=(-2, -1, -2), p1=(2, -1, 2), p2=(-2, -1, 2), mat=0, light=-1),
    ]
    area_lights = []
    for k in range(3):
        c = np.array([rng.uniform(-1.5, 1.5), 1.2, rng.uniform(-1.5, 1.5)])
        e1 = np.array([0.4, 0.0, 0.0])
        e2 = np.array([0.0, 0.0, 0.4])
        L = rng.uniform(2.0, 12.0, 3)
        area_lights.append(dict(p0=c, p1=c + e1, p2=c + e2, L=L))
        tris.append(dict(p0=c, p1=c + e1, p2=c + e2, mat=-1, light=k))
    pts = np.array([[1.0, 0.5, 1.0], [-1.0, 0.8, -0.5]], np.float32)
    Is = np.array([[3.0, 1.0, 0.5], [0.5, 2.0, 3.0]], np.float32)

    geom = Geometry.build(triangles=tris)
    mats = Materials.build([dict(albedo=(0.7, 0.6, 0.5))])  # default diffuse
    imgs = {}
    for sampler in ("power", "bvh"):
        lights = Lights.make(point_p=pts, point_I=Is, area_tris=area_lights,
                             world_radius=20.0, sampler=sampler)
        scene = volpath.Scene(geom, mats, Media.make(), lights)
        cam = PerspectiveCamera.make(
            tr.look_at((0, 1.5, -5), (0, 0, 0), (0, 1, 0)), fov_deg=40.0,
            resolution=(24, 24))
        img = volpath.render(scene, cam, RGBFilm.make((24, 24)), spp=96,
                             cfg=volpath.VolPathConfig(max_depth=4),
                             seed=9, spp_per_pass=8)
        imgs[sampler] = np.asarray(img)
    a, b = imgs["power"], imgs["bvh"]
    assert np.isfinite(b).all()
    rel = abs(a.mean() - b.mean()) / a.mean()
    assert rel < 0.03, (a.mean(), b.mean(), rel)
