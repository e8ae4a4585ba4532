"""Teaser-class fused megakernel: triangles (diffuse / smooth dielectric /
smooth conductor) inside a heterogeneous grid medium, traced end-to-end in
ONE Pallas kernel (ops/pallas_volpath grid kernel + SMEM triangle sweep).

The reference serves this scene class through its wavefront queue stages
(wavefront/integrator.cpp:374-432 IntersectClosest -> SampleMediumInteraction
-> EvaluateMaterialsAndBSDFs -> TraceShadowRays); here the same generality
is a per-lane state machine. Validation: cross-estimator agreement with the
general jnp wavefront path (the fake-backend idiom, SURVEY.md §4).
"""

import numpy as np
import pytest

import vspg_pbrt_v4_tpu.ops.pallas_volpath as pv
from vspg_pbrt_v4_tpu.models import materials as M
from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
from vspg_pbrt_v4_tpu.models.film import RGBFilm
from vspg_pbrt_v4_tpu.models.integrators import volpath
from vspg_pbrt_v4_tpu.models.lights import Lights
from vspg_pbrt_v4_tpu.models.media import GridMedium, Media
from vspg_pbrt_v4_tpu.models.shapes import Geometry
from vspg_pbrt_v4_tpu.utils import transform as tr

pytestmark = pytest.mark.slow


def cube_tris(c, h, mat, med_in=-1, med_out=0):
    cx, cy, cz = c
    v = {}
    for i in range(8):
        v[i] = (cx + (h if i & 1 else -h), cy + (h if i & 2 else -h),
                cz + (h if i & 4 else -h))
    faces = [(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5), (0, 4, 5),
             (0, 5, 1), (2, 3, 7), (2, 7, 6), (0, 2, 6), (0, 6, 4),
             (1, 5, 7), (1, 7, 3)]
    return [dict(p0=v[a], p1=v[b], p2=v[cc], mat=mat, light=-1,
                 med_in=med_in, med_out=med_out) for (a, b, cc) in faces]


def _teaser_scene(n=16):
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0,
                   1).astype(np.float32) * 2.0
    gm = GridMedium.make(dens, [0.05] * 3, [1.0] * 3, (-1, -1, -1),
                         (1, 1, 1), g=0.3, maj_res=8)
    tris = (cube_tris((0.25, -0.1, 0.0), 0.28, mat=1)
            + cube_tris((-0.45, 0.1, 0.2), 0.2, mat=0)
            + cube_tris((0.0, 0.55, -0.3), 0.15, mat=2))
    mats = M.Materials.build([
        dict(type=M.DIFFUSE, albedo=(0.7, 0.4, 0.2)),
        dict(type=M.DIELECTRIC, eta=1.5, roughness=0.0),
        dict(type=M.CONDUCTOR, albedo=(0.9, 0.7, 0.4), roughness=0.0),
    ])
    geom = Geometry.build(
        triangles=tris,
        boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1), mat=-1, light=-1,
                    med_in=0, med_out=-1)])
    lights = Lights.make(point_p=[(0.0, 1.8, 0.0)], point_I=[(6.0,) * 3],
                         env_L=[0.3, 0.35, 0.4], world_radius=100.0)
    scene = volpath.Scene(geom, mats, Media.make(grids=(gm,)), lights)
    camera = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (32, 32))
    film = RGBFilm.make((32, 32))
    cfg = volpath.VolPathConfig(max_depth=12, max_events=64)
    return scene, camera, film, cfg


def test_teaser_supported():
    scene, camera, film, cfg = _teaser_scene()
    c = pv.extract_constants(scene, camera, film, cfg)
    assert c is not None and c["kind"] == "grid" and c["n_tri"] == 36


@pytest.mark.mid
def test_teaser_kernel_matches_volpath():
    """Glass + metal + diffuse cubes in the test cloud: the fused kernel's
    mean agrees with the general jnp wavefront estimator within MC noise
    + quantization (bf16 density; measured per-lobe gaps <= 0.5%)."""
    scene, camera, film, cfg = _teaser_scene()
    ref = np.asarray(volpath.render(scene, camera, film, spp=32, seed=3,
                                    spp_per_pass=8, cfg=cfg))
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 32, cfg,
                                            seed=7, interpret=True))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / max(float(ref.mean()), 1e-9)
    assert rel < 0.03, (img.mean(), ref.mean())
    # per-pixel structure agrees too (loose: 32 spp is noisy)
    denom = np.maximum(ref.mean(), 1e-3)
    assert np.mean(np.abs(img.mean(-1) - ref.mean(-1))) / denom < 0.15


def test_teaser_rejects_rough_dielectric():
    """Rough dielectric stays out of the fused class (falls back to the
    general path); rough conductor and CookTorrance are served."""
    scene, camera, film, cfg = _teaser_scene()
    mats = M.Materials.build([
        dict(type=M.DIFFUSE, albedo=(0.7, 0.4, 0.2)),
        dict(type=M.DIELECTRIC, eta=1.5, roughness=0.2),
        dict(type=M.CONDUCTOR, albedo=(0.9, 0.7, 0.4), roughness=0.0),
    ])
    scene = scene._replace(materials=mats)
    assert pv.extract_constants(scene, camera, film, cfg) is None


@pytest.mark.mid
def test_teaser_kernel_rough_ct_matches_volpath():
    """Round-4: Trowbridge-Reitz rough conductor + the fork's
    CookTorrance (bxdfs.cpp:78-183) inside the fused kernel — VNDF
    sampling, glossy NEE and MIS all in-kernel
    (wavefront/surfscatter.cpp generality). Cross-estimator: mean must
    match the general jnp wavefront path."""
    scene, camera, film, cfg = _teaser_scene()
    mats = M.Materials.build([
        dict(type=M.COOK_TORRANCE, albedo=(0.7, 0.4, 0.2), eta=1.5,
             roughness=0.3),
        dict(type=M.DIELECTRIC, eta=1.5, roughness=0.0),
        dict(type=M.CONDUCTOR, albedo=(0.9, 0.7, 0.4), roughness=0.25),
    ])
    scene = scene._replace(materials=mats)
    c = pv.extract_constants(scene, camera, film, cfg)
    assert c is not None and c["n_tri"] == 36
    ref = np.asarray(volpath.render(scene, camera, film, spp=48, seed=3,
                                    spp_per_pass=8, cfg=cfg))
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48, cfg,
                                            seed=7, interpret=True))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / max(float(ref.mean()), 1e-9)
    assert rel < 0.035, (img.mean(), ref.mean())
    denom = np.maximum(ref.mean(), 1e-3)
    assert np.mean(np.abs(img.mean(-1) - ref.mean(-1))) / denom < 0.15


def _mesh_scene(n_sub=2):
    """Mesh-class teaser: loop-subdivided machine parts (hundreds to
    thousands of tris) in the cloud — exercises the chunk-skip VMEM
    triangle path (MAX_TRIS_GRID < n_tri <= MAX_TRIS_MESH), the TPU
    answer to BVHAggregate / OptiX GAS (cpu/aggregates.h:28,
    gpu/optix/aggregate.h:30)."""
    from vspg_pbrt_v4_tpu.utils.loopsubdiv import subdivide

    n = 16
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dens = np.clip(1.0 - np.sqrt(X**2 + Y**2 + Z**2), 0,
                   1).astype(np.float32) * 2.0
    gm = GridMedium.make(dens, [0.05] * 3, [1.0] * 3, (-1, -1, -1),
                         (1, 1, 1), g=0.3, maj_res=8)

    def cube_mesh(c, h, mat, levels):
        cx, cy, cz = c
        verts = np.array([[cx + (h if i & 1 else -h),
                           cy + (h if i & 2 else -h),
                           cz + (h if i & 4 else -h)] for i in range(8)],
                         np.float32)
        faces = np.array([(0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),
                          (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),
                          (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3)],
                         np.int32)
        v, f, _ = subdivide(verts, faces, levels, compute_limit=False)
        out = []
        for (a, b, cc) in np.asarray(f, np.int64):
            out.append(dict(p0=v[a], p1=v[b], p2=v[cc], mat=mat, light=-1,
                            med_in=-1, med_out=0))
        return out

    tris = (cube_mesh((0.25, -0.1, 0.0), 0.28, 1, n_sub)
            + cube_mesh((-0.45, 0.1, 0.2), 0.2, 0, n_sub)
            + cube_mesh((0.0, 0.55, -0.3), 0.15, 2, n_sub))
    mats = M.Materials.build([
        dict(type=M.DIFFUSE, albedo=(0.7, 0.4, 0.2)),
        dict(type=M.DIELECTRIC, eta=1.5, roughness=0.0),
        dict(type=M.CONDUCTOR, albedo=(0.9, 0.7, 0.4), roughness=0.0),
    ])
    geom = Geometry.build(
        triangles=tris,
        boxes=[dict(bmin=(-1, -1, -1), bmax=(1, 1, 1), mat=-1, light=-1,
                    med_in=0, med_out=-1)])
    lights = Lights.make(point_p=[(0.0, 1.8, 0.0)], point_I=[(6.0,) * 3],
                         env_L=[0.3, 0.35, 0.4], world_radius=100.0)
    scene = volpath.Scene(geom, mats, Media.make(grids=(gm,)), lights)
    camera = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (16, 16))
    film = RGBFilm.make((16, 16))
    cfg = volpath.VolPathConfig(max_depth=10, max_events=48)
    return scene, camera, film, cfg, len(tris)


def test_mesh_chunks_pack():
    scene, camera, film, cfg, n_tri = _mesh_scene()
    assert n_tri > pv.MAX_TRIS_GRID
    c = pv.extract_constants(scene, camera, film, cfg)
    assert c is not None and c["n_tri"] == n_tri
    tab, tb = pv.pack_tri_chunks(scene)
    assert tab.shape[0] % pv.MESH_CHUNK == 0 and tab.shape[1] == 16
    assert tb.shape == (tab.shape[0] // pv.MESH_CHUNK, 8)
    # chunk AABBs contain their triangles
    nc = tb.shape[0]
    v0 = tab[:, 0:3]
    v1 = v0 + tab[:, 3:6]
    v2 = v0 + tab[:, 6:9]
    for ci in range(nc):
        sl = slice(ci * pv.MESH_CHUNK, (ci + 1) * pv.MESH_CHUNK)
        pts = np.concatenate([v0[sl], v1[sl], v2[sl]], 0)
        live = np.abs(pts).sum(1) > 0
        if live.any():
            assert (pts[live] >= tb[ci, 0:3] - 1e-4).all()
            assert (pts[live] <= tb[ci, 3:6] + 1e-4).all()


@pytest.mark.mid
def test_mesh_kernel_matches_volpath():
    """Chunk-skip mesh sweep vs the general jnp wavefront estimator:
    the fused kernel must agree on the subdivided-machines cloud."""
    scene, camera, film, cfg, n_tri = _mesh_scene()
    ref = np.asarray(volpath.render(scene, camera, film, spp=64, seed=3,
                                    spp_per_pass=8, cfg=cfg))
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 64, cfg,
                                            seed=7, interpret=True))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / max(float(ref.mean()), 1e-9)
    assert rel < 0.04, (img.mean(), ref.mean())


def test_teaser_kernel_checker_texture_matches_volpath():
    """Round-4: CHECKER albedo textures in the fused kernel (parity
    select at the hit uv, textures.py checker semantics) — the kernel
    must match the general jnp wavefront path on a checker-textured
    diffuse cube in the cloud (textures.h:86 / surfscatter.cpp
    texture-eval generality)."""
    from vspg_pbrt_v4_tpu.models.textures import CHECKER, Textures

    scene, camera, film, cfg = _teaser_scene()
    texs = Textures.build([
        dict(kind=CHECKER, c0=(0.8, 0.2, 0.1), c1=(0.1, 0.3, 0.8),
             uvscale=(4.0, 4.0)),
    ])
    mats = M.Materials.build([
        dict(type=M.DIFFUSE, albedo=(0.7, 0.4, 0.2), albedo_tex=0),
        dict(type=M.DIELECTRIC, eta=1.5, roughness=0.0),
        dict(type=M.CONDUCTOR, albedo=(0.9, 0.7, 0.4), roughness=0.0),
    ])
    scene = scene._replace(materials=mats, textures=texs)
    c = pv.extract_constants(scene, camera, film, cfg)
    assert c is not None and c["mat_tex_kind"][0] == 1
    ref = np.asarray(volpath.render(scene, camera, film, spp=48, seed=3,
                                    spp_per_pass=8, cfg=cfg))
    img = np.asarray(pv.render_homog_pallas(scene, camera, film, 48, cfg,
                                            seed=7, interpret=True))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / max(float(ref.mean()), 1e-9)
    assert rel < 0.035, (img.mean(), ref.mean())
