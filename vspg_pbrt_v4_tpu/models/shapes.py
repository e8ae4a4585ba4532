"""Scene geometry as typed SoA arrays + vectorized closest-hit.

Analog of the reference's shape layer (shapes.h Sphere:107 Triangle:833) and
primitive binding (cpu/primitive.h GeometricPrimitive:48: material / area
light / medium-interface attachment). A Geometry holds stacked arrays per
primitive type; ``intersect`` computes the wavefront's closest hits by
evaluating every type brute-force (small scenes) or through the BVH
(ops/bvh.py) once built.

Primitive ids are global: [0, T) triangles | [T, T+S) spheres | [T+S, +B) boxes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.intersect import aabb_normal, ray_sphere, ray_triangle
from ..utils.vecmath import dot, normalize


class HitRecord(NamedTuple):
    hit: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,)
    p: jnp.ndarray  # (R,3)
    n: jnp.ndarray  # (R,3) geometric normal (faces ray origin side not forced)
    ns: jnp.ndarray  # (R,3) shading normal
    uv: jnp.ndarray  # (R,2)
    mat_id: jnp.ndarray  # (R,) int32, -1 = interface-only
    light_id: jnp.ndarray  # (R,) int32 area light id, -1 = none
    med_in: jnp.ndarray  # (R,) int32 medium on the side the normal points away from
    med_out: jnp.ndarray  # (R,) int32 medium on the normal side
    prim_id: jnp.ndarray  # (R,) int32 global primitive id
    tangent: jnp.ndarray = None  # (R,3) curve/fiber tangent (hair frames)


class Instances(NamedTuple):
    """Instanced triangle geometry stored ONCE in object space + a two-level
    BVH (ops/bvh.py TwoLevelBVH) — the TransformedPrimitive analog
    (cpu/primitive.h:83). Instead of flattening every ObjectInstance into
    world-space duplicates (memory x n_instances), each object's mesh is
    kept once and instances carry only a transform."""

    tl: object  # ops.bvh.TwoLevelBVH
    p0: jnp.ndarray  # (K,3) object-space triangle vertices
    p1: jnp.ndarray
    p2: jnp.ndarray
    n0: jnp.ndarray  # (K,3) object-space shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # (K,2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat: jnp.ndarray  # (K,) int32
    med_in: jnp.ndarray  # (K,) int32
    med_out: jnp.ndarray  # (K,) int32

    @staticmethod
    def build(objects, instances):
        """objects: list of triangle-dict lists (same keys as
        Geometry.build triangles, coordinates in OBJECT space);
        instances: list of {obj: int, o2w: (4,4) array-like}."""
        from ..ops.bvh import build_two_level

        p0s, p1s, p2s, n0s, n1s, n2s = [], [], [], [], [], []
        uv0s, uv1s, uv2s, mats, mis, mos = [], [], [], [], [], []
        obj_lo, obj_hi, obj_base = [], [], []
        for tris in objects:
            obj_base.append(len(p0s))
            a0 = np.asarray([t["p0"] for t in tris], np.float32)
            a1 = np.asarray([t["p1"] for t in tris], np.float32)
            a2 = np.asarray([t["p2"] for t in tris], np.float32)
            ng = np.cross(a1 - a0, a2 - a0)
            ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
            for i, t in enumerate(tris):
                p0s.append(a0[i])
                p1s.append(a1[i])
                p2s.append(a2[i])
                n0s.append(np.asarray(t.get("n0", ng[i]), np.float32))
                n1s.append(np.asarray(t.get("n1", ng[i]), np.float32))
                n2s.append(np.asarray(t.get("n2", ng[i]), np.float32))
                uv0s.append(np.asarray(t.get("uv0", (1, 0)), np.float32))
                uv1s.append(np.asarray(t.get("uv1", (0, 1)), np.float32))
                uv2s.append(np.asarray(t.get("uv2", (0, 0)), np.float32))
                mats.append(int(t.get("mat", -1)))
                mis.append(int(t.get("med_in", -1)))
                mos.append(int(t.get("med_out", -1)))
            obj_lo.append(np.minimum(np.minimum(a0, a1), a2) - 1e-5)
            obj_hi.append(np.maximum(np.maximum(a0, a1), a2) + 1e-5)
        tl = build_two_level(
            obj_lo, obj_hi, obj_base,
            [int(it["obj"]) for it in instances],
            [np.asarray(it["o2w"], np.float64) for it in instances],
            # motion blur: optional end-keyframe transform per instance
            # (AnimatedPrimitive, cpu/primitive.h:103)
            inst_o2w_end=[
                (np.asarray(it["o2w_end"], np.float64)
                 if it.get("o2w_end") is not None else None)
                for it in instances])
        asf = lambda x: jnp.asarray(np.asarray(x, np.float32))  # noqa: E731
        asi = lambda x: jnp.asarray(x, jnp.int32)  # noqa: E731
        return Instances(
            tl, asf(p0s), asf(p1s), asf(p2s), asf(n0s), asf(n1s), asf(n2s),
            asf(uv0s), asf(uv1s), asf(uv2s), asi(mats), asi(mis), asi(mos))

    @property
    def n_tri(self):
        return self.p0.shape[0]

    @property
    def n_inst(self):
        return self.tl.blas_root.shape[0]


class Geometry(NamedTuple):
    # triangles
    tri_p0: jnp.ndarray  # (T,3)
    tri_p1: jnp.ndarray
    tri_p2: jnp.ndarray
    tri_n0: jnp.ndarray  # (T,3) shading normals (= geometric if absent)
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_mat: jnp.ndarray  # (T,)
    tri_light: jnp.ndarray  # (T,)
    tri_med_in: jnp.ndarray
    tri_med_out: jnp.ndarray
    # spheres
    sph_c: jnp.ndarray  # (S,3)
    sph_r: jnp.ndarray  # (S,)
    sph_mat: jnp.ndarray
    sph_light: jnp.ndarray
    sph_med_in: jnp.ndarray
    sph_med_out: jnp.ndarray
    # axis-aligned boxes (medium containers / walls)
    box_min: jnp.ndarray  # (B,3)
    box_max: jnp.ndarray
    box_mat: jnp.ndarray
    box_light: jnp.ndarray
    box_med_in: jnp.ndarray
    box_med_out: jnp.ndarray
    # disks (shapes.h Disk:404 - world-space center/normal/radii)
    dsk_c: jnp.ndarray  # (D,3)
    dsk_n: jnp.ndarray  # (D,3) unit normal
    dsk_r: jnp.ndarray  # (D,)
    dsk_ri: jnp.ndarray  # (D,) inner radius
    dsk_mat: jnp.ndarray
    dsk_light: jnp.ndarray
    dsk_med_in: jnp.ndarray
    dsk_med_out: jnp.ndarray
    # cylinders (shapes.h Cylinder:551 - world-space base/axis/radius/height)
    cyl_c: jnp.ndarray  # (C,3) base center
    cyl_a: jnp.ndarray  # (C,3) unit axis
    cyl_r: jnp.ndarray  # (C,)
    cyl_h: jnp.ndarray  # (C,)
    cyl_mat: jnp.ndarray
    cyl_light: jnp.ndarray
    cyl_med_in: jnp.ndarray
    cyl_med_out: jnp.ndarray
    # bilinear patches (shapes.h BilinearPatch; Reshetov ray/patch solve)
    blp_p00: jnp.ndarray  # (P,3)
    blp_p10: jnp.ndarray
    blp_p01: jnp.ndarray
    blp_p11: jnp.ndarray
    blp_mat: jnp.ndarray
    blp_light: jnp.ndarray
    blp_med_in: jnp.ndarray
    blp_med_out: jnp.ndarray
    # curve segments (shapes.h Curve:1219): cubic Beziers flattened
    # host-side into linear ribbon segments facing the ray ("flat" type)
    crv_p0: jnp.ndarray = None  # (K,3)
    crv_p1: jnp.ndarray = None
    crv_r0: jnp.ndarray = None  # (K,) radius (half-width) at ends
    crv_r1: jnp.ndarray = None
    crv_u0: jnp.ndarray = None  # (K,) curve parameter at ends
    crv_u1: jnp.ndarray = None
    crv_mat: jnp.ndarray = None
    crv_light: jnp.ndarray = None
    crv_med_in: jnp.ndarray = None
    crv_med_out: jnp.ndarray = None
    tri_bvh: object = None  # ops.bvh.BVH over triangles (None = brute force)
    # per-corner texture coordinates (pbrt trianglemesh "point2 uv",
    # shapes.h Triangle uv interpolation). Default identity maps the hit
    # uv to the barycentrics (uv0=(1,0), uv1=(0,1), uv2=(0,0)).
    tri_uv0: jnp.ndarray = None  # (T,2)
    tri_uv1: jnp.ndarray = None
    tri_uv2: jnp.ndarray = None
    # instanced triangle meshes: object-space BLASes + TLAS over instances
    # (cpu/primitive.h:83 TransformedPrimitive analog; None = no instances)
    inst: object = None

    @staticmethod
    def build(triangles=(), spheres=(), boxes=(), disks=(), cylinders=(),
              patches=(), curves=(), use_bvh="auto", instanced=None,
              tri_meshes=(), accelerator="bvh"):
        """triangles: list of dicts {p0,p1,p2,[n0,n1,n2],mat,light,med_in,med_out};
        spheres: {c,r,...}; boxes: {bmin,bmax,...};
        disks: {c,n,r,[ri],...}; cylinders: {c,a,r,h,...};
        patches: {p00,p10,p01,p11,...};
        curves: {cp (4,3) cubic Bezier control points, width0, width1,
        [n_segs=8], ...} — flattened to ribbon segments.

        tri_meshes: the VECTORIZED triangle path for big meshes — a list
        of array bundles {p0,p1,p2 (T,3) [, n0,n1,n2 (T,3)]
        [, uv0,uv1,uv2 (T,2)], mat, med_in, med_out (scalars or (T,))},
        concatenated after `triangles` with no per-primitive Python loop
        (a 1M-triangle PLY builds in array time, not interpreter time)."""

        def stack(items, key, default, shape):
            if not items:
                return jnp.zeros((0,) + shape, jnp.float32)
            return jnp.asarray(
                np.stack([np.asarray(it.get(key, default), np.float32) for it in items]),
                jnp.float32,
            )

        def stack_i(items, key, default=-1):
            if not items:
                return jnp.zeros((0,), jnp.int32)
            return jnp.asarray([int(it.get(key, default)) for it in items], jnp.int32)

        t = list(triangles)
        tri_p0 = stack(t, "p0", (0, 0, 0), (3,))
        tri_p1 = stack(t, "p1", (0, 0, 0), (3,))
        tri_p2 = stack(t, "p2", (0, 0, 0), (3,))
        # shading normals: explicit per-triangle "n0/n1/n2" where present,
        # geometric normal otherwise (meshes with and without vertex
        # normals can be mixed in one build)
        ng = np.cross(
            np.asarray(tri_p1) - np.asarray(tri_p0),
            np.asarray(tri_p2) - np.asarray(tri_p0),
        )
        norm = np.linalg.norm(ng, axis=-1, keepdims=True)
        ng = (ng / np.maximum(norm, 1e-20)).astype(np.float32)
        if t and any("n0" in it for it in t):
            tri_n0 = jnp.asarray(np.stack([
                np.asarray(it.get("n0", ng[i]), np.float32)
                for i, it in enumerate(t)]))
            tri_n1 = jnp.asarray(np.stack([
                np.asarray(it.get("n1", ng[i]), np.float32)
                for i, it in enumerate(t)]))
            tri_n2 = jnp.asarray(np.stack([
                np.asarray(it.get("n2", ng[i]), np.float32)
                for i, it in enumerate(t)]))
        else:
            tri_n0 = tri_n1 = tri_n2 = jnp.asarray(ng, jnp.float32)
        tri_mat = stack_i(t, "mat")
        tri_light = stack_i(t, "light")
        tri_mi = stack_i(t, "med_in")
        tri_mo = stack_i(t, "med_out")
        tri_uv0 = stack(t, "uv0", (1, 0), (2,))
        tri_uv1 = stack(t, "uv1", (0, 1), (2,))
        tri_uv2 = stack(t, "uv2", (0, 0), (2,))
        if tri_meshes:
            # vectorized mesh bundles: pure array concatenation
            def fli(key, bund, T):
                v = np.asarray(bund.get(key, -1))
                return (np.full((T,), int(v), np.int32) if v.ndim == 0
                        else v.astype(np.int32))

            P0 = [np.asarray(tri_p0)]
            P1 = [np.asarray(tri_p1)]
            P2 = [np.asarray(tri_p2)]
            N0 = [np.asarray(tri_n0)]
            N1 = [np.asarray(tri_n1)]
            N2 = [np.asarray(tri_n2)]
            U0 = [np.asarray(tri_uv0)]
            U1 = [np.asarray(tri_uv1)]
            U2 = [np.asarray(tri_uv2)]
            MA = [np.asarray(tri_mat)]
            LI = [np.asarray(tri_light)]
            MI = [np.asarray(tri_mi)]
            MO = [np.asarray(tri_mo)]
            for b in tri_meshes:
                bp0 = np.asarray(b["p0"], np.float32)
                bp1 = np.asarray(b["p1"], np.float32)
                bp2 = np.asarray(b["p2"], np.float32)
                T = bp0.shape[0]
                bng = np.cross(bp1 - bp0, bp2 - bp0)
                bng /= np.maximum(
                    np.linalg.norm(bng, axis=-1, keepdims=True), 1e-20)
                P0.append(bp0)
                P1.append(bp1)
                P2.append(bp2)
                N0.append(np.asarray(b.get("n0", bng), np.float32))
                N1.append(np.asarray(b.get("n1", bng), np.float32))
                N2.append(np.asarray(b.get("n2", bng), np.float32))
                U0.append(np.asarray(b.get(
                    "uv0", np.tile(np.float32([1, 0]), (T, 1))), np.float32))
                U1.append(np.asarray(b.get(
                    "uv1", np.tile(np.float32([0, 1]), (T, 1))), np.float32))
                U2.append(np.asarray(b.get(
                    "uv2", np.tile(np.float32([0, 0]), (T, 1))), np.float32))
                MA.append(fli("mat", b, T))
                LI.append(fli("light", b, T))
                MI.append(fli("med_in", b, T))
                MO.append(fli("med_out", b, T))
            cat = np.concatenate
            tri_p0 = jnp.asarray(cat(P0))
            tri_p1 = jnp.asarray(cat(P1))
            tri_p2 = jnp.asarray(cat(P2))
            tri_n0 = jnp.asarray(cat(N0))
            tri_n1 = jnp.asarray(cat(N1))
            tri_n2 = jnp.asarray(cat(N2))
            tri_uv0 = jnp.asarray(cat(U0))
            tri_uv1 = jnp.asarray(cat(U1))
            tri_uv2 = jnp.asarray(cat(U2))
            tri_mat = jnp.asarray(cat(MA), jnp.int32)
            tri_light = jnp.asarray(cat(LI), jnp.int32)
            tri_mi = jnp.asarray(cat(MI), jnp.int32)
            tri_mo = jnp.asarray(cat(MO), jnp.int32)
        s = list(spheres)
        b = list(boxes)
        dk = list(disks)
        cy = list(cylinders)
        bp = list(patches)
        # flatten cubic Beziers into linear segments (the vectorized
        # equivalent of the reference's recursive subdivision,
        # shapes.cpp Curve::RecursiveIntersect)
        cv = list(curves)
        seg_p0, seg_p1, seg_r0, seg_r1, seg_u0, seg_u1 = [], [], [], [], [], []
        seg_mat, seg_light, seg_mi, seg_mo = [], [], [], []
        for c in cv:
            cp = np.asarray(c["cp"], np.float64).reshape(4, 3)
            w0 = float(c.get("width0", c.get("width", 0.01))) * 0.5
            w1 = float(c.get("width1", c.get("width", 0.01))) * 0.5
            ns = int(c.get("n_segs", 8))
            u = np.linspace(0.0, 1.0, ns + 1)
            bez = ((1 - u)[:, None] ** 3 * cp[0] + 3 * (1 - u)[:, None] ** 2
                   * u[:, None] * cp[1] + 3 * (1 - u)[:, None] * u[:, None] ** 2
                   * cp[2] + u[:, None] ** 3 * cp[3])
            r = w0 + (w1 - w0) * u
            for i in range(ns):
                seg_p0.append(bez[i])
                seg_p1.append(bez[i + 1])
                seg_r0.append(r[i])
                seg_r1.append(r[i + 1])
                seg_u0.append(u[i])
                seg_u1.append(u[i + 1])
                seg_mat.append(int(c.get("mat", -1)))
                seg_light.append(int(c.get("light", -1)))
                seg_mi.append(int(c.get("med_in", -1)))
                seg_mo.append(int(c.get("med_out", -1)))
        if seg_p0:
            crv = (jnp.asarray(np.asarray(seg_p0), jnp.float32),
                   jnp.asarray(np.asarray(seg_p1), jnp.float32),
                   jnp.asarray(seg_r0, jnp.float32),
                   jnp.asarray(seg_r1, jnp.float32),
                   jnp.asarray(seg_u0, jnp.float32),
                   jnp.asarray(seg_u1, jnp.float32),
                   jnp.asarray(seg_mat, jnp.int32),
                   jnp.asarray(seg_light, jnp.int32),
                   jnp.asarray(seg_mi, jnp.int32),
                   jnp.asarray(seg_mo, jnp.int32))
        else:
            z3 = jnp.zeros((0, 3), jnp.float32)
            z1 = jnp.zeros((0,), jnp.float32)
            zi = jnp.zeros((0,), jnp.int32)
            crv = (z3, z3, z1, z1, z1, z1, zi, zi, zi, zi)
        tri_bvh = None
        n_tri = tri_p0.shape[0]
        if use_bvh is True or (use_bvh == "auto" and n_tri > 64):
            lo = np.minimum(np.minimum(np.asarray(tri_p0), np.asarray(tri_p1)),
                            np.asarray(tri_p2)) - 1e-5
            hi = np.maximum(np.maximum(np.asarray(tri_p0), np.asarray(tri_p1)),
                            np.asarray(tri_p2)) + 1e-5
            tri_bvh = None
            if accelerator == "kdtree":
                # Accelerator "kdtree" (cpu/aggregates.h:76
                # KdTreeAggregate): SAH kd-tree instead of the BVH; the
                # traversal call sites dispatch on the aggregate's type
                from ..ops.kdtree import build_kdtree

                tri_bvh = build_kdtree(lo, hi)
            if tri_bvh is None and n_tri > 512:  # native builder, big meshes
                from ..native import build_bvh_native

                tri_bvh = build_bvh_native(lo, hi)
            if tri_bvh is None:
                from ..ops.bvh import build_bvh

                tri_bvh = build_bvh(lo, hi)
        return Geometry(
            tri_p0, tri_p1, tri_p2, tri_n0, tri_n1, tri_n2,
            tri_mat, tri_light, tri_mi, tri_mo,
            stack(s, "c", (0, 0, 0), (3,)),
            (jnp.asarray([float(it["r"]) for it in s], jnp.float32)
             if s else jnp.zeros((0,), jnp.float32)),
            stack_i(s, "mat"), stack_i(s, "light"),
            stack_i(s, "med_in"), stack_i(s, "med_out"),
            stack(b, "bmin", (0, 0, 0), (3,)),
            stack(b, "bmax", (0, 0, 0), (3,)),
            stack_i(b, "mat"), stack_i(b, "light"),
            stack_i(b, "med_in"), stack_i(b, "med_out"),
            stack(dk, "c", (0, 0, 0), (3,)),
            stack(dk, "n", (0, 0, 1), (3,)),
            (jnp.asarray([float(x["r"]) for x in dk], jnp.float32)
             if dk else jnp.zeros((0,), jnp.float32)),
            (jnp.asarray([float(x.get("ri", 0.0)) for x in dk], jnp.float32)
             if dk else jnp.zeros((0,), jnp.float32)),
            stack_i(dk, "mat"), stack_i(dk, "light"),
            stack_i(dk, "med_in"), stack_i(dk, "med_out"),
            stack(cy, "c", (0, 0, 0), (3,)),
            stack(cy, "a", (0, 0, 1), (3,)),
            (jnp.asarray([float(x["r"]) for x in cy], jnp.float32)
             if cy else jnp.zeros((0,), jnp.float32)),
            (jnp.asarray([float(x["h"]) for x in cy], jnp.float32)
             if cy else jnp.zeros((0,), jnp.float32)),
            stack_i(cy, "mat"), stack_i(cy, "light"),
            stack_i(cy, "med_in"), stack_i(cy, "med_out"),
            stack(bp, "p00", (0, 0, 0), (3,)),
            stack(bp, "p10", (0, 0, 0), (3,)),
            stack(bp, "p01", (0, 0, 0), (3,)),
            stack(bp, "p11", (0, 0, 0), (3,)),
            stack_i(bp, "mat"), stack_i(bp, "light"),
            stack_i(bp, "med_in"), stack_i(bp, "med_out"),
            *crv,
            tri_bvh,
            tri_uv0, tri_uv1, tri_uv2,
            (Instances.build(instanced["objects"], instanced["instances"])
             if instanced and instanced.get("instances") else None),
        )

    def _tri_uv(self, k, b0, b1, b2):
        """Interpolated per-corner uv at barycentrics (b0,b1,b2); falls
        back to raw barycentrics when the mesh carries no uv arrays."""
        if self.tri_uv0 is None or self.tri_uv0.shape[0] == 0:
            return jnp.stack([b0, b1], -1)
        return (b0[..., None] * self.tri_uv0[k]
                + b1[..., None] * self.tri_uv1[k]
                + b2[..., None] * self.tri_uv2[k])

    @property
    def n_tri(self):
        return self.tri_p0.shape[0]

    @property
    def n_sph(self):
        return self.sph_c.shape[0]

    @property
    def n_box(self):
        return self.box_min.shape[0]

    @property
    def n_dsk(self):
        return self.dsk_c.shape[0]

    @property
    def n_cyl(self):
        return self.cyl_c.shape[0]

    @property
    def n_blp(self):
        return self.blp_p00.shape[0]

    @property
    def n_crv(self):
        return 0 if self.crv_p0 is None else self.crv_p0.shape[0]

    # -- closest hit ---------------------------------------------------------
    def intersect(self, o, d, t_max, time=None):
        """Brute-force closest hit over all primitives (vectorized over R).

        time: optional (R,) per-lane ray times in [0,1] for animated
        instances (motion blur; static geometry ignores it).

        Each primitive type is tested against every lane; the running minimum
        keeps the nearest. Replaced by BVH traversal for large T (ops/bvh.py)
        — brute force doubles as its correctness oracle.
        """
        R = o.shape[:-1]
        inf = jnp.inf
        best = HitRecord(
            hit=jnp.zeros(R, bool),
            t=jnp.full(R, inf) * jnp.ones_like(o[..., 0]),
            p=jnp.zeros_like(o),
            n=jnp.zeros_like(o),
            ns=jnp.zeros_like(o),
            uv=jnp.zeros(R + (2,)),
            mat_id=jnp.full(R, -1, jnp.int32),
            light_id=jnp.full(R, -1, jnp.int32),
            med_in=jnp.full(R, -1, jnp.int32),
            med_out=jnp.full(R, -1, jnp.int32),
            prim_id=jnp.full(R, -1, jnp.int32),
            tangent=jnp.zeros_like(o),
        )

        def upd(best, closer, t, p, n, ns, uv, mat, light, mi, mo, pid,
                tangent=None):
            c = closer

            def w(new, old):
                m = c
                if new.ndim > m.ndim:
                    m = m[..., None]
                return jnp.where(m, new, old)

            return HitRecord(
                best.hit | c, w(t, best.t), w(p, best.p), w(n, best.n),
                w(ns, best.ns), w(uv, best.uv), w(mat, best.mat_id),
                w(light, best.light_id), w(mi, best.med_in), w(mo, best.med_out),
                w(pid, best.prim_id),
                best.tangent if tangent is None else w(tangent, best.tangent),
            )

        # triangles
        if self.n_tri > 0 and self.tri_bvh is not None:
            best = self._intersect_tris_bvh(o, d, best)
        elif self.n_tri > 0:
            ht, tt, b0, b1, ng = ray_triangle(
                o[..., None, :], d[..., None, :], best.t[..., None],
                self.tri_p0, self.tri_p1, self.tri_p2,
            )  # (R,T)
            tt = jnp.where(ht, tt, inf)
            k = jnp.argmin(tt, axis=-1)
            t_k = jnp.take_along_axis(tt, k[..., None], -1)[..., 0]
            closer = jnp.isfinite(t_k) & (t_k < best.t)
            b0k = jnp.take_along_axis(b0, k[..., None], -1)[..., 0]
            b1k = jnp.take_along_axis(b1, k[..., None], -1)[..., 0]
            b2k = 1.0 - b0k - b1k
            # ng is (T,3): ray-independent geometric normals -> plain gather
            ngk = ng[k]
            nsk = normalize(
                b0k[..., None] * self.tri_n0[k]
                + b1k[..., None] * self.tri_n1[k]
                + b2k[..., None] * self.tri_n2[k]
            )
            p_k = o + t_k[..., None] * d
            best = upd(
                best, closer, t_k, p_k, ngk, nsk,
                self._tri_uv(k, b0k, b1k, b2k), self.tri_mat[k],
                self.tri_light[k],
                self.tri_med_in[k], self.tri_med_out[k], k.astype(jnp.int32),
            )

        # spheres
        if self.n_sph > 0:
            hs, ts, ps, ns_ = ray_sphere(
                o[..., None, :], d[..., None, :], best.t[..., None],
                self.sph_c, self.sph_r,
            )
            ts = jnp.where(hs, ts, inf)
            k = jnp.argmin(ts, axis=-1)
            t_k = jnp.take_along_axis(ts, k[..., None], -1)[..., 0]
            closer = jnp.isfinite(t_k) & (t_k < best.t)
            p_k = jnp.take_along_axis(ps, k[..., None, None], -2)[..., 0, :]
            n_k = jnp.take_along_axis(ns_, k[..., None, None], -2)[..., 0, :]
            # spherical uv (shapes.h Sphere parameterization)
            from ..utils.vecmath import spherical_phi, spherical_theta
            from ..utils.math import PI
            uv_s = jnp.stack([spherical_phi(n_k) / (2 * PI),
                              spherical_theta(n_k) / PI], -1)
            best = upd(
                best, closer, t_k, p_k, n_k, n_k, uv_s,
                self.sph_mat[k], self.sph_light[k],
                self.sph_med_in[k], self.sph_med_out[k],
                (self.n_tri + k).astype(jnp.int32),
            )

        # disks: plane hit within [inner, outer] radius (shapes.h Disk:404)
        if self.n_dsk > 0:
            n_d = self.dsk_n  # (D,3)
            denom = jnp.sum(d[..., None, :] * n_d, -1)  # (R,D)
            t_all = jnp.sum((self.dsk_c - o[..., None, :]) * n_d, -1) / jnp.where(
                jnp.abs(denom) < 1e-9, 1e-9, denom)
            p_all = o[..., None, :] + t_all[..., None] * d[..., None, :]
            r2 = jnp.sum((p_all - self.dsk_c) ** 2, -1)
            ok = ((jnp.abs(denom) > 1e-9) & (t_all > 1e-4)
                  & (r2 <= self.dsk_r**2) & (r2 >= self.dsk_ri**2))
            t_all = jnp.where(ok, t_all, inf)
            k = jnp.argmin(t_all, axis=-1)
            t_k = jnp.take_along_axis(t_all, k[..., None], -1)[..., 0]
            closer = jnp.isfinite(t_k) & (t_k < best.t)
            p_k = o + t_k[..., None] * d
            n_k = self.dsk_n[k]
            best = upd(
                best, closer, t_k, p_k, n_k, n_k, jnp.zeros(R + (2,)),
                self.dsk_mat[k], self.dsk_light[k],
                self.dsk_med_in[k], self.dsk_med_out[k],
                (self.n_tri + self.n_sph + self.n_box + k).astype(jnp.int32),
            )

        # cylinders (finite, open)
        if self.n_cyl > 0:
            from ..ops.intersect import ray_cylinder

            hc, tc, pc, nc = ray_cylinder(
                o[..., None, :], d[..., None, :], best.t[..., None],
                self.cyl_c, self.cyl_a, self.cyl_r, self.cyl_h)
            tc = jnp.where(hc, tc, inf)
            k = jnp.argmin(tc, axis=-1)
            t_k = jnp.take_along_axis(tc, k[..., None], -1)[..., 0]
            closer = jnp.isfinite(t_k) & (t_k < best.t)
            p_k = o + t_k[..., None] * d
            n_k = jnp.take_along_axis(nc, k[..., None, None], -2)[..., 0, :]
            z_k = jnp.sum((p_k - self.cyl_c[k]) * self.cyl_a[k], -1)
            uv_c = jnp.stack([jnp.zeros_like(z_k),
                              z_k / jnp.maximum(self.cyl_h[k], 1e-9)], -1)
            best = upd(
                best, closer, t_k, p_k, n_k, n_k, uv_c,
                self.cyl_mat[k], self.cyl_light[k],
                self.cyl_med_in[k], self.cyl_med_out[k],
                (self.n_tri + self.n_sph + self.n_box + self.n_dsk
                 + k).astype(jnp.int32),
            )

        # bilinear patches
        if self.n_blp > 0:
            from ..ops.intersect import ray_bilinear_patch

            hp, tp, up, vp, np_ = ray_bilinear_patch(
                o[..., None, :], d[..., None, :], best.t[..., None],
                self.blp_p00, self.blp_p10, self.blp_p01, self.blp_p11)
            tp = jnp.where(hp, tp, inf)
            k = jnp.argmin(tp, axis=-1)
            t_k = jnp.take_along_axis(tp, k[..., None], -1)[..., 0]
            closer = jnp.isfinite(t_k) & (t_k < best.t)
            p_k = o + t_k[..., None] * d
            n_k = jnp.take_along_axis(np_, k[..., None, None], -2)[..., 0, :]
            u_k = jnp.take_along_axis(up, k[..., None], -1)[..., 0]
            v_k = jnp.take_along_axis(vp, k[..., None], -1)[..., 0]
            best = upd(
                best, closer, t_k, p_k, n_k, n_k,
                jnp.stack([u_k, v_k], -1),
                self.blp_mat[k], self.blp_light[k],
                self.blp_med_in[k], self.blp_med_out[k],
                (self.n_tri + self.n_sph + self.n_box + self.n_dsk
                 + self.n_cyl + k).astype(jnp.int32),
            )

        # curve ribbon segments ("flat" curves face the ray;
        # shapes.h Curve:1219 / shapes.cpp RecursiveIntersect leaf test)
        if self.n_crv > 0:
            from ..utils.vecmath import coordinate_system as _cs

            dn = normalize(d)
            e1, e2 = _cs(dn)
            q0 = self.crv_p0 - o[..., None, :]  # (R,K,3)
            q1 = self.crv_p1 - o[..., None, :]
            ax = jnp.sum(q0 * e1[..., None, :], -1)
            ay = jnp.sum(q0 * e2[..., None, :], -1)
            az = jnp.sum(q0 * dn[..., None, :], -1)
            bx = jnp.sum(q1 * e1[..., None, :], -1)
            by = jnp.sum(q1 * e2[..., None, :], -1)
            bz = jnp.sum(q1 * dn[..., None, :], -1)
            abx, aby = bx - ax, by - ay
            ab2 = abx * abx + aby * aby
            wseg = jnp.clip(-(ax * abx + ay * aby)
                            / jnp.where(ab2 < 1e-18, 1e-18, ab2), 0.0, 1.0)
            cx = ax + wseg * abx
            cy = ay + wseg * aby
            d2 = cx * cx + cy * cy
            r_w = self.crv_r0 + (self.crv_r1 - self.crv_r0) * wseg
            t_c = az + wseg * (bz - az)
            okc = (d2 <= r_w * r_w) & (t_c > 1e-4) & (t_c < best.t[..., None])
            t_c = jnp.where(okc, t_c, inf)
            k = jnp.argmin(t_c, axis=-1)
            t_k = jnp.take_along_axis(t_c, k[..., None], -1)[..., 0]
            closer = jnp.isfinite(t_k) & (t_k < best.t)
            p_k = o + t_k[..., None] * d
            tang = normalize(self.crv_p1[k] - self.crv_p0[k])
            # flat-curve normal: ray direction's component perpendicular
            # to the fiber, facing back along the ray
            n_k = normalize(-(dn - jnp.sum(dn * tang, -1)[..., None] * tang))
            w_k = jnp.take_along_axis(wseg, k[..., None], -1)[..., 0]
            u_k = (self.crv_u0[k]
                   + (self.crv_u1[k] - self.crv_u0[k]) * w_k)
            # v in [0,1] across the ribbon, signed by the 2D side
            cxk = jnp.take_along_axis(cx, k[..., None], -1)[..., 0]
            cyk = jnp.take_along_axis(cy, k[..., None], -1)[..., 0]
            abxk = jnp.take_along_axis(abx, k[..., None], -1)[..., 0]
            abyk = jnp.take_along_axis(aby, k[..., None], -1)[..., 0]
            side = jnp.sign(abxk * cyk - abyk * cxk)
            r_k = jnp.take_along_axis(r_w, k[..., None], -1)[..., 0]
            d_k = jnp.sqrt(jnp.take_along_axis(d2, k[..., None], -1)[..., 0])
            v_k = jnp.clip(0.5 + side * d_k
                           / jnp.maximum(2.0 * r_k, 1e-12), 0.0, 1.0)
            best = upd(
                best, closer, t_k, p_k, n_k, n_k,
                jnp.stack([u_k, v_k], -1),
                self.crv_mat[k], self.crv_light[k],
                self.crv_med_in[k], self.crv_med_out[k],
                (self.n_tri + self.n_sph + self.n_box + self.n_dsk
                 + self.n_cyl + self.n_blp + k).astype(jnp.int32),
                tangent=tang,
            )

        # boxes (face crossings; nearest of t_near/t_far ahead of origin)
        if self.n_box > 0:
            eps = 1e-4
            inv_d = 1.0 / d[..., None, :]
            t_lo = (self.box_min - o[..., None, :]) * inv_d
            t_hi = (self.box_max - o[..., None, :]) * inv_d
            t_near = jnp.nanmax(jnp.minimum(t_lo, t_hi), axis=-1)
            t_far = jnp.nanmin(jnp.maximum(t_lo, t_hi), axis=-1)
            valid = t_near <= t_far
            t_c = jnp.where(t_near > eps, t_near, t_far)
            t_c = jnp.where(valid & (t_c > eps), t_c, inf)
            k = jnp.argmin(t_c, axis=-1)
            t_k = jnp.take_along_axis(t_c, k[..., None], -1)[..., 0]
            closer = jnp.isfinite(t_k) & (t_k < best.t)
            p_k = o + t_k[..., None] * d
            n_k = aabb_normal(p_k, self.box_min[k], self.box_max[k])
            best = upd(
                best, closer, t_k, p_k, n_k, n_k, jnp.zeros(R + (2,)),
                self.box_mat[k], self.box_light[k],
                self.box_med_in[k], self.box_med_out[k],
                (self.n_tri + self.n_sph + k).astype(jnp.int32),
            )

        if self.inst is not None:
            best = self._intersect_instances(o, d, best, time=time)

        return best

    def _intersect_instances(self, o, d, best, time=None):
        """Closest hit against instanced meshes through the two-level BVH
        (ops/bvh.py two_level_traverse). Triangles are tested in object
        space with the instance's unnormalized ray, so t is directly
        comparable with world-space hits."""
        from ..ops.bvh import two_level_traverse

        ins = self.inst
        R = o.shape[0]

        def leaf_fn(pid, inst, m, co, cd, t_best, payload):
            k_b, i_b, b0_b, b1_b = payload
            hit, t, b0, b1, _ = ray_triangle(
                co, cd, t_best, ins.p0[pid], ins.p1[pid], ins.p2[pid])
            closer = m & hit
            t_best = jnp.where(closer, t, t_best)
            k_b = jnp.where(closer, pid, k_b)
            i_b = jnp.where(closer, inst, i_b)
            b0_b = jnp.where(closer, b0, b0_b)
            b1_b = jnp.where(closer, b1, b1_b)
            return t_best, (k_b, i_b, b0_b, b1_b)

        payload0 = (jnp.full((R,), -1, jnp.int32),
                    jnp.full((R,), -1, jnp.int32),
                    jnp.zeros(R), jnp.zeros(R))
        t_best, (k, ii, b0k, b1k) = two_level_traverse(
            ins.tl, o, d, best.t, leaf_fn, payload0, time=time)
        closer = k >= 0
        kc = jnp.maximum(k, 0)
        ic = jnp.maximum(ii, 0)
        e1 = ins.p1[kc] - ins.p0[kc]
        e2 = ins.p2[kc] - ins.p0[kc]
        ng_o = jnp.cross(e1, e2)
        b2k = 1.0 - b0k - b1k
        ns_o = (b0k[..., None] * ins.n0[kc] + b1k[..., None] * ins.n1[kc]
                + b2k[..., None] * ins.n2[kc])
        # normals transform by the inverse transpose of object-to-world,
        # i.e. by the transpose of the world-to-object linear part (at
        # the lane's ray time for animated instances)
        from ..ops.bvh import interp_w2o

        lin = interp_w2o(ins.tl, ic, time)[..., :3]  # (R,3,3)
        ngk = normalize(jnp.einsum("rij,ri->rj", lin, ng_o))
        nsk = normalize(jnp.einsum("rij,ri->rj", lin, ns_o))
        uvk = (b0k[..., None] * ins.uv0[kc] + b1k[..., None] * ins.uv1[kc]
               + b2k[..., None] * ins.uv2[kc])
        p_k = o + t_best[..., None] * d
        base = (self.n_tri + self.n_sph + self.n_box + self.n_dsk
                + self.n_cyl + self.n_blp + self.n_crv)

        def w(new, old):
            mm = closer
            if new.ndim > mm.ndim:
                mm = mm[..., None]
            return jnp.where(mm, new, old)

        return HitRecord(
            best.hit | closer, w(t_best, best.t), w(p_k, best.p),
            w(ngk, best.n), w(nsk, best.ns), w(uvk, best.uv),
            w(ins.mat[kc], best.mat_id),
            # area lights are not supported inside instances (pbrt rejects
            # them too: scene.cpp ObjectInstance error)
            jnp.where(closer, -1, best.light_id),
            w(ins.med_in[kc], best.med_in), w(ins.med_out[kc], best.med_out),
            w((base + kc).astype(jnp.int32), best.prim_id),
            best.tangent,
        )

    def _intersect_tris_bvh(self, o, d, best):
        """Closest triangle hit through the aggregate: BVH (ops/bvh.py)
        or kd-tree (ops/kdtree.py, Accelerator "kdtree") — same
        leaf_fn contract, dispatched on the aggregate's type."""
        from ..ops.bvh import bvh_traverse
        from ..ops.kdtree import KdTree, kdtree_traverse

        traverse = (kdtree_traverse if isinstance(self.tri_bvh, KdTree)
                    else bvh_traverse)

        R = o.shape[0]

        def leaf_fn(pid, m, t_best, payload):
            k_b, b0_b, b1_b = payload
            hit, t, b0, b1, _ = ray_triangle(
                o, d, t_best, self.tri_p0[pid], self.tri_p1[pid],
                self.tri_p2[pid])
            closer = m & hit
            t_best = jnp.where(closer, t, t_best)
            k_b = jnp.where(closer, pid, k_b)
            b0_b = jnp.where(closer, b0, b0_b)
            b1_b = jnp.where(closer, b1, b1_b)
            return t_best, (k_b, b0_b, b1_b)

        payload0 = (jnp.full((R,), -1, jnp.int32), jnp.zeros(R), jnp.zeros(R))
        t_best, (k, b0k, b1k) = traverse(
            self.tri_bvh, o, d, best.t, leaf_fn, payload0)
        closer = k >= 0
        kc = jnp.maximum(k, 0)
        e1 = self.tri_p1[kc] - self.tri_p0[kc]
        e2 = self.tri_p2[kc] - self.tri_p0[kc]
        ngk = normalize(jnp.cross(e1, e2))
        b2k = 1.0 - b0k - b1k
        nsk = normalize(
            b0k[..., None] * self.tri_n0[kc]
            + b1k[..., None] * self.tri_n1[kc]
            + b2k[..., None] * self.tri_n2[kc])
        p_k = o + t_best[..., None] * d

        def w(new, old):
            mm = closer
            if new.ndim > mm.ndim:
                mm = mm[..., None]
            return jnp.where(mm, new, old)

        return HitRecord(
            best.hit | closer, w(t_best, best.t), w(p_k, best.p),
            w(ngk, best.n), w(nsk, best.ns),
            w(self._tri_uv(kc, b0k, b1k, b2k), best.uv),
            w(self.tri_mat[kc], best.mat_id),
            w(self.tri_light[kc], best.light_id), w(self.tri_med_in[kc], best.med_in),
            w(self.tri_med_out[kc], best.med_out), w(kc, best.prim_id),
            best.tangent,
        )

    def intersect_p(self, o, d, t_max, time=None):
        """Any-hit against *opaque* primitives only (mat_id >= 0): occlusion
        for shadow rays. Interface-only primitives never occlude.
        time: per-lane ray times for animated instances."""
        occluded = jnp.zeros(o.shape[:-1], bool)
        if self.n_tri > 0 and self.tri_bvh is not None:
            from ..ops.bvh import bvh_traverse
            from ..ops.kdtree import KdTree, kdtree_traverse

            traverse = (kdtree_traverse if isinstance(self.tri_bvh, KdTree)
                        else bvh_traverse)

            def leaf_fn(pid, m, t_best, occ):
                hit, _, _, _, _ = ray_triangle(
                    o, d, t_best, self.tri_p0[pid], self.tri_p1[pid],
                    self.tri_p2[pid])
                occ_new = occ | (m & hit & (self.tri_mat[pid] >= 0))
                # collapse t_best to cull remaining traversal once occluded
                return jnp.where(occ_new, 0.0, t_best), occ_new

            _, occ = traverse(self.tri_bvh, o, d, t_max, leaf_fn,
                              jnp.zeros(o.shape[:-1], bool))
            occluded |= occ
        elif self.n_tri > 0:
            ht, _, _, _, _ = ray_triangle(
                o[..., None, :], d[..., None, :], t_max[..., None],
                self.tri_p0, self.tri_p1, self.tri_p2,
            )
            occluded |= jnp.any(ht & (self.tri_mat >= 0), axis=-1)
        if self.n_sph > 0:
            hs, _, _, _ = ray_sphere(
                o[..., None, :], d[..., None, :], t_max[..., None],
                self.sph_c, self.sph_r,
            )
            occluded |= jnp.any(hs & (self.sph_mat >= 0), axis=-1)
        if self.n_box > 0:
            from ..ops.intersect import ray_aabb

            hb, t0, t1 = ray_aabb(
                o[..., None, :], d[..., None, :], t_max[..., None],
                self.box_min, self.box_max,
            )
            # only face crossings strictly inside (0,t_max) occlude
            crossing = hb & ((t0 > 1e-4) | (t1 < t_max[..., None] - 1e-4))
            occluded |= jnp.any(crossing & (self.box_mat >= 0), axis=-1)
        if self.n_dsk > 0:
            n_d = self.dsk_n
            denom = jnp.sum(d[..., None, :] * n_d, -1)
            t_all = jnp.sum((self.dsk_c - o[..., None, :]) * n_d, -1) / jnp.where(
                jnp.abs(denom) < 1e-9, 1e-9, denom)
            p_all = o[..., None, :] + t_all[..., None] * d[..., None, :]
            r2 = jnp.sum((p_all - self.dsk_c) ** 2, -1)
            ok = ((jnp.abs(denom) > 1e-9) & (t_all > 1e-4)
                  & (t_all < t_max[..., None]) & (r2 <= self.dsk_r**2)
                  & (r2 >= self.dsk_ri**2))
            occluded |= jnp.any(ok & (self.dsk_mat >= 0), axis=-1)
        if self.n_cyl > 0:
            from ..ops.intersect import ray_cylinder

            hc, tc, _, _ = ray_cylinder(
                o[..., None, :], d[..., None, :], t_max[..., None],
                self.cyl_c, self.cyl_a, self.cyl_r, self.cyl_h)
            occluded |= jnp.any(hc & (self.cyl_mat >= 0), axis=-1)
        if self.n_blp > 0:
            from ..ops.intersect import ray_bilinear_patch

            hp, _, _, _, _ = ray_bilinear_patch(
                o[..., None, :], d[..., None, :], t_max[..., None],
                self.blp_p00, self.blp_p10, self.blp_p01, self.blp_p11)
            occluded |= jnp.any(hp & (self.blp_mat >= 0), axis=-1)
        if self.n_crv > 0:
            from ..utils.vecmath import coordinate_system as _cs

            dn = normalize(d)
            e1, e2 = _cs(dn)
            q0 = self.crv_p0 - o[..., None, :]
            q1 = self.crv_p1 - o[..., None, :]
            ax = jnp.sum(q0 * e1[..., None, :], -1)
            ay = jnp.sum(q0 * e2[..., None, :], -1)
            az = jnp.sum(q0 * dn[..., None, :], -1)
            bx = jnp.sum(q1 * e1[..., None, :], -1)
            by = jnp.sum(q1 * e2[..., None, :], -1)
            bz = jnp.sum(q1 * dn[..., None, :], -1)
            abx, aby = bx - ax, by - ay
            ab2 = abx * abx + aby * aby
            wseg = jnp.clip(-(ax * abx + ay * aby)
                            / jnp.where(ab2 < 1e-18, 1e-18, ab2), 0.0, 1.0)
            cx = ax + wseg * abx
            cy = ay + wseg * aby
            d2 = cx * cx + cy * cy
            r_w = self.crv_r0 + (self.crv_r1 - self.crv_r0) * wseg
            t_c = az + wseg * (bz - az)
            okc = ((d2 <= r_w * r_w) & (t_c > 1e-4)
                   & (t_c < t_max[..., None]))
            occluded |= jnp.any(okc & (self.crv_mat >= 0), axis=-1)
        if self.inst is not None:
            from ..ops.bvh import two_level_traverse

            ins = self.inst

            def leaf_fn(pid, inst, m, co, cd, t_best, occ):
                hit, _, _, _, _ = ray_triangle(
                    co, cd, t_best, ins.p0[pid], ins.p1[pid], ins.p2[pid])
                occ_new = occ | (m & hit & (ins.mat[pid] >= 0))
                return jnp.where(occ_new, 0.0, t_best), occ_new

            _, occ = two_level_traverse(
                ins.tl, o, d, t_max, leaf_fn, jnp.zeros(o.shape[:-1], bool),
                time=time)
            occluded |= occ
        return occluded
