"""Pallas TPU megakernel: persistent surface path tracing for the
small-triangle-mesh scene class (Cornell-box-like scenes).

The surface analog of ops/pallas_volpath: one lane per pixel, persistent
regeneration, the whole path life-cycle resident in VMEM/registers. The
scene class is: <=128 flat triangles with DIFFUSE materials, <=8 diffuse
area lights (+ optional point light + constant env), pinhole perspective
camera, box filter — a vacuum (no media) transport problem.

Physics mirrors the jnp path exactly (the same estimator as
models/integrators/volpath.volpath_bounce restricted to surfaces):

- closest hit: Moller-Trumbore sweep over a triangle table held in SMEM
  (per-triangle scalar broadcast onto the (sub, 128) lane tile — the
  natural TPU mapping for small static scenes; reference
  cpu/aggregates.cpp BVH traversal is pointless at this scene size);
- emissive hits with area-light MIS (integrators.cpp:1146-1160,
  DiffuseAreaLight::L one/two-sided semantics);
- NEE with uniform light selection + uniform-area triangle sampling
  (lights.py Lights.sample area branch; sampling.h SampleUniformTriangle)
  and the _combine_ld MIS denominators (integrators.cpp:1424-1433);
- cosine-sampled Lambertian bounce (beta *= albedo exactly), escape-ray
  env MIS (integrators.cpp:1127-1143), and the same Russian roulette as
  volpath (integrators.cpp:1301-1312).

Since the transport is vacuum + scalar pdfs, the hero-channel rescaled
quantities collapse: r_u == 1 and r_l is the scalar 1/pdf of the last
scatter — carried as one lane array instead of three.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_volpath import (_BIG, INV_4PI, _U32, _coord_system, _dot,
                             _normalize, _uniform4)

MAX_TRIS = 128
MAX_AREA_LIGHTS = 8
MAX_MATS = 8


# ---------------------------------------------------------------------------
# Support predicate + constant extraction
# ---------------------------------------------------------------------------


def extract_constants(scene, camera, film, cfg):
    """Return (constants dict, tri_table np (T,16)) if the scene qualifies
    for the surface megakernel, else None."""
    try:
        from ..models.cameras import PerspectiveCamera

        if not isinstance(camera, PerspectiveCamera):
            return None
        if getattr(camera, "lens_radius", 0.0) > 0:
            return None
        if getattr(cfg, "spectral", False):
            return None
        g = scene.geometry
        n_tri = int(g.tri_p0.shape[0])
        n_other = (int(g.sph_c.shape[0]) + int(g.dsk_c.shape[0])
                   + int(g.cyl_c.shape[0]) + int(g.blp_p00.shape[0])
                   + int(g.box_min.shape[0])
                   + (int(g.crv_p0.shape[0]) if g.crv_p0 is not None else 0))
        if getattr(g, "inst", None) is not None:
            return None  # instanced meshes take the two-level XLA path
        if n_other or not (1 <= n_tri <= MAX_TRIS):
            return None
        med_in = np.asarray(g.tri_med_in)
        med_out = np.asarray(g.tri_med_out)
        if (med_in >= 0).any() or (med_out >= 0).any():
            return None
        m = scene.media
        if len(m.grids) or len(m.procedurals):
            return None
        # flat shading normals only
        n0 = np.asarray(g.tri_n0)
        if (not np.allclose(n0, np.asarray(g.tri_n1))
                or not np.allclose(n0, np.asarray(g.tri_n2))):
            return None
        mat_ids = np.asarray(g.tri_mat)
        if (mat_ids < 0).any():
            return None  # interface tris (SkipIntersection) not in class
        mats = scene.materials
        n_mat = int(mats.mat_type.shape[0])
        if n_mat > MAX_MATS:
            return None
        used = np.unique(mat_ids[mat_ids >= 0])
        mt = np.asarray(mats.mat_type)
        at = np.asarray(mats.albedo_tex)
        for mid in used:
            if mt[mid] != 0 or at[mid] >= 0:  # DIFFUSE, untextured
                return None
        li = scene.lights
        if li.n_spot or li.n_gonio or li.n_proj or li.n_distant:
            return None
        if li.n_point > 1 or li.n_area > MAX_AREA_LIGHTS:
            return None
        if li.portal is not None or getattr(li, "has_env_img", False):
            return None
        if getattr(li, "bvh", None) is not None:
            return None
        n_lights = int(li.n_point) + int(li.n_area) + int(bool(li.has_env))
        if n_lights == 0:
            return None
        pmf_t = np.asarray(li.select_pmf_table)
        if not np.allclose(pmf_t, 1.0 / n_lights, atol=1e-6):
            return None  # uniform light selection only
        if film.filter.kind != "box":
            return None
        if abs(float(film.filter.radius) - 0.5) > 1e-6:
            return None
        if not np.allclose(np.asarray(film.sensor_matrix), np.eye(3)):
            return None
        if not np.isinf(film.max_component):
            return None

        # triangle table rows: p0(3) e1(3) e2(3) ng(3) mat light pad(4)
        p0 = np.asarray(g.tri_p0, np.float32)
        e1 = np.asarray(g.tri_p1, np.float32) - p0
        e2 = np.asarray(g.tri_p2, np.float32) - p0
        ng = np.asarray(g.tri_n0, np.float32)
        tab = np.zeros((n_tri, 16), np.float32)
        tab[:, 0:3] = p0
        tab[:, 3:6] = e1
        tab[:, 6:9] = e2
        tab[:, 9:12] = ng
        tab[:, 12] = mat_ids.astype(np.float32)
        tab[:, 13] = np.asarray(g.tri_light, np.float32)

        # area-light table
        A = int(li.n_area)
        la = dict(
            p0=np.asarray(li.area_p0, np.float32).reshape(A, 3),
            e1=(np.asarray(li.area_p1, np.float32)
                - np.asarray(li.area_p0, np.float32)).reshape(A, 3),
            e2=(np.asarray(li.area_p2, np.float32)
                - np.asarray(li.area_p0, np.float32)).reshape(A, 3),
            L=np.asarray(li.area_L, np.float32).reshape(A, 3),
            two=np.asarray(li.area_twosided).reshape(A).astype(bool),
        )
        cr = np.cross(la["e1"], la["e2"])
        nrm = np.linalg.norm(cr, axis=-1, keepdims=True)
        la["n"] = (cr / np.maximum(nrm, 1e-20)).astype(np.float32)
        la["area"] = (0.5 * nrm[:, 0]).astype(np.float32)

        albedo = np.asarray(mats.albedo, np.float32)
        has_point = int(li.n_point) == 1
        c = dict(
            n_tri=n_tri,
            n_area=A,
            n_mat=n_mat,
            n_lights=n_lights,
            albedo=tuple(map(tuple, albedo.tolist())),
            area_p0=tuple(map(tuple, la["p0"].tolist())),
            area_e1=tuple(map(tuple, la["e1"].tolist())),
            area_e2=tuple(map(tuple, la["e2"].tolist())),
            area_n=tuple(map(tuple, la["n"].tolist())),
            area_L=tuple(map(tuple, la["L"].tolist())),
            area_area=tuple(la["area"].tolist()),
            area_two=tuple(bool(x) for x in la["two"]),
            has_point=has_point,
            has_env=bool(li.has_env),
            point_p=(tuple(float(x) for x in np.asarray(li.point_p)[0])
                     if has_point else (0.0, 0.0, 0.0)),
            point_I=(tuple(float(x) for x in np.asarray(li.point_I)[0])
                     if has_point else (0.0, 0.0, 0.0)),
            env_L=(tuple(float(x) for x in np.asarray(li.env_L))
                   if li.has_env else (0.0, 0.0, 0.0)),
            rc=tuple(tuple(float(x) for x in row)
                     for row in np.asarray(camera.raster_to_camera.m)),
            cw=tuple(tuple(float(x) for x in row)
                     for row in np.asarray(camera.camera_to_world.m)),
            nx=int(film.resolution[0]),
            ny=int(film.resolution[1]),
            imaging_ratio=float(film.imaging_ratio),
            max_depth=int(cfg.max_depth),
            rr_start_depth=int(cfg.rr_start_depth),
        )
        return c, tab
    except Exception:
        return None


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(c, spp, sub):
    n_tri = c["n_tri"]
    n_area = c["n_area"]
    n_lights = c["n_lights"]
    pmf = 1.0 / n_lights
    albedo = np.asarray(c["albedo"], np.float32).reshape(-1, 3)
    a_p0 = np.asarray(c["area_p0"], np.float32).reshape(-1, 3)
    a_e1 = np.asarray(c["area_e1"], np.float32).reshape(-1, 3)
    a_e2 = np.asarray(c["area_e2"], np.float32).reshape(-1, 3)
    a_n = np.asarray(c["area_n"], np.float32).reshape(-1, 3)
    a_L = np.asarray(c["area_L"], np.float32).reshape(-1, 3)
    a_area = np.asarray(c["area_area"], np.float32).reshape(-1)
    a_two = c["area_two"]
    has_point, has_env = c["has_point"], c["has_env"]
    lp = np.asarray(c["point_p"], np.float32)
    lI = np.asarray(c["point_I"], np.float32)
    envL = np.asarray(c["env_L"], np.float32)
    rc = np.asarray(c["rc"], np.float32)
    cw = np.asarray(c["cw"], np.float32)
    nx = c["nx"]
    max_depth = c["max_depth"]
    rr_start = c["rr_start_depth"]
    max_iters = spp * (max_depth + 2)
    nx_pow2 = (nx & (nx - 1)) == 0
    nx_shift = int(np.log2(nx)) if nx_pow2 else 0
    LB = sub * 128
    INV_PI = float(1.0 / np.pi)

    def camera_ray(px, py):
        xc = rc[0, 0] * px + rc[0, 1] * py + rc[0, 3]
        yc = rc[1, 0] * px + rc[1, 1] * py + rc[1, 3]
        zc = rc[2, 0] * px + rc[2, 1] * py + rc[2, 3]
        wc = rc[3, 0] * px + rc[3, 1] * py + rc[3, 3]
        inv_w = jnp.where(jnp.abs(wc - 1.0) < 1e-9, 1.0, 1.0 / wc)
        xc, yc, zc = xc * inv_w, yc * inv_w, zc * inv_w
        dxc, dyc, dzc = _normalize(xc, yc, zc)
        dx = cw[0, 0] * dxc + cw[0, 1] * dyc + cw[0, 2] * dzc
        dy = cw[1, 0] * dxc + cw[1, 1] * dyc + cw[1, 2] * dzc
        dz = cw[2, 0] * dxc + cw[2, 1] * dyc + cw[2, 2] * dzc
        return _normalize(dx, dy, dz)

    cam_o = (float(cw[0, 3]), float(cw[1, 3]), float(cw[2, 3]))

    def kernel(seed_ref, tris_ref, out_ref):
        block = pl.program_id(0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
        pix_base = seed_ref[0, 1].astype(jnp.int32)
        pix_i = pix_base + block * LB + lane_i * 128 + lane_j
        pix = pix_i.astype(_U32)
        if nx_pow2:
            px_i = (pix_i & (nx - 1)).astype(jnp.float32)
            py_i = (pix_i >> nx_shift).astype(jnp.float32)
        else:
            pf = pix_i.astype(jnp.float32)
            py_i = jnp.floor(pf * (1.0 / nx) + 1e-6)
            px_i = pf - py_i * nx
        seed_a = jnp.full((sub, 128), seed_ref[0, 0], _U32)
        zf = jnp.zeros((sub, 128), jnp.float32)
        zi = jnp.zeros((sub, 128), jnp.int32)

        def closest_hit(ox, oy, oz, dx, dy, dz):
            """Moller-Trumbore sweep; returns (t, ngx, ngy, ngz, mat,
            light) of the closest hit (t=_BIG, mat=-1 on miss)."""

            def tri(ti, carry):
                (t_b, ngx_b, ngy_b, ngz_b, mat_b, li_b) = carry
                p0x, p0y, p0z = tris_ref[ti, 0], tris_ref[ti, 1], \
                    tris_ref[ti, 2]
                e1x, e1y, e1z = tris_ref[ti, 3], tris_ref[ti, 4], \
                    tris_ref[ti, 5]
                e2x, e2y, e2z = tris_ref[ti, 6], tris_ref[ti, 7], \
                    tris_ref[ti, 8]
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
                b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                b2 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ((jnp.abs(det) > 1e-12) & (b1 >= 0.0) & (b2 >= 0.0)
                      & (b1 + b2 <= 1.0) & (tt > 1e-4) & (tt < t_b))
                t_b = jnp.where(ok, tt, t_b)
                ngx_b = jnp.where(ok, tris_ref[ti, 9], ngx_b)
                ngy_b = jnp.where(ok, tris_ref[ti, 10], ngy_b)
                ngz_b = jnp.where(ok, tris_ref[ti, 11], ngz_b)
                mat_b = jnp.where(ok, tris_ref[ti, 12].astype(jnp.int32),
                                  mat_b)
                li_b = jnp.where(ok, tris_ref[ti, 13].astype(jnp.int32),
                                 li_b)
                return (t_b, ngx_b, ngy_b, ngz_b, mat_b, li_b)

            init = (jnp.full((sub, 128), _BIG, jnp.float32), zf, zf, zf,
                    jnp.full((sub, 128), -1, jnp.int32),
                    jnp.full((sub, 128), -1, jnp.int32))
            return jax.lax.fori_loop(0, n_tri, tri, init)

        def occluded(ox, oy, oz, dx, dy, dz, t_max):
            """Any-hit sweep in (1e-4, t_max)."""

            def tri(ti, occ):
                p0x, p0y, p0z = tris_ref[ti, 0], tris_ref[ti, 1], \
                    tris_ref[ti, 2]
                e1x, e1y, e1z = tris_ref[ti, 3], tris_ref[ti, 4], \
                    tris_ref[ti, 5]
                e2x, e2y, e2z = tris_ref[ti, 6], tris_ref[ti, 7], \
                    tris_ref[ti, 8]
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
                b1 = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                b2 = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                hit = ((jnp.abs(det) > 1e-12) & (b1 >= 0.0) & (b2 >= 0.0)
                       & (b1 + b2 <= 1.0) & (tt > 1e-4) & (tt < t_max))
                return occ | (hit.astype(jnp.int32))

            return jax.lax.fori_loop(0, n_tri, tri, zi) != 0

        def start_path(samp, dim):
            u0, u1, _, _ = _uniform4(seed_a, pix, samp, dim)
            px = px_i + 0.5 + (u0 - 0.5)
            py = py_i + 0.5 + (u1 - 0.5)
            dx, dy, dz = camera_ray(px, py)
            o = (jnp.full_like(zf, cam_o[0]), jnp.full_like(zf, cam_o[1]),
                 jnp.full_like(zf, cam_o[2]))
            return o, (dx, dy, dz), dim + _U32(1)

        o0, d0, _ = start_path(jnp.zeros((sub, 128), _U32),
                               jnp.zeros((sub, 128), _U32))
        ones = jnp.ones_like(zf)
        carry = (
            jnp.zeros((sub, 128), _U32),      # 0 samp
            jnp.full((sub, 128), 1, _U32),    # 1 dim
            jnp.ones((sub, 128), jnp.int32),  # 2 alive
            *o0, *d0,                         # 3..8 o, d
            ones, ones, ones,                 # 9..11 beta
            ones,                             # 12 r_l (scalar: vacuum)
            zf, zf, zf,                       # 13..15 L
            zi,                               # 16 depth
            zf, zf, zf,                       # 17..19 acc
            jnp.int32(0),                     # 20 iter
        )

        def cond(cy):
            return jnp.any(cy[2] != 0) & (cy[20] < max_iters)

        def body(cy):
            (samp, dim, alive_i, ox, oy, oz, dx, dy, dz, b0, b1, b2, rl,
             L0, L1, L2, depth, a0, a1, a2, it) = cy
            alive = alive_i != 0

            t_h, ngx, ngy, ngz, mat_h, li_h = closest_hit(ox, oy, oz,
                                                          dx, dy, dz)
            hit = alive & (mat_h >= -1) & (t_h < _BIG)
            first = depth == 0

            # ---- escaped: env light with MIS ----------------------------
            escaped = alive & ~hit
            if has_env:
                no_mis = escaped & first
                L0 = jnp.where(no_mis, L0 + b0 * float(envL[0]), L0)
                L1 = jnp.where(no_mis, L1 + b1 * float(envL[1]), L1)
                L2 = jnp.where(no_mis, L2 + b2 * float(envL[2]), L2)
                with_mis = escaped & ~first
                den = jnp.maximum(1.0 + rl * (pmf * INV_4PI), 1e-30)
                L0 = jnp.where(with_mis, L0 + b0 * float(envL[0]) / den, L0)
                L1 = jnp.where(with_mis, L1 + b1 * float(envL[1]) / den, L1)
                L2 = jnp.where(with_mis, L2 + b2 * float(envL[2]) / den, L2)
            alive = alive & ~escaped

            # ---- emissive hit (one-sided unless twosided) ---------------
            if n_area:
                cos_o = -(ngx * dx + ngy * dy + ngz * dz)  # dot(n, wo)
                LeR = zf
                LeG = zf
                LeB = zf
                area_l = ones
                for k in range(n_area):
                    sel = li_h == k
                    front = (cos_o > 0) | a_two[k]
                    emit = sel & front
                    LeR = jnp.where(emit, float(a_L[k, 0]), LeR)
                    LeG = jnp.where(emit, float(a_L[k, 1]), LeG)
                    LeB = jnp.where(emit, float(a_L[k, 2]), LeB)
                    area_l = jnp.where(sel, float(a_area[k]), area_l)
                emissive = alive & hit & (li_h >= 0)
                no_mis_s = emissive & first
                L0 = jnp.where(no_mis_s, L0 + b0 * LeR, L0)
                L1 = jnp.where(no_mis_s, L1 + b1 * LeG, L1)
                L2 = jnp.where(no_mis_s, L2 + b2 * LeB, L2)
                # pdf_li_area: pmf * dist^2 / (|cos_l| * area)
                p_l_area = (pmf * t_h * t_h
                            / jnp.maximum(jnp.abs(cos_o) * area_l, 1e-30))
                with_mis_s = emissive & ~first
                den_s = jnp.maximum(1.0 + rl * p_l_area, 1e-30)
                L0 = jnp.where(with_mis_s, L0 + b0 * LeR / den_s, L0)
                L1 = jnp.where(with_mis_s, L1 + b1 * LeG / den_s, L1)
                L2 = jnp.where(with_mis_s, L2 + b2 * LeB / den_s, L2)

            # ---- shading setup ------------------------------------------
            shade = alive & hit & (mat_h >= 0)
            black_hit = alive & hit & (mat_h < 0)  # matless, non-skip
            alive = alive & ~black_hit
            depth_exceeded = shade & (depth >= max_depth)
            alive = alive & ~depth_exceeded
            shade = shade & ~depth_exceeded
            depth = jnp.where(shade, depth + 1, depth)

            hx = ox + t_h * dx
            hy = oy + t_h * dy
            hz = oz + t_h * dz
            # face-forward shading normal toward wo (flat tris: ns == ng)
            cos_d = ngx * dx + ngy * dy + ngz * dz
            sgn_n = jnp.where(cos_d < 0, 1.0, -1.0)
            nsx, nsy, nsz = ngx * sgn_n, ngy * sgn_n, ngz * sgn_n

            albR = zf
            albG = zf
            albB = zf
            for mi in range(albedo.shape[0]):
                selm = mat_h == mi
                albR = jnp.where(selm, float(albedo[mi, 0]), albR)
                albG = jnp.where(selm, float(albedo[mi, 1]), albG)
                albB = jnp.where(selm, float(albedo[mi, 2]), albB)

            # ---- NEE ----------------------------------------------------
            ua, ub, uc, ud = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            lsel = jnp.minimum((ua * n_lights).astype(jnp.int32),
                               n_lights - 1)
            # candidate direction + unocc distance + pdf + L, merged
            wix = zf
            wiy = zf
            wiz = zf
            t_sh = zf
            p_dir = zf
            is_delta = zi
            LR = zf
            LG = zf
            LB_ = zf
            idx = 0
            if has_point:
                selp = lsel == idx
                tlx = float(lp[0]) - hx
                tly = float(lp[1]) - hy
                tlz = float(lp[2]) - hz
                d2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-12)
                dist = jnp.sqrt(d2)
                inv = 1.0 / dist
                wix = jnp.where(selp, tlx * inv, wix)
                wiy = jnp.where(selp, tly * inv, wiy)
                wiz = jnp.where(selp, tlz * inv, wiz)
                t_sh = jnp.where(selp, dist, t_sh)
                p_dir = jnp.where(selp, 1.0, p_dir)
                is_delta = jnp.where(selp, 1, is_delta)
                inv_d2 = 1.0 / d2
                LR = jnp.where(selp, float(lI[0]) * inv_d2, LR)
                LG = jnp.where(selp, float(lI[1]) * inv_d2, LG)
                LB_ = jnp.where(selp, float(lI[2]) * inv_d2, LB_)
                idx += 1
            if n_area:
                # SampleUniformTriangle (sqrt-free variant, sampling.py:141)
                flip = ub < uc
                sb0 = jnp.where(flip, ub * 0.5, ub - uc * 0.5)
                sb1 = jnp.where(flip, uc - sb0, uc * 0.5)
                for k in range(n_area):
                    sela = lsel == (idx + k)
                    plx = (float(a_p0[k, 0]) + sb0 * float(a_e1[k, 0])
                           + sb1 * float(a_e2[k, 0]))
                    ply = (float(a_p0[k, 1]) + sb0 * float(a_e1[k, 1])
                           + sb1 * float(a_e2[k, 1]))
                    plz = (float(a_p0[k, 2]) + sb0 * float(a_e1[k, 2])
                           + sb1 * float(a_e2[k, 2]))
                    tlx, tly, tlz = plx - hx, ply - hy, plz - hz
                    d2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz,
                                     1e-12)
                    dist = jnp.sqrt(d2)
                    inv = 1.0 / dist
                    wx, wy, wz = tlx * inv, tly * inv, tlz * inv
                    cos_l = -(wx * float(a_n[k, 0]) + wy * float(a_n[k, 1])
                              + wz * float(a_n[k, 2]))
                    front = (jnp.abs(cos_l) > 1e-7) if a_two[k] \
                        else (cos_l > 1e-7)
                    pdf_a = d2 / jnp.maximum(
                        jnp.abs(cos_l) * float(a_area[k]), 1e-30)
                    wix = jnp.where(sela, wx, wix)
                    wiy = jnp.where(sela, wy, wiy)
                    wiz = jnp.where(sela, wz, wiz)
                    t_sh = jnp.where(sela, dist * (1.0 - 1e-3), t_sh)
                    p_dir = jnp.where(sela & front, pdf_a, p_dir)
                    LR = jnp.where(sela & front, float(a_L[k, 0]), LR)
                    LG = jnp.where(sela & front, float(a_L[k, 1]), LG)
                    LB_ = jnp.where(sela & front, float(a_L[k, 2]), LB_)
                idx += n_area
            if has_env:
                sele = lsel == idx
                ez = 1.0 - 2.0 * ub
                er = jnp.sqrt(jnp.maximum(1.0 - ez * ez, 0.0))
                ephi = (2.0 * np.pi) * uc
                wix = jnp.where(sele, er * jnp.cos(ephi), wix)
                wiy = jnp.where(sele, er * jnp.sin(ephi), wiy)
                wiz = jnp.where(sele, ez, wiz)
                t_sh = jnp.where(sele, _BIG, t_sh)
                p_dir = jnp.where(sele, INV_4PI, p_dir)
                LR = jnp.where(sele, float(envL[0]), LR)
                LG = jnp.where(sele, float(envL[1]), LG)
                LB_ = jnp.where(sele, float(envL[2]), LB_)

            cos_wi = wix * nsx + wiy * nsy + wiz * nsz
            # diffuse BRDF: f = albedo/pi, pdf = cos/pi (same hemisphere)
            f_w = INV_PI * jnp.maximum(cos_wi, 0.0)  # f_hat scalar part
            spdf = INV_PI * jnp.maximum(cos_wi, 0.0)
            nee_ok = shade & (p_dir > 0) & (f_w > 0) \
                & ((LR > 0) | (LG > 0) | (LB_ > 0))
            # offset + shadow test (only meaningful where nee_ok)
            sox = hx + 1e-4 * nsx
            soy = hy + 1e-4 * nsy
            soz = hz + 1e-4 * nsz
            occ = occluded(sox, soy, soz, wix, wiy, wiz, t_sh)
            nee_ok = nee_ok & ~occ
            p_l = pmf * p_dir
            den_nee = jnp.where(is_delta != 0, p_l,
                                jnp.maximum(p_l + spdf, 1e-30))
            w_nee = f_w / jnp.maximum(den_nee, 1e-30)
            L0 = jnp.where(nee_ok, L0 + b0 * albR * LR * w_nee, L0)
            L1 = jnp.where(nee_ok, L1 + b1 * albG * LG * w_nee, L1)
            L2 = jnp.where(nee_ok, L2 + b2 * albB * LB_ * w_nee, L2)

            # ---- cosine-sampled bounce ----------------------------------
            u4a, u4b, u_rr, _ = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            r_s = jnp.sqrt(u4a)
            phi_s = (2.0 * np.pi) * u4b
            lx = r_s * jnp.cos(phi_s)
            ly = r_s * jnp.sin(phi_s)
            lz = jnp.sqrt(jnp.maximum(1.0 - u4a, 0.0))
            t1, t2 = _coord_system(nsx, nsy, nsz)
            bwx = lx * t1[0] + ly * t2[0] + lz * nsx
            bwy = lx * t1[1] + ly * t2[1] + lz * nsy
            bwz = lx * t1[2] + ly * t2[2] + lz * nsz
            bpdf = INV_PI * jnp.maximum(lz, 1e-12)
            # beta *= f*cos/pdf = albedo (cosine sampling)
            b0n = b0 * albR
            b1n = b1 * albG
            b2n = b2 * albB
            dead_b = shade & (jnp.maximum(jnp.maximum(b0n, b1n), b2n) <= 0)
            alive = alive & ~dead_b
            rl = jnp.where(shade, 1.0 / bpdf, rl)
            b0 = jnp.where(shade, b0n, b0)
            b1 = jnp.where(shade, b1n, b1)
            b2 = jnp.where(shade, b2n, b2)
            ox = jnp.where(shade, hx + 1e-4 * nsx, ox)
            oy = jnp.where(shade, hy + 1e-4 * nsy, oy)
            oz = jnp.where(shade, hz + 1e-4 * nsz, oz)
            dx = jnp.where(shade, bwx, dx)
            dy = jnp.where(shade, bwy, dy)
            dz = jnp.where(shade, bwz, dz)

            # ---- Russian roulette (integrators.cpp:1301-1312) -----------
            rr_max = jnp.maximum(jnp.maximum(b0, b1), b2)
            do_rr = shade & (rr_max < 1.0) & (depth >= rr_start)
            q = jnp.maximum(0.0, 1.0 - rr_max)
            rr_kill = do_rr & (u_rr < q)
            alive = alive & ~rr_kill
            keep = do_rr & ~rr_kill
            inv_keep = 1.0 / jnp.maximum(1.0 - q, 1e-6)
            b0 = jnp.where(keep, b0 * inv_keep, b0)
            b1 = jnp.where(keep, b1 * inv_keep, b1)
            b2 = jnp.where(keep, b2 * inv_keep, b2)

            # ---- commit + regenerate ------------------------------------
            died = ~alive & (samp < spp)
            bad = ~(jnp.isfinite(L0) & jnp.isfinite(L1) & jnp.isfinite(L2))
            L0 = jnp.where(bad, zf, L0)
            L1 = jnp.where(bad, zf, L1)
            L2 = jnp.where(bad, zf, L2)
            a0 = jnp.where(died, a0 + L0, a0)
            a1 = jnp.where(died, a1 + L1, a1)
            a2 = jnp.where(died, a2 + L2, a2)
            has_budget = died & (samp + _U32(1) < spp)
            samp = jnp.where(died, samp + _U32(1), samp)
            o_n, d_n, _ = start_path(samp, jnp.zeros_like(dim))
            dim = jnp.where(has_budget, _U32(1), dim)
            ox = jnp.where(has_budget, o_n[0], ox)
            oy = jnp.where(has_budget, o_n[1], oy)
            oz = jnp.where(has_budget, o_n[2], oz)
            dx = jnp.where(has_budget, d_n[0], dx)
            dy = jnp.where(has_budget, d_n[1], dy)
            dz = jnp.where(has_budget, d_n[2], dz)
            one = jnp.ones_like(b0)
            b0 = jnp.where(has_budget, one, b0)
            b1 = jnp.where(has_budget, one, b1)
            b2 = jnp.where(has_budget, one, b2)
            rl = jnp.where(has_budget, one, rl)
            L0 = jnp.where(has_budget, zf, L0)
            L1 = jnp.where(has_budget, zf, L1)
            L2 = jnp.where(has_budget, zf, L2)
            depth = jnp.where(has_budget, 0, depth)
            alive = alive | has_budget

            return (samp, dim, alive.astype(jnp.int32), ox, oy, oz,
                    dx, dy, dz, b0, b1, b2, rl, L0, L1, L2, depth,
                    a0, a1, a2, it + 1)

        final = jax.lax.while_loop(cond, body, carry)
        a0, a1, a2 = final[17], final[18], final[19]
        scale = c["imaging_ratio"] / spp
        out_ref[0] = a0 * scale
        out_ref[1] = a1 * scale
        out_ref[2] = a2 * scale

    return kernel


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


_KERNEL_CACHE = {}


def _get_callable(c, spp, interpret):
    key = (tuple(sorted((k, v) for k, v in c.items())), spp, interpret)
    fn = _KERNEL_CACHE.get(key)
    if fn is not None:
        return fn
    npix = c["nx"] * c["ny"]
    sub = 64
    while npix % (sub * 128) != 0:
        sub //= 2
    n_blocks = npix // (sub * 128)
    kernel = _make_kernel(c, spp, sub)
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((3, npix // 128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((3, sub, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    @jax.jit
    def fn(seed, tris, base=0):
        sm = jnp.stack([seed.astype(jnp.uint32),
                        jnp.asarray(base, jnp.uint32)]).reshape(1, 2)
        out = call(sm, tris)
        return jnp.transpose(out, (1, 2, 0)).reshape(c["ny"], c["nx"], 3)

    _KERNEL_CACHE[key] = fn
    return fn


def render_surface_pallas(scene, camera, film, spp, cfg, seed,
                          interpret=False):
    """Render the small-triangle-scene class via the surface megakernel.
    Raises ValueError if the scene does not qualify."""
    ct = extract_constants(scene, camera, film, cfg)
    if ct is None:
        raise ValueError("scene not supported by the surface megakernel")
    c, tab = ct
    npix = c["nx"] * c["ny"]
    if npix % 128 != 0:
        raise ValueError("npix must be a multiple of 128")
    fn = _get_callable(c, int(spp), bool(interpret))
    return fn(jnp.asarray(seed, jnp.uint32), jnp.asarray(tab))


def supports(scene, camera, film, cfg):
    ct = extract_constants(scene, camera, film, cfg)
    if ct is None:
        return False
    return (ct[0]["nx"] * ct[0]["ny"]) % 128 == 0
