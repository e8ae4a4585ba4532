"""Pallas TPU megakernel: persistent volumetric path tracing for the
homogeneous-medium scene class.

The general wavefront driver (volpath.render_persistent) steps ~60 f32 of
path state per lane through an XLA ``while_loop`` — every iteration the
carried state round-trips HBM, which is the measured bottleneck (PERF.md).
For the homogeneous scene class — axis-aligned-box medium interfaces,
homogeneous media, ≤1 point light, constant env light, pinhole perspective
camera, box filter — the entire path life-cycle fits in ONE Pallas kernel:

- one lane per pixel, persistent: a lane finishes a path, commits its
  radiance to a VMEM accumulator and immediately starts its next sample;
- all state lives in vector registers / VMEM for the whole render; the only
  HBM traffic is the final per-pixel accumulator (3 floats/pixel);
- the physics is the exact estimator of the jnp path:
  ``volpath._homogeneous_medium_interaction`` (closed-form single-step
  delta tracking, reference media.h:221 HomogeneousMedium +
  cpu/integrators.cpp:1022-1124 collision algebra),
  ``volpath.sample_ld_volume`` (NEE with analytic homogeneous
  transmittance, cpu/integrators.cpp:1319-1434) and the escaped-ray env
  MIS (cpu/integrators.cpp:1127-1143), all with the RGB hero-channel
  rescaled-pdf bookkeeping (spectrum.h:380-391).

Scene constants (σ, lights, box, camera matrices) are baked into the kernel
at trace time — the scene class is small enough that re-jitting per scene is
the right trade (same philosophy as the reference's template-specialized
wavefront kernels, wavefront/integrator.cpp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
INV_4PI = 1.0 / (4.0 * np.pi)
_BIG = 3e37


def _pcg4d(a, b, c, d):
    """pcg4d (utils/rng.py) with numpy-scalar constants — Pallas kernels
    may not capture jax-array constants, so the multipliers must be np."""
    mult = np.uint32(1664525)
    inc = np.uint32(1013904223)
    a = a * mult + inc
    b = b * mult + inc
    c = c * mult + inc
    d = d * mult + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> np.uint32(16))
    b = b ^ (b >> np.uint32(16))
    c = c ^ (c >> np.uint32(16))
    d = d ^ (d >> np.uint32(16))
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit_float(u):
    # Mosaic has no u32->f32 cast; >>8 clears the top bits so the i32
    # round-trip is exact (value < 2^24)
    return (u >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) \
        * np.float32(1.0 / (1 << 24))


# ---------------------------------------------------------------------------
# Support predicate + constant extraction
# ---------------------------------------------------------------------------


def extract_constants(scene, camera, film, cfg):
    """Return the baked-constant dict if the scene/camera/film qualify for
    the megakernel, else None."""
    try:
        from ..models.cameras import PerspectiveCamera
        from ..models.filters import Filter  # noqa: F401

        if not isinstance(camera, PerspectiveCamera):
            return None
        if getattr(camera, "lens_radius", 0.0) > 0:
            return None
        if getattr(cfg, "spectral", False):
            return None
        g = scene.geometry
        n_tri = int(g.tri_p0.shape[0])
        n_other = (int(g.sph_c.shape[0]) + int(g.dsk_c.shape[0])
                   + int(g.cyl_c.shape[0]) + int(g.blp_p00.shape[0]))
        n_box = int(g.box_min.shape[0])
        if n_tri or n_other or n_box != 1:
            return None
        if int(np.asarray(g.box_mat)[0]) >= 0:
            return None
        med_in = int(np.asarray(g.box_med_in)[0])
        med_out = int(np.asarray(g.box_med_out)[0])
        if med_in != 0 or med_out != -1:
            return None
        m = scene.media
        if len(m.grids) or len(m.procedurals):
            return None
        if int(m.h_sigma_a.shape[0]) != 1:
            return None
        if float(np.asarray(m.h_Le).max()) > 0:
            return None
        li = scene.lights
        if (li.n_spot or li.n_gonio or li.n_proj or li.n_distant
                or li.n_area):
            return None
        if li.n_point > 1:
            return None
        if li.portal is not None or getattr(li, "has_env_img", False):
            return None
        if getattr(li, "bvh", None) is not None:
            return None
        # film: box filter (radius 0.5 jitter), identity sensor
        if film.filter.kind != "box":
            return None
        if abs(float(film.filter.radius) - 0.5) > 1e-6:
            return None
        if not np.allclose(np.asarray(film.sensor_matrix), np.eye(3)):
            return None
        if not np.isinf(film.max_component):
            return None

        has_env = bool(li.has_env)
        has_point = int(li.n_point) == 1
        if not (has_env or has_point):
            return None
        c = dict(
            sigma_a=tuple(float(x) for x in np.asarray(m.h_sigma_a)[0]),
            sigma_s=tuple(float(x) for x in np.asarray(m.h_sigma_s)[0]),
            g_hg=float(np.asarray(m.h_g)[0]),
            bmin=tuple(float(x) for x in np.asarray(g.box_min)[0]),
            bmax=tuple(float(x) for x in np.asarray(g.box_max)[0]),
            has_point=has_point,
            has_env=has_env,
            point_p=(tuple(float(x) for x in np.asarray(li.point_p)[0])
                     if has_point else (0.0, 0.0, 0.0)),
            point_I=(tuple(float(x) for x in np.asarray(li.point_I)[0])
                     if has_point else (0.0, 0.0, 0.0)),
            env_L=(tuple(float(x) for x in np.asarray(li.env_L))
                   if has_env else (0.0, 0.0, 0.0)),
            # raster -> camera: z=0 plane, so fold column 2 out
            rc=tuple(tuple(float(x) for x in row)
                     for row in np.asarray(camera.raster_to_camera.m)),
            cw=tuple(tuple(float(x) for x in row)
                     for row in np.asarray(camera.camera_to_world.m)),
            nx=int(film.resolution[0]),
            ny=int(film.resolution[1]),
            imaging_ratio=float(film.imaging_ratio),
            max_depth=int(cfg.max_depth),
            max_events=int(cfg.max_events),
        )
        return c
    except Exception:
        return None


# ---------------------------------------------------------------------------
# In-kernel math helpers (component-wise on (SUB, 128) f32 arrays)
# ---------------------------------------------------------------------------


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _coord_system(vx, vy, vz):
    """Duff et al. branchless ONB (utils/vecmath.coordinate_system)."""
    sign = jnp.where(vz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + vz)
    b = vx * vy * a
    t1 = (1.0 + sign * vx * vx * a, sign * b, -sign * vx)
    t2 = (b, sign + vy * vy * a, -vy)
    return t1, t2


def _hg_value(cos_theta, g):
    g = np.clip(g, -0.99, 0.99)
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    denom = jnp.maximum(denom, 1e-12)
    return INV_4PI * (1.0 - g * g) / (denom * jnp.sqrt(denom))


def _sample_hg(wox, woy, woz, g, u0, u1):
    """(utils/sampling.sample_henyey_greenstein, g static): returns
    (wix, wiy, wiz, pdf); cosθ measured in the +wo frame."""
    g = float(np.clip(g, -0.99, 0.99))
    if abs(g) < 1e-3:
        cos_theta = 1.0 - 2.0 * u0
    else:
        sq = (1.0 - g * g) / (1.0 + g - 2.0 * g * u0)
        cos_theta = -(1.0 + g * g - sq * sq) / (2.0 * g)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = (2.0 * np.pi) * u1
    lx = sin_theta * jnp.cos(phi)
    ly = sin_theta * jnp.sin(phi)
    lz = cos_theta
    t1, t2 = _coord_system(wox, woy, woz)
    wix = lx * t1[0] + ly * t2[0] + lz * wox
    wiy = lx * t1[1] + ly * t2[1] + lz * woy
    wiz = lx * t1[2] + ly * t2[2] + lz * woz
    return wix, wiy, wiz, _hg_value(cos_theta, g)


def _box_hit(ox, oy, oz, dx, dy, dz, bmin, bmax):
    """Slab test. Returns (hit, t_hit, entering): entering = the hit is the
    near face (origin outside); ~entering = exit face (origin inside)."""
    eps = 1e-4
    hit_t = None
    t_n = jnp.full_like(ox, -_BIG)
    t_f = jnp.full_like(ox, _BIG)
    for (o_c, d_c, lo, hi) in ((ox, dx, bmin[0], bmax[0]),
                               (oy, dy, bmin[1], bmax[1]),
                               (oz, dz, bmin[2], bmax[2])):
        inv = 1.0 / jnp.where(jnp.abs(d_c) < 1e-12,
                              jnp.where(d_c >= 0, 1e-12, -1e-12), d_c)
        t0 = (lo - o_c) * inv
        t1 = (hi - o_c) * inv
        lo_t = jnp.minimum(t0, t1)
        hi_t = jnp.maximum(t0, t1)
        t_n = jnp.maximum(t_n, lo_t)
        t_f = jnp.minimum(t_f, hi_t)
    ok = (t_n <= t_f) & (t_f > eps)
    entering = t_n > eps
    hit_t = jnp.where(entering, t_n, t_f)
    return ok, jnp.where(ok, hit_t, _BIG), entering


def _uniform4(seed, pix, samp, dim):
    a, b, c, d = _pcg4d(pix, samp, dim, seed)
    return (_to_unit_float(a), _to_unit_float(b), _to_unit_float(c),
            _to_unit_float(d))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(c, spp, sub):
    """Build the kernel fn with constants `c` baked in. Lane layout: the
    block covers LB = sub*128 consecutive pixels, lane (i, j) -> pixel
    block_start + i*128 + j; each lane traces all `spp` samples of its
    pixel back-to-back."""
    sa = np.asarray(c["sigma_a"], np.float32)
    ss = np.asarray(c["sigma_s"], np.float32)
    st = sa + ss
    g_hg = c["g_hg"]
    bmin, bmax = c["bmin"], c["bmax"]
    has_point, has_env = c["has_point"], c["has_env"]
    lp = np.asarray(c["point_p"], np.float32)
    lI = np.asarray(c["point_I"], np.float32)
    envL = np.asarray(c["env_L"], np.float32)
    n_lights = int(has_point) + int(has_env)
    pmf = 1.0 / max(n_lights, 1)
    rc = np.asarray(c["rc"], np.float32)  # (4,4) raster->camera
    cw = np.asarray(c["cw"], np.float32)  # (4,4) camera->world
    nx = c["nx"]
    max_depth = c["max_depth"]
    max_iters = spp * c["max_events"]
    nx_pow2 = (nx & (nx - 1)) == 0
    nx_shift = int(np.log2(nx)) if nx_pow2 else 0
    LB = sub * 128

    def chan(vec3, h):
        """Select the hero channel of a per-channel constant triple."""
        return jnp.where(h == 0, float(vec3[0]),
                         jnp.where(h == 1, float(vec3[1]), float(vec3[2])))

    def exp3(coef, t):
        """(exp(-coef[k] * t) for k in 0..2) for a constant triple."""
        return tuple(jnp.exp(-float(coef[k]) * t) for k in range(3))

    def avg3(v):
        return (v[0] + v[1] + v[2]) * (1.0 / 3.0)

    def camera_ray(px, py):
        """Continuous raster coords -> (o fixed world origin, d world)."""
        # p_cam = rc @ (px, py, 0, 1), perspective divide
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

    def kernel(seed_ref, out_ref):
        block = pl.program_id(0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
        pix_i = block * LB + lane_i * 128 + lane_j  # int32
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

        def start_path(samp, dim):
            """Camera ray + fresh state for sample index `samp`."""
            u0, u1, u2, _ = _uniform4(seed_a, pix, samp, dim)
            px = px_i + 0.5 + (u0 - 0.5)
            py = py_i + 0.5 + (u1 - 0.5)
            dx, dy, dz = camera_ray(px, py)
            hero = jnp.minimum(jnp.floor(u2 * 3.0).astype(jnp.int32), 2)
            o = (jnp.full_like(zf, cam_o[0]), jnp.full_like(zf, cam_o[1]),
                 jnp.full_like(zf, cam_o[2]))
            return o, (dx, dy, dz), hero, dim + _U32(1)

        o0, d0, hero0, _ = start_path(jnp.zeros((sub, 128), _U32),
                                      jnp.zeros((sub, 128), _U32))
        ones3 = (jnp.ones_like(zf),) * 3
        zeros3 = (zf,) * 3

        # carry layout (flat tuple)
        carry = (
            jnp.zeros((sub, 128), _U32),     # 0 samp
            jnp.full((sub, 128), 1, _U32),   # 1 dim (camera used dim 0)
            jnp.ones((sub, 128), jnp.int32),  # 2 alive (i32: Mosaic can't
            #   carry i1 vectors through scf.while)
            *o0,                              # 3..5 o
            *d0,                              # 6..8 d
            *ones3,                           # 9..11 beta
            *ones3,                           # 12..14 r_u
            *ones3,                           # 15..17 r_l
            *zeros3,                          # 18..20 L
            zi,                               # 21 depth
            hero0,                            # 22 hero
            jnp.full((sub, 128), -1, jnp.int32),  # 23 medium
            *zeros3,                          # 24..26 acc
            jnp.int32(0),                     # 27 iter
        )

        def cond(cy):
            return jnp.any(cy[2] != 0) & (cy[27] < max_iters)

        def body(cy):
            (samp, dim, alive_i, ox, oy, oz, dx, dy, dz,
             b0, b1, b2, ru0, ru1, ru2, rl0, rl1, rl2,
             L0, L1, L2, depth, hero, med, a0, a1, a2, it) = cy
            alive = alive_i != 0

            st_h = chan(st, hero)
            sa_h = chan(sa, hero)
            ss_h = chan(ss, hero)

            hit, t_wall, entering = _box_hit(ox, oy, oz, dx, dy, dz,
                                             bmin, bmax)
            in_med = alive & (med == 0)
            seg = jnp.where(hit, t_wall, _BIG)

            # -- closed-form homogeneous collision ------------------------
            ua, ub, uc, ud = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            t_coll = -jnp.log1p(-ua) / jnp.maximum(st_h, 1e-30)
            t_coll = jnp.where(st_h > 0, t_coll, _BIG)
            coll = in_med & (t_coll < seg)

            # ran-to-end spectral rescale: exp(-seg (σ - σ_h))
            ran = in_med & ~coll
            segc = jnp.minimum(seg, _BIG)
            Te = exp3(st, segc)
            Te_h = jnp.maximum(jnp.exp(-st_h * segc), 1e-30)
            se = tuple(Te[k] / Te_h for k in range(3))
            b0 = jnp.where(ran, b0 * se[0], b0)
            b1 = jnp.where(ran, b1 * se[1], b1)
            b2 = jnp.where(ran, b2 * se[2], b2)
            ru0 = jnp.where(ran, ru0 * se[0], ru0)
            ru1 = jnp.where(ran, ru1 * se[1], ru1)
            ru2 = jnp.where(ran, ru2 * se[2], ru2)
            rl0 = jnp.where(ran, rl0 * se[0], rl0)
            rl1 = jnp.where(ran, rl1 * se[1], rl1)
            rl2 = jnp.where(ran, rl2 * se[2], rl2)

            # collision: absorb vs scatter (p_null = 0)
            p_absorb = sa_h / jnp.maximum(st_h, 1e-30)
            is_absorb = coll & (ub < p_absorb)
            is_scatter = coll & ~is_absorb
            depth_exceeded = is_scatter & (depth >= max_depth)
            terminated = is_absorb | depth_exceeded
            scat = is_scatter & ~depth_exceeded
            depth = jnp.where(scat, depth + 1, depth)
            Tm = exp3(st, t_coll)
            Tm_h = jnp.maximum(jnp.exp(-st_h * t_coll), 1e-30)
            pdf_s = jnp.maximum(Tm_h * ss_h, 1e-30)
            sc = tuple(Tm[k] * float(ss[k]) / pdf_s for k in range(3))
            b0 = jnp.where(scat, b0 * sc[0], b0)
            b1 = jnp.where(scat, b1 * sc[1], b1)
            b2 = jnp.where(scat, b2 * sc[2], b2)
            ru0 = jnp.where(scat, ru0 * sc[0], ru0)
            ru1 = jnp.where(scat, ru1 * sc[1], ru1)
            ru2 = jnp.where(scat, ru2 * sc[2], ru2)
            alive = alive & ~terminated

            # scatter point
            sx = ox + t_coll * dx
            sy = oy + t_coll * dy
            sz = oz + t_coll * dz
            wox, woy, woz = -dx, -dy, -dz

            # -- NEE (sample_ld_volume, analytic homogeneous Tr) ----------
            u_sel = uc
            u2a, u2b = ud, None
            un0, un1, _, _ = _uniform4(seed_a, pix, samp, dim)
            dim = dim + _U32(1)
            if has_point:
                plx = sx - float(lp[0])
                ply = sy - float(lp[1])
                plz = sz - float(lp[2])
                dist2 = jnp.maximum(plx * plx + ply * ply + plz * plz, 1e-12)
                dist = jnp.sqrt(dist2)
                inv_dist = 1.0 / dist
                wix = -plx * inv_dist
                wiy = -ply * inv_dist
                wiz = -plz * inv_dist
                cos_wi = _dot(wox, woy, woz, wix, wiy, wiz)
                f_hg = _hg_value(cos_wi, g_hg)
                # medium chord toward the light: the shadow ray leaves the
                # box at t_exit (vacuum outside), so the attenuated length
                # is min(dist, t_exit) — supports lights inside AND outside
                _, t_exit_p, _ = _box_hit(sx, sy, sz, wix, wiy, wiz,
                                          bmin, bmax)
                Tr = exp3(st, jnp.minimum(dist, t_exit_p))
                # delta light: denom = avg(tr_l * r_u * pmf * 1)
                denom = jnp.maximum(avg3((ru0 * pmf, ru1 * pmf, ru2 * pmf)),
                                    1e-30)
                sel_pt = (u_sel < pmf * 1.0) if has_env else (u_sel >= -1.0)
                okp = scat & sel_pt & (f_hg > 0)
                w = f_hg / (dist2 * denom)
                L0 = jnp.where(okp, L0 + b0 * Tr[0] * float(lI[0]) * w, L0)
                L1 = jnp.where(okp, L1 + b1 * Tr[1] * float(lI[1]) * w, L1)
                L2 = jnp.where(okp, L2 + b2 * Tr[2] * float(lI[2]) * w, L2)
            if has_env:
                # uniform-sphere env sample
                ez = 1.0 - 2.0 * u2a
                er = jnp.sqrt(jnp.maximum(1.0 - ez * ez, 0.0))
                ephi = (2.0 * np.pi) * u2b if u2b is not None else \
                    (2.0 * np.pi) * un0
                wix = er * jnp.cos(ephi)
                wiy = er * jnp.sin(ephi)
                wiz = ez
                cos_wi = _dot(wox, woy, woz, wix, wiy, wiz)
                f_hg = _hg_value(cos_wi, g_hg)
                # distance to wall along wi from inside
                _, t_exit, _ = _box_hit(sx, sy, sz, wix, wiy, wiz,
                                        bmin, bmax)
                Tr = exp3(st, jnp.minimum(t_exit, _BIG))
                p_l = pmf * INV_4PI
                denom = jnp.maximum(
                    avg3((ru0 * p_l + ru0 * f_hg,
                          ru1 * p_l + ru1 * f_hg,
                          ru2 * p_l + ru2 * f_hg)), 1e-30)
                sel_env = (u_sel >= pmf) if has_point else (u_sel >= -1.0)
                oke = scat & sel_env & (f_hg > 0)
                w = f_hg / denom
                L0 = jnp.where(oke, L0 + b0 * Tr[0] * float(envL[0]) * w, L0)
                L1 = jnp.where(oke, L1 + b1 * Tr[1] * float(envL[1]) * w, L1)
                L2 = jnp.where(oke, L2 + b2 * Tr[2] * float(envL[2]) * w, L2)

            # -- phase sampling -------------------------------------------
            pwx, pwy, pwz, ppdf = _sample_hg(wox, woy, woz, g_hg, un1,
                                             _uniform4(seed_a, pix, samp,
                                                       dim)[0])
            dim = dim + _U32(1)
            bad_phase = scat & (ppdf <= 0)
            alive = alive & ~bad_phase
            inv_ppdf = 1.0 / jnp.maximum(ppdf, 1e-30)
            rl0 = jnp.where(scat, ru0 * inv_ppdf, rl0)
            rl1 = jnp.where(scat, ru1 * inv_ppdf, rl1)
            rl2 = jnp.where(scat, ru2 * inv_ppdf, rl2)
            ox = jnp.where(scat, sx, ox)
            oy = jnp.where(scat, sy, oy)
            oz = jnp.where(scat, sz, oz)
            dx = jnp.where(scat, pwx, dx)
            dy = jnp.where(scat, pwy, dy)
            dz = jnp.where(scat, pwz, dz)

            # -- non-scattered lanes: escape / interface skip -------------
            flew = alive & ~scat & ~coll
            escaped = flew & ~hit
            if has_env:
                first = depth == 0
                ru_avg = jnp.maximum(avg3((ru0, ru1, ru2)), 1e-30)
                no_mis = escaped & first
                L0 = jnp.where(no_mis, L0 + b0 * float(envL[0]) / ru_avg, L0)
                L1 = jnp.where(no_mis, L1 + b1 * float(envL[1]) / ru_avg, L1)
                L2 = jnp.where(no_mis, L2 + b2 * float(envL[2]) / ru_avg, L2)
                with_mis = escaped & ~first
                p_esc = pmf * INV_4PI
                den = jnp.maximum(avg3((ru0 + rl0 * p_esc,
                                        ru1 + rl1 * p_esc,
                                        ru2 + rl2 * p_esc)), 1e-30)
                L0 = jnp.where(with_mis, L0 + b0 * float(envL[0]) / den, L0)
                L1 = jnp.where(with_mis, L1 + b1 * float(envL[1]) / den, L1)
                L2 = jnp.where(with_mis, L2 + b2 * float(envL[2]) / den, L2)
            alive = alive & ~escaped

            iface = alive & flew & hit
            med = jnp.where(iface, jnp.where(entering, 0, -1), med)
            ox = jnp.where(iface, ox + (t_wall + 1e-4) * dx, ox)
            oy = jnp.where(iface, oy + (t_wall + 1e-4) * dy, oy)
            oz = jnp.where(iface, oz + (t_wall + 1e-4) * dz, oz)

            # -- commit + regenerate dead lanes ---------------------------
            died = ~alive & (samp < spp)  # includes init-dead & this-iter
            # NaN/Inf scrub at commit (RayIntegrator, integrators.cpp:308)
            bad = ~(jnp.isfinite(L0) & jnp.isfinite(L1) & jnp.isfinite(L2))
            L0 = jnp.where(bad, zf, L0)
            L1 = jnp.where(bad, zf, L1)
            L2 = jnp.where(bad, zf, L2)
            a0 = jnp.where(died, a0 + L0, a0)
            a1 = jnp.where(died, a1 + L1, a1)
            a2 = jnp.where(died, a2 + L2, a2)
            has_budget = died & (samp + _U32(1) < spp)
            samp = jnp.where(died, samp + _U32(1), samp)
            o_n, d_n, hero_n, _ = start_path(samp, jnp.zeros_like(dim))
            dim = jnp.where(has_budget, _U32(1), dim)
            ox = jnp.where(has_budget, o_n[0], ox)
            oy = jnp.where(has_budget, o_n[1], oy)
            oz = jnp.where(has_budget, o_n[2], oz)
            dx = jnp.where(has_budget, d_n[0], dx)
            dy = jnp.where(has_budget, d_n[1], dy)
            dz = jnp.where(has_budget, d_n[2], dz)
            hero = jnp.where(has_budget, hero_n, hero)
            one = jnp.ones_like(b0)
            b0 = jnp.where(has_budget, one, b0)
            b1 = jnp.where(has_budget, one, b1)
            b2 = jnp.where(has_budget, one, b2)
            ru0 = jnp.where(has_budget, one, ru0)
            ru1 = jnp.where(has_budget, one, ru1)
            ru2 = jnp.where(has_budget, one, ru2)
            rl0 = jnp.where(has_budget, one, rl0)
            rl1 = jnp.where(has_budget, one, rl1)
            rl2 = jnp.where(has_budget, one, rl2)
            L0 = jnp.where(has_budget, zf, L0)
            L1 = jnp.where(has_budget, zf, L1)
            L2 = jnp.where(has_budget, zf, L2)
            depth = jnp.where(has_budget, 0, depth)
            med = jnp.where(has_budget, -1, med)
            alive = alive | has_budget

            return (samp, dim, alive.astype(jnp.int32), ox, oy, oz,
                    dx, dy, dz, b0, b1, b2, ru0, ru1, ru2, rl0, rl1, rl2,
                    L0, L1, L2, depth, hero, med, a0, a1, a2, it + 1)

        final = jax.lax.while_loop(cond, body, carry)
        a0, a1, a2 = final[24], final[25], final[26]
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
    """Memoized jitted megakernel render fn for (constants, spp)."""
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((3, sub, 128), lambda b: (0, b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    @jax.jit
    def fn(seed):
        out = call(jnp.reshape(seed.astype(jnp.uint32), (1, 1)))
        return jnp.transpose(out, (1, 2, 0)).reshape(c["ny"], c["nx"], 3)

    _KERNEL_CACHE[key] = fn
    return fn


def render_homog_pallas(scene, camera, film, spp, cfg, seed,
                        interpret=False):
    """Render via the megakernel. Caller must have verified support via
    extract_constants (raises ValueError otherwise). Returns (ny, nx, 3)."""
    c = extract_constants(scene, camera, film, cfg)
    if c is None:
        raise ValueError("scene not supported by the homogeneous megakernel")
    npix = c["nx"] * c["ny"]
    if npix % 128 != 0:
        raise ValueError("npix must be a multiple of 128")
    return _get_callable(c, int(spp), bool(interpret))(
        jnp.asarray(seed, jnp.uint32))


def supports(scene, camera, film, cfg):
    c = extract_constants(scene, camera, film, cfg)
    if c is None:
        return False
    return (c["nx"] * c["ny"]) % 128 == 0
