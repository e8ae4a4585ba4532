"""SPPM — stochastic progressive photon mapping.

Analog of the reference's ``SPPMIntegrator`` (cpu/integrators.h:831,
cpu/integrators.cpp:1972-2380): per iteration a camera pass finds one
visible point per pixel (accumulating emitted + NEE direct light along the
way), a photon pass traces light particles and deposits flux on nearby
visible points, and the per-pixel radius/flux statistics shrink with
alpha = 2/3 (Knaus-Zwicker progressive update).

TPU re-design of the photon->visible-point gather: instead of the
reference's lock-free spatial hash of VP lists (integrators.cpp:2072-2143),
photons are binned to a uniform grid keyed by cell id, sorted once per
iteration (XLA sort), and every visible point scans the photons of its 27
neighbor cells through `searchsorted` ranges with a fixed per-cell budget —
a dense, divergence-free gather that keeps the MXU/VPU busy instead of
chasing linked lists. Surfaces only, like the reference's SPPM.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.intersect import offset_ray_origin
from ...utils.spectrum import average, sample_hero_channel
from ...utils.vecmath import coordinate_system, dot, face_forward, normalize
from ..materials import bsdf_f, bsdf_sample
from ..samplers import LaneSampler
from . import volpath as vp
from .volpath import Scene, VolPathConfig, _m

INF = jnp.inf


class SPPMConfig(NamedTuple):
    max_depth: int = 5
    initial_radius: float = 0.2
    alpha: float = 2.0 / 3.0
    photons_per_iter: int = 0  # 0 = one per pixel
    grid_res: int = 64  # photon binning grid resolution (cube)
    max_per_cell: int = 64  # photon scan budget per neighbor cell


class PixelStats(NamedTuple):
    radius: jnp.ndarray  # (npix,)
    n: jnp.ndarray  # (npix,) accumulated photon count (smoothed)
    tau: jnp.ndarray  # (npix,3) accumulated flux
    Ld: jnp.ndarray  # (npix,3) direct+emitted running sum


def _camera_pass(scene, cfg, scfg, camera, film, seed, it):
    """One sample per pixel: returns visible points + direct radiance."""
    npix = film.npix
    pixel_id = jnp.arange(npix, dtype=jnp.int32)
    s, fw = vp.start_camera_paths(camera, film, seed, jnp.uint32(it),
                                  pixel_id, -1)
    sampler = s.sampler
    o, d, beta = s.o, s.d, s.beta
    L = jnp.zeros((npix, 3))
    alive = jnp.ones(npix, bool)
    specular = jnp.ones(npix, bool)  # camera rays count as specular for Le
    vp_set = jnp.zeros(npix, bool)
    vp_p = jnp.zeros((npix, 3))
    vp_wo = jnp.zeros((npix, 3))
    vp_ns = jnp.zeros((npix, 3))
    vp_beta = jnp.zeros((npix, 3))
    vp_mat = jnp.full(npix, -1, jnp.int32)
    vp_uv = jnp.zeros((npix, 2))
    hero = s.hero_idx
    prev_p = o

    for depth in range(scfg.max_depth):
        h = scene.geometry.intersect(o, d, jnp.full(npix, INF))
        escaped = alive & ~h.hit
        Le_env = scene.lights.le_escaped(d)
        L = _m(escaped & specular, L + beta * Le_env, L)
        alive = alive & ~escaped

        surf = alive & h.hit
        emissive = surf & (h.light_id >= 0)
        Le_s = scene.lights.le_area(h.light_id, -d, h.n)
        L = _m(emissive & specular, L + beta * Le_s, L)

        iface = surf & (h.mat_id < 0)
        o = _m(iface, h.p + 1e-4 * d, o)
        shade = surf & (h.mat_id >= 0)

        lanes = scene.materials.gather_textured(scene.textures, h.mat_id,
                                                h.uv, h.p)
        ns = face_forward(h.ns, h.n)
        t1, t2 = coordinate_system(ns)

        def to_local(w):
            return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], -1)

        def to_world(w):
            return w[..., 0:1] * t1 + w[..., 1:2] * t2 + w[..., 2:3] * ns

        # NEE direct lighting at this vertex (integrators.cpp:2052-2066)
        p_off = offset_ray_origin(h.p, h.n, -d)
        can_nee = shade & ~lanes.is_specular
        sampler, u_sel = sampler.get_1d()
        sampler, u2l = sampler.get_2d()
        ls = scene.lights.sample(p_off, u_sel, u2l)
        ok = can_nee & ls.valid & (average(ls.L) > 0)
        wi_l = to_local(ls.wi)
        f_l = bsdf_f(lanes, to_local(-d), wi_l) * jnp.abs(dot(ls.wi, ns))[..., None]
        ok &= jnp.max(f_l, -1) > 0
        occ = scene.geometry.intersect_p(p_off, ls.wi, ls.t_shadow)
        contrib = beta * f_l * ls.L / jnp.maximum(
            ls.select_pmf * ls.pdf_dir, 1e-30)[..., None]
        L = _m(ok & ~occ, L + contrib, L)

        # create the visible point at the first diffuse vertex
        diffuse_here = shade & ~lanes.is_specular
        new_vp = diffuse_here & ~vp_set
        vp_set = vp_set | new_vp
        vp_p = _m(new_vp, h.p, vp_p)
        vp_wo = _m(new_vp, -d, vp_wo)
        vp_ns = _m(new_vp, ns, vp_ns)
        vp_beta = _m(new_vp, beta, vp_beta)
        vp_mat = jnp.where(new_vp, h.mat_id, vp_mat)
        vp_uv = _m(new_vp, h.uv, vp_uv)
        alive = alive & ~new_vp

        # continue through specular surfaces only
        sampler, u_lobe = sampler.get_1d()
        sampler, u2b = sampler.get_2d()
        bs = bsdf_sample(lanes, to_local(-d), u_lobe, u2b)
        wi_w = normalize(to_world(bs.wi))
        go = alive & shade & bs.valid & (bs.pdf > 0)
        beta = _m(go, beta * bs.f * jnp.abs(dot(wi_w, ns))[..., None]
                  / jnp.maximum(bs.pdf, 1e-30)[..., None], beta)
        prev_p = _m(go, h.p, prev_p)
        o = _m(go, offset_ray_origin(h.p, h.n, wi_w), o)
        d = _m(go, wi_w, d)
        specular = jnp.where(go, bs.is_specular, specular)
        alive = go | (alive & iface)

    return (sampler, L, vp_set, vp_p, vp_wo, vp_ns, vp_beta, vp_mat, vp_uv)


def _photon_pass(scene, cfg, scfg, seed, it, n_photons, bounds_lo, extent,
                 vp_set, vp_p, vp_wo, vp_ns, vp_beta, vp_mat, vp_uv, radius):
    """Trace photons, deposit flux on the visible points via the sorted
    cell grid. Returns (phi (npix,3), m (npix,) photon counts)."""
    P = n_photons
    lane = jnp.arange(P, dtype=jnp.uint32)
    sampler = LaneSampler.start(seed ^ jnp.uint32(0x9E3779B9), lane,
                                jnp.uint32(it))
    sampler, u_sel = sampler.get_1d()
    sampler, u_side = sampler.get_1d()
    sampler, u2a = sampler.get_2d()
    sampler, u2b = sampler.get_2d()
    p0, d0, alpha0, n_l, is_area, valid, _ = scene.lights.sample_le(
        u_sel, u_side, u2a, u2b)
    p0 = jnp.where(is_area[..., None], offset_ray_origin(p0, n_l, d0), p0)

    G = scfg.grid_res
    # the 27-neighbor scan only sees +-1 cell: the cell width must cover the
    # largest live search radius (the reference recomputes its hash-grid
    # resolution from maxRadius each iteration, integrators.cpp:2075-2092)
    max_r = jnp.max(jnp.where(vp_set, radius, 0.0))
    cell_w = jnp.maximum(jnp.maximum(jnp.max(extent) / G, 1e-6), max_r)

    def cell_of(p):
        c = jnp.clip(((p - bounds_lo) / cell_w).astype(jnp.int32), 0, G - 1)
        return (c[..., 0] * G + c[..., 1]) * G + c[..., 2]

    # photon vertex storage: max_depth bounces
    ph_p = jnp.zeros((scfg.max_depth, P, 3))
    ph_wi = jnp.zeros((scfg.max_depth, P, 3))
    ph_beta = jnp.zeros((scfg.max_depth, P, 3))
    ph_ok = jnp.zeros((scfg.max_depth, P), bool)

    o, d, beta, alive = p0, d0, alpha0, valid
    for depth in range(scfg.max_depth):
        h = scene.geometry.intersect(o, d, jnp.full(P, INF))
        shade = alive & h.hit & (h.mat_id >= 0)
        iface = alive & h.hit & (h.mat_id < 0)
        lanes = scene.materials.gather_textured(scene.textures, h.mat_id,
                                                h.uv, h.p)
        ns = face_forward(h.ns, h.n)
        # deposit only after the first bounce (direct light handled by NEE,
        # integrators.cpp:2219-2225) and only on non-specular photons' hits
        dep = shade & (depth > 0) & ~lanes.is_specular
        ph_p = ph_p.at[depth].set(h.p)
        ph_wi = ph_wi.at[depth].set(-d)
        ph_beta = ph_beta.at[depth].set(beta)
        ph_ok = ph_ok.at[depth].set(dep)
        # scatter
        t1, t2 = coordinate_system(ns)

        def to_local(w):
            return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], -1)

        def to_world(w):
            return w[..., 0:1] * t1 + w[..., 1:2] * t2 + w[..., 2:3] * ns

        sampler, u_lobe = sampler.get_1d()
        sampler, u2s = sampler.get_2d()
        bs = bsdf_sample(lanes, to_local(-d), u_lobe, u2s)
        wi_w = normalize(to_world(bs.wi))
        go = shade & bs.valid & (bs.pdf > 0)
        beta_new = beta * bs.f * jnp.abs(dot(wi_w, ns))[..., None] \
            / jnp.maximum(bs.pdf, 1e-30)[..., None]
        # photon RR keeping throughput bounded (integrators.cpp:2307-2316)
        q = jnp.clip(1.0 - jnp.max(beta_new, -1)
                     / jnp.maximum(jnp.max(beta, -1), 1e-30), 0.0, 0.95)
        sampler, u_rr = sampler.get_1d()
        kill = go & (u_rr < q)
        beta = _m(go & ~kill, beta_new / jnp.maximum(1 - q, 1e-3)[..., None],
                  beta)
        o = _m(go, offset_ray_origin(h.p, h.n, wi_w), o)
        o = _m(iface, h.p + 1e-4 * d, o)
        d = _m(go, wi_w, d)
        alive = (go & ~kill) | iface

    # ---- deposit: sort photons by cell, VP scans neighbors -----------------
    NV = scfg.max_depth * P
    pp = ph_p.reshape(NV, 3)
    pwi = ph_wi.reshape(NV, 3)
    pbeta = ph_beta.reshape(NV, 3)
    pok = ph_ok.reshape(NV)
    pcell = jnp.where(pok, cell_of(pp), G * G * G)  # dead -> sentinel
    order = jnp.argsort(pcell)
    pcell_s = pcell[order]
    pp_s = pp[order]
    pwi_s = pwi[order]
    pbeta_s = pbeta[order]

    npix = vp_p.shape[0]
    t1v, t2v = coordinate_system(vp_ns)
    wo_l = jnp.stack([jnp.sum(vp_wo * t1v, -1), jnp.sum(vp_wo * t2v, -1),
                      jnp.sum(vp_wo * vp_ns, -1)], -1)
    lanes_v = scene.materials.gather_textured(scene.textures, vp_mat, vp_uv,
                                              vp_p)
    r2 = radius * radius

    ci = jnp.clip(((vp_p - bounds_lo) / cell_w).astype(jnp.int32), 0, G - 1)
    phi = jnp.zeros((npix, 3))
    m_cnt = jnp.zeros(npix)
    K = scfg.max_per_cell
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                cc = jnp.clip(ci + jnp.asarray([dx, dy, dz]), 0, G - 1)
                cid = (cc[..., 0] * G + cc[..., 1]) * G + cc[..., 2]
                start = jnp.searchsorted(pcell_s, cid, side="left")

                def scan(k, carry):
                    phi, m_cnt = carry
                    idx = jnp.minimum(start + k, NV - 1)
                    same = (pcell_s[idx] == cid) & (start + k < NV)
                    dp = pp_s[idx] - vp_p
                    near = same & vp_set & (
                        jnp.sum(dp * dp, -1) < r2)
                    wi_l = jnp.stack(
                        [jnp.sum(pwi_s[idx] * t1v, -1),
                         jnp.sum(pwi_s[idx] * t2v, -1),
                         jnp.sum(pwi_s[idx] * vp_ns, -1)], -1)
                    f_v = bsdf_f(lanes_v, wo_l, wi_l)
                    phi = phi + jnp.where(near[..., None],
                                          f_v * pbeta_s[idx], 0.0)
                    m_cnt = m_cnt + near
                    return phi, m_cnt

                phi, m_cnt = jax.lax.fori_loop(0, K, scan, (phi, m_cnt))
    return phi * vp_beta, m_cnt


@partial(jax.jit, static_argnames=("cfg", "scfg", "n_photons"))
def sppm_iteration(scene, camera, film, stats, cfg, scfg, seed, it,
                   bounds_lo, extent, n_photons):
    (sampler, L, vp_set, vp_p, vp_wo, vp_ns, vp_beta, vp_mat,
     vp_uv) = _camera_pass(scene, cfg, scfg, camera, film, seed, it)
    phi, m = _photon_pass(scene, cfg, scfg, seed, it, n_photons, bounds_lo,
                          extent, vp_set, vp_p, vp_wo, vp_ns, vp_beta,
                          vp_mat, vp_uv, stats.radius)
    # progressive statistics update (integrators.cpp:2327-2345)
    has = m > 0
    n_new = stats.n + scfg.alpha * m
    r_new = stats.radius * jnp.sqrt(
        jnp.where(has, n_new / jnp.maximum(stats.n + m, 1e-9), 1.0))
    ratio2 = (r_new / jnp.maximum(stats.radius, 1e-20)) ** 2
    tau_new = (stats.tau + phi) * ratio2[..., None]
    return PixelStats(
        jnp.where(has, r_new, stats.radius),
        jnp.where(has, n_new, stats.n),
        jnp.where(has[..., None], tau_new, stats.tau + phi),
        stats.Ld + L)


def render(scene: Scene, camera, film, iterations=16, cfg=VolPathConfig(),
           scfg=SPPMConfig(), seed=0):
    """Progressive SPPM render. Final estimate per pixel:
    Ld/iters + tau/(iters * photons * pi * r^2)."""
    import numpy as np

    g = scene.geometry
    pts = []
    for arr in (g.tri_p0, g.tri_p1, g.tri_p2, g.box_min, g.box_max,
                g.dsk_c, g.blp_p00, g.blp_p11):
        if arr.shape[0]:
            pts.append(np.asarray(arr).reshape(-1, 3))
    if g.sph_c.shape[0]:
        c = np.asarray(g.sph_c)
        r = np.asarray(g.sph_r)[:, None]
        pts += [c - r, c + r]
    allp = np.concatenate(pts, 0)
    lo = jnp.asarray(allp.min(0) - 1e-3)
    extent = jnp.asarray(allp.max(0) - allp.min(0) + 2e-3)

    npix = film.npix
    n_photons = scfg.photons_per_iter or npix
    stats = PixelStats(
        jnp.full((npix,), scfg.initial_radius),
        jnp.zeros(npix), jnp.zeros((npix, 3)), jnp.zeros((npix, 3)))
    for it in range(iterations):
        stats = sppm_iteration(scene, camera, film, stats, cfg, scfg,
                               jnp.uint32(seed), jnp.uint32(it), lo, extent,
                               int(n_photons))
    L = (stats.Ld / iterations
         + stats.tau / (iterations * n_photons * jnp.pi
                        * jnp.maximum(stats.radius, 1e-20)[..., None] ** 2))
    nx, ny = film.resolution
    return (L @ film.sensor_matrix.T).reshape(ny, nx, 3)
