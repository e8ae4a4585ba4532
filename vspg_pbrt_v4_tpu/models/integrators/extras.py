"""Auxiliary integrators (cpu/integrators.h extras).

- ``render_ao``: ambient occlusion (AOIntegrator, cpu/integrators.h:~660):
  cosine-sampled occlusion within a max distance.
- ``render_randomwalk``: the teaching random-walk integrator
  (RandomWalkIntegrator, cpu/integrators.h:123-188): uniform-sphere
  scattering, no NEE/MIS.
- ``render_simplepath``: SimplePathIntegrator (BSDF sampling + emitter hits,
  no NEE, no MIS) — the ground-truth cross-check for the MIS machinery.
- ``render_gbuffer``: first-hit AOVs (GBufferFilm analog, film.h:331):
  albedo, shading normal, depth, prim id.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.intersect import offset_ray_origin
from ...utils.sampling import (UNIFORM_SPHERE_PDF, sample_cosine_hemisphere,
                               sample_uniform_sphere)
from ...utils.spectrum import average
from ...utils.vecmath import coordinate_system, dot, face_forward, normalize
from ..materials import bsdf_f, bsdf_sample
from . import volpath as vp
from .volpath import _m


@partial(jax.jit, static_argnames=("cfg", "spp", "spp_per_pass"))
def _render_ao_jit(scene, camera, film, cfg, spp, seed, radius, spp_per_pass):
    R = film.npix * spp_per_pass
    lane = jnp.arange(R, dtype=jnp.int32)
    pixel_id = lane // spp_per_pass
    state = film.init_state()

    def one_pass(i, st):
        sample_index = (i * spp_per_pass + lane % spp_per_pass).astype(jnp.uint32)
        s, fw = vp.start_camera_paths(camera, film, seed, sample_index, pixel_id, -1)
        h = scene.geometry.intersect(s.o, s.d, jnp.full(R, jnp.inf))
        ns = face_forward(h.ns, -s.d)
        t1, t2 = coordinate_system(ns)
        sampler, u2 = s.sampler.get_2d()
        w_local = sample_cosine_hemisphere(u2)
        wi = (w_local[..., 0:1] * t1 + w_local[..., 1:2] * t2
              + w_local[..., 2:3] * ns)
        o2 = offset_ray_origin(h.p, h.n, wi)
        occ = scene.geometry.intersect_p(o2, wi, jnp.full(R, radius))
        ao = jnp.where(h.hit & (h.mat_id >= 0), jnp.where(occ, 0.0, 1.0), 0.0)
        L = ao[..., None] * jnp.ones(3)
        return film.add_samples(st, pixel_id, L, fw)

    state = jax.lax.fori_loop(0, spp // spp_per_pass, one_pass, state)
    return film.image(state)


def render_ao(scene, camera, film, spp=16, radius=1e6, seed=0, spp_per_pass=4,
              cfg=vp.VolPathConfig()):
    return _render_ao_jit(scene, camera, film, cfg, int(spp),
                          jnp.uint32(seed), jnp.float32(radius),
                          int(min(spp_per_pass, spp)))


@partial(jax.jit, static_argnames=("cfg", "spp", "spp_per_pass"))
def _render_rw_jit(scene, camera, film, cfg, spp, seed, spp_per_pass):
    R = film.npix * spp_per_pass
    lane = jnp.arange(R, dtype=jnp.int32)
    pixel_id = lane // spp_per_pass
    state = film.init_state()

    def bounce(s):
        h = scene.geometry.intersect(s.o, s.d, jnp.full(R, jnp.inf))
        L, alive, beta = s.L, s.alive, s.beta
        # emission at hits / escape (no MIS: the walk is its own estimator)
        esc = alive & ~h.hit
        L = _m(esc, L + beta * scene.lights.le_escaped(s.d), L)
        alive = alive & ~esc
        emis = alive & h.hit & (h.light_id >= 0)
        Le = scene.lights.le_area(h.light_id, -s.d, h.n)
        L = _m(emis, L + beta * Le, L)
        # uniform-sphere scatter from the surface
        shade = alive & h.hit & (h.mat_id >= 0)
        depth_ok = s.depth < cfg.max_depth
        alive = alive & ~(shade & ~depth_ok)
        shade = shade & depth_ok
        lanes_m = scene.materials.gather_textured(scene.textures, h.mat_id, h.uv, h.p)
        ns = face_forward(h.ns, -s.d)
        sampler, u2 = s.sampler.get_2d()
        wi = sample_uniform_sphere(u2)
        t1, t2 = coordinate_system(ns)

        def to_local(w):
            return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], -1)

        fval = bsdf_f(lanes_m, to_local(-s.d), to_local(wi))
        beta = _m(shade, beta * fval * jnp.abs(dot(wi, ns))[..., None]
                  / UNIFORM_SPHERE_PDF, beta)
        alive = alive & ~(shade & (jnp.max(beta, -1) <= 0))
        # interface skip
        iface = alive & h.hit & (h.mat_id < 0)
        o_new = _m(shade, offset_ray_origin(h.p, h.n, wi),
                   _m(iface, h.p + 1e-4 * s.d, s.o))
        d_new = _m(shade, wi, s.d)
        depth = jnp.where(shade, s.depth + 1, s.depth)
        return s._replace(sampler=sampler, o=o_new, d=d_new, L=L, beta=beta,
                          depth=depth, alive=alive)

    def one_pass(i, st):
        sample_index = (i * spp_per_pass + lane % spp_per_pass).astype(jnp.uint32)
        s, fw = vp.start_camera_paths(camera, film, seed, sample_index, pixel_id, -1)

        def cond(c):
            return jnp.any(c[0].alive) & (c[1] < cfg.max_events)

        def body(c):
            return bounce(c[0]), c[1] + 1

        s, _ = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))
        return film.add_samples(st, pixel_id, s.L, fw)

    state = jax.lax.fori_loop(0, spp // spp_per_pass, one_pass, state)
    return film.image(state)


def render_randomwalk(scene, camera, film, spp=16, seed=0, spp_per_pass=4,
                      cfg=vp.VolPathConfig(max_depth=5)):
    return _render_rw_jit(scene, camera, film, cfg, int(spp), jnp.uint32(seed),
                          int(min(spp_per_pass, spp)))


@partial(jax.jit, static_argnames=("cfg", "spp", "spp_per_pass"))
def _render_sp_jit(scene, camera, film, cfg, spp, seed, spp_per_pass):
    """SimplePath: BSDF importance sampling only, emission on hit."""
    R = film.npix * spp_per_pass
    lane = jnp.arange(R, dtype=jnp.int32)
    pixel_id = lane // spp_per_pass
    state = film.init_state()

    def bounce(s):
        h = scene.geometry.intersect(s.o, s.d, jnp.full(R, jnp.inf))
        L, alive, beta = s.L, s.alive, s.beta
        esc = alive & ~h.hit
        L = _m(esc, L + beta * scene.lights.le_escaped(s.d), L)
        alive = alive & ~esc
        emis = alive & h.hit & (h.light_id >= 0)
        Le = scene.lights.le_area(h.light_id, -s.d, h.n)
        L = _m(emis, L + beta * Le, L)

        shade = alive & h.hit & (h.mat_id >= 0)
        depth_ok = s.depth < cfg.max_depth
        alive = alive & ~(shade & ~depth_ok)
        shade = shade & depth_ok
        lanes_m = scene.materials.gather_textured(scene.textures, h.mat_id, h.uv, h.p)
        ns = face_forward(h.ns, -s.d)
        t1, t2 = coordinate_system(ns)

        def to_local(w):
            return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], -1)

        def to_world(w):
            return w[..., 0:1] * t1 + w[..., 1:2] * t2 + w[..., 2:3] * ns

        sampler, u1 = s.sampler.get_1d()
        sampler, u2 = sampler.get_2d()
        bs = bsdf_sample(lanes_m, to_local(-s.d), u1, u2)
        wi = normalize(to_world(bs.wi))
        ok = shade & bs.valid & (bs.pdf > 0)
        alive = alive & ~(shade & ~ok)
        beta = _m(ok, beta * bs.f * jnp.abs(dot(wi, ns))[..., None]
                  / jnp.maximum(bs.pdf, 1e-30)[..., None], beta)
        iface = alive & h.hit & (h.mat_id < 0)
        o_new = _m(ok, offset_ray_origin(h.p, h.n, wi),
                   _m(iface, h.p + 1e-4 * s.d, s.o))
        d_new = _m(ok, wi, s.d)
        depth = jnp.where(shade, s.depth + 1, s.depth)
        return s._replace(sampler=sampler, o=o_new, d=d_new, L=L, beta=beta,
                          depth=depth, alive=alive)

    def one_pass(i, st):
        sample_index = (i * spp_per_pass + lane % spp_per_pass).astype(jnp.uint32)
        s, fw = vp.start_camera_paths(camera, film, seed, sample_index, pixel_id, -1)

        def cond(c):
            return jnp.any(c[0].alive) & (c[1] < cfg.max_events)

        def body(c):
            return bounce(c[0]), c[1] + 1

        s, _ = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))
        return film.add_samples(st, pixel_id, s.L, fw)

    state = jax.lax.fori_loop(0, spp // spp_per_pass, one_pass, state)
    return film.image(state)


def render_simplepath(scene, camera, film, spp=16, seed=0, spp_per_pass=4,
                      cfg=vp.VolPathConfig(max_depth=5)):
    return _render_sp_jit(scene, camera, film, cfg, int(spp), jnp.uint32(seed),
                          int(min(spp_per_pass, spp)))


@jax.jit
def render_guiding_gbuffer(scene, camera, film, field):
    """Guiding-cache-id visualization (GuidedGBufferFilm, film.h:413 +
    film.cpp:955-972: id -> color hash at the first hit/scatter cell)."""
    from ...utils import rng as _rng

    R = film.npix
    pixel_id = jnp.arange(R, dtype=jnp.int32)
    s, _ = vp.start_camera_paths(camera, film, jnp.uint32(0), jnp.uint32(0),
                                 pixel_id, -1)
    h = scene.geometry.intersect(s.o, s.d, jnp.full(R, jnp.inf))
    cid = field.cell_id(h.p)
    u = _rng.uniform3(jnp.uint32(0xC0FFEE), cid.astype(jnp.uint32),
                      jnp.uint32(1), jnp.uint32(2))
    rgb = jnp.where(h.hit[..., None], u, 0.0)
    nx, ny = film.resolution
    return rgb.reshape(ny, nx, 3), cid.reshape(ny, nx)


@jax.jit
def render_gbuffer(scene, camera, film):
    """First-hit AOVs: (albedo, normal, depth, prim_id) images
    (GBufferFilm analog)."""
    R = film.npix
    pixel_id = jnp.arange(R, dtype=jnp.int32)
    s, _ = vp.start_camera_paths(camera, film, jnp.uint32(0), jnp.uint32(0),
                                 pixel_id, -1)
    h = scene.geometry.intersect(s.o, s.d, jnp.full(R, jnp.inf))
    lanes_m = scene.materials.gather_textured(scene.textures, h.mat_id, h.uv, h.p)
    alb = jnp.where((h.hit & (h.mat_id >= 0))[..., None], lanes_m.albedo, 0.0)
    nrm = jnp.where(h.hit[..., None], face_forward(h.ns, -s.d), 0.0)
    depth = jnp.where(h.hit, h.t, 0.0)
    nx, ny = film.resolution
    return (alb.reshape(ny, nx, 3), nrm.reshape(ny, nx, 3),
            depth.reshape(ny, nx), h.prim_id.reshape(ny, nx))


def render_function(film, fn="checkerboard", spp=64, seed=0,
                    sampler_kind="independent"):
    """FunctionIntegrator (cpu/integrators.h:819): every pixel Monte-Carlo
    integrates a known 2D function with its own sampler stream — the image
    is pure estimator noise around the analytic value, the harness for
    sampler-convergence studies (used with imgtool error).

    Functions and exact integrals over [0,1)^2:
      checkerboard (8x8, values 0/1 -> 0.5), diagonal (u+v)/2 -> 0.5,
      gaussian exp(-50 r^2) about the center, disk indicator r<0.4.
    """
    import numpy as np

    from ..samplers import LaneSampler

    npix = film.npix
    acc = jnp.zeros((npix,))

    def f_eval(u):
        x, y = u[..., 0], u[..., 1]
        if fn == "checkerboard":
            return ((jnp.floor(x * 8) + jnp.floor(y * 8)) % 2)
        if fn == "diagonal":
            return 0.5 * (x + y)
        if fn == "gaussian":
            r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2
            return jnp.exp(-50.0 * r2)
        if fn == "disk":
            return (((x - 0.5) ** 2 + (y - 0.5) ** 2) < 0.4**2).astype(
                jnp.float32)
        raise ValueError(fn)

    exact = {"checkerboard": 0.5, "diagonal": 0.5,
             "gaussian": float(np.pi / 50 * (1 - np.exp(-25.0))),
             "disk": float(np.pi * 0.16)}[fn]

    @jax.jit
    def one(si):
        smp = LaneSampler.start(jnp.uint32(seed),
                                jnp.arange(npix, dtype=jnp.uint32), si,
                                kind=sampler_kind, spp=spp)
        smp, u = smp.get_2d()
        return f_eval(u)

    for s in range(spp):
        acc = acc + one(jnp.uint32(s))
    est = acc / spp
    nx, ny = film.resolution
    img = jnp.repeat(est[:, None], 3, -1).reshape(ny, nx, 3)
    return img, exact


def render_pixel_stats(scene, camera, film, spp=16, cfg=None, seed=0,
                       camera_medium=-1):
    """Per-pixel statistics heatmaps (the --pixelstats EXR path,
    util/stats.h STAT_PIXEL_COUNTER + cpu/integrators.cpp:126-128):
    channels = mean path depth, survival (paths alive at loop exit), and
    mean radiance luminance."""
    from . import volpath as vp

    cfg = cfg or vp.VolPathConfig()
    npix = film.npix
    depth_sum = jnp.zeros((npix,))
    alive_sum = jnp.zeros((npix,))
    lum_sum = jnp.zeros((npix,))

    @jax.jit
    def wave(si):
        pid = jnp.arange(npix, dtype=jnp.int32)
        s, _ = vp.start_camera_paths(camera, film, jnp.uint32(seed),
                                     jnp.uint32(si), pid, camera_medium)
        s = vp.trace_paths(scene, cfg, s)
        return (s.depth.astype(jnp.float32), s.alive.astype(jnp.float32),
                jnp.mean(s.L, -1))

    for si in range(spp):
        d, a, l = wave(si)
        depth_sum += d
        alive_sum += a
        lum_sum += l
    nx, ny = film.resolution
    img = jnp.stack([depth_sum, alive_sum, lum_sum], -1) / spp
    return img.reshape(ny, nx, 3)


@partial(jax.jit, static_argnames=("cfg", "spp", "spp_per_pass",
                                   "camera_medium"))
def _render_svp_jit(scene, camera, film, cfg, spp, seed, spp_per_pass,
                    camera_medium):
    """SimpleVolPath (cpu/integrators.cpp:879): null-scattering volumetric
    path tracing WITHOUT NEE or MIS — absorb/emit, phase-sampled scatter,
    emitter/env hits only. The teaching/validation integrator: its means
    must match volpath within MC noise."""
    from ...utils.sampling import sample_henyey_greenstein

    R = film.npix * spp_per_pass
    lane = jnp.arange(R, dtype=jnp.int32)
    pixel_id = lane // spp_per_pass
    state = film.init_state()

    def bounce(s):
        h = scene.geometry.intersect(s.o, s.d, jnp.full(R, jnp.inf))
        seg_end = jnp.where(h.hit, h.t, jnp.inf)
        in_med = s.alive & (s.medium_id >= 0)
        mr = vp.sample_medium_interaction(
            scene, cfg, s.o, s.d, seg_end, s.medium_id, s.hero_idx,
            s.sampler, s.beta, s.r_u, s.r_l, s.L, s.depth, in_med)
        sampler, beta, L, depth = mr.sampler, mr.beta, mr.L, mr.depth
        r_u = mr.r_u
        alive = s.alive & ~mr.terminated

        scat = mr.scattered & alive
        p_s = s.o + mr.t_scatter[..., None] * s.d
        sampler, u2p = sampler.get_2d()
        wi_p, _ = sample_henyey_greenstein(-s.d, mr.g_scatter, u2p)
        o_new = _m(scat, p_s, s.o)
        d_new = _m(scat, wi_p, s.d)

        flew = alive & ~scat
        esc = flew & ~h.hit
        L = _m(esc, L + beta * scene.lights.le_escaped(s.d, s.o)
               / jnp.maximum(vp.average(r_u), 1e-30)[..., None], L)
        alive = alive & ~esc
        emis = flew & h.hit & (h.light_id >= 0)
        Le = scene.lights.le_area(h.light_id, -s.d, h.n)
        L = _m(emis, L + beta * Le
               / jnp.maximum(vp.average(r_u), 1e-30)[..., None], L)
        # surfaces end the path (the reference errors on real materials;
        # interface-only surfaces are crossed)
        iface = flew & h.hit & (h.mat_id < 0)
        new_med = jnp.where(dot(s.d, h.n) < 0, h.med_in, h.med_out)
        medium_id = jnp.where(iface, new_med, s.medium_id)
        o_new = _m(iface, h.p + 1e-4 * s.d, o_new)
        alive = alive & ~(flew & h.hit & (h.mat_id >= 0))
        return s._replace(sampler=sampler, o=o_new, d=d_new, beta=beta,
                          r_u=r_u, L=L, depth=depth, alive=alive,
                          medium_id=medium_id)

    def one_pass(i, st):
        sample_index = (i * spp_per_pass + lane % spp_per_pass).astype(jnp.uint32)
        s, fw = vp.start_camera_paths(camera, film, seed, sample_index,
                                      pixel_id, camera_medium)

        def cond(c):
            return jnp.any(c[0].alive) & (c[1] < cfg.max_events)

        def body(c):
            return bounce(c[0]), c[1] + 1

        s, _ = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))
        return film.add_samples(st, pixel_id, s.L, fw)

    state = jax.lax.fori_loop(0, spp // spp_per_pass, one_pass, state)
    return film.image(state)


def render_simplevolpath(scene, camera, film, spp=16, seed=0, spp_per_pass=4,
                         cfg=vp.VolPathConfig(max_depth=32),
                         camera_medium=-1):
    return _render_svp_jit(scene, camera, film, cfg, int(spp),
                           jnp.uint32(seed), int(min(spp_per_pass, spp)),
                           int(camera_medium))
