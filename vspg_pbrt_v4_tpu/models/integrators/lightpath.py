"""Light (particle) tracing integrator — camera-splat adjoint transport.

Analog of the reference's ``LightPathIntegrator`` (cpu/integrators.h:254,
cpu/integrators.cpp:460-560): paths start on light sources via SampleLe,
scatter through surfaces AND participating media (the reference's CPU
lightpath is surface-only; media support here mirrors the volpath delta
tracking so splats stay consistent with volpath renders), and every real
vertex connects to the pinhole camera with an importance splat
(Camera::SampleWi + film AddSplat).

TPU design: one SoA particle wavefront stepped by ``lax.while_loop``; the
camera connection is a masked scatter-add into the film's splat plane. The
final image is splat_sum / n_paths (RGBFilm::AddSplat + splatScale
semantics).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.intersect import offset_ray_origin
from ...utils.sampling import henyey_greenstein, sample_henyey_greenstein
from ...utils.spectrum import average, sample_hero_channel
from ...utils.vecmath import coordinate_system, dot, face_forward, normalize
from ..materials import bsdf_f, bsdf_sample
from ..samplers import LaneSampler
from .volpath import (Scene, VolPathConfig, _m, sample_medium_interaction,
                      transmittance_ratio_tracking)

INF = jnp.inf


class LPState(NamedTuple):
    sampler: LaneSampler
    o: jnp.ndarray
    d: jnp.ndarray
    alpha: jnp.ndarray  # (R,3) particle throughput
    depth: jnp.ndarray
    alive: jnp.ndarray
    hero_idx: jnp.ndarray
    medium_id: jnp.ndarray
    splat_pix: jnp.ndarray  # (R,) this bounce's splat target (-1 none)
    splat_L: jnp.ndarray  # (R,3)


def _connect_camera(scene, cfg, camera, p, f_toward_cam, alpha, medium_id,
                    hero_idx, sampler, active):
    """Splat alpha*f*Tr*We/d^2 to the camera pixel (BDPT t=1 strategy)."""
    valid, pixel_id, wi, dist, we = camera.sample_wi(p)
    ok = active & valid
    sampler, T_ray, _, tr_u = transmittance_ratio_tracking(
        scene, cfg, p, wi, dist * (1.0 - 1e-4), medium_id, hero_idx, sampler,
        ok)
    tr = T_ray / jnp.maximum(average(tr_u), 1e-30)[..., None]
    L = alpha * f_toward_cam * tr * (we / jnp.maximum(dist * dist, 1e-12))[..., None]
    L = jnp.where(ok[..., None], L, 0.0)
    return sampler, jnp.where(ok, pixel_id, 0), L, ok


def lightpath_bounce(scene: Scene, cfg: VolPathConfig, camera, s: LPState
                     ) -> LPState:
    t_far = jnp.full_like(s.o[..., 0], INF)
    h = scene.geometry.intersect(s.o, s.d, t_far)
    seg_end = jnp.where(h.hit, h.t, INF)

    in_medium = s.alive & (s.medium_id >= 0)
    zero3 = jnp.zeros_like(s.alpha)
    mr = sample_medium_interaction(
        scene, cfg, s.o, s.d, seg_end, s.medium_id, s.hero_idx, s.sampler,
        s.alpha, jnp.ones_like(s.alpha), jnp.ones_like(s.alpha), zero3,
        s.depth, in_medium)
    sampler, alpha, depth = mr.sampler, mr.beta, mr.depth
    alive = s.alive & ~mr.terminated

    # ---- volume scatter vertex: connect + HG continue -----------------------
    scat = mr.scattered & alive
    p_v = s.o + mr.t_scatter[..., None] * s.d
    wo = -s.d
    valid_c, pix_v, wi_c, dist_c, we_c = camera.sample_wi(p_v)
    f_phase = henyey_greenstein(jnp.sum(wo * wi_c, -1), mr.g_scatter)
    sampler, pix_v2, L_v, ok_v = _connect_camera(
        scene, cfg, camera, p_v, f_phase[..., None] * jnp.ones(3), alpha,
        s.medium_id, s.hero_idx, sampler, scat)
    sampler, u2p = sampler.get_2d()
    wi_v, _ = sample_henyey_greenstein(wo, mr.g_scatter, u2p)
    o_new = _m(scat, p_v, s.o)
    d_new = _m(scat, wi_v, s.d)
    # HG importance sampling: f/pdf == 1, alpha unchanged

    # ---- surface vertex ------------------------------------------------------
    flew = alive & ~scat
    escaped = flew & ~h.hit
    alive = alive & ~escaped

    surf = flew & h.hit
    iface = surf & (h.mat_id < 0)
    new_med = jnp.where(dot(s.d, h.n) < 0, h.med_in, h.med_out)
    medium_id = jnp.where(iface, new_med, s.medium_id)
    o_new = _m(iface, h.p + 1e-4 * s.d, o_new)

    shade = surf & (h.mat_id >= 0)
    depth_hit = shade & (depth >= cfg.max_depth)
    alive = alive & ~depth_hit
    shade = shade & ~depth_hit
    depth = jnp.where(shade, depth + 1, depth)

    lanes = scene.materials.gather_textured(scene.textures, h.mat_id, h.uv,
                                            h.p)
    ns = face_forward(h.ns, h.n)
    t1, t2 = coordinate_system(ns)

    def to_local(w):
        return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], axis=-1)

    def to_world(w):
        return w[..., 0:1] * t1 + w[..., 1:2] * t2 + w[..., 2:3] * ns

    wo_l = to_local(-s.d)
    # camera connection from the surface vertex
    p_off = offset_ray_origin(h.p, h.n, -s.d)
    can_connect = shade & ~lanes.is_specular
    valid_s, pix_s, wi_s_c, dist_s, we_s = camera.sample_wi(p_off)
    f_b = bsdf_f(lanes, wo_l, to_local(wi_s_c)) \
        * jnp.abs(dot(wi_s_c, ns))[..., None]
    sampler, pix_s2, L_s, ok_s = _connect_camera(
        scene, cfg, camera, p_off, f_b, alpha, medium_id, s.hero_idx, sampler,
        can_connect & valid_s)

    # continue with BSDF sampling (importance transport)
    sampler, u_lobe = sampler.get_1d()
    sampler, u2b = sampler.get_2d()
    bs = bsdf_sample(lanes, wo_l, u_lobe, u2b)
    wi_w = normalize(to_world(bs.wi))
    bs_ok = shade & bs.valid & (bs.pdf > 0)
    alive = alive & ~(shade & ~bs_ok)
    scale = bs.f * jnp.abs(dot(wi_w, ns))[..., None] \
        / jnp.maximum(bs.pdf, 1e-30)[..., None]
    # importance-transport eta^2 correction for transmission
    # (BDPT CorrectShadingNormals / radiance vs importance asymmetry):
    # radiance scales by 1/eta^2 on refraction; particles carry power, so
    # multiply the factor back out.
    scale = jnp.where((bs.is_transmission & ~bs.is_specular)[..., None],
                      scale, scale)
    eta2 = jnp.where(bs.is_transmission, bs.eta**2, 1.0)
    alpha = _m(bs_ok, alpha * scale * eta2[..., None], alpha)
    # reflection keeps the medium; only true crossings adopt the far
    # side's label (volpath_bounce's round-5 robust rule)
    wi_front_l = dot(wi_w, h.n) > 0
    arr_front_l = dot(s.d, h.n) < 0
    crossed_l = bs_ok & (wi_front_l != arr_front_l)
    medium_id = jnp.where(crossed_l,
                          jnp.where(wi_front_l, h.med_out, h.med_in),
                          medium_id)
    o_new = _m(bs_ok, offset_ray_origin(h.p, h.n, wi_w), o_new)
    d_new = _m(bs_ok, wi_w, d_new)

    # Russian roulette on particle throughput
    do_rr = alive & (depth > cfg.rr_start_depth)
    q = jnp.maximum(0.0, 1.0 - jnp.max(alpha, -1))
    q = jnp.clip(q, 0.0, 0.95)
    sampler, u_rr = sampler.get_1d()
    kill = do_rr & (u_rr < q)
    alive = alive & ~kill
    alpha = _m(do_rr & ~kill, alpha / jnp.maximum(1.0 - q, 1e-3)[..., None],
               alpha)

    dead = jnp.max(alpha, -1) <= 0
    alive = alive & ~dead

    # merge the two possible splats of this bounce (volume xor surface)
    splat_pix = jnp.where(ok_v, pix_v2, jnp.where(ok_s, pix_s2, -1))
    splat_L = jnp.where(ok_v[..., None], L_v,
                        jnp.where(ok_s[..., None], L_s, 0.0))
    return LPState(sampler, o_new, d_new, alpha, depth, alive, s.hero_idx,
                   medium_id, splat_pix, splat_L)


@partial(jax.jit, static_argnames=("cfg", "light_medium", "n_paths"))
def lightpath_wave(scene, camera, film, film_state, cfg, seed, wave_idx,
                   light_medium, n_paths):
    R = n_paths
    lane = jnp.arange(R, dtype=jnp.uint32)
    sampler = LaneSampler.start(seed, lane, wave_idx)
    sampler, u_hero = sampler.get_1d()
    hero_idx = sample_hero_channel(u_hero)
    sampler, u_sel = sampler.get_1d()
    sampler, u_side = sampler.get_1d()
    sampler, u2a = sampler.get_2d()
    sampler, u2b = sampler.get_2d()
    p0, d0, alpha0, n_l, is_area, valid, alpha_pos = scene.lights.sample_le(
        u_sel, u_side, u2a, u2b)
    p0 = jnp.where(is_area[..., None],
                   offset_ray_origin(p0, n_l, d0), p0)
    # directly visible emitters: splat the light vertex itself
    # (cpu/integrators.cpp:489-505 — pbrt's lightpath does the same)
    v0, pix0, wi0, dist0, we0 = camera.sample_wi(p0)
    cos_l0 = jnp.sum(n_l * wi0, -1)
    ok0 = valid & is_area & v0 & (cos_l0 > 0)
    sampler, T0, _, tru0 = transmittance_ratio_tracking(
        scene, cfg, jnp.where(is_area[..., None],
                              offset_ray_origin(p0, n_l, wi0), p0),
        wi0, dist0 * (1.0 - 1e-4), jnp.full(R, light_medium, jnp.int32),
        hero_idx, sampler, ok0)
    tr0 = T0 / jnp.maximum(average(tru0), 1e-30)[..., None]
    L0 = alpha_pos * (cos_l0 * we0 / jnp.maximum(dist0 * dist0, 1e-12))[..., None] * tr0
    film_state = film.add_splats(
        film_state, jnp.where(ok0, pix0, 0),
        jnp.where(ok0[..., None], L0, 0.0))
    s = LPState(sampler, p0, d0, alpha0, jnp.zeros(R, jnp.int32), valid,
                hero_idx, jnp.full(R, light_medium, jnp.int32),
                jnp.full(R, -1, jnp.int32), jnp.zeros((R, 3)))

    def cond(c):
        s, fs, it = c
        return jnp.any(s.alive) & (it < cfg.max_events)

    def body(c):
        s, fs, it = c
        s = lightpath_bounce(scene, cfg, camera, s)
        fs = film.add_splats(fs, jnp.maximum(s.splat_pix, 0),
                             jnp.where((s.splat_pix >= 0)[..., None],
                                       s.splat_L, 0.0))
        return s, fs, it + 1

    s, film_state, _ = jax.lax.while_loop(cond, body,
                                          (s, film_state, jnp.int32(0)))
    return film_state


def render(scene, camera, film, spp=16, cfg=VolPathConfig(), seed=0,
           light_medium=-1, spp_per_pass=1):
    """Light tracing render: spp*npix particles, image = splats/n_paths."""
    film_state = film.init_state()
    n_paths_per_wave = film.npix * spp_per_pass
    waves = max(spp // spp_per_pass, 1)
    for wave in range(waves):
        film_state = lightpath_wave(scene, camera, film, film_state, cfg,
                                    jnp.uint32(seed), jnp.uint32(wave),
                                    int(light_medium), int(n_paths_per_wave))
    return film.image(film_state,
                      splat_scale=1.0 / (waves * n_paths_per_wave))
