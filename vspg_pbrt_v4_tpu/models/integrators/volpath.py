"""Wavefront volumetric path tracer (TPU-native VolPathIntegrator).

Re-designs the reference's recursive spectral null-scattering volumetric path
tracer (cpu/integrators.cpp:998-1434: Li + SampleLd) as SoA path-state arrays
stepped by ``lax.while_loop``:

- outer loop = one path event per iteration (medium segment + surface or
  escape handling), all lanes in lockstep with masks;
- inner loop = delta-tracking tentative collisions (media_sampleTMaj.h:40-117
  semantics: exponential steps vs the hero-channel majorant, spectral T_maj
  accumulation, absorb/scatter/null event selection);
- NEE shadow rays walk interface segments with the ratio-tracking
  transmittance estimator + rescaled pdfs (cpu/integrators.cpp:1319-1434),
  including the low-throughput Russian roulette;
- surfaces: masked-SoA BSDF evaluation/sampling (models/materials.py), area
  light MIS via the previous-vertex light-sampling context, carried per-lane
  medium ids switched at interface crossings (interaction.h SpawnRay medium
  selection semantics).

The rescaled path probabilities (beta, r_u, r_l) follow the reference's
algebra exactly, with the RGB-mode hero channel (spectrum.h:380-391) as the
pdf channel. With no media attached this is simultaneously the surface
``path`` integrator (NEE + MIS + RR).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.intersect import offset_ray_origin
from ...utils.sampling import (
    henyey_greenstein,
    sample_exponential,
    sample_henyey_greenstein,
)
from ...utils.spectrum import average, hero, sample_hero_channel
from ...utils.vecmath import coordinate_system, dot, face_forward, normalize
from ..film import pixel_coords
from ..lights import Lights
from ..materials import Materials, bsdf_f, bsdf_pdf, bsdf_sample
from ..media import HomogeneousMedia, Media, seg_init, seg_next
from ..samplers import LaneSampler
from ..shapes import Geometry

INF = jnp.inf


def _m(mask, new, old):
    """Masked update, broadcasting mask over trailing dims of new/old."""
    if new.ndim > mask.ndim:
        mask = mask[..., None]
    return jnp.where(mask, new, old)


def shading_frame(ns, tangent=None):
    """Orthonormal (t1, t2) for the shading frame. Lanes carrying a fiber
    tangent (curve hits) align t1 with it so the hair BSDF's longitudinal
    axis is the x-axis (the reference's dpdu-aligned curve frame)."""
    t1, t2 = coordinate_system(ns)
    if tangent is not None:
        has_t = jnp.sum(tangent * tangent, -1) > 0.5
        tt = tangent - dot(tangent, ns)[..., None] * ns
        tt = normalize(tt)
        t1 = jnp.where(has_t[..., None], tt, t1)
        t2 = jnp.where(has_t[..., None], jnp.cross(ns, t1), t2)
    return t1, t2


class VolPathConfig(NamedTuple):
    max_depth: int = 32
    spectral: bool = False  # N=4 hero-wavelength mode (static; RGB otherwise)
    max_events: int = 256  # outer path-event iterations (bounces + interface skips)
    max_collisions: int = 4096  # delta-tracking runaway guard (media_sampleTMaj.h:216)
    max_shadow_segments: int = 8  # shadow ray interface crossings
    rr_start_depth: int = 2  # RR applied when depth > 1 (integrators.cpp:1305)
    sss: bool = False  # enable subsurface probe relocation (static; set by
    #     the builder when the scene has SUBSURFACE materials)


class Scene(NamedTuple):
    geometry: Geometry
    materials: Materials
    media: Media
    lights: Lights
    textures: object = None  # models.textures.Textures or None


# ---------------------------------------------------------------------------
# Delta-tracking medium interaction (SampleT_maj + VolPath callback fused)
# ---------------------------------------------------------------------------


class MediumResult(NamedTuple):
    sampler: LaneSampler
    beta: jnp.ndarray
    r_u: jnp.ndarray
    r_l: jnp.ndarray
    L: jnp.ndarray
    depth: jnp.ndarray
    scattered: jnp.ndarray  # (R,) real scatter happened
    terminated: jnp.ndarray  # (R,) absorbed / beta died / depth exceeded
    t_scatter: jnp.ndarray  # (R,)
    g_scatter: jnp.ndarray  # (R,) phase asymmetry at scatter point


def sample_medium_interaction(
    scene, cfg, o, d, seg_end, medium_id, hero_idx, sampler, beta, r_u, r_l, L,
    depth, active, lam=None,
):
    """Vectorized delta tracking along [0, seg_end] of (o, d normalized).

    Implements the event algebra of VolPathIntegrator's SampleT_maj callback
    (cpu/integrators.cpp:1022-1110) for all lanes in lockstep, with the
    per-lane majorant segment iterator (media.py SegIter: homogeneous =
    single segment, grids = DDA supervoxel walk per DDAMajorantIterator).
    """
    media = scene.media
    if len(media.grids) == 0 and len(media.procedurals) == 0:
        # static fast path: homogeneous-only scenes have majorant == sigma_t,
        # so there are no null collisions — one exponential step decides
        # everything (the loop below would run exactly one iteration)
        return _homogeneous_medium_interaction(
            scene, cfg, o, d, seg_end, medium_id, hero_idx, sampler, beta,
            r_u, r_l, L, depth, active, lam)
    it0 = seg_init(media, medium_id, o, d, seg_end, active, lam)

    # carries derived from varying inputs (shard_map vma-compatible)
    z = jnp.zeros_like(seg_end)
    f0 = active & (seg_end < 0)  # all-False, varying
    t_min = it0.t_seg_start
    T_maj = jnp.ones_like(beta)
    scattered = f0
    terminated = f0
    t_scatter = z
    g_scatter = z

    def cond(c):
        (_, _, _, _, _, _, _, _, _, vol_active, _, _, _, _, n) = c
        return jnp.any(vol_active) & (n < cfg.max_collisions)

    def body(c):
        (sampler, it, t_min, T_maj, beta, r_u, r_l, L, depth, vol_active,
         scattered, terminated, t_scatter, g_scatter, n) = c
        sigma_maj = it.sigma_maj
        maj_h = hero(sigma_maj, hero_idx)
        sampler, u_step = sampler.get_1d()
        can_collide = maj_h > 0
        t = jnp.where(
            can_collide,
            t_min + sample_exponential(u_step, jnp.maximum(maj_h, 1e-30)),
            jnp.inf,
        )
        past = t >= it.t_seg_end

        # ---- segment tail: accumulate T_maj, advance the iterator ----
        tail = vol_active & past
        dt_end = jnp.clip(it.t_seg_end - t_min, 0.0, 3e37)
        T_maj = _m(tail, T_maj * jnp.exp(-dt_end[..., None] * sigma_maj), T_maj)
        it = seg_next(media, medium_id, it, tail, lam)
        t_min = jnp.where(tail, it.t_seg_start, t_min)
        exhausted = tail & it.done
        vol_active_new = vol_active & ~exhausted

        # ---- tentative collision ----
        coll = vol_active & ~past
        T_maj = _m(coll, T_maj * jnp.exp(-(t - t_min)[..., None] * sigma_maj), T_maj)
        p = o + t[..., None] * d
        mp = media.sample_point(medium_id, p, lam)

        # medium emission at tentative collision (integrators.cpp:1032-1046)
        T_maj_h = hero(T_maj, hero_idx)
        emit = coll & (depth < cfg.max_depth) & (jnp.max(mp.Le, -1) > 0)
        pdf_e = maj_h * T_maj_h
        betap = beta * T_maj / jnp.maximum(pdf_e, 1e-30)[..., None]
        r_e = r_u * sigma_maj * T_maj / jnp.maximum(pdf_e, 1e-30)[..., None]
        r_e_avg = average(r_e)
        L_add = betap * mp.sigma_a * mp.Le / jnp.maximum(r_e_avg, 1e-30)[..., None]
        L = _m(emit & (r_e_avg > 0), L + L_add, L)

        # event probabilities at hero channel
        sa_h = hero(mp.sigma_a, hero_idx)
        ss_h = hero(mp.sigma_s, hero_idx)
        p_absorb = sa_h / jnp.maximum(maj_h, 1e-30)
        p_scatter = ss_h / jnp.maximum(maj_h, 1e-30)
        sampler, um = sampler.get_1d()
        is_absorb = coll & (um < p_absorb)
        is_scatter = coll & ~is_absorb & (um < p_absorb + p_scatter)
        is_null = coll & ~is_absorb & ~is_scatter

        # absorption: terminate (integrators.cpp:1058-1062)
        terminated = terminated | is_absorb
        vol_active_new = vol_active_new & ~is_absorb

        # real scatter (integrators.cpp:1064-1100)
        depth_exceeded = is_scatter & (depth >= cfg.max_depth)
        terminated = terminated | depth_exceeded
        do_scatter = is_scatter & ~depth_exceeded
        depth = jnp.where(do_scatter, depth + 1, depth)
        pdf_s = T_maj_h * ss_h
        scale_s = T_maj * mp.sigma_s / jnp.maximum(pdf_s, 1e-30)[..., None]
        beta = _m(do_scatter, beta * scale_s, beta)
        r_u = _m(do_scatter, r_u * scale_s, r_u)
        scattered = scattered | do_scatter
        t_scatter = jnp.where(do_scatter, t, t_scatter)
        g_scatter = jnp.where(do_scatter, mp.g, g_scatter)
        vol_active_new = vol_active_new & ~is_scatter

        # null scatter (integrators.cpp:1102-1110)
        sigma_n = jnp.maximum(sigma_maj - mp.sigma_a - mp.sigma_s, 0.0)
        sn_h = hero(sigma_n, hero_idx)
        pdf_n = T_maj_h * sn_h
        zero_pdf = pdf_n == 0
        inv_pdf_n = 1.0 / jnp.maximum(pdf_n, 1e-30)
        beta = _m(is_null, beta * T_maj * sigma_n * inv_pdf_n[..., None], beta)
        beta = _m(is_null & zero_pdf, jnp.zeros_like(beta), beta)
        r_u = _m(is_null, r_u * T_maj * sigma_n * inv_pdf_n[..., None], r_u)
        r_l = _m(is_null, r_l * T_maj * sigma_maj * inv_pdf_n[..., None], r_l)
        died = is_null & ((jnp.max(beta, -1) == 0) | (jnp.max(r_u, -1) == 0))
        terminated = terminated | died
        vol_active_new = vol_active_new & ~died
        # continue tracking: reset T_maj, advance t_min
        T_maj = _m(is_null & ~died, jnp.ones_like(T_maj), T_maj)
        t_min = jnp.where(is_null, t, t_min)

        return (sampler, it, t_min, T_maj, beta, r_u, r_l, L, depth,
                vol_active_new, scattered, terminated, t_scatter, g_scatter,
                n + 1)

    init = (sampler, it0, t_min, T_maj, beta, r_u, r_l, L, depth,
            active & ~it0.done, scattered, terminated, t_scatter, g_scatter,
            jnp.int32(0))
    (sampler, _, t_min, T_maj, beta, r_u, r_l, L, depth, _, scattered,
     terminated, t_scatter, g_scatter, _) = jax.lax.while_loop(cond, body, init)

    # final rescale for lanes that reached segment end (integrators.cpp:1121-1124)
    ran_to_end = active & ~scattered & ~terminated
    T_maj_h = jnp.maximum(hero(T_maj, hero_idx), 1e-30)
    scale = T_maj / T_maj_h[..., None]
    beta = _m(ran_to_end, beta * scale, beta)
    r_u = _m(ran_to_end, r_u * scale, r_u)
    r_l = _m(ran_to_end, r_l * scale, r_l)

    return MediumResult(sampler, beta, r_u, r_l, L, depth, scattered, terminated,
                        t_scatter, g_scatter)


def _homogeneous_medium_interaction(scene, cfg, o, d, seg_end, medium_id,
                                    hero_idx, sampler, beta, r_u, r_l, L,
                                    depth, active, lam=None):
    """Closed-form single-step delta tracking for homogeneous-only scenes
    (media.h HomogeneousMajorantIterator + the one-collision algebra):
    p_null = 0, so the collision loop degenerates to one exponential draw.
    Identical estimator to the general loop, no while_loop."""
    media = scene.media
    z = jnp.zeros_like(seg_end)
    f0 = active & (seg_end < 0)
    mp = media.sample_point(medium_id, o, lam)  # constant within the medium
    sigma_maj = mp.sigma_a + mp.sigma_s
    maj_h = hero(sigma_maj, hero_idx)
    in_med = active & media.is_homogeneous(medium_id)
    seg = jnp.where(jnp.isfinite(seg_end), seg_end, 3e37)

    sampler, u_step = sampler.get_1d()
    t = jnp.where(maj_h > 0,
                  sample_exponential(u_step, jnp.maximum(maj_h, 1e-30)),
                  jnp.inf)
    coll = in_med & (t < seg)

    # ran-to-end lanes: spectral rescale exp(-seg*(sigma - sigma_h))
    ran = in_med & ~coll
    T_end = jnp.exp(-jnp.minimum(seg, 3e37)[..., None] * sigma_maj)
    T_end_h = jnp.maximum(hero(T_end, hero_idx), 1e-30)
    scale_end = T_end / T_end_h[..., None]
    beta = _m(ran, beta * scale_end, beta)
    r_u = _m(ran, r_u * scale_end, r_u)
    r_l = _m(ran, r_l * scale_end, r_l)

    # collision lanes
    T_maj = jnp.exp(-t[..., None] * sigma_maj)
    T_maj_h = hero(T_maj, hero_idx)
    # medium emission (integrators.cpp:1032-1046)
    emit = coll & (depth < cfg.max_depth) & (jnp.max(mp.Le, -1) > 0)
    pdf_e = jnp.maximum(maj_h * T_maj_h, 1e-30)
    betap = beta * T_maj / pdf_e[..., None]
    r_e = r_u * sigma_maj * T_maj / pdf_e[..., None]
    r_e_avg = average(r_e)
    L = _m(emit & (r_e_avg > 0),
           L + betap * mp.sigma_a * mp.Le
           / jnp.maximum(r_e_avg, 1e-30)[..., None], L)

    sa_h = hero(mp.sigma_a, hero_idx)
    ss_h = hero(mp.sigma_s, hero_idx)
    sampler, um = sampler.get_1d()
    p_absorb = sa_h / jnp.maximum(maj_h, 1e-30)
    is_absorb = coll & (um < p_absorb)
    is_scatter = coll & ~is_absorb
    depth_exceeded = is_scatter & (depth >= cfg.max_depth)
    terminated = is_absorb | depth_exceeded | f0
    do_scatter = is_scatter & ~depth_exceeded
    depth = jnp.where(do_scatter, depth + 1, depth)
    pdf_s = jnp.maximum(T_maj_h * ss_h, 1e-30)
    scale_s = T_maj * mp.sigma_s / pdf_s[..., None]
    beta = _m(do_scatter, beta * scale_s, beta)
    r_u = _m(do_scatter, r_u * scale_s, r_u)
    return MediumResult(sampler, beta, r_u, r_l, L, depth,
                        do_scatter, terminated, jnp.where(coll, t, z), mp.g)


# ---------------------------------------------------------------------------
# NEE with ratio-tracking transmittance (VolPath::SampleLd)
# ---------------------------------------------------------------------------


def transmittance_ratio_tracking(scene, cfg, o, wi, t_max, medium_start,
                                 hero_idx, sampler, active, lam=None,
                                 time=None):
    """Spectral transmittance along a shadow ray with rescaled pdfs.

    Walks interface segments (opaque hit => occluded) and ratio-tracks null
    collisions in each segment's medium (cpu/integrators.cpp:1374-1422).
    Returns (sampler, T_ray, r_l, r_u).
    """
    nchan = 3 if lam is None else lam.shape[-1]
    # derived from the varying o so shard_map vma carries stay consistent
    T_ray = jnp.ones_like(o[..., :1]) + jnp.zeros(o.shape[:-1] + (nchan,))
    r_l = jnp.ones_like(T_ray)
    r_u = jnp.ones_like(T_ray)
    t_cur = jnp.zeros_like(o[..., 0])
    med_id = medium_start
    seg_active = active
    homog_only = (len(scene.media.grids) == 0
                  and len(scene.media.procedurals) == 0)

    def seg_cond(c):
        (_, _, _, _, _, _, seg_active, it) = c
        return jnp.any(seg_active) & (it < cfg.max_shadow_segments)

    def seg_body(c):
        (sampler, T_ray, r_l, r_u, t_cur, med_id, seg_active, it) = c
        p_cur = o + t_cur[..., None] * wi
        rem = t_max - t_cur
        h = scene.geometry.intersect(p_cur, wi, rem, time=time)
        blocked = h.hit & (h.mat_id >= 0) & (h.t < rem)
        T_ray = _m(seg_active & blocked, jnp.zeros_like(T_ray), T_ray)
        seg_len = jnp.where(h.hit & (h.t < rem), h.t, rem)

        live = seg_active & ~blocked
        if homog_only:
            # analytic homogeneous transmittance: exactly the ratio-tracking
            # expectation with zero variance and no collision loop
            mp_h = scene.media.sample_point(med_id, p_cur, lam)
            in_m = live & scene.media.is_homogeneous(med_id)
            sl = jnp.where(jnp.isfinite(seg_len), seg_len, 0.0)
            T_seg = jnp.exp(-sl[..., None] * (mp_h.sigma_a + mp_h.sigma_s))
            T_ray = _m(in_m, T_ray * T_seg, T_ray)
            crossing = live & h.hit & (h.t < rem)
            new_med = jnp.where(dot(wi, h.n) < 0, h.med_in, h.med_out)
            med_id = jnp.where(crossing, new_med, med_id)
            dead = jnp.max(T_ray, -1) == 0
            t_cur = jnp.where(live, t_cur + seg_len + 1e-4, t_cur)
            seg_active = live & ~dead & crossing & (t_cur < t_max)
            return (sampler, T_ray, r_l, r_u, t_cur, med_id, seg_active,
                    it + 1)
        # majorant-segment iterator over this interface segment
        sit0 = seg_init(scene.media, med_id, p_cur, wi, seg_len, live, lam)
        t_min = sit0.t_seg_start
        T_maj = jnp.ones_like(T_ray)

        def c_cond(cc):
            (_, _, _, _, _, _, _, ca, cit) = cc
            return jnp.any(ca) & (cit < cfg.max_collisions)

        def c_body(cc):
            (sampler, sit, t_min, T_maj, T_ray, r_l, r_u, ca, cit) = cc
            sigma_maj = sit.sigma_maj
            maj_h = hero(sigma_maj, hero_idx)
            sampler, u_step = sampler.get_1d()
            t = jnp.where(
                maj_h > 0,
                t_min + sample_exponential(u_step, jnp.maximum(maj_h, 1e-30)),
                jnp.inf,
            )
            past = t >= sit.t_seg_end
            tail = ca & past
            dt_end = jnp.clip(sit.t_seg_end - t_min, 0.0, 3e37)
            T_maj = _m(tail, T_maj * jnp.exp(-dt_end[..., None] * sigma_maj), T_maj)
            sit = seg_next(scene.media, med_id, sit, tail, lam)
            t_min = jnp.where(tail, sit.t_seg_start, t_min)
            ca_new = ca & ~(tail & sit.done)

            coll = ca & ~past
            T_maj = _m(coll, T_maj * jnp.exp(-(t - t_min)[..., None] * sigma_maj), T_maj)
            p = p_cur + t[..., None] * wi
            mp = scene.media.sample_point(med_id, p, lam)
            sigma_n = jnp.maximum(sigma_maj - mp.sigma_a - mp.sigma_s, 0.0)
            T_maj_h = hero(T_maj, hero_idx)
            pdf = jnp.maximum(T_maj_h * maj_h, 1e-30)
            T_ray = _m(coll, T_ray * T_maj * sigma_n / pdf[..., None], T_ray)
            r_l = _m(coll, r_l * T_maj * sigma_maj / pdf[..., None], r_l)
            r_u = _m(coll, r_u * T_maj * sigma_n / pdf[..., None], r_u)

            # transmittance russian roulette (integrators.cpp:1404-1412)
            Tr = T_ray / jnp.maximum(average(r_l + r_u), 1e-30)[..., None]
            low = coll & (jnp.max(Tr, -1) < 0.05)
            sampler, u_rr = sampler.get_1d()
            killed = low & (u_rr < 0.75)
            T_ray = _m(killed, jnp.zeros_like(T_ray), T_ray)
            T_ray = _m(low & ~killed, T_ray / 0.25, T_ray)

            dead = coll & (jnp.max(T_ray, -1) == 0)
            ca_new = ca_new & ~dead
            T_maj = _m(coll & ~dead, jnp.ones_like(T_maj), T_maj)
            t_min = jnp.where(coll, t, t_min)
            return (sampler, sit, t_min, T_maj, T_ray, r_l, r_u, ca_new, cit + 1)

        (sampler, _, t_min, T_maj, T_ray, r_l, r_u, _, _) = jax.lax.while_loop(
            c_cond, c_body,
            (sampler, sit0, t_min, T_maj, T_ray, r_l, r_u, live & ~sit0.done,
             jnp.int32(0)),
        )
        # final per-segment rescale (integrators.cpp:1416-1419)
        T_maj_h = jnp.maximum(hero(T_maj, hero_idx), 1e-30)
        scale = T_maj / T_maj_h[..., None]
        T_ray = _m(live, T_ray * scale, T_ray)
        r_l = _m(live, r_l * scale, r_l)
        r_u = _m(live, r_u * scale, r_u)

        # cross the interface: switch medium by crossing side
        crossing = live & h.hit & (h.t < rem)
        new_med = jnp.where(dot(wi, h.n) < 0, h.med_in, h.med_out)
        med_id = jnp.where(crossing, new_med, med_id)

        dead = jnp.max(T_ray, -1) == 0
        t_cur = jnp.where(live, t_cur + seg_len + 1e-4, t_cur)
        seg_active = live & ~dead & crossing & (t_cur < t_max)
        return (sampler, T_ray, r_l, r_u, t_cur, med_id, seg_active, it + 1)

    (sampler, T_ray, r_l, r_u, _, _, _, _) = jax.lax.while_loop(
        seg_cond, seg_body,
        (sampler, T_ray, r_l, r_u, t_cur, med_id, seg_active, jnp.int32(0)),
    )
    return sampler, T_ray, r_l, r_u


def _combine_ld(ls, f_hat, scatter_pdf, T_ray, tr_l, tr_u, r_p, beta, ok):
    """Final SampleLd contribution (integrators.cpp:1424-1433).

    Returns (contribution, local_contribution): the latter is the same
    estimate without the path prefix (beta, r_p) — what guided training
    records as scattered direct light (guiding.h:729 semantics).
    """
    p_l = ls.select_pmf * ls.pdf_dir
    r_l = tr_l * r_p * p_l[..., None]
    r_u = tr_u * r_p * scatter_pdf[..., None]
    denom = jnp.where(ls.is_delta, average(r_l), average(r_l + r_u))
    contrib = beta * f_hat * T_ray * ls.L / jnp.maximum(denom, 1e-30)[..., None]
    contrib = jnp.where((ok & (denom > 0))[..., None], contrib, 0.0)
    # local variant: r_p == 1
    r_l_loc = tr_l * p_l[..., None]
    r_u_loc = tr_u * scatter_pdf[..., None]
    denom_loc = jnp.where(ls.is_delta, average(r_l_loc), average(r_l_loc + r_u_loc))
    local = f_hat * T_ray * ls.L / jnp.maximum(denom_loc, 1e-30)[..., None]
    local = jnp.where((ok & (denom_loc > 0))[..., None], local, 0.0)
    return contrib, local


def sample_ld_volume(scene, cfg, p, wo, g, medium_id, hero_idx, sampler, beta,
                     r_p, active, lam=None, time=None):
    """NEE from a medium scatter vertex (SampleLd with phase function)."""
    sampler, u_sel = sampler.get_1d()
    sampler, u2 = sampler.get_2d()
    ls = scene.lights.sample(p, u_sel, u2)
    if lam is not None:
        from ...utils.spectrum import uplift_unbounded

        ls = ls._replace(L=uplift_unbounded(ls.L, lam))
    ok = active & ls.valid & (average(ls.L) > 0)

    cos_wo_wi = jnp.sum(wo * ls.wi, axis=-1)
    f_scalar = henyey_greenstein(cos_wo_wi, g)
    f_hat = f_scalar[..., None] * jnp.ones_like(beta)
    scatter_pdf = f_scalar
    ok &= f_scalar > 0

    sampler, T_ray, tr_l, tr_u = transmittance_ratio_tracking(
        scene, cfg, p, ls.wi, ls.t_shadow, medium_id, hero_idx, sampler, ok,
        lam, time=time
    )
    contrib, local = _combine_ld(ls, f_hat, scatter_pdf, T_ray, tr_l, tr_u,
                                 r_p, beta, ok)
    return sampler, contrib, local


def sample_ld_surface(scene, cfg, p, n_g, ns, wo_world, lanes, medium_id,
                      hero_idx, sampler, beta, r_p, active, lam=None,
                      tangent=None, time=None):
    """NEE from a surface vertex (SampleLd with BSDF).

    Directions converted to the shading frame for masked BSDF dispatch.
    """
    p_offset = offset_ray_origin(p, n_g, wo_world)
    sampler, u_sel = sampler.get_1d()
    sampler, u2 = sampler.get_2d()
    ls = scene.lights.sample(p_offset, u_sel, u2)
    if lam is not None:
        from ...utils.spectrum import uplift_unbounded

        ls = ls._replace(L=uplift_unbounded(ls.L, lam))
    ok = active & ls.valid & (average(ls.L) > 0)

    t1, t2 = shading_frame(ns, tangent)

    def to_local(w):
        return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], axis=-1)

    wo_l = to_local(wo_world)
    wi_l = to_local(ls.wi)
    f_hat = bsdf_f(lanes, wo_l, wi_l) * jnp.abs(dot(ls.wi, ns))[..., None]
    scatter_pdf = bsdf_pdf(lanes, wo_l, wi_l)
    ok &= jnp.max(f_hat, -1) > 0

    sampler, T_ray, tr_l, tr_u = transmittance_ratio_tracking(
        scene, cfg, p_offset, ls.wi, ls.t_shadow, medium_id, hero_idx, sampler,
        ok, lam, time=time
    )
    contrib, local = _combine_ld(ls, f_hat, scatter_pdf, T_ray, tr_l, tr_u,
                                 r_p, beta, ok)
    return sampler, contrib, local


# ---------------------------------------------------------------------------
# Path state + bounce loop
# ---------------------------------------------------------------------------


class PathState(NamedTuple):
    sampler: LaneSampler
    o: jnp.ndarray  # (R,3)
    d: jnp.ndarray  # (R,3) normalized
    beta: jnp.ndarray  # (R,3)
    r_u: jnp.ndarray  # (R,3)
    r_l: jnp.ndarray  # (R,3)
    L: jnp.ndarray  # (R,3)
    depth: jnp.ndarray  # (R,) int32
    alive: jnp.ndarray  # (R,) bool
    specular: jnp.ndarray  # (R,) bool
    hero_idx: jnp.ndarray  # (R,) int32
    medium_id: jnp.ndarray  # (R,) int32, -1 = vacuum
    eta_scale: jnp.ndarray  # (R,)
    prev_p: jnp.ndarray  # (R,3) previous scattering vertex (light ctx)
    lam: jnp.ndarray = None  # (R,4) sampled wavelengths (spectral mode)
    pdf_lam: jnp.ndarray = None  # (R,4) their pdfs
    time: jnp.ndarray = None  # (R,) ray time in [0,1] (motion blur;
    #     None = static scene — constant per path, cameras.h:131-149)


def make_path_state(sampler, o, d, hero_idx, medium_id, pixel_like,
                    lam=None, pdf_lam=None, time=None):
    """Fresh path state; carries derived from varying inputs."""
    nchan = 3 if lam is None else lam.shape[-1]
    # derived from the varying o so shard_map vma carries stay consistent
    ones = jnp.ones_like(o[..., :1]) + jnp.zeros(o.shape[:-1] + (nchan,))
    return PathState(
        sampler=sampler, o=o, d=d,
        beta=ones, r_u=ones, r_l=ones,
        L=jnp.zeros_like(ones), depth=jnp.zeros_like(pixel_like),
        alive=pixel_like >= 0, specular=pixel_like < 0,
        hero_idx=hero_idx, medium_id=medium_id,
        eta_scale=jnp.ones_like(o[..., 0]), prev_p=jnp.zeros_like(o),
        lam=lam, pdf_lam=pdf_lam, time=time,
    )


def volpath_bounce(scene: Scene, cfg: VolPathConfig, s: PathState) -> PathState:
    """One path event for every lane."""
    t_far = jnp.full_like(s.o[..., 0], INF)
    h = scene.geometry.intersect(s.o, s.d, t_far, time=s.time)
    seg_end = jnp.where(h.hit, h.t, INF)

    # ---- medium flight -----------------------------------------------------
    in_medium = s.alive & (s.medium_id >= 0)
    mr = sample_medium_interaction(
        scene, cfg, s.o, s.d, seg_end, s.medium_id, s.hero_idx, s.sampler,
        s.beta, s.r_u, s.r_l, s.L, s.depth, in_medium, s.lam,
    )
    sampler, beta, r_u, r_l, L, depth = (
        mr.sampler, mr.beta, mr.r_u, mr.r_l, mr.L, mr.depth,
    )
    alive = s.alive & ~mr.terminated

    # ---- real-scatter lanes: NEE + phase sample ---------------------------
    scat = mr.scattered & alive
    p_scat = s.o + mr.t_scatter[..., None] * s.d
    wo = -s.d
    sampler, Ld, _ = sample_ld_volume(
        scene, cfg, p_scat, wo, mr.g_scatter, s.medium_id, s.hero_idx, sampler,
        beta, r_u, scat, s.lam, time=s.time,
    )
    L = _m(scat, L + Ld, L)
    sampler, u2 = sampler.get_2d()
    wi_p, phase_pdf = sample_henyey_greenstein(wo, mr.g_scatter, u2)
    bad_phase = scat & (phase_pdf <= 0)
    alive = alive & ~bad_phase
    r_l = _m(scat, r_u / jnp.maximum(phase_pdf, 1e-30)[..., None], r_l)
    o_new = _m(scat, p_scat, s.o)
    d_new = _m(scat, wi_p, s.d)
    specular = jnp.where(scat, False, s.specular)
    prev_p = _m(scat, p_scat, s.prev_p)

    # ---- non-scattered lanes: escape / surface ----------------------------
    flew = alive & ~scat

    # escaped: infinite lights with MIS (integrators.cpp:1127-1143)
    escaped = flew & ~h.hit
    Le_env = scene.lights.le_escaped(s.d, s.o)
    if s.lam is not None:
        from ...utils.spectrum import uplift_unbounded

        Le_env = uplift_unbounded(Le_env, s.lam)
    any_env = average(Le_env) > 0
    first = (s.depth == 0) | s.specular
    no_mis = escaped & first & any_env
    L = _m(no_mis, L + beta * Le_env / jnp.maximum(average(r_u), 1e-30)[..., None], L)
    with_mis = escaped & ~first & any_env
    p_l_esc = scene.lights.pdf_li_escaped(s.d, s.prev_p)
    r_l_esc = r_l * p_l_esc[..., None]
    denom_esc = jnp.maximum(average(r_u + r_l_esc), 1e-30)
    L = _m(with_mis, L + beta * Le_env / denom_esc[..., None], L)
    alive = alive & ~escaped

    surf = flew & h.hit

    # emissive surface hit (integrators.cpp:1146-1160)
    emissive = surf & (h.light_id >= 0)
    Le_surf = scene.lights.le_area(h.light_id, -s.d, h.n)
    if s.lam is not None:
        from ...utils.spectrum import uplift_unbounded

        Le_surf = uplift_unbounded(Le_surf, s.lam)
    has_le = average(Le_surf) > 0
    no_mis_s = emissive & first & has_le
    L = _m(no_mis_s, L + beta * Le_surf / jnp.maximum(average(r_u), 1e-30)[..., None], L)
    with_mis_s = emissive & ~first & has_le
    p_l_area = scene.lights.pdf_li_area(h.light_id, s.prev_p, h.p, h.n)
    r_l_area = r_l * p_l_area[..., None]
    denom_s = jnp.maximum(average(r_u + r_l_area), 1e-30)
    L = _m(with_mis_s, L + beta * Le_surf / denom_s[..., None], L)

    # interface-only surfaces: skip through, switch medium
    # (integrators.cpp:1168-1171 SkipIntersection + SpawnRay medium logic)
    iface = surf & (h.mat_id < 0)
    new_med_skip = jnp.where(dot(s.d, h.n) < 0, h.med_in, h.med_out)
    medium_id = jnp.where(iface, new_med_skip, s.medium_id)
    o_new = _m(iface, h.p + 1e-4 * s.d, o_new)

    # ---- real surface shading ---------------------------------------------
    shade = surf & (h.mat_id >= 0)
    depth_hit = shade & (s.depth >= cfg.max_depth)
    alive = alive & ~depth_hit
    shade = shade & ~depth_hit
    depth = jnp.where(shade, depth + 1, depth)

    lanes = scene.materials.gather_textured(scene.textures, h.mat_id, h.uv, h.p)
    if s.lam is not None:
        from ...utils.spectrum import uplift_unbounded

        lanes = lanes._replace(albedo=uplift_unbounded(lanes.albedo, s.lam),
                               albedo2=uplift_unbounded(lanes.albedo2, s.lam))
    ns = face_forward(h.ns, h.n)  # keep shading normal consistent w/ geometric
    hp, hn = h.p, h.n

    # ---- subsurface scattering: Fresnel split + probe relocation ----------
    # (bssrdf.h SeparableBSSRDF; see models/bssrdf.py for the redesign)
    if cfg.sss:
        from ..bssrdf import sample_exit_point, sp_weight
        from ..materials import SUBSURFACE, fresnel_dielectric
        from ..materials import CONDUCTOR as _COND
        from ..materials import DIFFUSE as _DIFF

        is_sss = shade & (lanes.mat_type == SUBSURFACE)
        t1s, t2s = shading_frame(ns, h.tangent)
        sampler, u_fr = sampler.get_1d()
        F_in = fresnel_dielectric(jnp.abs(dot(-s.d, ns)), lanes.eta)
        sss_refl = is_sss & (u_fr < F_in)  # interface reflection lobe
        sss_trans = is_sss & ~sss_refl
        sampler, u_r1 = sampler.get_1d()
        sampler, u_r2 = sampler.get_1d()
        sampler, u_phi = sampler.get_1d()
        d_mfp = scene.materials.albedo2[jnp.maximum(h.mat_id, 0)]
        alb_sss = scene.materials.albedo[jnp.maximum(h.mat_id, 0)]
        d_hero = jnp.mean(d_mfp, -1)
        sss_ok, p_x, n_x, r_s, cos_x = sample_exit_point(
            scene.geometry, h.p, ns, t1s, t2s, h.mat_id, d_hero,
            u_r1, u_r2, u_phi, sss_trans)
        w_sp = sp_weight(h.p, p_x, alb_sss, d_mfp, r_s, cos_x)
        dead_sss = sss_trans & ~sss_ok
        alive = alive & ~dead_sss
        shade = shade & ~dead_sss
        relocated = sss_trans & sss_ok
        if s.lam is not None:
            from ...utils.spectrum import uplift_unbounded

            w_sp = uplift_unbounded(w_sp, s.lam)
        beta = _m(relocated, beta * w_sp, beta)
        hp = _m(relocated, p_x, hp)
        hn = _m(relocated, n_x, hn)
        ns = _m(relocated, n_x, ns)
        # transmitted lanes exit through a Lambertian lobe (the Sw factor
        # integrates to 1 over the hemisphere); reflected lanes become a
        # perfect mirror (the Fresnel-weighted interface lobe)
        one = jnp.ones_like(lanes.albedo)
        lanes = lanes._replace(
            mat_type=jnp.where(sss_refl, _COND,
                               jnp.where(relocated, _DIFF, lanes.mat_type)),
            albedo=jnp.where(is_sss[..., None], one, lanes.albedo),
            roughness=jnp.where(is_sss, 0.0, lanes.roughness),
        )

    # NEE from surface (skipped for pure-specular lanes)
    can_nee = shade & ~lanes.is_specular
    sampler, Ld_s, _ = sample_ld_surface(
        scene, cfg, hp, hn, ns, -s.d, lanes, medium_id, s.hero_idx, sampler,
        beta, r_u, can_nee, s.lam, h.tangent, time=s.time,
    )
    L = _m(can_nee, L + Ld_s, L)

    # BSDF sampling
    t1, t2 = shading_frame(ns, h.tangent)

    def to_local(w):
        return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], axis=-1)

    def to_world(w):
        return w[..., 0:1] * t1 + w[..., 1:2] * t2 + w[..., 2:3] * ns

    wo_l = to_local(-s.d)
    sampler, u_lobe = sampler.get_1d()
    sampler, u2b = sampler.get_2d()
    bs = bsdf_sample(lanes, wo_l, u_lobe, u2b)
    bs_ok = shade & bs.valid & (bs.pdf > 0)
    alive = alive & ~(shade & ~bs_ok)
    wi_world = normalize(to_world(bs.wi))

    cos_wi = jnp.abs(dot(wi_world, ns))
    scale_b = bs.f * cos_wi[..., None] / jnp.maximum(bs.pdf, 1e-30)[..., None]
    beta = _m(bs_ok, beta * scale_b, beta)
    r_l = _m(bs_ok, r_u / jnp.maximum(bs.pdf, 1e-30)[..., None], r_l)
    specular = jnp.where(bs_ok, bs.is_specular, specular)
    eta_scale = jnp.where(bs_ok & bs.is_transmission,
                          s.eta_scale * bs.eta * bs.eta, s.eta_scale)
    # ROBUST medium switch (round-5 bias hunt): a REFLECTED ray never
    # changes medium — re-deriving the medium from the face's label side
    # made reflections off inward-wound faces tunnel into the wrong
    # medium (measured: the XLA path lost ALL post-reflection in-medium
    # energy on such meshes, which the kernels' keep-medium rule
    # preserved — the round-4 '+2-3%% kernel bias' was the REFERENCE
    # being dark). Only a true crossing (wi on the opposite side of the
    # arrival direction) adopts the far side's medium label
    # (interaction.h SpawnRay semantics).
    wi_front = dot(wi_world, hn) > 0
    arr_front = dot(s.d, hn) < 0
    crossed = bs_ok & (wi_front != arr_front)
    new_med_x = jnp.where(wi_front, h.med_out, h.med_in)
    medium_id = jnp.where(crossed, new_med_x, medium_id)
    o_new = _m(bs_ok, offset_ray_origin(hp, hn, wi_world), o_new)
    d_new = _m(bs_ok, wi_world, d_new)
    prev_p = _m(bs_ok, hp, prev_p)

    # ---- Russian roulette (integrators.cpp:1301-1312) ---------------------
    # The reference runs RR at the END of every bounce iteration — volume
    # scatters included — which is what bounds the deep multiple-scattering
    # tails in dense media (without it the densest paths run to max_depth
    # and one slow lane serializes its whole wavefront/block).
    dead_beta = shade & (jnp.max(beta, -1) == 0)
    alive = alive & ~dead_beta
    rr_beta = beta * eta_scale[..., None] / jnp.maximum(average(r_u), 1e-30)[..., None]
    rr_max = jnp.max(rr_beta, -1)
    sampler, u_rr = sampler.get_1d()
    do_rr = (shade | scat) & (rr_max < 1.0) & (depth >= cfg.rr_start_depth)
    q = jnp.maximum(0.0, 1.0 - rr_max)
    rr_kill = do_rr & (u_rr < q)
    alive = alive & ~rr_kill
    beta = _m(do_rr & ~rr_kill, beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta)

    return PathState(
        sampler, o_new, d_new, beta, r_u, r_l, L, depth, alive, specular,
        s.hero_idx, medium_id, eta_scale, prev_p, s.lam, s.pdf_lam, s.time,
    )


# ---------------------------------------------------------------------------
# Render drivers
# ---------------------------------------------------------------------------


def trace_paths(scene, cfg, s: PathState):
    """Run the bounce loop until all lanes die (or max_events)."""

    def cond(c):
        st, it = c
        return jnp.any(st.alive) & (it < cfg.max_events)

    def body(c):
        st, it = c
        return volpath_bounce(scene, cfg, st), it + 1

    s, _ = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))
    return s


def start_camera_paths(camera, film, seed, sample_index, pixel_id, camera_medium,
                       sampler_kind="independent", spp=0, spectral=False):
    """Generate primary rays + fresh path state for the given pixel lanes."""
    pix = pixel_coords(film.resolution)[pixel_id]
    sampler = LaneSampler.start(seed, pixel_id.astype(jnp.uint32), sample_index,
                                kind=sampler_kind, spp=spp,
                                nx=film.resolution[0])
    sampler, u_pix = sampler.get_2d()
    offset, filter_w = film.filter.sample(u_pix)
    p_raster = pix.astype(jnp.float32) + 0.5 + offset
    sampler, u_lens = sampler.get_2d()
    rays = camera.generate_rays(p_raster, u_lens)
    if len(rays) == 3:  # lens-system cameras return a radiance weight
        o, d, cam_w = rays
    else:
        o, d = rays
        cam_w = None
    sampler, u_wl = sampler.get_1d()
    if spectral:
        from ...utils.spectrum import sample_wavelengths_visible

        lam, pdf_lam = sample_wavelengths_visible(u_wl)
        hero_idx = jnp.zeros_like(pixel_id)  # lambda[0] is the hero in N=4
    else:
        lam = pdf_lam = None
        hero_idx = sample_hero_channel(u_wl)
    med0 = jnp.full_like(pixel_id, camera_medium)
    # camera shutter (cameras.h:131-149): ray time = lerp(open, close, u);
    # static cameras (shutter_open == shutter_close == 0) carry no time
    sh_o = float(getattr(camera, "shutter_open", 0.0) or 0.0)
    sh_c = float(getattr(camera, "shutter_close", 0.0) or 0.0)
    if sh_c > sh_o:
        sampler, u_time = sampler.get_1d()
        ray_time = sh_o + (sh_c - sh_o) * u_time
    else:
        ray_time = None
    state = make_path_state(sampler, o, d, hero_idx, med0, pixel_id, lam,
                            pdf_lam, time=ray_time)
    if cam_w is not None:
        state = state._replace(beta=state.beta * cam_w[..., None],
                               alive=state.alive & (cam_w > 0))
    return state, filter_w


def _film_add(film, state, pixel_id, s, fw):
    """Accumulate traced radiance: RGB directly, or spectral via the CIE
    sensor integration (film.add_spectral_samples)."""
    if s.lam is None:
        return film.add_samples(state, pixel_id, s.L, fw)
    return film.add_spectral_samples(state, pixel_id, s.L, s.lam, s.pdf_lam, fw)


def render_wave(scene, camera, film, film_state, cfg, seed, sample_index,
                camera_medium=-1):
    """Trace one 1-spp wave over all pixels and accumulate into the film
    (wave loop analog of cpu/integrators.cpp:75-269)."""
    R = film.npix
    pixel_id = jnp.arange(R, dtype=jnp.int32)
    s, fw = start_camera_paths(camera, film, seed, sample_index, pixel_id,
                               camera_medium, spectral=cfg.spectral)
    s = trace_paths(scene, cfg, s)
    return _film_add(film, film_state, pixel_id, s, fw)


@partial(jax.jit, static_argnames=("cfg", "camera_medium", "spp_per_pass",
                                   "sampler_kind", "sampler_spp"))
def _render_jit(scene, camera, film, cfg, spp, seed, camera_medium, spp_per_pass,
                sampler_kind="independent", sampler_spp=0):
    state = film.init_state()
    R = film.npix * spp_per_pass
    lane = jnp.arange(R, dtype=jnp.int32)
    pixel_id = lane // spp_per_pass
    n_pass = spp // spp_per_pass

    def one_pass(i, st):
        sample_index = (i * spp_per_pass + lane % spp_per_pass).astype(jnp.uint32)
        s, fw = start_camera_paths(camera, film, seed, sample_index, pixel_id,
                                   camera_medium, sampler_kind, sampler_spp,
                                   cfg.spectral)
        s = trace_paths(scene, cfg, s)
        return _film_add(film, st, pixel_id, s, fw)

    state = jax.lax.fori_loop(0, n_pass, one_pass, state)
    return film.image(state)


@partial(jax.jit, static_argnames=("cfg", "camera_medium", "spp_per_pass",
                                   "sampler_kind", "sampler_spp"))
def render_pass(scene, camera, film, film_state, cfg, seed, wave_idx,
                camera_medium, spp_per_pass, sampler_kind="independent",
                sampler_spp=0):
    """One progressive pass of spp_per_pass samples, accumulated in
    film_state (the wave loop building block for --time budgets, display
    streaming and partial-image writes; cpu/integrators.cpp:113-263)."""
    R = film.npix * spp_per_pass
    lane = jnp.arange(R, dtype=jnp.int32)
    pixel_id = lane // spp_per_pass
    sample_index = (wave_idx * spp_per_pass + lane % spp_per_pass).astype(jnp.uint32)
    s, fw = start_camera_paths(camera, film, seed, sample_index, pixel_id,
                               camera_medium, sampler_kind, sampler_spp,
                               cfg.spectral)
    s = trace_paths(scene, cfg, s)
    return _film_add(film, film_state, pixel_id, s, fw), s


def render_progressive(scene, camera, film, cfg=VolPathConfig(), seed=0,
                       camera_medium=-1, spp_per_pass=4, max_spp=1 << 16,
                       time_budget=None, sampler="independent",
                       wave_callback=None, resume_state=None):
    """Progressive wave loop with a render-time budget (--time semantics,
    options.h:46): returns (image, spp_rendered, film_state).
    wave_callback(wave_idx, spp_done, image_fn) runs between waves
    (display/partial writes/MSE). resume_state: (FilmState, spp_done) from
    utils.checkpoint to continue an interrupted render."""
    import time as _time

    import jax as _jax

    t0 = _time.perf_counter()
    if resume_state is not None:
        state, spp_done = resume_state
        wave = spp_done // spp_per_pass
    else:
        state = film.init_state()
        spp_done = 0
        wave = 0
    while spp_done < max_spp:
        state, _ = render_pass(scene, camera, film, state, cfg,
                               jnp.uint32(seed), jnp.int32(wave),
                               int(camera_medium), int(spp_per_pass),
                               str(sampler), 0)
        spp_done += spp_per_pass
        wave += 1
        if wave_callback is not None:
            wave_callback(wave, spp_done, lambda: _jax.device_get(film.image(state)))
        if time_budget is not None:
            _jax.device_get(state.weight_sum[0])  # sync before timing check
            if _time.perf_counter() - t0 > time_budget:
                break
    return film.image(state), spp_done, state


def render(scene: Scene, camera, film, spp=16, cfg=VolPathConfig(), seed=0,
           camera_medium=-1, spp_per_pass=None, sampler="independent"):
    """Full render. spp_per_pass packs multiple samples into one wavefront
    (bigger arrays -> better VPU utilization); defaults to min(spp, 8).
    sampler: independent | stratified | paddedsobol/sobol/zsobol."""
    if spp_per_pass is None:
        spp_per_pass = min(spp, 8)
    assert spp % spp_per_pass == 0
    return _render_jit(scene, camera, film, cfg, jnp.int32(spp), jnp.uint32(seed),
                       int(camera_medium), int(spp_per_pass),
                       str(sampler), int(spp))


# -- convenience: fog-box scene builder (BASELINE config 1) ------------------


def make_fog_box_scene(sigma_a, sigma_s, g=0.0, Le=None, env_L=None,
                       point=None, box=((-1, -1, -1), (1, 1, 1)),
                       world_radius=100.0):
    media = HomogeneousMedia.make([sigma_a], [sigma_s],
                                  Le=None if Le is None else [Le], g=[g])
    lights = Lights.make(
        point_p=None if point is None else [point[0]],
        point_I=None if point is None else [point[1]],
        env_L=env_L, world_radius=world_radius,
    )
    geom = Geometry.build(
        boxes=[dict(bmin=box[0], bmax=box[1], mat=-1, light=-1, med_in=0,
                    med_out=-1)]
    )
    return Scene(geom, Materials.build([]), media, lights)


def make_cornell_box_scene(Le=12.0):
    """Classic Cornell box (surface-only demo scene): white floor/ceiling/
    back, red left, green right, ceiling area light facing down. Camera
    convention: interior is x,z in [-1,1], y in [0,2]; view from +z."""

    def quad(p00, p10, p11, p01, mat, light=-1):
        return [dict(p0=p00, p1=p10, p2=p11, mat=mat, light=light),
                dict(p0=p00, p1=p11, p2=p01, mat=mat, light=light)]

    white, red, green = 0, 1, 2
    tris = []
    tris += quad((-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1), white)
    tris += quad((-1, 2, 1), (1, 2, 1), (1, 2, -1), (-1, 2, -1), white)
    tris += quad((-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1), white)
    tris += quad((-1, 0, -1), (-1, 0, 1), (-1, 2, 1), (-1, 2, -1), red)
    tris += quad((1, 0, 1), (1, 0, -1), (1, 2, -1), (1, 2, 1), green)
    lq = [(-0.35, 1.99, -0.35), (0.35, 1.99, -0.35),
          (0.35, 1.99, 0.35), (-0.35, 1.99, 0.35)]
    lt = [dict(p0=lq[0], p1=lq[1], p2=lq[3], mat=white, light=0),
          dict(p0=lq[1], p1=lq[2], p2=lq[3], mat=white, light=1)]
    tris += lt
    geom = Geometry.build(triangles=tris, use_bvh=False)
    mats = Materials.build([
        dict(type=0, albedo=(0.73, 0.73, 0.73)),
        dict(type=0, albedo=(0.65, 0.05, 0.05)),
        dict(type=0, albedo=(0.12, 0.45, 0.15)),
    ])
    area = [dict(p0=t["p0"], p1=t["p1"], p2=t["p2"], L=(Le,) * 3)
            for t in lt]
    lights = Lights.make(area_tris=area)
    from ..media import Media

    return Scene(geom, mats, Media.make(), lights)


# ---------------------------------------------------------------------------
# Persistent wavefront: ray-pool regeneration
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "spp", "camera_medium", "n_lanes",
                                   "sampler_kind"))
def _render_persistent_jit(scene, camera, film, cfg, spp, seed, camera_medium,
                           n_lanes, sampler_kind="independent"):
    """Persistent-wavefront render: R lanes stay saturated — when a path
    dies its radiance is committed and the lane immediately restarts the
    next (pixel, sample) from a global counter. Replaces the wave-drain
    outer loop (utilization ~1 instead of tailing off as paths die; the
    reference's wavefront keeps queues full the same way,
    wavefront/integrator.cpp:336-374)."""
    R = n_lanes
    npix = film.npix
    total = npix * spp

    def fresh(global_id, active):
        pixel_id = (global_id % npix).astype(jnp.int32)
        sample_index = (global_id // npix).astype(jnp.uint32)
        s, fw = start_camera_paths(camera, film, seed, sample_index, pixel_id,
                                   camera_medium, sampler_kind, 0,
                                   cfg.spectral)
        s = s._replace(alive=s.alive & active)
        return s, pixel_id, fw

    gid0 = jnp.arange(R, dtype=jnp.uint32)
    s, pixel_id, fw = fresh(gid0, gid0 < total)
    next_ctr = jnp.uint32(min(R, total))
    film_state = film.init_state()

    def cond(c):
        s, pixel_id, fw, film_state, next_ctr, it = c
        return jnp.any(s.alive) & (it < spp * cfg.max_events)

    def body(c):
        s, pixel_id, fw, film_state, next_ctr, it = c
        was_alive = s.alive
        s = volpath_bounce(scene, cfg, s)
        died = was_alive & ~s.alive
        # commit finished paths
        if cfg.spectral:
            film_state = film.add_spectral_samples(
                film_state, jnp.where(died, pixel_id, 0),
                jnp.where(died[..., None], s.L, 0.0), s.lam, s.pdf_lam,
                jnp.where(died, fw, 0.0))
        else:
            film_state = film.add_samples(
                film_state, jnp.where(died, pixel_id, 0),
                jnp.where(died[..., None], s.L, 0.0),
                jnp.where(died, fw, 0.0))
        # reseed died lanes with fresh samples while budget remains
        rank = jnp.cumsum(died.astype(jnp.uint32)) - died.astype(jnp.uint32)
        new_gid = next_ctr + rank
        has_budget = died & (new_gid < total)
        s2, pixel2, fw2 = fresh(new_gid, has_budget)
        pick = has_budget

        def sel(new, old):
            if new.ndim == 0:  # scalars (sampler seed) are identical
                return new
            m = pick
            while m.ndim < new.ndim:
                m = m[..., None]
            return jnp.where(m, new, old)

        s = jax.tree_util.tree_map(sel, s2, s)
        pixel_id = jnp.where(pick, pixel2, pixel_id)
        fw = jnp.where(pick, fw2, fw)
        next_ctr = next_ctr + jnp.sum(died.astype(jnp.uint32))
        next_ctr = jnp.minimum(next_ctr, jnp.uint32(total))
        return s, pixel_id, fw, film_state, next_ctr, it + 1

    s, pixel_id, fw, film_state, next_ctr, _ = jax.lax.while_loop(
        cond, body, (s, pixel_id, fw, film_state, next_ctr, jnp.int32(0)))
    return film.image(film_state)


def render_persistent(scene: Scene, camera, film, spp=16,
                      cfg=VolPathConfig(), seed=0, camera_medium=-1,
                      lanes_per_pixel=2, sampler="independent",
                      backend="auto"):
    """Persistent-wavefront render driver. lanes_per_pixel controls the
    pool size (R = npix * lanes_per_pixel).

    backend: "auto" uses the Pallas megakernel (ops/pallas_volpath) when the
    scene qualifies (homogeneous box media, pinhole camera, point/env
    lights) — the whole path life-cycle stays in VMEM, ~40x the XLA
    while_loop driver on real TPU; "jnp" forces the XLA path."""
    if (backend == "auto" and sampler == "independent"
            and camera_medium == -1
            and jax.default_backend() in ("tpu", "axon")):
        from ...ops import pallas_volpath as _pv

        c = _pv.extract_constants(scene, camera, film, cfg)
        # grid scenes: small grids sweep VMEM chunks (68x measured at
        # 16^3); 4096..MXU_MAX_VOX-voxel grids gather via one-hot MXU
        # matmuls (7x over the XLA DDA loop measured at 64^3 — PERF.md
        # addenda 5-6). Only beyond the MXU VMEM bound does the XLA
        # path win.
        grid_ok = (c is not None and c["kind"] == "grid"
                   and (c["grid_res"][0] * c["grid_res"][1]
                        * c["grid_res"][2]) <= _pv.MXU_MAX_VOX)
        if (c is not None and (c["kind"] == "homog" or grid_ok)
                and _pv.supports(scene, camera, film, cfg)):
            return _pv.render_homog_pallas(scene, camera, film, int(spp),
                                           cfg, seed)
        if c is None:
            from ...ops import pallas_surface as _ps

            if _ps.supports(scene, camera, film, cfg):
                return _ps.render_surface_pallas(scene, camera, film,
                                                 int(spp), cfg, seed)
    R = film.npix * max(int(lanes_per_pixel), 1)
    return _render_persistent_jit(scene, camera, film, cfg, int(spp),
                                  jnp.uint32(seed), int(camera_medium), R,
                                  str(sampler))
