"""Guided volumetric path tracer (GuidedPath / GuidedVolPath analog).

Implements the fork's guided integrators (cpu/integrators.cpp:3774-5010 +
cpu/guiding.h) on top of the wavefront volpath machinery:

- per-vertex *directional guiding*: one-sample MIS (guiding.h
  Sample_f_MIS:120-167 — 50/50 mixture of BSDF/phase sampling and the
  field's vMF mixture, combined pdf) or 2-candidate RIS (Sample_f_RIS:
  169-257 — resampled importance sampling targeting f x incoming radiance,
  stochastic pdf + misPdf for NEE MIS);
- cosine product on opaque surfaces, single-lobe HG product in volumes
  (guiding.h:83-109, 383-398);
- per-wave training: path-segment recording -> backward radiance
  propagation -> incremental weighted EM on the field (PostProcessWave,
  guidedvolpathvspgintegrator.cpp:230-259; training starts once >=
  min_train_samples and stops after train_waves iterations);
- the wave loop with a training barrier is the reference's progressive
  rendering structure (cpu/integrators.cpp:177-263).

The guided path state extends PathState with the SegmentRecord buffers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.intersect import offset_ray_origin
from ...utils.math import INV_4PI
from ...utils.sampling import henyey_greenstein, sample_henyey_greenstein
from ...utils.spectrum import average, sample_hero_channel
from ...utils.vecmath import coordinate_system, dot, face_forward, normalize
from ..film import pixel_coords
from ..guiding import field as gfield
from ..guiding import recording as grec
from ..guiding.field import GuidingField
from ..guiding.recording import SegmentRecord
from ..materials import bsdf_f, bsdf_pdf, bsdf_sample
from ..samplers import LaneSampler
from . import volpath as vp
from .volpath import (
    PathState,
    Scene,
    VolPathConfig,
    _combine_ld,
    _m,
    sample_medium_interaction,
    transmittance_ratio_tracking,
)

INF = jnp.inf


class GuidingOptions(NamedTuple):
    """Static guiding configuration (the integrator's scene-file params:
    guidedvolpathvspgintegrator.cpp:1263-1316)."""

    mode: str = "ris"  # "mis" | "ris" (reference default EGuideRIS)
    guiding_prob: float = 0.5
    surface_guiding: bool = True
    volume_guiding: bool = True
    record_depth: int = 8
    train_waves: int = 128  # guideNumTrainingWaves
    min_train_weight: float = 128.0  # min samples before Update
    field_res: int = 16
    n_lobes: int = 8
    # adaptive spatial refinement (OpenPGL kd-tree analog): extra leaf
    # capacity; 0 = uniform grid. Dense cells split into 2^3 children
    # between waves once their EM mass exceeds refine_threshold.
    adaptive_extra: int = 0
    refine_threshold: float = 256.0


class GState(NamedTuple):
    s: PathState
    rec: SegmentRecord


def _to3(x):
    """Spectral->vec3 bridge for guiding/ISGB data (guiding.h:24-36:
    spectral mode trains on max-component grayscale; RGB passes through)."""
    if x.shape[-1] == 3:
        return x
    return jnp.broadcast_to(jnp.max(x, -1, keepdims=True),
                            x.shape[:-1] + (3,))


# ---------------------------------------------------------------------------
# Guided direction sampling (GuidedBSDF / GuidedPhaseFunction)
# ---------------------------------------------------------------------------


def _guided_sample(sampler, use_guide, gopt, dist, base_sample_fn, base_pdf_fn,
                   inc_rad_pdf):
    """Shared one-sample-MIS / RIS combination.

    base_sample_fn(sampler) -> (sampler, wi, f(R,3), pdf(R,), aux)
    base_pdf_fn(wi) -> pdf of the base (BSDF/phase) sampler at wi
    inc_rad_pdf(wi) -> IncomingRadiancePDF at wi (RIS target term)
    Returns (sampler, wi, f, pdf, mis_pdf, base_pdf, aux, valid).
    pdf multiplies into beta; mis_pdf goes into r_l (NEE MIS).
    """
    pg = gopt.guiding_prob
    if gopt.mode == "mis":
        sampler, u_c = sampler.get_1d()
        sampler, u2g = sampler.get_2d()
        take_guide = use_guide & (u_c < pg)
        u_lobe = jnp.clip(u_c / pg, 0.0, 0.999999)  # remapped for lobe select
        # base sample for everyone (cheap relative to divergence)
        sampler, wi_b, f_b, pdf_b, aux = base_sample_fn(sampler)
        wi_g, gpdf_g = gfield.dist_sample(dist, u_lobe, u2g)
        wi = jnp.where(take_guide[..., None], wi_g, wi_b)
        f = jnp.where(take_guide[..., None],
                      jnp.zeros_like(f_b), f_b)  # filled below for guide lanes
        base_pdf = jnp.where(take_guide, base_pdf_fn(wi_g), pdf_b)
        guide_pdf = jnp.where(take_guide, gpdf_g, gfield.dist_pdf(dist, wi_b))
        mix = jnp.where(use_guide, (1.0 - pg) * base_pdf + pg * guide_pdf, pdf_b)
        pdf = mix
        mis_pdf = mix
        valid = jnp.where(take_guide, base_pdf > 0, pdf_b > 0) & (pdf > 0)
        return sampler, wi, f, pdf, mis_pdf, base_pdf, aux, valid, take_guide
    else:  # RIS (guiding.h:169-257)
        sampler, wi_b, f_b, pdf_b, aux = base_sample_fn(sampler)
        sampler, u2g = sampler.get_2d()
        sampler, u_pick = sampler.get_1d()
        wi_g, gpdf_g = gfield.dist_sample(dist, u_pick, u2g)
        bpdf_g = base_pdf_fn(wi_g)
        gpdf_b = gfield.dist_pdf(dist, wi_b)
        irp_b = inc_rad_pdf(wi_b)
        irp_g = inc_rad_pdf(wi_g)
        mis0 = 0.5 * (pdf_b + gpdf_b)
        mis1 = 0.5 * (bpdf_g + gpdf_g)
        target0 = pdf_b * ((1 - pg) * INV_4PI + pg * irp_b)
        target1 = bpdf_g * ((1 - pg) * INV_4PI + pg * irp_g)
        w0 = jnp.where(pdf_b > 0, target0 / jnp.maximum(mis0, 1e-20), 0.0)
        w1 = jnp.where(bpdf_g > 0, target1 / jnp.maximum(mis1, 1e-20), 0.0)
        sum_w = w0 + w1
        sampler, u_sel = sampler.get_1d()
        pick1 = u_sel * jnp.maximum(sum_w, 1e-20) > w0
        wi = jnp.where(pick1[..., None], wi_g, wi_b)
        base_pdf = jnp.where(pick1, bpdf_g, pdf_b)
        mis_pdf = jnp.where(pick1, mis1, mis0)
        w_sel = jnp.where(pick1, w1, w0)
        pdf = w_sel * mis_pdf * 2.0 / jnp.maximum(sum_w, 1e-20)
        ris_valid = use_guide & (sum_w > 0) & (pdf > 0)
        # lanes without guiding fall back to the plain base sample
        wi = jnp.where(use_guide[..., None], wi, wi_b)
        pdf = jnp.where(use_guide, pdf, pdf_b)
        mis_pdf = jnp.where(use_guide, mis_pdf, pdf_b)
        base_pdf = jnp.where(use_guide, base_pdf, pdf_b)
        valid = jnp.where(use_guide, ris_valid, pdf_b > 0)
        return sampler, wi, f_b, pdf, mis_pdf, base_pdf, aux, valid, use_guide & pick1


# ---------------------------------------------------------------------------
# Guided bounce
# ---------------------------------------------------------------------------


def guided_bounce(scene: Scene, cfg: VolPathConfig, gopt: GuidingOptions,
                  field: GuidingField, train: bool, gs: GState) -> GState:
    s = gs.s
    rec = gs.rec
    t_far = jnp.full_like(s.o[..., 0], INF)
    h = scene.geometry.intersect(s.o, s.d, t_far)
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

    # ---- volume scatter: guided phase sampling + NEE ----------------------
    scat = mr.scattered & alive
    p_scat = s.o + mr.t_scatter[..., None] * s.d
    wo = -s.d
    dist_v = gfield.volume_distribution(field, p_scat, wo, mr.g_scatter)
    use_guide_v = (scat & dist_v.valid & field.trained
                   & bool(gopt.volume_guiding))

    # NEE (scatter pdf must be the guided wrapper's PDF for MIS consistency)
    sampler, u_sel = sampler.get_1d()
    sampler, u2l = sampler.get_2d()
    ls = scene.lights.sample(p_scat, u_sel, u2l)
    if s.lam is not None:
        from ...utils.spectrum import uplift_unbounded

        ls = ls._replace(L=uplift_unbounded(ls.L, s.lam))
    ok = scat & ls.valid & (average(ls.L) > 0)
    cos_wo_wi = jnp.sum(wo * ls.wi, axis=-1)
    f_scalar = henyey_greenstein(cos_wo_wi, mr.g_scatter)
    phase_pdf_l = f_scalar
    guide_pdf_l = gfield.dist_pdf(dist_v, ls.wi)
    pg = gopt.guiding_prob if gopt.mode == "mis" else 0.5
    scatter_pdf_l = jnp.where(use_guide_v,
                              (1 - pg) * phase_pdf_l + pg * guide_pdf_l,
                              phase_pdf_l)
    f_hat = f_scalar[..., None] * jnp.ones_like(beta)
    ok &= f_scalar > 0
    sampler, T_ray, tr_l, tr_u = transmittance_ratio_tracking(
        scene, cfg, p_scat, ls.wi, ls.t_shadow, s.medium_id, s.hero_idx,
        sampler, ok, s.lam)
    Ld, Ld_local = _combine_ld(ls, f_hat, scatter_pdf_l, T_ray, tr_l, tr_u,
                               r_u, beta, ok)
    L = _m(scat, L + Ld, L)

    # guided phase sampling
    def phase_base(sampler):
        sampler, u2p = sampler.get_2d()
        wi_p, pdf_p = sample_henyey_greenstein(wo, mr.g_scatter, u2p)
        f_p = pdf_p[..., None] * jnp.ones_like(beta)
        return sampler, wi_p, f_p, pdf_p, None

    def phase_pdf_at(wi):
        return henyey_greenstein(jnp.sum(wo * wi, -1), mr.g_scatter)

    def inc_rad_pdf_v(wi):
        return gfield.incoming_radiance_pdf(field, "volume", p_scat, wi)

    (sampler, wi_v, _, pdf_v, mis_pdf_v, base_pdf_v, _, valid_v, _) = (
        _guided_sample(sampler, use_guide_v, gopt, dist_v, phase_base,
                       phase_pdf_at, inc_rad_pdf_v))
    f_v = phase_pdf_at(wi_v)  # HG value at the sampled direction
    bad_phase = scat & ~valid_v
    alive = alive & ~bad_phase
    scale_v = f_v / jnp.maximum(pdf_v, 1e-30)
    beta = _m(scat, beta * scale_v[..., None], beta)
    r_l = _m(scat, r_u / jnp.maximum(mis_pdf_v, 1e-30)[..., None], r_l)
    o_new = _m(scat, p_scat, s.o)
    d_new = _m(scat, wi_v, s.d)
    specular = jnp.where(scat, False, s.specular)
    prev_p = _m(scat, p_scat, s.prev_p)

    # recording at the volume vertex
    if train:
        rec = grec.record_vertex(rec, scat, p_scat, wi_v,
                                 scale_v[..., None] * jnp.ones(3),
                                 pdf_v, jnp.ones_like(scat))
        rec = grec.record_direct(rec, ok, _to3(Ld_local))

    # ---- non-scattered: escape / surface ----------------------------------
    flew = alive & ~scat
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
    if train:
        # local emission contribution (virtual vertex at 1e6,
        # guiding.h addInfiniteLightEmission:759)
        w_mis_env = jnp.where(
            first, jnp.ones_like(denom_esc),
            average(r_u) / jnp.maximum(average(r_u + r_l_esc), 1e-30))
        rec = grec.record_emission(
            rec, escaped & any_env, _to3(Le_env * w_mis_env[..., None]),
            jnp.full_like(denom_esc, 1e6))
    alive = alive & ~escaped

    surf = flew & h.hit
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
    if train:
        w_mis_srf = jnp.where(
            first, jnp.ones_like(denom_s),
            average(r_u) / jnp.maximum(average(r_u + r_l_area), 1e-30))
        rec = grec.record_emission(rec, emissive & has_le,
                                   _to3(Le_surf * w_mis_srf[..., None]), h.t)

    # interface skip
    iface = surf & (h.mat_id < 0)
    new_med_skip = jnp.where(dot(s.d, h.n) < 0, h.med_in, h.med_out)
    medium_id = jnp.where(iface, new_med_skip, s.medium_id)
    o_new = _m(iface, h.p + 1e-4 * s.d, o_new)

    # ---- surface shading ---------------------------------------------------
    shade = surf & (h.mat_id >= 0)
    depth_hit = shade & (s.depth >= cfg.max_depth)
    alive = alive & ~depth_hit
    shade = shade & ~depth_hit
    depth = jnp.where(shade, depth + 1, depth)

    lanes = scene.materials.gather_textured(scene.textures, h.mat_id, h.uv, h.p)
    if s.lam is not None:
        from ...utils.spectrum import uplift_unbounded

        lanes = lanes._replace(albedo=uplift_unbounded(lanes.albedo, s.lam),
                               albedo2=uplift_unbounded(lanes.albedo2,
                                                        s.lam))
    ns = face_forward(h.ns, h.n)
    # guided surface distribution: cosine product only on opaque materials
    is_transmissive = (lanes.mat_type == 2) | (lanes.mat_type == 3)
    ns_cos = jnp.where(dot(-s.d, ns)[..., None] < 0, -ns, ns)
    dist_cos = gfield.surface_distribution(field, h.p, ns_cos, apply_cosine=True)
    dist_flat = gfield.surface_distribution(field, h.p, ns_cos, apply_cosine=False)
    dist_s = jax.tree.map(
        lambda a, b: jnp.where(
            is_transmissive.reshape(is_transmissive.shape + (1,) * (a.ndim - 1)),
            b, a),
        dist_cos, dist_flat)
    use_guide_s = (shade & dist_s.valid & field.trained & ~lanes.is_specular
                   & bool(gopt.surface_guiding))

    t1, t2 = coordinate_system(ns)

    def to_local(w):
        return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], axis=-1)

    def to_world(w):
        return w[..., 0:1] * t1 + w[..., 1:2] * t2 + w[..., 2:3] * ns

    wo_l = to_local(-s.d)

    # NEE from the surface with guided-mixture scatter pdf
    p_off = offset_ray_origin(h.p, h.n, -s.d)
    sampler, u_sel2 = sampler.get_1d()
    sampler, u2l2 = sampler.get_2d()
    ls2 = scene.lights.sample(p_off, u_sel2, u2l2)
    if s.lam is not None:
        from ...utils.spectrum import uplift_unbounded

        ls2 = ls2._replace(L=uplift_unbounded(ls2.L, s.lam))
    can_nee = shade & ~lanes.is_specular
    ok2 = can_nee & ls2.valid & (average(ls2.L) > 0)
    wi_l2 = to_local(ls2.wi)
    f_hat2 = bsdf_f(lanes, wo_l, wi_l2) * jnp.abs(dot(ls2.wi, ns))[..., None]
    bpdf2 = bsdf_pdf(lanes, wo_l, wi_l2)
    gpdf2 = gfield.dist_pdf(dist_s, ls2.wi)
    scatter_pdf2 = jnp.where(use_guide_s, (1 - pg) * bpdf2 + pg * gpdf2, bpdf2)
    ok2 &= jnp.max(f_hat2, -1) > 0
    sampler, T_ray2, tr_l2, tr_u2 = transmittance_ratio_tracking(
        scene, cfg, p_off, ls2.wi, ls2.t_shadow, medium_id, s.hero_idx,
        sampler, ok2, s.lam)
    Ld2, Ld2_local = _combine_ld(ls2, f_hat2, scatter_pdf2, T_ray2, tr_l2,
                                 tr_u2, r_u, beta, ok2)
    L = _m(can_nee, L + Ld2, L)

    # guided BSDF sampling
    def bsdf_base(sampler):
        sampler, u_lobe = sampler.get_1d()
        sampler, u2b = sampler.get_2d()
        bs = bsdf_sample(lanes, wo_l, u_lobe, u2b)
        wi_w = normalize(to_world(bs.wi))
        f_cos = bs.f * jnp.abs(dot(wi_w, ns))[..., None]
        return sampler, wi_w, f_cos, bs.pdf, bs

    def bsdf_pdf_at(wi_w):
        return bsdf_pdf(lanes, wo_l, to_local(wi_w))

    def inc_rad_pdf_s(wi_w):
        return gfield.incoming_radiance_pdf(field, "surface", h.p, wi_w)

    (sampler, wi_s, f_s, pdf_s, mis_pdf_s, base_pdf_s, bs_aux, valid_s,
     took_guide_s) = _guided_sample(sampler, use_guide_s, gopt, dist_s,
                                    bsdf_base, bsdf_pdf_at, inc_rad_pdf_s)
    # f for guide-sampled lanes must be evaluated at the guided wi
    f_guide = bsdf_f(lanes, wo_l, to_local(wi_s)) * jnp.abs(dot(wi_s, ns))[..., None]
    f_s = jnp.where(took_guide_s[..., None], f_guide, f_s)
    # specular lanes always use the raw BSDF sample
    bs_ok = shade & valid_s & (pdf_s > 0) & bs_aux.valid
    spec_lane = lanes.is_specular
    bs_ok = jnp.where(spec_lane, shade & bs_aux.valid & (bs_aux.pdf > 0), bs_ok)
    alive = alive & ~(shade & ~bs_ok)

    cos_wi = jnp.abs(dot(wi_s, ns))
    scale_b = f_s / jnp.maximum(pdf_s, 1e-30)[..., None]
    beta = _m(bs_ok, beta * scale_b, beta)
    r_l = _m(bs_ok, r_u / jnp.maximum(mis_pdf_s, 1e-30)[..., None], r_l)
    specular = jnp.where(bs_ok, bs_aux.is_specular & ~took_guide_s, specular)
    eta_scale = jnp.where(bs_ok & bs_aux.is_transmission & ~took_guide_s,
                          s.eta_scale * bs_aux.eta**2, s.eta_scale)
    # reflection keeps the medium; only true crossings adopt the far
    # side's label (see volpath_bounce's round-5 note)
    wi_front_s = dot(wi_s, h.n) > 0
    arr_front_s = dot(s.d, h.n) < 0
    crossed_s = bs_ok & (wi_front_s != arr_front_s)
    new_med_x = jnp.where(wi_front_s, h.med_out, h.med_in)
    medium_id = jnp.where(crossed_s, new_med_x, medium_id)
    o_new = _m(bs_ok, offset_ray_origin(h.p, h.n, wi_s), o_new)
    d_new = _m(bs_ok, wi_s, d_new)
    prev_p = _m(bs_ok, h.p, prev_p)

    if train:
        rec = grec.record_vertex(rec, bs_ok & ~spec_lane, h.p, wi_s,
                                 _to3(scale_b), pdf_s,
                                 jnp.zeros_like(bs_ok))
        rec = grec.record_direct(rec, ok2, _to3(Ld2_local))

    # ---- Russian roulette --------------------------------------------------
    dead_beta = shade & (jnp.max(beta, -1) == 0)
    alive = alive & ~dead_beta
    rr_beta = beta * eta_scale[..., None] / jnp.maximum(average(r_u), 1e-30)[..., None]
    rr_max = jnp.max(rr_beta, -1)
    sampler, u_rr = sampler.get_1d()
    do_rr = shade & (rr_max < 1.0) & (depth > 1)
    q = jnp.maximum(0.0, 1.0 - rr_max)
    rr_kill = do_rr & (u_rr < q)
    alive = alive & ~rr_kill
    beta = _m(do_rr & ~rr_kill, beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta)

    s2 = PathState(
        sampler, o_new, d_new, beta, r_u, r_l, L, depth, alive, specular,
        s.hero_idx, medium_id, eta_scale, prev_p, s.lam, s.pdf_lam,
    )
    return GState(s2, rec)


# ---------------------------------------------------------------------------
# Wave / render drivers with training barrier
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "gopt", "camera_medium", "train",
                                   "spp_per_pass"))
def guided_wave(scene, camera, film, film_state, field, cfg, gopt, seed,
                wave_idx, camera_medium, train, spp_per_pass):
    """One wave: trace, accumulate film, return (film_state, train_batch)."""
    R = film.npix * spp_per_pass
    lane = jnp.arange(R, dtype=jnp.int32)
    pixel_id = lane // spp_per_pass
    sample_index = (wave_idx * spp_per_pass + lane % spp_per_pass).astype(jnp.uint32)
    s, fw = vp.start_camera_paths(camera, film, seed, sample_index, pixel_id,
                                  camera_medium, spectral=cfg.spectral)
    rec = SegmentRecord.make(R, gopt.record_depth if train else 1,
                             pixel_id.astype(jnp.float32))
    gs = GState(s, rec)

    def cond(c):
        gs, it = c
        return jnp.any(gs.s.alive) & (it < cfg.max_events)

    def body(c):
        gs, it = c
        return guided_bounce(scene, cfg, gopt, field, train, gs), it + 1

    gs, _ = jax.lax.while_loop(cond, body, (gs, jnp.int32(0)))
    film_state = vp._film_add(film, film_state, pixel_id, gs.s, fw)
    batch = grec.propagate(gs.rec) if train else None
    return film_state, batch


@partial(jax.jit, static_argnames=())
def train_step(field, batch):
    return gfield.field_update(field, batch)


def render_guided(scene: Scene, camera, film, spp=16, cfg=VolPathConfig(),
                  gopt=GuidingOptions(), seed=0, camera_medium=-1,
                  spp_per_pass=1, field=None, train=True):
    """Progressive guided rendering with per-wave training barrier
    (ImageTileIntegrator::Render + PostProcessWave structure).

    Returns (image, field). Pass a pre-trained `field` with train=False for
    inference-only guiding (loadGuidingCache semantics)."""
    if field is None:
        # field bounds = scene bounds padded
        import numpy as np

        g = scene.geometry
        pts = []
        for arr in (g.tri_p0, g.tri_p1, g.tri_p2, g.box_min, g.box_max):
            if arr.shape[0]:
                pts.append(np.asarray(arr))
        if g.sph_c.shape[0]:
            c = np.asarray(g.sph_c)
            r = np.asarray(g.sph_r)[:, None]
            pts += [c - r, c + r]
        allp = np.concatenate(pts, 0)
        lo, hi = allp.min(0) - 1e-3, allp.max(0) + 1e-3
        field = gfield.GuidingField.make(lo, hi, res=gopt.field_res,
                                         n_extra=gopt.adaptive_extra,
                                         n_lobes=gopt.n_lobes)

    film_state = film.init_state()
    for wave in range(spp // spp_per_pass):
        do_train = train and int(field.iteration) < gopt.train_waves
        film_state, batch = guided_wave(
            scene, camera, film, film_state, field, cfg, gopt,
            jnp.uint32(seed), jnp.int32(wave), int(camera_medium),
            bool(do_train), int(spp_per_pass))
        if do_train:
            total_w = float(jnp.sum(jnp.where(batch.valid, batch.weight, 0.0)))
            if total_w > gopt.min_train_weight:
                field = train_step(field, batch)
                if gopt.adaptive_extra:
                    field = gfield.refine_field(field,
                                                gopt.refine_threshold)
    return film.image(film_state), field
