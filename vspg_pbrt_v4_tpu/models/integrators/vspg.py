"""GuidedVolPathVSPG — Volume Scattering Probability Guiding (the paper).

TPU re-design of the fork's flagship integrator
(cpu/guidedvolpathvspgintegrator.cpp:61-1322 + media_sampleTMaj.h:120-491):

Scatter-vs-surface decision guiding ("VSP guiding"):
- primary rays take their target VSP from the denoised image-space guiding
  buffer (GetPrimaryRayVolumeScatterProbability, :1098-1112);
- secondary rays query the guiding field's VSP statistics at the previous
  vertex (GetSecondaryRayVolumeScatterProbability, :1114-1134);
- the distance sampler is steered toward that VSP by one of two routines:
  * RESAMPLING (heterogeneous media; media_sampleTMaj.h:120-247 +
    integrator :679-877): walk *all* tentative collisions to the segment
    end, maintain the ratio-tracking transmittance estimate, reservoir-pick
    one volume candidate with the delta-tracking weights, then reweight the
    surface candidate by surfRatio/volRatio * sumW so the volume event
    probability matches the (defensively MIS'd) target VSP;
  * ANALYTIC (homogeneous media; the delta-tracking route of
    media_sampleTMaj.h:270-491 with its closed single-segment form): warp
    the optical-depth CDF so P(scatter inside) = vsp, with probability
    vspMISRatio, else plain exponential sampling; the pdf change enters the
    rescaled algebra through r_u_factor = mis/tpScale + (1-mis);
  * NDS / NDS+ (heterogeneous media, sampling_method="nds"/"nds+";
    media_sampleTMaj.h:251-491): treat the whole ray as one interval in
    hero-channel optical-depth space (total depth t_v from a majorant
    pre-pass), extend it to t_n = -log(1 - (1-e^-t_v)/vsp) and draw
    tentative collisions from the truncated exponential on [0, t_n) so
    P(any real-or-null chain scattering inside) tracks the target VSP;
    each truncation renormalization accumulates into tpScaleFactor and
    enters r_u via r_u_factor = mis/tpScale + (1-mis). NDS+ additionally
    biases the real-collision probability on primary rays to
    pScatter^(1/(1+TrEst)) using the previous-wave transmittance buffer
    (guidedvolpathvspgintegrator.cpp:929-938) with exact r_u compensation
    (:975-976, :1073-1074).
- this integrator uses the fork's absorption-free formulation (the
  non-VOLUME_ABSORB branch, :925-980): real collisions always scatter with
  the single-scattering albedo folded into beta;
- guided Russian roulette from the ISGB pixel estimate + the field's
  in-scattered radiance cache (util::GuidedRussianRoulette, :468,599);
- directional guiding (MIS/RIS) identical to guided_volpath;
- TrBuffer: per-pixel primary-ray ratio-tracking transmittance (NDS+ input
  and diagnostic output, cpu/trbuffer.h:17-101).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.intersect import offset_ray_origin
from ...utils.math import INV_4PI
from ...utils.sampling import henyey_greenstein, sample_exponential, sample_henyey_greenstein
from ...utils.spectrum import average, hero
from ...utils.vecmath import coordinate_system, dot, face_forward, normalize
from ..guiding import field as gfield
from ..guiding import isgb as gisgb
from ..guiding import recording as grec
from ..guiding.field import GuidingField
from ..guiding.isgb import ISGB
from ..guiding.recording import SegmentRecord
from ..materials import bsdf_f, bsdf_pdf, bsdf_sample
from ..media import seg_init, seg_next
from ..samplers import LaneSampler
from . import guided_volpath as gv
from . import volpath as vp
from .guided_volpath import GuidingOptions, _guided_sample
from .volpath import (PathState, Scene, VolPathConfig, _combine_ld, _m,
                      transmittance_ratio_tracking)

INF = jnp.inf


class VSPGOptions(NamedTuple):
    """Scene-file parameter analog (guidedvolpathvspgintegrator.cpp:1263-1316:
    vspguiding, vspprimaryguiding, vspsecondaryguiding, vspsamplingmethod,
    vspmisratio, vspcriterion, guidedrr ...)."""

    guide_vsp: bool = True
    guide_primary_vsp: bool = True
    guide_secondary_vsp: bool = True
    sampling_method: str = "resampling"  # "resampling" | "nds" | "nds+"
    vsp_mis_ratio: float = 0.5
    vsp_criterion: str = "variance"  # "variance" | "contribution"
    guide_rr: bool = True
    min_rr_depth: int = 1
    # megakernel guided-walk collision-budget cap: the walk majorant is
    # scaled only up to -log(1-cap) expected collisions per segment (the
    # reference's exact-prepass scale targets the full vsp clamp 0.999 =
    # ~6.9 collisions; on TPU each collision is a block-wide iteration —
    # PERF.md round-4 ablation). Importance-only: estimator stays unbiased.
    scale_vsp_cap: float = 0.95
    denoiser: str = "atrous"  # ISGB denoiser: "atrous" | "unet"
    isgb_update_waves: tuple = (1, 2, 4, 8, 16, 32, 64, 128)
    calculate_tr_buffer: bool = True


class VState(NamedTuple):
    s: PathState
    rec: SegmentRecord
    pixel_id: jnp.ndarray  # (R,)
    last_vol: jnp.ndarray  # (R,) was the previous vertex a volume vertex
    first_set: jnp.ndarray  # (R,) ISGB first-event recorded
    first_vol: jnp.ndarray  # (R,)
    first_albedo: jnp.ndarray  # (R,3)
    first_normal: jnp.ndarray  # (R,3)
    tr_est: jnp.ndarray  # (R,3) primary ratio-tracking transmittance
    tr_prev: jnp.ndarray  # (R,3) previous-wave TrBuffer estimate (NDS+ input)


class DistanceResult(NamedTuple):
    sampler: LaneSampler
    beta: jnp.ndarray
    r_u: jnp.ndarray
    r_l: jnp.ndarray
    L: jnp.ndarray
    scattered: jnp.ndarray
    terminated: jnp.ndarray
    t_scatter: jnp.ndarray
    g_scatter: jnp.ndarray
    albedo_scatter: jnp.ndarray  # (R,3) single-scattering albedo at vertex
    tr_est: jnp.ndarray  # (R,3) ratio-tracking transmittance estimate


# ---------------------------------------------------------------------------
# VSP target lookup
# ---------------------------------------------------------------------------


def lookup_vsp(vopt: VSPGOptions, field: GuidingField, isgb: ISGB, s,
               pixel_id, last_vol):
    """Per-lane target VSP (or -1 = unguided)."""
    primary = s.depth == 0
    vsp = jnp.full_like(s.o[..., 0], -1.0)
    if vopt.guide_vsp and vopt.guide_primary_vsp:
        v_is = gisgb.isgb_primary_vsp(isgb, pixel_id)
        vsp = jnp.where(primary, v_is, vsp)
    if vopt.guide_vsp and vopt.guide_secondary_vsp:
        # query the field half matching the previous vertex type at the ray
        # origin (the cell-level stand-in for the distribution's
        # VolumeScatterProbability(wi))
        d_vol = gfield._gather_half(field, field.volume, s.o,
                                    vopt.vsp_criterion == "variance")
        d_srf = gfield._gather_half(field, field.surface, s.o,
                                    vopt.vsp_criterion == "variance")
        # directional query along the ray (VolumeScatterProbability(wi),
        # guiding.h:564-574); falls back to the cell estimate
        v_vol_dir = gfield.dist_vsp_directional(d_vol, s.d)
        v_srf_dir = gfield.dist_vsp_directional(d_srf, s.d)
        v_sec = jnp.where(last_vol, v_vol_dir, v_srf_dir)
        vsp = jnp.where(~primary & field.trained, v_sec, vsp)
    guide = vsp >= 0.0
    vsp = jnp.clip(vsp, 0.001, 0.999)
    return guide, vsp


# ---------------------------------------------------------------------------
# Distance sampling: analytic homogeneous + heterogeneous delta + resampling
# ---------------------------------------------------------------------------


def sample_distance_vspg(scene, cfg, vopt, o, d, seg_end, medium_id, hero_idx,
                         sampler, beta, r_u, r_l, L, guide, vsp, active,
                         tr_prev=None, depth=None, lam=None):
    """The paper's SampleDistance (guidedvolpathvspgintegrator.cpp:650-1100),
    vectorized over the lane classes:
      homogeneous (closed form, optionally VSP-warped),
      heterogeneous delta tracking (unguided lanes),
      heterogeneous resampling (guided lanes, sampling_method="resampling"),
      heterogeneous NDS/NDS+ (guided lanes, sampling_method="nds"/"nds+").
    Absorption-free formulation: real events always scatter, albedo in beta.
    """
    media = scene.media
    R = o.shape[0]
    is_h = media.is_homogeneous(medium_id) & active
    mis = vopt.vsp_mis_ratio

    scattered = active & (seg_end < 0)  # all-False varying
    terminated = scattered
    t_scatter = jnp.zeros_like(seg_end)
    g_scatter = jnp.zeros_like(seg_end)
    albedo_sc = jnp.zeros_like(beta)
    tr_est = jnp.ones_like(beta)

    # ======== homogeneous lanes: closed form ================================
    mp0 = media.sample_point(medium_id, o, lam)  # constant within the medium
    sigma_t = mp0.sigma_a + mp0.sigma_s
    sig_h = hero(sigma_t, hero_idx)
    h_act = is_h & (sig_h > 0) & jnp.isfinite(seg_end)
    t_v = sig_h * jnp.minimum(seg_end, 3e37)  # total optical depth
    norm_maj = sigma_t / jnp.maximum(sig_h, 1e-30)[..., None]

    sampler, u0 = sampler.get_1d()
    h_guide = h_act & guide
    delta_lane = ~h_guide | (u0 > mis)
    u_r = jnp.where(
        h_guide,
        jnp.where(delta_lane, (u0 - mis) / jnp.maximum(1 - mis, 1e-6),
                  u0 / jnp.maximum(mis, 1e-6)),
        u0)
    u_r = jnp.clip(u_r, 0.0, 0.999999)
    one_m_e = 1.0 - jnp.exp(-t_v)
    # warped lanes: P(scatter) = vsp
    warp_scatter = u_r < vsp
    dist_w = -jnp.log1p(-jnp.where(warp_scatter, u_r, 0.0) * one_m_e / jnp.maximum(vsp, 1e-4))
    dist_w = jnp.where(warp_scatter, dist_w, INF)
    # delta lanes: plain exponential in optical depth
    dist_d = -jnp.log1p(-u_r)
    dist_tau = jnp.where(delta_lane, dist_d, dist_w)
    h_scatter = h_act & (dist_tau < t_v - 1e-5)
    h_pass = h_act & ~h_scatter

    # tpScaleFactor (spectral) + r_u_factor for guided lanes
    tp_sc = one_m_e[..., None] * jnp.ones_like(beta) / jnp.maximum(vsp, 1e-4)[..., None]
    tp_pa = jnp.exp(-t_v[..., None] * norm_maj) / jnp.maximum(1 - vsp, 1e-4)[..., None]
    tp = jnp.where(h_scatter[..., None], tp_sc, tp_pa)
    r_u_factor = jnp.where(
        h_guide[..., None],
        mis / jnp.maximum(tp, 1e-30) + (1.0 - mis),
        jnp.ones_like(tp))

    t_h = dist_tau / jnp.maximum(sig_h, 1e-30)
    # spectral transmittance to the sampled point: exp(-dist_tau * maj/maj_h)
    T_spec = jnp.exp(-jnp.clip(dist_tau, 0.0, 80.0)[..., None] * norm_maj)
    # scatter update (non-VOLUME_ABSORB: pdf = T_h * sigma_t_h; beta_factor=1,
    # the pdf warp enters only through r_u_factor)
    pdf_h = jnp.maximum(hero(T_spec, hero_idx) * sig_h, 1e-30)
    beta = _m(h_scatter, beta * T_spec * mp0.sigma_s / pdf_h[..., None], beta)
    r_u = _m(h_scatter, r_u * T_spec * sigma_t / pdf_h[..., None] * r_u_factor, r_u)
    scattered = scattered | h_scatter
    t_scatter = jnp.where(h_scatter, t_h, t_scatter)
    g_scatter = jnp.where(h_scatter, mp0.g, g_scatter)
    alb_h = mp0.sigma_s / jnp.maximum(sigma_t, 1e-30)
    albedo_sc = _m(h_scatter, alb_h, albedo_sc)
    # pass-through update: T over full segment
    T_pass = jnp.exp(-jnp.minimum(t_v, 80.0)[..., None] * norm_maj)
    Tp_h = jnp.maximum(hero(T_pass, hero_idx), 1e-30)
    scale_p = T_pass / Tp_h[..., None]
    beta = _m(h_pass, beta * scale_p, beta)
    r_u = _m(h_pass, r_u * scale_p * r_u_factor, r_u)
    r_l = _m(h_pass, r_l * scale_p * r_u_factor, r_l)
    # homogeneous ratio-tracking transmittance estimate is binary; use the
    # analytic value for the Tr buffer instead
    tr_est = _m(is_h, T_pass, tr_est)

    # ======== heterogeneous NDS / NDS+ lanes (guided) ========================
    het = active & ~is_h & (medium_id >= 0)
    use_nds = vopt.sampling_method in ("nds", "nds+") and vopt.vsp_mis_ratio > 0
    nds_fallback = jnp.zeros_like(het)
    if use_nds:
        het_ods = het & guide
        if tr_prev is None:
            tr_prev = jnp.ones_like(beta)
        if depth is None:
            depth = jnp.zeros_like(medium_id)
        ores = _heterogeneous_ods(scene, cfg, vopt, o, d, seg_end, medium_id,
                                  hero_idx, sampler, beta, r_u, r_l, vsp,
                                  tr_prev, depth, het_ods, lam)
        (sampler, beta, r_u, r_l, o_scat, o_term, o_t, o_g, o_alb, o_tr,
         nds_fallback) = ores
        scattered = scattered | o_scat
        terminated = terminated | o_term
        t_scatter = jnp.where(o_scat, o_t, t_scatter)
        g_scatter = jnp.where(o_scat, o_g, g_scatter)
        albedo_sc = _m(o_scat, o_alb, albedo_sc)
        tr_est = _m(het_ods & ~nds_fallback, o_tr, tr_est)

    # ======== heterogeneous delta lanes (unguided + NDS fallback) ===========
    guided_route = guide & (vopt.sampling_method == "resampling") if not use_nds \
        else (guide & ~nds_fallback)
    het_delta = het & ~guided_route
    dres = _heterogeneous_delta(scene, cfg, o, d, seg_end, medium_id, hero_idx,
                                sampler, beta, r_u, r_l, het_delta, lam)
    (sampler, beta, r_u, r_l, d_scat, d_term, d_t, d_g, d_alb) = dres
    scattered = scattered | d_scat
    terminated = terminated | d_term
    t_scatter = jnp.where(d_scat, d_t, t_scatter)
    g_scatter = jnp.where(d_scat, d_g, g_scatter)
    albedo_sc = _m(d_scat, d_alb, albedo_sc)

    # ======== heterogeneous resampling lanes (guided) =======================
    if vopt.sampling_method == "resampling":
        het_rs = het & guide
        rres = _heterogeneous_resampling(scene, cfg, vopt, o, d, seg_end,
                                         medium_id, hero_idx, sampler, beta,
                                         r_u, r_l, vsp, het_rs, lam)
        (sampler, beta, r_u, r_l, rs_scat, rs_term, rs_t, rs_g, rs_alb,
         rs_tr) = rres
        scattered = scattered | rs_scat
        terminated = terminated | rs_term
        t_scatter = jnp.where(rs_scat, rs_t, t_scatter)
        g_scatter = jnp.where(rs_scat, rs_g, g_scatter)
        albedo_sc = _m(rs_scat, rs_alb, albedo_sc)
        tr_est = _m(het_rs, rs_tr, tr_est)

    return DistanceResult(sampler, beta, r_u, r_l, L, scattered, terminated,
                          t_scatter, g_scatter, albedo_sc, tr_est)


def _heterogeneous_ods(scene, cfg, vopt, o, d, seg_end, medium_id, hero_idx,
                       sampler, beta, r_u, r_l, vsp, tr_prev, depth, active,
                       lam=None):
    """NDS / NDS+ optical-depth-space distance sampling
    (media_sampleTMaj.h:251-491; called from the delta-tracking routine of
    guidedvolpathvspgintegrator.cpp:878-1094).

    The whole ray is treated as one interval of hero-channel optical depth
    t_v (majorant pre-pass). NDS extends it to t_n = -log(1-(1-e^-t_v)/vsp)
    and draws tentative collisions from the truncated exponential on
    [0, t_n); the truncation renormalizations accumulate into tpScaleFactor
    so the one-sample-MIS weight vs plain delta tracking is
    r_u_factor = mis/tpScale + (1-mis) (media_sampleTMaj.h:389,435,461).
    With probability (1 - vspMISRatio) a lane uses plain exponential
    candidates instead (the defensive MIS mixture, :339-345).

    NDS+ (sampling_method="nds+") additionally raises the real-collision
    probability on primary rays to pScatter^(1/(1+TrEst)) using the
    previous-wave transmittance buffer, with exact r_u compensation
    (guidedvolpathvspgintegrator.cpp:929-938,975-976,1073-1074).

    Lanes whose target vsp is below the medium's delta-tracking scatter
    probability 1-e^-t_v cannot be served by NDS (:326-327) and are
    returned in `fallback` for the plain delta-tracking route.
    """
    media = scene.media
    mis = float(vopt.vsp_mis_ratio)
    eps = 1e-5

    # --- pre-pass: total hero-channel majorant optical depth ---------------
    it = seg_init(media, medium_id, o, d, seg_end, active, lam)
    t_v = jnp.zeros_like(seg_end)

    def pre_cond(c):
        it, _, n = c
        return jnp.any(~it.done) & (n < cfg.max_collisions)

    def pre_body(c):
        it, tv, n = c
        maj_h = hero(it.sigma_maj, hero_idx)
        live = ~it.done
        tv = tv + jnp.where(
            live, maj_h * jnp.clip(it.t_seg_end - it.t_seg_start, 0.0, 3e37),
            0.0)
        return seg_next(media, medium_id, it, live, lam), tv, n + 1

    _, t_v, _ = jax.lax.while_loop(pre_cond, pre_body, (it, t_v, jnp.int32(0)))

    one_m_e = -jnp.expm1(-t_v)
    # NDS cannot *decrease* the scatter probability below delta tracking's
    fallback = active & (vsp < one_m_e)
    act = active & ~fallback & (t_v > 0)
    t_n = -jnp.log1p(-jnp.minimum(one_m_e / jnp.maximum(vsp, 1e-4),
                                  1.0 - 1e-7))
    if vopt.sampling_method == "nds+":
        nds_plus = act & (depth == 0)
    else:
        nds_plus = jnp.zeros_like(act)
    inv_gamma = jnp.where(
        nds_plus, 1.0 / (1.0 + jnp.clip(hero(tr_prev, hero_idx), 0.0, 1.0)),
        1.0)

    # --- defensive-MIS technique selection ----------------------------------
    sampler, u0 = sampler.get_1d()
    dt_lane = u0 > mis
    u0 = jnp.where(dt_lane, (u0 - mis) / max(1.0 - mis, 1e-6),
                   u0 / max(mis, 1e-6))
    u0 = jnp.clip(u0, 0.0, 1.0 - 1e-7)

    # --- main walk in optical-depth space ------------------------------------
    it0 = seg_init(media, medium_id, o, d, seg_end, act, lam)
    z = jnp.zeros_like(seg_end)
    ones3 = jnp.ones_like(beta)
    T_maj = ones3
    tp = ones3
    tr_ratio = ones3
    f0 = act & (seg_end < 0)  # all-False
    carry = (sampler, it0, it0.t_seg_start, T_maj, tp, t_v, t_n, z - 1.0, u0,
             beta, r_u, r_l, tr_ratio, f0, f0, f0, act & ~it0.done,
             z, z, jnp.zeros_like(beta), jnp.int32(0))

    def cond(c):
        return jnp.any(c[16]) & (c[20] < cfg.max_collisions)

    def body(c):
        (sampler, it, t_min, T_maj, tp, t_v_cur, t_n_cur, rem, u_cur, beta,
         r_u, r_l, tr_ratio, scattered, terminated, passed, live, t_sc, g_sc,
         alb, n) = c
        sigma_maj = it.sigma_maj
        maj_h = hero(sigma_maj, hero_idx)
        norm_maj = sigma_maj / jnp.maximum(maj_h, 1e-30)[..., None]

        # -- draw a candidate (truncated exp / plain exp) where needed ------
        need = live & (rem < 0) & ~passed & (maj_h > 0)
        step_scale = -jnp.expm1(-jnp.maximum(t_n_cur, 0.0)[..., None] * norm_maj)
        step_h = hero(step_scale, hero_idx)
        dist = jnp.where(dt_lane, -jnp.log1p(-u_cur),
                         -jnp.log1p(-u_cur * jnp.clip(step_h, 0.0, 1.0 - 1e-7)))
        tp = _m(need, tp * jnp.maximum(step_scale, 1e-30), tp)
        pass_now = need & ((t_v_cur - dist < eps) | (dist <= 0))
        tail = -jnp.expm1(-jnp.maximum(t_n - t_v, 0.0))
        tp = _m(pass_now, tp / jnp.maximum(tail, 1e-30)[..., None], tp)
        passed = passed | pass_now
        rem = jnp.where(need & ~pass_now, dist, rem)

        # -- consume the current segment or land inside it -------------------
        dt_end = jnp.clip(it.t_seg_end - t_min, 0.0, 3e37)
        seg_tau = dt_end * maj_h
        consume = live & (passed | (rem > seg_tau + eps) | (maj_h <= 0))
        T_maj = _m(consume, T_maj * jnp.exp(-dt_end[..., None] * sigma_maj),
                   T_maj)
        t_v_cur = jnp.where(consume, t_v_cur - seg_tau, t_v_cur)
        t_n_cur = jnp.where(consume, t_n_cur - seg_tau, t_n_cur)
        rem = jnp.where(consume & ~passed, rem - seg_tau, rem)
        it = seg_next(media, medium_id, it, consume, lam)
        t_min = jnp.where(consume, it.t_seg_start, t_min)
        live = live & ~(consume & it.done)

        # -- tentative collision ---------------------------------------------
        arrive = live & ~consume & ~passed & (rem >= 0)
        t = t_min + rem / jnp.maximum(maj_h, 1e-30)
        T_maj = _m(arrive, T_maj * jnp.exp(-rem[..., None] * norm_maj), T_maj)
        t_v_cur = jnp.where(arrive, t_v_cur - rem, t_v_cur)
        t_n_cur = jnp.where(arrive, t_n_cur - rem, t_n_cur)
        rem = jnp.where(arrive, -1.0, rem)
        t_min = jnp.where(arrive, t, t_min)
        sampler, u_next = sampler.get_1d()
        u_cur = jnp.where(arrive, u_next, u_cur)

        p = o + t[..., None] * d
        mp = media.sample_point(medium_id, p, lam)
        sigma_t = mp.sigma_a + mp.sigma_s
        st_h = hero(sigma_t, hero_idx)
        p_scat = st_h / jnp.maximum(maj_h, 1e-30)
        p_scat_b = jnp.where(nds_plus,
                             jnp.clip(p_scat, 1e-30, 1.0) ** inv_gamma, p_scat)
        sampler, um = sampler.get_1d()
        is_real = arrive & (um < p_scat_b)
        is_null = arrive & ~is_real

        T_maj_h = hero(T_maj, hero_idx)
        r_u_factor = mis / jnp.maximum(tp, 1e-30) + (1.0 - mis)
        pdf_r = jnp.maximum(T_maj_h * st_h, 1e-30)
        beta = _m(is_real, beta * T_maj * mp.sigma_s / pdf_r[..., None], beta)
        ru_r = r_u * T_maj * sigma_t / pdf_r[..., None] * r_u_factor
        comp_r = sigma_maj * p_scat_b[..., None] / jnp.maximum(sigma_t, 1e-30)
        ru_r = jnp.where((is_real & nds_plus)[..., None], ru_r * comp_r, ru_r)
        r_u = _m(is_real, ru_r, r_u)
        scattered = scattered | is_real
        t_sc = jnp.where(is_real, t, t_sc)
        g_sc = jnp.where(is_real, mp.g, g_sc)
        alb = _m(is_real, mp.sigma_s / jnp.maximum(sigma_t, 1e-30), alb)
        live = live & ~is_real

        sigma_n = jnp.maximum(sigma_maj - sigma_t, 0.0)
        sn_h = hero(sigma_n, hero_idx)
        pdf_n = T_maj_h * sn_h
        inv_pdf = 1.0 / jnp.maximum(pdf_n, 1e-30)
        beta = _m(is_null, beta * T_maj * sigma_n * inv_pdf[..., None], beta)
        beta = _m(is_null & (pdf_n == 0), jnp.zeros_like(beta), beta)
        ru_n = r_u * T_maj * sigma_n * inv_pdf[..., None]
        comp_n = (sigma_maj * (1.0 - p_scat_b)[..., None]
                  / jnp.maximum(sigma_n, 1e-30))
        ru_n = jnp.where((is_null & nds_plus)[..., None], ru_n * comp_n, ru_n)
        r_u = _m(is_null, ru_n, r_u)
        r_l = _m(is_null, r_l * T_maj * sigma_maj * inv_pdf[..., None], r_l)
        tr_ratio = _m(is_null,
                      tr_ratio * sigma_n / jnp.maximum(sigma_maj, 1e-30),
                      tr_ratio)
        died = is_null & ((jnp.max(beta, -1) == 0) | (jnp.max(r_u, -1) == 0))
        terminated = terminated | died
        live = live & ~died
        T_maj = _m(is_null & ~died, jnp.ones_like(T_maj), T_maj)
        return (sampler, it, t_min, T_maj, tp, t_v_cur, t_n_cur, rem, u_cur,
                beta, r_u, r_l, tr_ratio, scattered, terminated, passed, live,
                t_sc, g_sc, alb, n + 1)

    (sampler, _, _, T_maj, tp, _, _, _, _, beta, r_u, r_l, tr_ratio,
     scattered, terminated, passed, _, t_sc, g_sc, alb,
     _) = jax.lax.while_loop(cond, body, carry)

    # pass-through / ran-out finish (integrator :1080-1091)
    ran_out = act & ~scattered & ~terminated
    T_maj_h = jnp.maximum(hero(T_maj, hero_idx), 1e-30)
    scale = T_maj / T_maj_h[..., None]
    r_u_factor_end = mis / jnp.maximum(tp, 1e-30) + (1.0 - mis)
    beta = _m(ran_out, beta * scale, beta)
    r_u = _m(ran_out, r_u * scale * r_u_factor_end, r_u)
    r_l = _m(ran_out, r_l * scale * r_u_factor_end, r_l)
    return (sampler, beta, r_u, r_l, scattered, terminated, t_sc, g_sc, alb,
            tr_ratio, fallback)


def _heterogeneous_delta(scene, cfg, o, d, seg_end, medium_id, hero_idx,
                         sampler, beta, r_u, r_l, active, lam=None):
    """Absorption-free delta tracking over the majorant segment iterator."""
    media = scene.media
    it0 = seg_init(media, medium_id, o, d, seg_end, active, lam)
    z = jnp.zeros_like(seg_end)
    f0 = active & (seg_end < 0)
    t_min = it0.t_seg_start
    T_maj = jnp.ones_like(beta)
    scattered, terminated = f0, f0
    t_sc, g_sc = z, z
    alb = jnp.zeros_like(beta)

    def cond(c):
        return jnp.any(c[9]) & (c[14] < cfg.max_collisions)

    def body(c):
        (sampler, it, t_min, T_maj, beta, r_u, r_l, scattered, terminated,
         act, t_sc, g_sc, alb, _, n) = c
        sigma_maj = it.sigma_maj
        maj_h = hero(sigma_maj, hero_idx)
        sampler, u_step = sampler.get_1d()
        t = jnp.where(maj_h > 0,
                      t_min + sample_exponential(u_step, jnp.maximum(maj_h, 1e-30)),
                      INF)
        past = t >= it.t_seg_end
        tail = act & past
        dt_end = jnp.clip(it.t_seg_end - t_min, 0.0, 3e37)
        T_maj = _m(tail, T_maj * jnp.exp(-dt_end[..., None] * sigma_maj), T_maj)
        it = seg_next(media, medium_id, it, tail, lam)
        t_min = jnp.where(tail, it.t_seg_start, t_min)
        act_new = act & ~(tail & it.done)

        coll = act & ~past
        T_maj = _m(coll, T_maj * jnp.exp(-(t - t_min)[..., None] * sigma_maj), T_maj)
        p = o + t[..., None] * d
        mp = media.sample_point(medium_id, p, lam)
        sigma_t = mp.sigma_a + mp.sigma_s
        st_h = hero(sigma_t, hero_idx)
        p_scatter = st_h / jnp.maximum(maj_h, 1e-30)
        sampler, um = sampler.get_1d()
        is_real = coll & (um < p_scatter)
        is_null = coll & ~is_real

        T_maj_h = hero(T_maj, hero_idx)
        pdf_r = jnp.maximum(T_maj_h * st_h, 1e-30)
        beta = _m(is_real, beta * T_maj * mp.sigma_s / pdf_r[..., None], beta)
        r_u = _m(is_real, r_u * T_maj * sigma_t / pdf_r[..., None], r_u)
        scattered = scattered | is_real
        t_sc = jnp.where(is_real, t, t_sc)
        g_sc = jnp.where(is_real, mp.g, g_sc)
        alb = _m(is_real, mp.sigma_s / jnp.maximum(sigma_t, 1e-30), alb)
        act_new = act_new & ~is_real

        sigma_n = jnp.maximum(sigma_maj - sigma_t, 0.0)
        sn_h = hero(sigma_n, hero_idx)
        pdf_n = T_maj_h * sn_h
        inv_pdf = 1.0 / jnp.maximum(pdf_n, 1e-30)
        beta = _m(is_null, beta * T_maj * sigma_n * inv_pdf[..., None], beta)
        beta = _m(is_null & (pdf_n == 0), jnp.zeros_like(beta), beta)
        r_u = _m(is_null, r_u * T_maj * sigma_n * inv_pdf[..., None], r_u)
        r_l = _m(is_null, r_l * T_maj * sigma_maj * inv_pdf[..., None], r_l)
        died = is_null & ((jnp.max(beta, -1) == 0) | (jnp.max(r_u, -1) == 0))
        terminated = terminated | died
        act_new = act_new & ~died
        T_maj = _m(is_null & ~died, jnp.ones_like(T_maj), T_maj)
        t_min = jnp.where(is_null, t, t_min)
        return (sampler, it, t_min, T_maj, beta, r_u, r_l, scattered,
                terminated, act_new, t_sc, g_sc, alb, jnp.int32(0), n + 1)

    init = (sampler, it0, t_min, T_maj, beta, r_u, r_l, scattered, terminated,
            active & ~it0.done, t_sc, g_sc, alb, jnp.int32(0), jnp.int32(0))
    (sampler, _, _, T_maj, beta, r_u, r_l, scattered, terminated, _, t_sc,
     g_sc, alb, _, _) = jax.lax.while_loop(cond, body, init)

    ran_out = active & ~scattered & ~terminated
    T_maj_h = jnp.maximum(hero(T_maj, hero_idx), 1e-30)
    scale = T_maj / T_maj_h[..., None]
    beta = _m(ran_out, beta * scale, beta)
    r_u = _m(ran_out, r_u * scale, r_u)
    r_l = _m(ran_out, r_l * scale, r_l)
    return (sampler, beta, r_u, r_l, scattered, terminated, t_sc, g_sc, alb)


def _heterogeneous_resampling(scene, cfg, vopt, o, d, seg_end, medium_id,
                              hero_idx, sampler, beta, r_u, r_l, vsp,
                              active, lam=None):
    """The resampling routine (media_sampleTMaj.h:120-247 + :679-877).

    Deviation from the reference: on a pass-through (surface candidate
    selected) we also multiply r_l by the accumulated light-strategy
    rescaled pdfs of the null chain (T_maj*sigma_maj/pdf per collision,
    exactly what the delta route applies at :1075,:1089). The reference
    leaves r_l untouched in its resampling branch, which breaks the
    NEE-vs-escape MIS balance and measurably brightens an absorbing
    furnace (~2%/traversal in our tests); with this term the furnace is
    exact."""
    media = scene.media

    # --- pre-pass: total majorant optical length -----------------------------
    it = seg_init(media, medium_id, o, d, seg_end, active, lam)
    total_len = jnp.zeros_like(seg_end)

    def pre_cond(c):
        it, _, n = c
        return jnp.any(~it.done) & (n < cfg.max_collisions)

    def pre_body(c):
        it, total, n = c
        maj_h = hero(it.sigma_maj, hero_idx)
        live = ~it.done
        total = total + jnp.where(
            live, maj_h * jnp.clip(it.t_seg_end - it.t_seg_start, 0.0, 3e37), 0.0)
        it = seg_next(media, medium_id, it, live, lam)
        return it, total, n + 1

    _, total_len, _ = jax.lax.while_loop(pre_cond, pre_body,
                                         (it, total_len, jnp.int32(0)))
    act = active & (total_len > 0)

    # --- majorant scale for the zero-volume-candidate compensation ----------
    min_total = -jnp.log(jnp.maximum(1.0 - vsp, 1e-6))
    maj_scale = jnp.where(act & (min_total > total_len),
                          min_total / jnp.maximum(total_len, 1e-30), 1.0)
    total_eff = jnp.maximum(total_len, min_total)
    vol_ratio_comp = vsp / jnp.maximum(1.0 - jnp.exp(-total_eff), 1e-6)

    # --- main walk: reservoir over all tentative collisions -----------------
    it0 = seg_init(media, medium_id, o, d, seg_end, act, lam)
    z = jnp.zeros_like(seg_end)
    T_maj = jnp.ones_like(beta)
    tr_ratio = jnp.ones_like(beta)
    beta_rs = jnp.ones_like(beta)
    r_u_rs = jnp.ones_like(beta)
    r_l_rs = jnp.ones_like(beta)
    w_sum = z
    # reservoir candidate state
    c_p = jnp.zeros_like(o)
    c_g = z
    c_alb = jnp.zeros_like(beta)
    c_wi = z
    c_ste = z
    c_num = jnp.ones_like(beta)
    c_den = jnp.ones_like(beta)
    has_c = act & (seg_end < 0)
    t_min = it0.t_seg_start

    def cond(c):
        return jnp.any(c[-2]) & (c[-1] < cfg.max_collisions)

    def body(c):
        (sampler, it, t_min, T_maj, tr_ratio, beta_rs, r_u_rs, r_l_rs, w_sum,
         c_p, c_g, c_alb, c_wi, c_ste, c_num, c_den, has_c, live, n) = c
        sigma_maj = it.sigma_maj * maj_scale[..., None]
        maj_h = hero(sigma_maj, hero_idx)
        sampler, u_step = sampler.get_1d()
        t = jnp.where(maj_h > 0,
                      t_min + sample_exponential(u_step, jnp.maximum(maj_h, 1e-30)),
                      INF)
        past = t >= it.t_seg_end
        tail = live & past
        dt_end = jnp.clip(it.t_seg_end - t_min, 0.0, 3e37)
        T_maj = _m(tail, T_maj * jnp.exp(-dt_end[..., None] * sigma_maj), T_maj)
        it = seg_next(media, medium_id, it, tail, lam)
        t_min = jnp.where(tail, it.t_seg_start, t_min)
        live_new = live & ~(tail & it.done)

        coll = live & ~past
        T_maj = _m(coll, T_maj * jnp.exp(-(t - t_min)[..., None] * sigma_maj), T_maj)
        p = o + t[..., None] * d
        mp = media.sample_point(medium_id, p, lam)
        sigma_t = mp.sigma_a + mp.sigma_s
        sigma_n = jnp.maximum(sigma_maj - sigma_t, 0.0)
        # candidate weight: (sigma_t/sigma_maj * trRatioEst)[hero]
        wi = hero(sigma_t / jnp.maximum(sigma_maj, 1e-30) * tr_ratio, hero_idx)
        wi = jnp.where(coll, wi, 0.0)
        w_sum_new = w_sum + wi
        sampler, u_res = sampler.get_1d()
        take = coll & (wi > 0) & (u_res < wi / jnp.maximum(w_sum_new, 1e-30))
        T_maj_h = hero(T_maj, hero_idx)
        st_h = hero(sigma_t, hero_idx)
        pdf = jnp.maximum(T_maj_h * st_h, 1e-30)
        num = beta_rs * T_maj * mp.sigma_s / pdf[..., None]
        den = r_u_rs * T_maj * sigma_t / pdf[..., None]
        c_p = _m(take, p, c_p)
        c_g = jnp.where(take, mp.g, c_g)
        c_alb = _m(take, mp.sigma_s / jnp.maximum(sigma_t, 1e-30), c_alb)
        c_wi = jnp.where(take, wi, c_wi)
        c_ste = jnp.where(take, wi, c_ste)  # sigmaTTrEst == wi at selection
        c_num = _m(take, num, c_num)
        c_den = _m(take, den, c_den)
        has_c = has_c | take
        w_sum = jnp.where(coll, w_sum_new, w_sum)

        # always continue: null-collision bookkeeping
        sn_h = hero(sigma_n, hero_idx)
        pdf_n = jnp.maximum(T_maj_h * sn_h, 1e-30)
        beta_rs = _m(coll, beta_rs * T_maj * sigma_n / pdf_n[..., None], beta_rs)
        r_u_rs = _m(coll, r_u_rs * T_maj * sigma_n / pdf_n[..., None], r_u_rs)
        r_l_rs = _m(coll, r_l_rs * T_maj * sigma_maj / pdf_n[..., None], r_l_rs)
        tr_ratio = _m(coll, tr_ratio * sigma_n / jnp.maximum(sigma_maj, 1e-30), tr_ratio)
        T_maj = _m(coll, jnp.ones_like(T_maj), T_maj)
        t_min = jnp.where(coll, t, t_min)
        return (sampler, it, t_min, T_maj, tr_ratio, beta_rs, r_u_rs, r_l_rs,
                w_sum, c_p, c_g, c_alb, c_wi, c_ste, c_num, c_den, has_c,
                live_new, n + 1)

    init = (sampler, it0, t_min, T_maj, tr_ratio, beta_rs, r_u_rs, r_l_rs,
            w_sum, c_p, c_g, c_alb, c_wi, c_ste, c_num, c_den, has_c,
            act & ~it0.done, jnp.int32(0))
    (sampler, _, _, T_maj, tr_ratio, beta_rs, r_u_rs, r_l_rs, w_sum, c_p, c_g,
     c_alb, c_wi, c_ste, c_num, c_den, has_c, _, _) = jax.lax.while_loop(
        cond, body, init)

    T_maj_h = jnp.maximum(hero(T_maj, hero_idx), 1e-30)
    beta_rs = beta_rs * T_maj / T_maj_h[..., None]
    r_u_rs = r_u_rs * T_maj / T_maj_h[..., None]
    r_l_rs = r_l_rs * T_maj / T_maj_h[..., None]

    tr_h = hero(tr_ratio, hero_idx)
    # surface candidate (integrator :735-747)
    surf_wi = tr_h
    adj = act & (tr_h < 1) & (tr_h > 0) & (w_sum > 0)
    vol_ratio = (vol_ratio_comp * vopt.vsp_mis_ratio
                 + (1.0 - tr_h) * (1.0 - vopt.vsp_mis_ratio))
    surf_ratio = 1.0 - vol_ratio
    surf_wi = jnp.where(
        adj, surf_ratio / jnp.maximum(vol_ratio, 1e-6) * w_sum, surf_wi)
    w_total = w_sum + surf_wi

    dead = act & (w_total <= 0)
    sampler, u_pick = sampler.get_1d()
    pick_surf = act & ~dead & (u_pick < surf_wi / jnp.maximum(w_total, 1e-30))
    pick_vol = act & ~dead & ~pick_surf & has_c
    dead = dead | (act & ~pick_surf & ~has_c)

    # selected-candidate resampling factor: w_total * sigmaTTrEst / wi
    sel_wi = jnp.where(pick_surf, surf_wi, c_wi)
    sel_ste = jnp.where(pick_surf, tr_h, c_ste)
    sel_num = _m(pick_surf, beta_rs, c_num)
    sel_den = _m(pick_surf, r_u_rs, c_den)
    factor = w_total * sel_ste / jnp.maximum(sel_wi, 1e-30)
    beta = _m(act & ~dead, beta * sel_num * factor[..., None], beta)
    r_u = _m(act & ~dead, r_u * sel_den, r_u)
    # light-strategy rescaled pdf over the pass-through null chain (see
    # docstring); scattering lanes overwrite r_l at the phase sample anyway
    r_l = _m(pick_surf, r_l * r_l_rs, r_l)

    bad = act & ~dead & (
        jnp.any(~jnp.isfinite(beta), -1) | jnp.any(~jnp.isfinite(r_u), -1)
        | jnp.any(~jnp.isfinite(r_l), -1))
    dead = dead | bad

    return (sampler, beta, r_u, r_l, pick_vol & ~bad, dead,
            jnp.where(pick_vol, jnp.sum((c_p - o) * d, -1), jnp.zeros_like(w_sum)),
            c_g, c_alb, tr_ratio)


# ---------------------------------------------------------------------------
# Guided Russian roulette (openpgl util::GuidedRussianRoulette)
# ---------------------------------------------------------------------------


_LUM_W = np.asarray([0.2126, 0.7152, 0.0722], np.float32)


def guided_rr_survival(beta, adjoint, pixel_estimate, min_survival=0.1):
    """survival = clamp(lum(beta*adjoint)/lum(pixelEstimate), min, 1)
    (openpgl util::GuidedRussianRoulette, Rec.709 luminance weighting)."""
    num = jnp.sum(beta * adjoint * _LUM_W, -1)
    den = jnp.maximum(jnp.sum(pixel_estimate * _LUM_W, -1), 1e-6)
    return jnp.clip(num / den, min_survival, 1.0)


def throughput_rr_survival(beta, r_u):
    """StandardThroughputBasedRussianRoulette."""
    tp = jnp.max(beta / jnp.maximum(average(r_u), 1e-30)[..., None], -1)
    return jnp.clip(tp, 0.0, 1.0)


# ---------------------------------------------------------------------------
# VSPG bounce
# ---------------------------------------------------------------------------


def vspg_bounce(scene: Scene, cfg: VolPathConfig, gopt: GuidingOptions,
                vopt: VSPGOptions, field: GuidingField, isgb: ISGB,
                train: bool, gs: VState) -> VState:
    s = gs.s
    rec = gs.rec
    t_far = jnp.full_like(s.o[..., 0], INF)
    h = scene.geometry.intersect(s.o, s.d, t_far)
    seg_end = jnp.where(h.hit, h.t, INF)

    # ---- VSP-guided distance sampling --------------------------------------
    in_medium = s.alive & (s.medium_id >= 0)
    guide, vsp = lookup_vsp(vopt, field, isgb, s, gs.pixel_id, gs.last_vol)
    dr = sample_distance_vspg(
        scene, cfg, vopt, s.o, s.d, seg_end, s.medium_id, s.hero_idx,
        s.sampler, s.beta, s.r_u, s.r_l, s.L, guide & in_medium, vsp,
        in_medium, tr_prev=gs.tr_prev, depth=s.depth, lam=s.lam)
    sampler, beta, r_u, r_l, L = dr.sampler, dr.beta, dr.r_u, dr.r_l, dr.L
    depth = s.depth
    alive = s.alive & ~dr.terminated

    # depth guard for scatter events (reference: depth++ >= maxDepth)
    scat_raw = dr.scattered & alive
    depth_exceeded = scat_raw & (depth >= cfg.max_depth)
    alive = alive & ~depth_exceeded
    scat = scat_raw & ~depth_exceeded
    depth = jnp.where(scat, depth + 1, depth)

    p_scat = s.o + dr.t_scatter[..., None] * s.d
    wo = -s.d

    # ISGB first-event data (volume)
    first_now_v = scat & ~gs.first_set & (s.depth == 0)
    first_set = gs.first_set | first_now_v
    first_vol = jnp.where(first_now_v, True, gs.first_vol)
    first_albedo = _m(first_now_v, gv._to3(dr.albedo_scatter),
                      gs.first_albedo)
    first_normal = _m(first_now_v, wo, gs.first_normal)
    # primary transmittance estimate for the TrBuffer
    tr_est = _m((s.depth == 0) & in_medium, gv._to3(dr.tr_est),
                gs.tr_est)

    # ---- volume vertex shading: NEE + guided RR + guided phase -------------
    dist_v = gfield.volume_distribution(field, p_scat, wo, dr.g_scatter)
    use_guide_v = scat & dist_v.valid & field.trained & bool(gopt.volume_guiding)

    sampler, u_sel = sampler.get_1d()
    sampler, u2l = sampler.get_2d()
    ls = scene.lights.sample(p_scat, u_sel, u2l)
    if s.lam is not None:
        from ...utils.spectrum import uplift_unbounded

        ls = ls._replace(L=uplift_unbounded(ls.L, s.lam))
    ok = scat & ls.valid & (average(ls.L) > 0)
    cos_wo_wi = jnp.sum(wo * ls.wi, axis=-1)
    f_scalar = henyey_greenstein(cos_wo_wi, dr.g_scatter)
    pg = gopt.guiding_prob if gopt.mode == "mis" else 0.5
    guide_pdf_l = gfield.dist_pdf(dist_v, ls.wi)
    scatter_pdf_l = jnp.where(use_guide_v,
                              (1 - pg) * f_scalar + pg * guide_pdf_l, f_scalar)
    f_hat = f_scalar[..., None] * jnp.ones_like(beta)
    ok &= f_scalar > 0
    sampler, T_ray, tr_l, tr_u = transmittance_ratio_tracking(
        scene, cfg, p_scat, ls.wi, ls.t_shadow, s.medium_id, s.hero_idx,
        sampler, ok, s.lam)
    Ld, Ld_local = _combine_ld(ls, f_hat, scatter_pdf_l, T_ray, tr_l, tr_u,
                               r_u, beta, ok)
    L = _m(scat, L + Ld, L)

    # guided RR at volume vertices (before direction sampling,
    # guidedvolpathvspgintegrator.cpp:818-838)
    pixel_est = gisgb.isgb_contribution(isgb, gs.pixel_id)
    adjoint = dist_v.flux
    if vopt.guide_rr:
        survival = jnp.where(
            dist_v.valid & (jnp.mean(pixel_est, -1) > 0),
            guided_rr_survival(gv._to3(beta), adjoint, pixel_est), 1.0)
    else:
        survival = throughput_rr_survival(beta, r_u)
    do_rr_v = scat & (depth > vopt.min_rr_depth) & (survival < 1.0)
    sampler, u_rrv = sampler.get_1d()
    kill_v = do_rr_v & (u_rrv >= survival)
    alive = alive & ~kill_v
    beta = _m(do_rr_v & ~kill_v,
              beta / jnp.maximum(survival, 1e-3)[..., None], beta)

    def phase_base(sampler):
        sampler, u2p = sampler.get_2d()
        wi_p, pdf_p = sample_henyey_greenstein(wo, dr.g_scatter, u2p)
        f_p = pdf_p[..., None] * jnp.ones_like(beta)
        return sampler, wi_p, f_p, pdf_p, None

    def phase_pdf_at(wi):
        return henyey_greenstein(jnp.sum(wo * wi, -1), dr.g_scatter)

    def inc_rad_pdf_v(wi):
        return gfield.incoming_radiance_pdf(field, "volume", p_scat, wi)

    (sampler, wi_v, _, pdf_v, mis_pdf_v, _, _, valid_v, _) = _guided_sample(
        sampler, use_guide_v, gopt, dist_v, phase_base, phase_pdf_at,
        inc_rad_pdf_v)
    f_v = phase_pdf_at(wi_v)
    alive = alive & ~(scat & ~valid_v)
    scale_v = f_v / jnp.maximum(pdf_v, 1e-30)
    beta = _m(scat, beta * scale_v[..., None], beta)
    r_l = _m(scat, r_u / jnp.maximum(mis_pdf_v, 1e-30)[..., None], r_l)
    o_new = _m(scat, p_scat, s.o)
    d_new = _m(scat, wi_v, s.d)
    specular = jnp.where(scat, False, s.specular)
    prev_p = _m(scat, p_scat, s.prev_p)
    last_vol = jnp.where(scat, True, gs.last_vol)

    if train:
        rec = grec.record_vertex(rec, scat, p_scat, wi_v,
                                 scale_v[..., None] * jnp.ones(3), pdf_v,
                                 jnp.ones_like(scat))
        rec = grec.record_direct(rec, ok, gv._to3(Ld_local))

    # ---- escape / surface (same structure as guided_volpath) ---------------
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
        w_mis_env = jnp.where(first, jnp.ones_like(denom_esc),
                              average(r_u) / denom_esc)
        rec = grec.record_emission(rec, escaped & any_env,
                                   gv._to3(Le_env * w_mis_env[..., None]),
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
        w_mis_srf = jnp.where(first, jnp.ones_like(denom_s),
                              average(r_u) / denom_s)
        rec = grec.record_emission(rec, emissive & has_le,
                                   gv._to3(Le_surf * w_mis_srf[..., None]),
                                   h.t)

    iface = surf & (h.mat_id < 0)
    new_med_skip = jnp.where(dot(s.d, h.n) < 0, h.med_in, h.med_out)
    medium_id = jnp.where(iface, new_med_skip, s.medium_id)
    o_new = _m(iface, h.p + 1e-4 * s.d, o_new)

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

    # ISGB first-event data (surface)
    first_now_s = shade & ~first_set & (s.depth == 0)
    first_set = first_set | first_now_s
    first_vol = jnp.where(first_now_s, False, first_vol)
    first_albedo = _m(first_now_s, gv._to3(lanes.albedo), first_albedo)
    first_normal = _m(first_now_s, ns, first_normal)

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

    (sampler, wi_s, f_s, pdf_s, mis_pdf_s, _, bs_aux, valid_s,
     took_guide_s) = _guided_sample(sampler, use_guide_s, gopt, dist_s,
                                    bsdf_base, bsdf_pdf_at, inc_rad_pdf_s)
    f_guide = bsdf_f(lanes, wo_l, to_local(wi_s)) * jnp.abs(dot(wi_s, ns))[..., None]
    f_s = jnp.where(took_guide_s[..., None], f_guide, f_s)
    bs_ok = shade & valid_s & (pdf_s > 0) & bs_aux.valid
    spec_lane = lanes.is_specular
    bs_ok = jnp.where(spec_lane, shade & bs_aux.valid & (bs_aux.pdf > 0), bs_ok)
    alive = alive & ~(shade & ~bs_ok)

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
    last_vol = jnp.where(bs_ok, False, last_vol)

    if train:
        rec = grec.record_vertex(rec, bs_ok & ~spec_lane, h.p, wi_s,
                                 gv._to3(scale_b), pdf_s,
                                 jnp.zeros_like(bs_ok))
        rec = grec.record_direct(rec, ok2, gv._to3(Ld2_local))

    # surface RR (guided or throughput)
    dead_beta = shade & (jnp.max(beta, -1) == 0)
    alive = alive & ~dead_beta
    dist_srr = gfield._gather_half(field, field.surface, h.p)
    if vopt.guide_rr:
        survival_s = jnp.where(
            dist_srr.valid & (jnp.mean(pixel_est, -1) > 0),
            guided_rr_survival(gv._to3(beta), dist_srr.flux, pixel_est),
            1.0)
        survival_s = jnp.where(specular, 0.95, survival_s)
    else:
        survival_s = throughput_rr_survival(beta, r_u)
    do_rr_s = shade & (depth > vopt.min_rr_depth) & (survival_s < 1.0)
    sampler, u_rrs = sampler.get_1d()
    kill_s = do_rr_s & (u_rrs >= survival_s)
    alive = alive & ~kill_s
    beta = _m(do_rr_s & ~kill_s,
              beta / jnp.maximum(survival_s, 1e-3)[..., None], beta)

    s2 = PathState(sampler, o_new, d_new, beta, r_u, r_l, L, depth, alive,
                   specular, s.hero_idx, medium_id, eta_scale, prev_p,
                   s.lam, s.pdf_lam)
    return VState(s2, rec, gs.pixel_id, last_vol, first_set, first_vol,
                  first_albedo, first_normal, tr_est, gs.tr_prev)


# ---------------------------------------------------------------------------
# Wave / render drivers
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "gopt", "vopt", "camera_medium",
                                   "train", "spp_per_pass"))
def vspg_wave(scene, camera, film, film_state, field, isgb, cfg, gopt, vopt,
              seed, wave_idx, camera_medium, train, spp_per_pass,
              tr_buffer=None, pixel_id=None, pixel_base=None):
    """One VSPG wave. pixel_id/pixel_base support the sharded driver
    (parallel/mesh.render_vspg_sharded): lanes cover pixel_id (a slice of
    the frame) and film_state/isgb/tr_buffer hold only the local rows
    starting at pixel_base."""
    if pixel_id is None:
        R = film.npix * spp_per_pass
        lane = jnp.arange(R, dtype=jnp.int32)
        pixel_id = lane // spp_per_pass
        local_pid = pixel_id
    else:
        R = pixel_id.shape[0]
        lane = jnp.arange(R, dtype=jnp.int32) + 0 * pixel_id
        base = pixel_id[0] if pixel_base is None else pixel_base
        local_pid = pixel_id - base
    sample_index = (wave_idx * spp_per_pass + lane % spp_per_pass).astype(jnp.uint32)
    s, fw = vp.start_camera_paths(camera, film, seed, sample_index, pixel_id,
                                  camera_medium, spectral=cfg.spectral)
    rec = SegmentRecord.make(R, gopt.record_depth if train else 1,
                             pixel_id.astype(jnp.float32))
    z3 = jnp.zeros_like(s.o)
    tr_prev = (jnp.ones_like(s.o) if tr_buffer is None
               else tr_buffer[local_pid])
    # VState.pixel_id indexes the (possibly sharded) ISGB rows -> local ids
    gs = VState(s, rec, local_pid, pixel_id < 0, pixel_id < 0, pixel_id < 0,
                z3, z3, jnp.ones_like(s.o), tr_prev)

    def cond(c):
        gs, it = c
        return jnp.any(gs.s.alive) & (it < cfg.max_events)

    def body(c):
        gs, it = c
        return vspg_bounce(scene, cfg, gopt, vopt, field, isgb, train, gs), it + 1

    gs, _ = jax.lax.while_loop(cond, body, (gs, jnp.int32(0)))
    film_state = vp._film_add(film, film_state, local_pid, gs.s, fw)
    isgb = gisgb.isgb_add_samples(isgb, local_pid, gv._to3(gs.s.L),
                                  gs.first_albedo,
                                  gs.first_normal, gs.first_vol,
                                  pixel_id >= 0, half=wave_idx % 2)
    batch = grec.propagate(gs.rec) if train else None
    tr = gs.tr_est
    return film_state, isgb, batch, tr


def render_vspg(scene: Scene, camera, film, spp=16, cfg=VolPathConfig(),
                gopt=GuidingOptions(), vopt=VSPGOptions(), seed=0,
                camera_medium=-1, spp_per_pass=1, field=None, isgb=None,
                train=True, use_pallas="auto", interpret_pallas=False,
                train_pallas="auto"):
    """Progressive VSPG rendering: waves + training barrier + ISGB updates
    at waves 1,2,4,8,... (PostProcessWave, :230-259).

    use_pallas: once training is over (field frozen), remaining spp render
    through the fused ops/pallas_vspg megakernel when the scene class
    supports it ("auto"); False forces the XLA wave path. Freezing the
    field/ISGB for the kernel phase only changes sampling distributions,
    never estimator weights — the mixed image stays unbiased.

    train_pallas: training waves also run through the megakernel (its
    record variant) when spp_per_pass == 1 and the scene class qualifies
    — ~100x faster per wave, enabling reference-scale training budgets
    (up to guideNumTrainingWaves=128, integrators.h:502) on TPU.

    Returns (image, field, isgb)."""
    if field is None:
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
        field = gfield.GuidingField.make(allp.min(0) - 1e-3, allp.max(0) + 1e-3,
                                         res=gopt.field_res,
                                         n_lobes=gopt.n_lobes,
                                         n_extra=gopt.adaptive_extra)
    if isgb is None:
        isgb = ISGB.make(film.resolution, vopt.vsp_criterion,
                         getattr(vopt, 'denoiser', 'atrous'))

    film_state = film.init_state()
    # NDS+ feeds the previous waves' primary-transmittance buffer back in
    # (reference loads it from disk via loadTrBuffer; here it is accumulated
    # online across waves, starting from the unbiased-anyway Tr=1 guess).
    tr_buffer = (jnp.ones((film.npix, 3))
                 if vopt.sampling_method == "nds+" else None)
    n_tr = 0
    spp_done = 0
    kimg_sum = None
    kimg_spp = 0
    ktrain_ok = None  # lazily evaluated: scene qualifies for kernel train
    _packed = None  # packed (dens, maj) reused across kernel train waves
    for wave in range(spp // spp_per_pass):
        do_train = train and int(field.iteration) < gopt.train_waves
        if not do_train and use_pallas and _pallas_supported(
                scene, camera, film, cfg, gopt, vopt, field,
                bool(interpret_pallas)):
            break  # remaining spp render through the fused kernel
        if do_train and train_pallas and spp_per_pass == 1 \
                and tr_buffer is None:
            if ktrain_ok is None:
                ktrain_ok = _pallas_supported(
                    scene, camera, film, cfg, gopt, vopt, field,
                    bool(interpret_pallas))
            if ktrain_ok:
                from ...ops import pallas_vspg as _pk

                img_w, segrec, f_alb, f_nrm, f_vol, L_raw, _packed = \
                    _pk.train_wave_pallas(
                        scene, camera, film, cfg, gopt, vopt, field, isgb,
                        seed=jnp.uint32(seed) + jnp.uint32(wave * 7919 + 1),
                        interpret=bool(interpret_pallas),
                        packed_scene=_packed)
                spp_done += 1
                kimg_spp += 1
                kimg_sum = img_w if kimg_sum is None else kimg_sum + img_w
                pid = jnp.arange(film.npix, dtype=jnp.int32)
                isgb = gisgb.isgb_add_samples(isgb, pid, L_raw, f_alb,
                                              f_nrm, f_vol, pid >= 0,
                                              half=wave % 2)
                batch = grec.propagate(segrec)
                total_w = float(jnp.sum(jnp.where(batch.valid,
                                                  batch.weight, 0.0)))
                if total_w > gopt.min_train_weight:
                    field = gv.train_step(field, batch)
                    if gopt.adaptive_extra:
                        field = gfield.refine_field(field,
                                                    gopt.refine_threshold)
                if (wave + 1) in vopt.isgb_update_waves:
                    isgb = gisgb.isgb_update(isgb)
                continue
        spp_done += spp_per_pass
        film_state, isgb, batch, tr = vspg_wave(
            scene, camera, film, film_state, field, isgb, cfg, gopt, vopt,
            jnp.uint32(seed), jnp.int32(wave), int(camera_medium),
            bool(do_train), int(spp_per_pass), tr_buffer)
        if tr_buffer is not None:
            tr_pix = tr.reshape(film.npix, spp_per_pass, 3).mean(1)
            tr_buffer = (tr_pix if n_tr == 0
                         else (tr_buffer * n_tr + tr_pix) / (n_tr + 1))
            n_tr += 1
        if do_train:
            total_w = float(jnp.sum(jnp.where(batch.valid, batch.weight, 0.0)))
            if total_w > gopt.min_train_weight:
                field = gv.train_step(field, batch)
                if gopt.adaptive_extra:
                    field = gfield.refine_field(field,
                                                gopt.refine_threshold)
        if (wave + 1) in vopt.isgb_update_waves:
            isgb = gisgb.isgb_update(isgb)
    remaining = spp - spp_done
    xla_spp = spp_done - kimg_spp
    parts = []
    if xla_spp > 0:
        parts.append((film.image(film_state), xla_spp))
    if kimg_spp > 0:
        parts.append((kimg_sum / kimg_spp, kimg_spp))
    if remaining > 0:
        from ...ops import pallas_vspg as _pk

        img_k = _pk.render_vspg_pallas(
            scene, camera, film, remaining, cfg, gopt, vopt, field, isgb,
            seed=jnp.uint32(seed) + jnp.uint32(0x9E3779B9),
            interpret=bool(interpret_pallas), tr_buffer=tr_buffer)
        parts.append((img_k, remaining))
    img = sum(im * w for im, w in parts) / sum(w for _, w in parts)
    return img, field, isgb


def _pallas_supported(scene, camera, film, cfg, gopt, vopt, field,
                      interpret=False):
    # round 5: the megakernel serves all three distance routes —
    # resampling, NDS and NDS+ (the ODS walk + exact OD prepass run
    # in-kernel; NDS+ rides the TrBuffer as extra ISGB rows)
    import jax

    # TPU kernels only — CPU runs stay on the XLA path unless the caller
    # explicitly asked for interpret-mode Pallas (tests)
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return False
    try:
        from ...ops import pallas_vspg as _pk

        return _pk.supports(scene, camera, film, cfg, gopt, vopt, field)
    except Exception:
        return False
