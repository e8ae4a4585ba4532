"""Materials -> BSDFs as SoA arrays with masked type dispatch.

Analog of the reference's materials.h -> bsdf.h -> bxdfs.h stack. Instead of
TaggedPointer dispatch per hit (bxdfs.h DiffuseBxDF:31, Dielectric:232,
Conductor:357; microfacets in util/scattering.h), each lane gathers its
material row and every BSDF family is evaluated branchlessly; lanes keep the
row matching their mat_type. With few families this costs a handful of fused
VPU ops — the TPU version of a sorted material queue.

All directions here are in *local shading frame* (z = shading normal);
integrators convert with coordinate_system frames. Conventions match pbrt:
wo, wi point away from the surface; eta is interior/exterior IOR ratio.

Supported families (mat_type):
  0 DIFFUSE         albedo
  1 CONDUCTOR       reflectance (Schlick F0), roughness (TR microfacet; 0 = mirror)
  2 DIELECTRIC      eta, roughness (0 = smooth specular reflect/transmit)
  3 DIFFUSE_TRANS   albedo (reflect) + albedo2 (transmit)
  4 THIN_DIELECTRIC eta (always specular; double-interface Fresnel, straight-
                    through transmission — bxdfs.h ThinDielectricBxDF:303)
  5 COATED_DIFFUSE  albedo (base), roughness + eta (coat). The reference runs
                    a stochastic layered simulation (bxdfs.h LayeredBxDF:436);
                    here the coat is a dielectric-Fresnel GGX lobe over a
                    reciprocally Fresnel-attenuated diffuse base
                    (Ashikhmin-Shirley coupled model) — branch-free and
                    energy conserving, trading the simulation's multiple
                    interreflections for a closed form.
  6 COATED_CONDUCTOR albedo (base F0), roughness (base GGX), roughness2 + eta
                    (coat GGX), same closed-form layering as 5.
  7 MIX             mix_m1/mix_m2/mix_amount: resolved to one constituent per
                    intersection by a position hash (materials.h MixMaterial
                    ChooseMaterial semantics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.math import INV_PI, safe_div, safe_sqrt, sqr
from ..utils.sampling import (
    cosine_hemisphere_pdf,
    sample_cosine_hemisphere,
    sample_uniform_disk_polar,
)
from ..utils.vecmath import (
    abs_cos_theta,
    cos_theta,
    dot,
    normalize,
    same_hemisphere,
    tan2_theta,
)

DIFFUSE = 0
CONDUCTOR = 1
DIELECTRIC = 2
DIFFUSE_TRANS = 3
THIN_DIELECTRIC = 4
COATED_DIFFUSE = 5
COATED_CONDUCTOR = 6
MIX = 7
HAIR = 8  # Chiang et al. 2016 fiber model (bxdfs.h HairBxDF:~700)
          # field reuse: albedo2=sigma_a, roughness=beta_m,
          # roughness2=beta_n, mix_amount=alpha (scale tilt, radians)
SUBSURFACE = 9  # separable BSSRDF (bssrdf.h:135; models/bssrdf.py)
          # field reuse: albedo=A, albedo2=diffusion mfp d, eta=IOR;
          # handled by the integrator's probe relocation (cfg.sss)
MEASURED = 10  # tabulated measured BRDF (materials.h Measured:909 role).
# fork addition (materials.h CookTorrance:555, bxdfs.h:181): a rough
# dielectric-coated diffuse — Fresnel-weighted sum of a Trowbridge-Reitz
# glossy reflection lobe and a Lambertian base tinted by `reflectance`
COOK_TORRANCE = 11
          # The reference reads RGL .bsdf tensors (Dupuy-Jakob adaptive
          # parameterization); here: a Rusinkiewicz (theta_h, theta_d,
          # phi_d) table bank with trilinear lookup + cosine sampling,
          # fed by the MERL .binary loader (load_merl_brdf) or synthetic
          # tables. meas_id picks the table; sampling is cosine-hemisphere.


class Materials(NamedTuple):
    mat_type: jnp.ndarray  # (M,)
    albedo: jnp.ndarray  # (M,3) diffuse reflectance / conductor F0
    albedo2: jnp.ndarray  # (M,3) transmission color
    eta: jnp.ndarray  # (M,) relative IOR
    roughness: jnp.ndarray  # (M,) TR alpha (already remapped)
    albedo_tex: jnp.ndarray  # (M,) texture id for albedo, -1 = constant
    roughness2: jnp.ndarray  # (M,) coat roughness (COATED_CONDUCTOR)
    mix_m1: jnp.ndarray  # (M,) MIX constituent ids (-1 elsewhere)
    mix_m2: jnp.ndarray  # (M,)
    mix_amount: jnp.ndarray  # (M,) probability of mix_m1
    meas_id: jnp.ndarray = None  # (M,) measured-table id (-1 = none)
    meas_bank: jnp.ndarray = None  # (K,Nh,Nd,Np,3) measured BRDF tables

    @staticmethod
    def build(mats, measured_tables=None):
        """mats: list of dicts {type, albedo, albedo2, eta, roughness,
        roughness2, albedo_tex, mix_m1, mix_m2, mix_amount, meas_id};
        measured_tables: optional (K,Nh,Nd,Np,3) array bank."""
        n = len(mats)
        if n == 0:
            # dummy black-diffuse row so lane gathers stay in range
            mats = [dict(type=DIFFUSE, albedo=(0.0, 0.0, 0.0))]
        return Materials(
            jnp.asarray([m.get("type", DIFFUSE) for m in mats], jnp.int32),
            jnp.asarray([m.get("albedo", (0.5, 0.5, 0.5)) for m in mats], jnp.float32),
            jnp.asarray([m.get("albedo2", (0, 0, 0)) for m in mats], jnp.float32),
            jnp.asarray([m.get("eta", 1.5) for m in mats], jnp.float32),
            jnp.asarray([m.get("roughness", 0.0) for m in mats], jnp.float32),
            jnp.asarray([m.get("albedo_tex", -1) for m in mats], jnp.int32),
            jnp.asarray([m.get("roughness2", 0.0) for m in mats], jnp.float32),
            jnp.asarray([m.get("mix_m1", -1) for m in mats], jnp.int32),
            jnp.asarray([m.get("mix_m2", -1) for m in mats], jnp.int32),
            jnp.asarray([m.get("mix_amount", 0.5) for m in mats], jnp.float32),
            jnp.asarray([m.get("meas_id", -1) for m in mats], jnp.int32),
            (None if measured_tables is None
             else jnp.asarray(measured_tables, jnp.float32)),
        )

    def resolve_mix(self, mat_id, p=None):
        """Resolve MIX materials to a constituent id with a position hash
        (materials.h MixMaterial::ChooseMaterial; pbrt uses HashFloat of the
        intersection point). One nesting level, like the reference's
        wavefront path."""
        if p is None:
            return mat_id
        mid = jnp.maximum(mat_id, 0)
        is_mix = self.mat_type[mid] == MIX
        from ..utils import rng as _rng

        bits = (jnp.abs(p) * 65536.0).astype(jnp.uint32)
        h = _rng.hash_u32(bits[..., 0], bits[..., 1], bits[..., 2],
                          mid.astype(jnp.uint32))
        u = h.astype(jnp.float32) * (1.0 / 4294967296.0)
        chosen = jnp.where(u < self.mix_amount[mid], self.mix_m1[mid],
                           self.mix_m2[mid])
        return jnp.where(is_mix & (mat_id >= 0), jnp.maximum(chosen, 0),
                         mat_id)

    def gather(self, mat_id, p=None):
        mat_id = self.resolve_mix(mat_id, p)
        mid = jnp.maximum(mat_id, 0)
        return BSDFLanes(
            self.mat_type[mid], self.albedo[mid], self.albedo2[mid],
            self.eta[mid], self.roughness[mid], self.roughness2[mid],
            self.mix_amount[mid], jnp.zeros_like(self.eta[mid]),
            None if self.meas_id is None else self.meas_id[mid],
            self.meas_bank,
        )

    def gather_textured(self, textures, mat_id, uv, p=None):
        """Gather + evaluate the albedo texture at the hit uv
        (materials.h -> textures.h evaluation at shading time). For hair
        lanes the curve cross-section offset h = 2v-1 rides along."""
        mat_id = self.resolve_mix(mat_id, p)
        lanes = self.gather(mat_id)
        lanes = lanes._replace(h=jnp.clip(2.0 * uv[..., 1] - 1.0,
                                          -0.9995, 0.9995))
        if textures is None:
            return lanes
        from .textures import eval_texture

        mid = jnp.maximum(mat_id, 0)
        tex = self.albedo_tex[mid]
        tval = eval_texture(textures, tex, uv, p)
        albedo = jnp.where((tex >= 0)[..., None], tval, lanes.albedo)
        return lanes._replace(albedo=albedo)


class BSDFLanes(NamedTuple):
    """Per-lane material parameters (gathered)."""

    mat_type: jnp.ndarray  # (R,)
    albedo: jnp.ndarray  # (R,3)
    albedo2: jnp.ndarray  # (R,3)
    eta: jnp.ndarray  # (R,)
    roughness: jnp.ndarray  # (R,)
    roughness2: jnp.ndarray  # (R,) coat roughness
    alpha: jnp.ndarray = None  # (R,) hair scale tilt
    h: jnp.ndarray = None  # (R,) hair cross-section offset in [-1,1]
    meas_id: jnp.ndarray = None  # (R,) measured-table id
    meas_bank: jnp.ndarray = None  # shared (K,Nh,Nd,Np,3) bank

    @property
    def is_specular(self):
        """Delta-only materials: smooth conductor/dielectric + thin
        dielectric. Coated materials keep a non-delta base lobe so NEE/MIS
        still applies (per-sample delta coat picks are flagged in
        BSDFSample.is_specular)."""
        smooth = self.roughness < 1e-3
        return ((smooth & ((self.mat_type == CONDUCTOR)
                           | (self.mat_type == DIELECTRIC)))
                | (self.mat_type == THIN_DIELECTRIC))


class BSDFSample(NamedTuple):
    wi: jnp.ndarray  # (R,3) local
    f: jnp.ndarray  # (R,3)
    pdf: jnp.ndarray  # (R,)
    is_specular: jnp.ndarray  # (R,)
    is_transmission: jnp.ndarray  # (R,)
    eta: jnp.ndarray  # (R,) relative IOR of the sampled event (1 if reflect)
    valid: jnp.ndarray  # (R,)


# -- Fresnel -----------------------------------------------------------------


def fresnel_dielectric(cos_i, eta):
    """Exact dielectric Fresnel (util/scattering.h FrDielectric).

    cos_i may be negative (exiting); eta is interior/exterior.
    """
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    flip = cos_i < 0
    eta_e = jnp.where(flip, 1.0 / eta, eta)
    ci = jnp.abs(cos_i)
    sin2_t = (1.0 - sqr(ci)) / sqr(eta_e)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    r_parl = safe_div(eta_e * ci - cos_t, eta_e * ci + cos_t)
    r_perp = safe_div(ci - eta_e * cos_t, ci + eta_e * cos_t)
    F = 0.5 * (sqr(r_parl) + sqr(r_perp))
    return jnp.where(tir, 1.0, F)


def fresnel_schlick(cos_i, f0):
    """Schlick approximation for conductors with RGB F0."""
    m = jnp.clip(1.0 - jnp.abs(cos_i), 0.0, 1.0)
    return f0 + (1.0 - f0) * (m**5)[..., None]


def refract(wi, n, eta):
    """Refract wi about n (both unit, cos_i = dot(wi,n) > 0 expected after
    flipping). Returns (ok, wt, eta_used)."""
    cos_i = dot(n, wi)
    flip = cos_i < 0
    eta_e = jnp.where(flip, 1.0 / eta, eta)
    n_e = jnp.where(flip[..., None], -n, n)
    ci = jnp.abs(cos_i)
    sin2_t = jnp.maximum(0.0, 1.0 - sqr(ci)) / sqr(eta_e)
    tir = sin2_t >= 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    wt = -wi / eta_e[..., None] + (ci / eta_e - cos_t)[..., None] * n_e
    return ~tir, normalize(wt), eta_e


# -- Trowbridge-Reitz microfacet (util/scattering.h) -------------------------


def tr_d(wm, alpha):
    """GGX/TR normal distribution (isotropic)."""
    t2 = tan2_theta(wm)
    c4 = sqr(sqr(cos_theta(wm)))
    e = t2 / sqr(alpha)
    return jnp.where(
        jnp.isfinite(t2),
        safe_div(1.0, jnp.pi * sqr(alpha) * c4 * sqr(1.0 + e), 0.0),
        0.0,
    )


def tr_lambda(w, alpha):
    t2 = tan2_theta(w)
    return jnp.where(jnp.isfinite(t2), 0.5 * (safe_sqrt(1.0 + sqr(alpha) * t2) - 1.0), 0.0)


def tr_g1(w, alpha):
    return 1.0 / (1.0 + tr_lambda(w, alpha))


def tr_g(wo, wi, alpha):
    return 1.0 / (1.0 + tr_lambda(wo, alpha) + tr_lambda(wi, alpha))


def tr_d_visible(w, wm, alpha):
    """Visible-normal distribution pdf."""
    return (
        tr_g1(w, alpha)
        / jnp.maximum(abs_cos_theta(w), 1e-8)
        * tr_d(wm, alpha)
        * jnp.abs(dot(w, wm))
    )


def tr_sample_wm(w, alpha, u2):
    """Sample visible normals (Heitz 2018 VNDF; scattering.h Sample_wm)."""
    wh = normalize(jnp.stack(
        [alpha * w[..., 0], alpha * w[..., 1], w[..., 2]], axis=-1))
    wh = jnp.where(cos_theta(wh)[..., None] < 0, -wh, wh)
    t1 = jnp.where(
        (cos_theta(wh) < 0.999999)[..., None],
        normalize(jnp.cross(jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wh.shape), wh)),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), wh.shape),
    )
    t2v = jnp.cross(wh, t1)
    p = sample_uniform_disk_polar(u2)
    h = safe_sqrt(1.0 - sqr(p[..., 0]))
    p1 = jnp.stack([p[..., 0], (1.0 + cos_theta(wh)) / 2.0 * p[..., 1] + (1.0 - (1.0 + cos_theta(wh)) / 2.0) * h], axis=-1)
    pz = safe_sqrt(1.0 - p1[..., 0] ** 2 - p1[..., 1] ** 2)
    nh = p1[..., 0:1] * t1 + p1[..., 1:2] * t2v + pz[..., None] * wh
    wm = normalize(jnp.stack(
        [alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)], axis=-1))
    return wm


def tr_pdf(wo, wm, alpha):
    return tr_d_visible(wo, wm, alpha)


# -- unified BSDF interface (masked over families) ---------------------------


def bsdf_f(lanes: BSDFLanes, wo, wi):
    """BSDF value f(wo, wi) (local frame), excluding delta lobes. (R,3)."""
    f = jnp.zeros_like(lanes.albedo)
    same = same_hemisphere(wo, wi)

    # diffuse
    is_d = lanes.mat_type == DIFFUSE
    f = jnp.where((is_d & same)[..., None], lanes.albedo * INV_PI, f)

    # diffuse transmission (bxdfs.h DiffuseTransmission)
    is_dt = lanes.mat_type == DIFFUSE_TRANS
    f = jnp.where((is_dt & same)[..., None], lanes.albedo * INV_PI, f)
    f = jnp.where((is_dt & ~same)[..., None], lanes.albedo2 * INV_PI, f)

    # rough conductor
    is_c = (lanes.mat_type == CONDUCTOR) & (lanes.roughness >= 1e-3)
    alpha = jnp.maximum(lanes.roughness, 1e-4)
    wm = wi + wo
    wm_ok = jnp.sum(wm * wm, -1) > 1e-18
    wm_n = normalize(wm)
    wm_n = jnp.where(cos_theta(wm_n)[..., None] < 0, -wm_n, wm_n)
    F = fresnel_schlick(dot(wo, wm_n), lanes.albedo)
    denom = 4.0 * abs_cos_theta(wo) * abs_cos_theta(wi)
    spec = tr_d(wm_n, alpha)[..., None] * F * tr_g(wo, wi, alpha)[..., None]
    spec = spec * safe_div(1.0, denom, 0.0)[..., None]
    f = jnp.where((is_c & same & wm_ok)[..., None], spec, f)

    # rough dielectric: reflection + transmission lobes
    is_rd = (lanes.mat_type == DIELECTRIC) & (lanes.roughness >= 1e-3)
    eta = lanes.eta
    # reflection part
    wm_r = normalize(wi + wo)
    wm_r = jnp.where(cos_theta(wm_r)[..., None] < 0, -wm_r, wm_r)
    Fr = fresnel_dielectric(dot(wo, wm_r), eta)
    spec_r = (
        tr_d(wm_r, alpha) * tr_g(wo, wi, alpha) * Fr
        * safe_div(1.0, 4.0 * abs_cos_theta(wo) * abs_cos_theta(wi), 0.0)
    )
    f = jnp.where((is_rd & same)[..., None], spec_r[..., None] * jnp.ones_like(lanes.albedo), f)
    # transmission part (bxdfs.h DielectricBxDF::f)
    etap = jnp.where(cos_theta(wo) > 0, eta, 1.0 / eta)
    wm_t = wi * etap[..., None] + wo
    wm_tok = jnp.sum(wm_t * wm_t, -1) > 1e-18
    wm_t = normalize(wm_t)
    wm_t = jnp.where(cos_theta(wm_t)[..., None] < 0, -wm_t, wm_t)
    backface = (dot(wm_t, wi) * cos_theta(wi) > 0) | (dot(wm_t, wo) * cos_theta(wo) < 0)
    Ft = 1.0 - fresnel_dielectric(dot(wo, wm_t), eta)
    denom_t = sqr(dot(wi, wm_t) + dot(wo, wm_t) / etap)
    spec_t = (
        tr_d(wm_t, alpha) * Ft * tr_g(wo, wi, alpha)
        * jnp.abs(safe_div(
            dot(wi, wm_t) * dot(wo, wm_t),
            cos_theta(wi) * cos_theta(wo) * denom_t, 0.0))
        / sqr(etap)  # radiance transport scaling
    )
    f = jnp.where(
        (is_rd & ~same & wm_tok & ~backface)[..., None],
        spec_t[..., None] * jnp.ones_like(lanes.albedo), f,
    )

    # coated diffuse / coated conductor (closed-form layering; see header)
    is_cd = lanes.mat_type == COATED_DIFFUSE
    is_cc = lanes.mat_type == COATED_CONDUCTOR
    a_coat = jnp.maximum(jnp.where(is_cd, lanes.roughness, lanes.roughness2),
                         0.01)
    a_base = jnp.maximum(lanes.roughness, 0.01)
    Fo = fresnel_dielectric(abs_cos_theta(wo), lanes.eta)
    Fi = fresnel_dielectric(abs_cos_theta(wi), lanes.eta)
    wm_l = wi + wo
    wm_lok = jnp.sum(wm_l * wm_l, -1) > 1e-18
    wm_l = normalize(wm_l)
    wm_l = jnp.where(cos_theta(wm_l)[..., None] < 0, -wm_l, wm_l)
    denom_l = 4.0 * abs_cos_theta(wo) * abs_cos_theta(wi)
    coat = (tr_d(wm_l, a_coat) * tr_g(wo, wi, a_coat)
            * fresnel_dielectric(dot(wo, wm_l), lanes.eta))
    coat = safe_div(coat, denom_l, 0.0)[..., None] * jnp.ones_like(lanes.albedo)
    atten = ((1.0 - Fo) * (1.0 - Fi))[..., None]
    diff_base = lanes.albedo * INV_PI * atten
    cond_base = (tr_d(wm_l, a_base)[..., None]
                 * fresnel_schlick(dot(wo, wm_l), lanes.albedo)
                 * tr_g(wo, wi, a_base)[..., None]
                 * safe_div(1.0, denom_l, 0.0)[..., None] * atten)
    f = jnp.where((is_cd & same & wm_lok)[..., None], coat + diff_base, f)
    f = jnp.where((is_cc & same & wm_lok)[..., None], coat + cond_base, f)

    # CookTorrance (fork, bxdfs.cpp:127-150): glossy dielectric reflection
    # + (1-F)-weighted Lambertian base, reflection only
    is_ct = lanes.mat_type == COOK_TORRANCE
    a_ct = jnp.maximum(lanes.roughness, 1e-3)
    wm_ct = wi + wo
    wm_ctok = jnp.sum(wm_ct * wm_ct, -1) > 1e-18
    wm_ct = normalize(wm_ct)
    wm_ct = jnp.where(cos_theta(wm_ct)[..., None] < 0, -wm_ct, wm_ct)
    F_ct = fresnel_dielectric(dot(wo, wm_ct), lanes.eta)
    spec_ct = (tr_d(wm_ct, a_ct) * tr_g(wo, wi, a_ct) * F_ct
               * safe_div(1.0, jnp.abs(4.0 * cos_theta(wo) * cos_theta(wi)),
                          0.0))
    f_ct = (spec_ct[..., None] * jnp.ones_like(lanes.albedo)
            + lanes.albedo * (INV_PI * (1.0 - F_ct))[..., None])
    f = jnp.where((is_ct & same & wm_ctok)[..., None], f_ct, f)

    # hair fibers (frame x = tangent; see hair_f below)
    is_hair = lanes.mat_type == HAIR
    f = jnp.where(is_hair[..., None], hair_f(lanes, wo, wi), f)

    # measured tables (reflection only, reciprocal by construction)
    if lanes.meas_bank is not None:
        is_meas = (lanes.mat_type == MEASURED) & same
        f = jnp.where(is_meas[..., None], measured_f(lanes, wo, wi), f)
    return f


def bsdf_pdf(lanes: BSDFLanes, wo, wi):
    """Sampling pdf of wi given wo (non-delta lobes). (R,)."""
    pdf = jnp.zeros(wo.shape[:-1])
    same = same_hemisphere(wo, wi)

    is_d = lanes.mat_type == DIFFUSE
    pdf = jnp.where(is_d & same, cosine_hemisphere_pdf(abs_cos_theta(wi)), pdf)

    is_dt = lanes.mat_type == DIFFUSE_TRANS
    # half/half hemisphere selection weighted by albedo norms
    wr = jnp.sum(lanes.albedo, -1)
    wt = jnp.sum(lanes.albedo2, -1)
    pr = safe_div(wr, wr + wt, 0.5)
    pdf_dt = jnp.where(
        same,
        pr * cosine_hemisphere_pdf(abs_cos_theta(wi)),
        (1.0 - pr) * cosine_hemisphere_pdf(abs_cos_theta(wi)),
    )
    pdf = jnp.where(is_dt, pdf_dt, pdf)

    alpha = jnp.maximum(lanes.roughness, 1e-4)
    is_c = (lanes.mat_type == CONDUCTOR) & (lanes.roughness >= 1e-3)
    wm = normalize(wi + wo)
    wm = jnp.where(cos_theta(wm)[..., None] < 0, -wm, wm)
    pdf_c = safe_div(tr_pdf(wo, wm, alpha), 4.0 * jnp.abs(dot(wo, wm)), 0.0)
    pdf = jnp.where(is_c & same, pdf_c, pdf)

    is_rd = (lanes.mat_type == DIELECTRIC) & (lanes.roughness >= 1e-3)
    eta = lanes.eta
    # reflection pdf weighted by Fresnel
    wm_r = normalize(wi + wo)
    wm_r = jnp.where(cos_theta(wm_r)[..., None] < 0, -wm_r, wm_r)
    Fr = fresnel_dielectric(dot(wo, wm_r), eta)
    pdf_rr = safe_div(tr_pdf(wo, wm_r, alpha), 4.0 * jnp.abs(dot(wo, wm_r)), 0.0) * Fr
    # transmission pdf
    etap = jnp.where(cos_theta(wo) > 0, eta, 1.0 / eta)
    wm_t = wi * etap[..., None] + wo
    wm_tok = jnp.sum(wm_t * wm_t, -1) > 1e-18
    wm_t = normalize(wm_t)
    wm_t = jnp.where(cos_theta(wm_t)[..., None] < 0, -wm_t, wm_t)
    backface = (dot(wm_t, wi) * cos_theta(wi) > 0) | (dot(wm_t, wo) * cos_theta(wo) < 0)
    Ft = 1.0 - fresnel_dielectric(dot(wo, wm_t), eta)
    denom_t = sqr(dot(wi, wm_t) + dot(wo, wm_t) / etap)
    dwm_dwi = safe_div(jnp.abs(dot(wi, wm_t)), denom_t, 0.0)
    pdf_tt = tr_pdf(wo, wm_t, alpha) * dwm_dwi * Ft
    pdf_rd = jnp.where(same, pdf_rr, jnp.where(wm_tok & ~backface, pdf_tt, 0.0))
    pdf = jnp.where(is_rd, pdf_rd, pdf)

    # coated diffuse / conductor: Fresnel-weighted two-lobe mixture
    is_cd = lanes.mat_type == COATED_DIFFUSE
    is_cc = lanes.mat_type == COATED_CONDUCTOR
    a_coat = jnp.maximum(jnp.where(is_cd, lanes.roughness, lanes.roughness2),
                         0.01)
    a_base = jnp.maximum(lanes.roughness, 0.01)
    Fo = fresnel_dielectric(abs_cos_theta(wo), lanes.eta)
    p_c = jnp.clip(Fo, 0.1, 0.9)
    wm_l = normalize(wi + wo)
    wm_l = jnp.where(cos_theta(wm_l)[..., None] < 0, -wm_l, wm_l)
    pdf_coat = safe_div(tr_pdf(wo, wm_l, a_coat),
                        4.0 * jnp.abs(dot(wo, wm_l)), 0.0)
    pdf_base_c = safe_div(tr_pdf(wo, wm_l, a_base),
                          4.0 * jnp.abs(dot(wo, wm_l)), 0.0)
    pdf_cd = p_c * pdf_coat + (1 - p_c) * cosine_hemisphere_pdf(abs_cos_theta(wi))
    pdf_cc = p_c * pdf_coat + (1 - p_c) * pdf_base_c
    pdf = jnp.where(is_cd & same, pdf_cd, pdf)
    pdf = jnp.where(is_cc & same, pdf_cc, pdf)

    # CookTorrance (bxdfs.cpp:151-183): Fresnel-at-normal lobe mixture of
    # VNDF glossy reflection and cosine-hemisphere diffuse
    is_ct = lanes.mat_type == COOK_TORRANCE
    a_ct = jnp.maximum(lanes.roughness, 1e-3)
    wm_ct = normalize(wi + wo)
    wm_ct = jnp.where(cos_theta(wm_ct)[..., None] < 0, -wm_ct, wm_ct)
    pr_ct = fresnel_dielectric(abs_cos_theta(wo), lanes.eta)
    pdf_ct = (pr_ct * safe_div(tr_pdf(wo, wm_ct, a_ct),
                               4.0 * jnp.abs(dot(wo, wm_ct)), 0.0)
              + (1.0 - pr_ct) * cosine_hemisphere_pdf(abs_cos_theta(wi)))
    pdf = jnp.where(is_ct & same, pdf_ct, pdf)

    is_hair = lanes.mat_type == HAIR
    pdf = jnp.where(is_hair, hair_pdf(lanes, wo, wi), pdf)

    if lanes.meas_bank is not None:
        is_meas = lanes.mat_type == MEASURED
        pdf = jnp.where(is_meas & same,
                        cosine_hemisphere_pdf(abs_cos_theta(wi)), pdf)
    return pdf


def bsdf_sample(lanes: BSDFLanes, wo, u_lobe, u2) -> BSDFSample:
    """Sample wi ~ BSDF. All families evaluated masked; specular lobes return
    delta samples with pdf=1 and f containing the delta weight / |cos|
    (pbrt convention: f already divided by nothing; caller uses f*cos/pdf).
    """
    R = wo.shape[:-1]
    wi = jnp.zeros(R + (3,))
    f = jnp.zeros_like(lanes.albedo)
    pdf = jnp.zeros(R)
    is_spec = jnp.zeros(R, bool)
    is_trans = jnp.zeros(R, bool)
    eta_out = jnp.ones(R)
    valid = jnp.zeros(R, bool)

    flip = cos_theta(wo) < 0  # wo below surface: sample mirrored then flip

    # ---- diffuse ----
    is_d = lanes.mat_type == DIFFUSE
    wi_d = sample_cosine_hemisphere(u2)
    wi_d = jnp.where(flip[..., None], wi_d * jnp.asarray([1.0, 1.0, -1.0]), wi_d)
    pdf_d = cosine_hemisphere_pdf(abs_cos_theta(wi_d))
    f_d = lanes.albedo * INV_PI
    wi = jnp.where(is_d[..., None], wi_d, wi)
    f = jnp.where(is_d[..., None], f_d, f)
    pdf = jnp.where(is_d, pdf_d, pdf)
    valid = valid | (is_d & (pdf_d > 0))

    # ---- diffuse transmission ----
    is_dt = lanes.mat_type == DIFFUSE_TRANS
    wr = jnp.sum(lanes.albedo, -1)
    wt = jnp.sum(lanes.albedo2, -1)
    pr = safe_div(wr, wr + wt, 0.5)
    go_reflect = u_lobe < pr
    wi_t = sample_cosine_hemisphere(u2)
    # reflect stays in wo hemisphere; transmit flips
    sign = jnp.where(go_reflect ^ flip, 1.0, -1.0)
    wi_t = wi_t * jnp.stack([jnp.ones_like(sign), jnp.ones_like(sign), sign], -1)
    pdf_t = cosine_hemisphere_pdf(abs_cos_theta(wi_t)) * jnp.where(go_reflect, pr, 1.0 - pr)
    f_t = jnp.where(go_reflect[..., None], lanes.albedo, lanes.albedo2) * INV_PI
    wi = jnp.where(is_dt[..., None], wi_t, wi)
    f = jnp.where(is_dt[..., None], f_t, f)
    pdf = jnp.where(is_dt, pdf_t, pdf)
    is_trans = is_trans | (is_dt & ~go_reflect)
    valid = valid | (is_dt & (pdf_t > 0))

    # ---- conductor ----
    is_c = lanes.mat_type == CONDUCTOR
    smooth_c = is_c & (lanes.roughness < 1e-3)
    # smooth: mirror reflect
    wi_m = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    F_m = fresnel_schlick(abs_cos_theta(wo), lanes.albedo)
    f_m = F_m * safe_div(1.0, abs_cos_theta(wi_m), 0.0)[..., None]
    wi = jnp.where(smooth_c[..., None], wi_m, wi)
    f = jnp.where(smooth_c[..., None], f_m, f)
    pdf = jnp.where(smooth_c, 1.0, pdf)
    is_spec = is_spec | smooth_c
    valid = valid | (smooth_c & (abs_cos_theta(wo) > 0))
    # rough: VNDF sample
    rough_c = is_c & ~smooth_c
    alpha = jnp.maximum(lanes.roughness, 1e-4)
    wo_up = jnp.where(flip[..., None], -wo, wo)
    wm = tr_sample_wm(wo_up, alpha, u2)
    wm = jnp.where(flip[..., None], -wm, wm)
    wi_r = -wo + 2.0 * dot(wo, wm)[..., None] * wm  # reflect(wo, wm)
    same_r = same_hemisphere(wo, wi_r)
    pdf_r = safe_div(tr_pdf(wo_up, jnp.where(flip[..., None], -wm, wm), alpha),
                     4.0 * jnp.abs(dot(wo, wm)), 0.0)
    F_r = fresnel_schlick(dot(wo, wm), lanes.albedo)
    f_r = (
        tr_d(jnp.where(flip[..., None], -wm, wm), alpha)[..., None]
        * F_r * tr_g(wo_up, jnp.where(flip[..., None], -wi_r, wi_r), alpha)[..., None]
        * safe_div(1.0, 4.0 * abs_cos_theta(wo) * abs_cos_theta(wi_r), 0.0)[..., None]
    )
    wi = jnp.where(rough_c[..., None], wi_r, wi)
    f = jnp.where(rough_c[..., None], f_r, f)
    pdf = jnp.where(rough_c, pdf_r, pdf)
    valid = valid | (rough_c & same_r & (pdf_r > 0))

    # ---- dielectric ----
    is_di = lanes.mat_type == DIELECTRIC
    smooth_d = is_di & (lanes.roughness < 1e-3)
    eta = lanes.eta
    n_local = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wo.shape)
    F = fresnel_dielectric(cos_theta(wo), eta)
    reflect_choice = u_lobe < F
    # reflect
    wi_sr = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    f_sr = (F * safe_div(1.0, abs_cos_theta(wi_sr), 0.0))[..., None] * jnp.ones_like(lanes.albedo)
    pdf_sr = F
    # transmit
    ok_t, wi_st, etap = refract(wo, n_local, eta)
    Ft2 = (1.0 - F)
    f_st = (Ft2 * safe_div(1.0, abs_cos_theta(wi_st), 0.0) / sqr(etap))[..., None] * jnp.ones_like(lanes.albedo)
    pdf_st = 1.0 - F
    sm_wi = jnp.where(reflect_choice[..., None], wi_sr, wi_st)
    sm_f = jnp.where(reflect_choice[..., None], f_sr, f_st)
    sm_pdf = jnp.where(reflect_choice, pdf_sr, pdf_st)
    sm_valid = jnp.where(reflect_choice, abs_cos_theta(wo) > 0, ok_t)
    wi = jnp.where(smooth_d[..., None], sm_wi, wi)
    f = jnp.where(smooth_d[..., None], sm_f, f)
    pdf = jnp.where(smooth_d, sm_pdf, pdf)
    is_spec = is_spec | smooth_d
    is_trans = is_trans | (smooth_d & ~reflect_choice)
    eta_out = jnp.where(smooth_d & ~reflect_choice, etap, eta_out)
    valid = valid | (smooth_d & sm_valid)

    # rough dielectric sampling: VNDF + Fresnel lobe choice
    rough_d = is_di & ~smooth_d
    wm_rd = tr_sample_wm(wo_up, alpha, u2)
    wm_rd = jnp.where(flip[..., None], -wm_rd, wm_rd)
    F_rd = fresnel_dielectric(dot(wo, wm_rd), eta)
    refl_rd = u_lobe < F_rd
    wi_rdr = -wo + 2.0 * dot(wo, wm_rd)[..., None] * wm_rd
    ok_rt, wi_rdt, etap_rd = refract(wo, wm_rd, eta)
    wi_rd = jnp.where(refl_rd[..., None], wi_rdr, wi_rdt)
    f_rd = bsdf_f(lanes, wo, wi_rd)
    pdf_rd = bsdf_pdf(lanes, wo, wi_rd)
    wi = jnp.where(rough_d[..., None], wi_rd, wi)
    f = jnp.where(rough_d[..., None], f_rd, f)
    pdf = jnp.where(rough_d, pdf_rd, pdf)
    is_trans = is_trans | (rough_d & ~refl_rd)
    eta_out = jnp.where(rough_d & ~refl_rd, etap_rd, eta_out)
    rd_valid = jnp.where(refl_rd, same_hemisphere(wo, wi_rd), ok_rt & ~same_hemisphere(wo, wi_rd))
    valid = valid | (rough_d & rd_valid & (pdf_rd > 0))

    # ---- thin dielectric (bxdfs.h ThinDielectricBxDF::Sample_f) ----
    is_td = lanes.mat_type == THIN_DIELECTRIC
    F_td = fresnel_dielectric(abs_cos_theta(wo), eta)
    R_td = jnp.where(
        F_td < 1.0,
        F_td + sqr(1.0 - F_td) * F_td / jnp.maximum(1.0 - sqr(F_td), 1e-9),
        1.0)
    T_td = 1.0 - R_td
    refl_td = u_lobe < R_td
    wi_tdr = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], -1)
    wi_td = jnp.where(refl_td[..., None], wi_tdr, -wo)
    w_td = jnp.where(refl_td, R_td, T_td)
    f_td = (w_td * safe_div(1.0, abs_cos_theta(wi_td), 0.0))[..., None] * jnp.ones_like(lanes.albedo)
    wi = jnp.where(is_td[..., None], wi_td, wi)
    f = jnp.where(is_td[..., None], f_td, f)
    pdf = jnp.where(is_td, w_td, pdf)
    is_spec = is_spec | is_td
    is_trans = is_trans | (is_td & ~refl_td)
    # straight-through: entering+exiting the slab cancels, eta_out stays 1
    valid = valid | (is_td & (w_td > 0) & (abs_cos_theta(wo) > 0))

    # ---- coated diffuse / coated conductor ----
    is_cd = lanes.mat_type == COATED_DIFFUSE
    is_cc = lanes.mat_type == COATED_CONDUCTOR
    is_coat = is_cd | is_cc
    a_coat = jnp.maximum(jnp.where(is_cd, lanes.roughness, lanes.roughness2),
                         0.01)
    a_base = jnp.maximum(lanes.roughness, 0.01)
    Fo = fresnel_dielectric(abs_cos_theta(wo), eta)
    p_c = jnp.clip(Fo, 0.1, 0.9)
    pick_coat = u_lobe < p_c
    wm_c = tr_sample_wm(wo_up, a_coat, u2)
    wm_c = jnp.where(flip[..., None], -wm_c, wm_c)
    wi_coat = -wo + 2.0 * dot(wo, wm_c)[..., None] * wm_c
    # base lobe: cosine (diffuse) or base-GGX reflect (conductor)
    wi_base_d = sample_cosine_hemisphere(u2)
    wi_base_d = jnp.where(flip[..., None],
                          wi_base_d * jnp.asarray([1.0, 1.0, -1.0]), wi_base_d)
    wm_b = tr_sample_wm(wo_up, a_base, u2)
    wm_b = jnp.where(flip[..., None], -wm_b, wm_b)
    wi_base_c = -wo + 2.0 * dot(wo, wm_b)[..., None] * wm_b
    wi_base = jnp.where(is_cd[..., None], wi_base_d, wi_base_c)
    wi_l = jnp.where(pick_coat[..., None], wi_coat, wi_base)
    f_l = bsdf_f(lanes, wo, wi_l)
    pdf_l = bsdf_pdf(lanes, wo, wi_l)
    wi = jnp.where(is_coat[..., None], wi_l, wi)
    f = jnp.where(is_coat[..., None], f_l, f)
    pdf = jnp.where(is_coat, pdf_l, pdf)
    valid = valid | (is_coat & same_hemisphere(wo, wi_l) & (pdf_l > 0))

    # ---- measured: cosine-hemisphere sampling ----
    if lanes.meas_bank is not None:
        is_meas = lanes.mat_type == MEASURED
        wi_me = sample_cosine_hemisphere(u2)
        wi_me = jnp.where(flip[..., None],
                          wi_me * jnp.asarray([1.0, 1.0, -1.0]), wi_me)
        pdf_me = cosine_hemisphere_pdf(abs_cos_theta(wi_me))
        f_me = measured_f(lanes, wo, wi_me)
        wi = jnp.where(is_meas[..., None], wi_me, wi)
        f = jnp.where(is_meas[..., None], f_me, f)
        pdf = jnp.where(is_meas, pdf_me, pdf)
        valid = valid | (is_meas & (pdf_me > 0))

    # ---- CookTorrance (bxdfs.cpp:78-126): Fresnel lobe choice between
    # VNDF glossy reflection and cosine-hemisphere diffuse; f/pdf are the
    # full two-lobe mixture (one-sample MIS, like the reference) ----
    is_ct = lanes.mat_type == COOK_TORRANCE
    a_ct = jnp.maximum(lanes.roughness, 1e-3)
    pr_ct = fresnel_dielectric(abs_cos_theta(wo), lanes.eta)
    pick_gl = u_lobe < pr_ct
    wm_ct = tr_sample_wm(wo_up, a_ct, u2)
    wm_ct = jnp.where(flip[..., None], -wm_ct, wm_ct)
    wi_gl = -wo + 2.0 * dot(wo, wm_ct)[..., None] * wm_ct
    wi_df = sample_cosine_hemisphere(u2)
    wi_df = jnp.where(flip[..., None],
                      wi_df * jnp.asarray([1.0, 1.0, -1.0]), wi_df)
    wi_ct = jnp.where(pick_gl[..., None], wi_gl, wi_df)
    f_ct = bsdf_f(lanes, wo, wi_ct)
    pdf_ct = bsdf_pdf(lanes, wo, wi_ct)
    wi = jnp.where(is_ct[..., None], wi_ct, wi)
    f = jnp.where(is_ct[..., None], f_ct, f)
    pdf = jnp.where(is_ct, pdf_ct, pdf)
    valid = valid | (is_ct & same_hemisphere(wo, wi_ct) & (pdf_ct > 0))

    # ---- hair ----
    is_hair = lanes.mat_type == HAIR
    wi_h, f_h, pdf_h = hair_sample(lanes, wo, u_lobe, u2)
    wi = jnp.where(is_hair[..., None], wi_h, wi)
    f = jnp.where(is_hair[..., None], f_h, f)
    pdf = jnp.where(is_hair, pdf_h, pdf)
    valid = valid | (is_hair & (pdf_h > 0))

    return BSDFSample(wi, f, pdf, is_spec, is_trans, eta_out, valid)


# -- hair fiber scattering (Chiang et al. 2016; bxdfs.h/bxdfs.cpp HairBxDF) --
# Local frame convention: x = fiber tangent (longitudinal axis), z = shading
# normal; sin(theta) = w.x, azimuth phi = atan2(w.z, w.y) — the reference's
# curve shading frame (dpdu along the fiber).

_P_MAX = 3


def _bessel_i0(x):
    """Modified Bessel I0 by series (bxdfs.cpp I0), accurate for the small
    arguments the v<=0.1 branch does NOT take."""
    out = jnp.zeros_like(x)
    x2 = x * x
    term = jnp.ones_like(x)
    out = term
    fact = 1.0
    for i in range(1, 10):
        fact *= i
        term = term * x2 / 4.0
        out = out + term / (fact * fact) * (4.0 ** 0)  # (x^2/4)^i/(i!)^2
    return out


def _log_bessel_i0(x):
    # Asymptotic expansion log I0(x) ~ x - log(2*pi*x)/2 + 1/(8x) for large x
    # (bxdfs.cpp LogI0 large branch).
    xs = jnp.maximum(x, 1e-6)
    big = x - 0.5 * jnp.log(2.0 * jnp.pi * xs) + 1.0 / (8.0 * xs)
    small = jnp.log(_bessel_i0(jnp.minimum(x, 12.0)))
    return jnp.where(x > 12.0, big, small)


def _mp(cos_ti, cos_to, sin_ti, sin_to, v):
    """Longitudinal scattering function (bxdfs.cpp Mp)."""
    v = jnp.maximum(v, 1e-5)
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small_v = v <= 0.1
    mp_small = jnp.exp(_log_bessel_i0(a) - b - 1.0 / v + 0.6931
                       + jnp.log(1.0 / (2.0 * v)))
    mp_big = (jnp.exp(-b) * _bessel_i0(jnp.minimum(a, 80.0))
              / (jnp.sinh(1.0 / v) * 2.0 * v))
    return jnp.where(small_v, mp_small, mp_big)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * sqr(1.0 + e))


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / (_logistic_cdf(b, s) - _logistic_cdf(a, s))


def _sample_trimmed_logistic(u, s, a, b):
    k = _logistic_cdf(b, s) - _logistic_cdf(a, s)
    x = -s * jnp.log(1.0 / jnp.maximum(u * k + _logistic_cdf(a, s), 1e-9) - 1.0)
    return jnp.clip(x, a, b)


def _hair_phi(p, gamma_o, gamma_t):
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * jnp.pi


def _wrap_pi(x):
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


def _hair_derived(lanes, wo):
    """Shared per-evaluation quantities (bxdfs.cpp HairBxDF ctor + f)."""
    beta_m = jnp.clip(lanes.roughness, 1e-3, 1.0)
    beta_n = jnp.clip(lanes.roughness2, 1e-3, 1.0)
    h = lanes.h if lanes.h is not None else jnp.zeros_like(beta_m)
    eta = lanes.eta
    sigma_a = lanes.albedo2

    v0 = sqr(0.726 * beta_m + 0.812 * sqr(beta_m) + 3.7 * beta_m ** 20)
    vs = (v0, 0.25 * v0, 4.0 * v0, 4.0 * v0)
    s_az = 0.626657069 * (0.265 * beta_n + 1.194 * sqr(beta_n)
                          + 5.372 * beta_n ** 22)

    sin_to = jnp.clip(wo[..., 0], -1.0, 1.0)
    cos_to = safe_sqrt(1.0 - sqr(sin_to))
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])

    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))
    etap = safe_sqrt(sqr(eta) - sqr(sin_to)) / jnp.maximum(cos_to, 1e-6)
    sin_gt = h / jnp.maximum(etap, 1e-6)
    cos_gt = safe_sqrt(1.0 - sqr(sin_gt))
    gamma_t = jnp.arcsin(jnp.clip(sin_gt, -1.0, 1.0))
    sin_tt = sin_to / eta
    cos_tt = safe_sqrt(1.0 - sqr(sin_tt))

    # transmittance of one internal pass (bxdfs.cpp:~hair T)
    T = jnp.exp(-sigma_a * (2.0 * cos_gt / jnp.maximum(cos_tt, 1e-6))[..., None])

    # Ap attenuations
    cos_go = safe_sqrt(1.0 - sqr(h))
    f_fres = fresnel_dielectric(cos_to * cos_go, eta)
    A = [f_fres[..., None] * jnp.ones_like(T)]
    A.append(sqr(1.0 - f_fres)[..., None] * T)
    A.append(A[1] * T * f_fres[..., None])
    A.append(A[2] * f_fres[..., None] * T
             / jnp.maximum(1.0 - T * f_fres[..., None], 1e-4))

    # scale-tilt rotations sin/cos(2^k alpha), k=0..2
    alpha = lanes.alpha if lanes.alpha is not None else jnp.zeros_like(beta_m)
    s2k = [jnp.sin(alpha)]
    c2k = [safe_sqrt(1.0 - sqr(s2k[0]))]
    for _ in range(2):
        s2k.append(2.0 * c2k[-1] * s2k[-1])
        c2k.append(sqr(c2k[-1]) - sqr(s2k[-1]))
    return dict(vs=vs, s_az=s_az, sin_to=sin_to, cos_to=cos_to, phi_o=phi_o,
                gamma_o=gamma_o, gamma_t=gamma_t, T=T, A=A, s2k=s2k, c2k=c2k)


def _hair_tilted(d, p):
    """(sin,cos) of theta_o rotated by the p-th scale tilt
    (bxdfs.cpp Sample_f theta_op logic)."""
    sin_to, cos_to = d["sin_to"], d["cos_to"]
    s2k, c2k = d["s2k"], d["c2k"]
    if p == 0:
        s = sin_to * c2k[1] - cos_to * s2k[1]
        c = cos_to * c2k[1] + sin_to * s2k[1]
    elif p == 1:
        s = sin_to * c2k[0] + cos_to * s2k[0]
        c = cos_to * c2k[0] - sin_to * s2k[0]
    elif p == 2:
        s = sin_to * c2k[2] + cos_to * s2k[2]
        c = cos_to * c2k[2] - sin_to * s2k[2]
    else:
        s, c = sin_to, cos_to
    return s, jnp.abs(c)


def _hair_ap_pdf(d):
    """Lobe selection pmf from Ap luminances (bxdfs.cpp ApPDF)."""
    lum = [jnp.mean(a, -1) for a in d["A"]]
    tot = jnp.maximum(sum(lum), 1e-9)
    return [l_ / tot for l_ in lum]


def hair_f(lanes, wo, wi):
    """Hair BSDF value (bxdfs.cpp HairBxDF::f). (R,3)."""
    d = _hair_derived(lanes, wo)
    sin_ti = jnp.clip(wi[..., 0], -1.0, 1.0)
    cos_ti = safe_sqrt(1.0 - sqr(sin_ti))
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])
    phi = phi_i - d["phi_o"]
    fsum = jnp.zeros_like(lanes.albedo2)
    for p in range(_P_MAX):
        s_op, c_op = _hair_tilted(d, p)
        mp = _mp(cos_ti, c_op, sin_ti, s_op, d["vs"][p])
        np_ = _trimmed_logistic(_wrap_pi(phi - _hair_phi(p, d["gamma_o"],
                                                        d["gamma_t"])),
                                d["s_az"], -jnp.pi, jnp.pi)
        fsum = fsum + (mp * np_)[..., None] * d["A"][p]
    mp_max = _mp(cos_ti, d["cos_to"], sin_ti, d["sin_to"], d["vs"][_P_MAX])
    fsum = fsum + (mp_max / (2.0 * jnp.pi))[..., None] * d["A"][_P_MAX]
    abs_cos_wi = jnp.abs(wi[..., 2])
    return fsum / jnp.maximum(abs_cos_wi, 1e-5)[..., None]


def hair_pdf(lanes, wo, wi):
    """Hair sampling pdf (bxdfs.cpp HairBxDF::PDF). (R,)."""
    d = _hair_derived(lanes, wo)
    sin_ti = jnp.clip(wi[..., 0], -1.0, 1.0)
    cos_ti = safe_sqrt(1.0 - sqr(sin_ti))
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])
    phi = phi_i - d["phi_o"]
    ap_pdf = _hair_ap_pdf(d)
    pdf = jnp.zeros_like(sin_ti)
    for p in range(_P_MAX):
        s_op, c_op = _hair_tilted(d, p)
        mp = _mp(cos_ti, c_op, sin_ti, s_op, d["vs"][p])
        np_ = _trimmed_logistic(_wrap_pi(phi - _hair_phi(p, d["gamma_o"],
                                                        d["gamma_t"])),
                                d["s_az"], -jnp.pi, jnp.pi)
        pdf = pdf + ap_pdf[p] * mp * np_
    mp_max = _mp(cos_ti, d["cos_to"], sin_ti, d["sin_to"], d["vs"][_P_MAX])
    pdf = pdf + ap_pdf[_P_MAX] * mp_max / (2.0 * jnp.pi)
    return pdf


def hair_sample(lanes, wo, u_lobe, u2):
    """Sample the hair BSDF (bxdfs.cpp HairBxDF::Sample_f).

    Returns (wi, f, pdf). The fourth uniform is derived from the fractional
    expansion of u2[...,0] (documented precision trade)."""
    d = _hair_derived(lanes, wo)
    ap_pdf = _hair_ap_pdf(d)
    # lobe choice by cumulative ap_pdf
    c0 = ap_pdf[0]
    c1 = c0 + ap_pdf[1]
    c2 = c1 + ap_pdf[2]
    p_idx = (jnp.where(u_lobe < c0, 0,
             jnp.where(u_lobe < c1, 1,
             jnp.where(u_lobe < c2, 2, 3))))
    u1m = jnp.maximum(u2[..., 0] * 4096.0 - jnp.floor(u2[..., 0] * 4096.0),
                      1e-5)
    u1 = jnp.maximum(u2[..., 0], 1e-5)
    u_phi = u2[..., 1]

    sin_ti = jnp.zeros_like(u_lobe)
    cos_ti = jnp.zeros_like(u_lobe)
    phi = jnp.zeros_like(u_lobe)
    for p in range(_P_MAX + 1):
        sel = p_idx == p
        s_op, c_op = _hair_tilted(d, p)
        v = d["vs"][p]
        cos_t = 1.0 + v * jnp.log(jnp.maximum(
            u1 + (1.0 - u1) * jnp.exp(-2.0 / jnp.maximum(v, 1e-5)), 1e-12))
        sin_t = safe_sqrt(1.0 - sqr(cos_t))
        cos_phi_m = jnp.cos(2.0 * jnp.pi * u1m)
        s_ti = -cos_t * s_op + sin_t * cos_phi_m * c_op
        c_ti = safe_sqrt(1.0 - sqr(s_ti))
        if p < _P_MAX:
            dphi = _hair_phi(p, d["gamma_o"], d["gamma_t"]) \
                + _sample_trimmed_logistic(u_phi, d["s_az"], -jnp.pi, jnp.pi)
        else:
            dphi = 2.0 * jnp.pi * u_phi - jnp.pi
        sin_ti = jnp.where(sel, s_ti, sin_ti)
        cos_ti = jnp.where(sel, c_ti, cos_ti)
        phi = jnp.where(sel, dphi, phi)
    phi_i = d["phi_o"] + phi
    wi = jnp.stack([sin_ti, cos_ti * jnp.cos(phi_i),
                    cos_ti * jnp.sin(phi_i)], -1)
    f = hair_f(lanes, wo, wi)
    pdf = hair_pdf(lanes, wo, wi)
    return wi, f, pdf


def hair_sigma_a_from_reflectance(c, beta_n):
    """RGB reflectance -> fiber absorption (HairBxDF::SigmaAFromReflectance)."""
    import numpy as _np

    c = _np.clip(_np.asarray(c, _np.float64), 1e-4, 0.9999)
    denom = (5.969 - 0.215 * beta_n + 2.532 * beta_n**2 - 10.73 * beta_n**3
             + 5.574 * beta_n**4 + 0.245 * beta_n**5)
    return (_np.log(c) / denom) ** 2


# -- measured BRDF (materials.h MeasuredMaterial role) -----------------------


def _rusinkiewicz(wo, wi):
    """(theta_h, theta_d, phi_d) half/difference angles of (wo, wi) in the
    local frame (the MERL/measured-BRDF parameterization)."""
    wh = normalize(wo + wi)
    theta_h = jnp.arccos(jnp.clip(cos_theta(wh), -1.0, 1.0))
    # rotate wi into the half-vector frame
    from ..utils.vecmath import coordinate_system as _cs

    bi_n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), wh.shape)
    t1 = normalize(jnp.cross(bi_n, wh) + 1e-12)
    t2 = jnp.cross(wh, t1)
    wd = jnp.stack([dot(wi, t1), dot(wi, t2), dot(wi, wh)], -1)
    theta_d = jnp.arccos(jnp.clip(wd[..., 2], -1.0, 1.0))
    phi_d = jnp.arctan2(wd[..., 1], wd[..., 0]) % jnp.pi  # reciprocity fold
    return theta_h, theta_d, phi_d


def measured_f(lanes: BSDFLanes, wo, wi):
    """Trilinear table lookup of the measured BRDF. (R,3)."""
    if lanes.meas_bank is None:
        return jnp.zeros_like(lanes.albedo)
    bank = lanes.meas_bank
    K, Nh, Nd, Np_ = bank.shape[:4]
    th, td, pd = _rusinkiewicz(wo, wi)
    # MERL-style sqrt warp concentrates resolution near theta_h = 0
    fh = jnp.sqrt(jnp.clip(th / (jnp.pi / 2), 0.0, 1.0)) * (Nh - 1)
    fd = jnp.clip(td / (jnp.pi / 2), 0.0, 1.0) * (Nd - 1)
    fp = jnp.clip(pd / jnp.pi, 0.0, 1.0) * (Np_ - 1)
    mid = jnp.clip(lanes.meas_id if lanes.meas_id is not None else 0,
                   0, K - 1)

    def tri(f, n):
        i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, n - 1)
        i1 = jnp.minimum(i0 + 1, n - 1)
        return i0, i1, f - i0

    h0, h1, wh_ = tri(fh, Nh)
    d0, d1, wd_ = tri(fd, Nd)
    p0, p1, wp_ = tri(fp, Np_)
    out = jnp.zeros(wo.shape[:-1] + (3,))
    for hi, hw in ((h0, 1 - wh_), (h1, wh_)):
        for di, dw in ((d0, 1 - wd_), (d1, wd_)):
            for pi, pw in ((p0, 1 - wp_), (p1, wp_)):
                out = out + (hw * dw * pw)[..., None] * bank[mid, hi, di, pi]
    return jnp.maximum(out, 0.0)


def load_merl_brdf(path, out_res=(32, 16, 16)):
    """Read a MERL .binary BRDF and downsample to an (Nh,Nd,Np,3) table in
    the sqrt-warped Rusinkiewicz grid used by measured_f. MERL layout:
    three int32 dims (90,90,180) then float64 channels scaled by
    (1/1500, 1.15/1500, 1.66/1500)."""
    import numpy as _np

    with open(path, "rb") as f:
        dims = _np.fromfile(f, _np.int32, 3)
        n = int(dims[0] * dims[1] * dims[2])
        data = _np.fromfile(f, _np.float64, 3 * n)
    th_n, td_n, pd_n = int(dims[0]), int(dims[1]), int(dims[2])
    scale = _np.asarray([1.0 / 1500, 1.15 / 1500, 1.66 / 1500])
    vol = data.reshape(3, th_n, td_n, pd_n)
    vol = _np.moveaxis(vol, 0, -1) * scale  # (th, td, pd, 3)
    vol = _np.maximum(vol, 0.0)
    Nh, Nd, Np_ = out_res
    ih = _np.minimum((_np.arange(Nh) * th_n) // Nh, th_n - 1)
    idd = _np.minimum((_np.arange(Nd) * td_n) // Nd, td_n - 1)
    ip = _np.minimum((_np.arange(Np_) * pd_n) // Np_, pd_n - 1)
    return vol[_np.ix_(ih, idd, ip)].astype(_np.float32)


def make_lambertian_table(albedo, res=(32, 16, 16)):
    """Synthetic measured table of a Lambertian BRDF (tests/validation)."""
    import numpy as _np

    t = _np.empty(res + (3,), _np.float32)
    t[...] = _np.asarray(albedo, _np.float32) / _np.pi
    return t
