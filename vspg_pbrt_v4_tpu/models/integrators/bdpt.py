"""Bidirectional path tracing (BDPT), TPU-native.

Analog of the reference's ``BDPTIntegrator`` (cpu/integrators.h:700-780,
cpu/integrators.cpp:1599-2550: Vertex, GenerateCamera/LightSubpath,
RandomWalk, ConnectBDPT, MISWeight). The recursive vertex-pointer design
becomes fixed-size vertex SoA arrays: both subpaths are random walks of
static length K stored as (R, K, ...) stacked arrays, and every (s,t)
connection strategy is evaluated masked over all lanes — a static python
double loop over strategies, each one a fused shadow-ray + BSDF evaluation
+ closed-form MIS weight (the reference's ScopedAssignment pdf patching
becomes functional array substitution).

Scope: surface transport with finite lights (diffuse-area triangles,
point/spot/gonio/projection) plus uniform/image infinite lights (escaped
camera vertices, env SampleLe subpaths, InfiniteLightDensity MIS —
integrators.cpp:1994-2006, 2272-2279) and the perspective pinhole camera —
the reference likewise restricts BDPT to the perspective camera
(integrators.cpp:2520). Distant (delta-direction) lights ride the
infinite-endpoint machinery — disk-origin SampleLe subpaths, planar
PDFLight density, env-only PDFLightOrigin (Vertex::IsInfiniteLight
includes LightType::DeltaDirection, integrators.cpp:1714-1718). Portal
env lights are excluded from the strategies with a warning.

Conventions (identical to the reference):
- pdf_fwd / pdf_rev are *area-measure* densities (Vertex::ConvertDensity,
  integrators.cpp:1777-1789).
- the t=1 strategy splats through ``camera.sample_wi`` in the per-pixel
  importance measure (the film-resolution factor of pbrt-v4 issue #347 is
  built into We), with splat scale 1/(npix*spp).
- MIS: balance heuristic over all strategies via the remap0 ratio products
  (integrators.cpp MISWeight:2186-2260).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.intersect import offset_ray_origin
from ...utils.math import INV_PI, safe_div
from ...utils.sampling import (henyey_greenstein, sample_cosine_hemisphere,
                               sample_henyey_greenstein,
                               sample_uniform_sphere)
from ...utils.spectrum import average, sample_hero_channel
from ...utils.vecmath import (coordinate_system, cross, dot, face_forward,
                              length, normalize)
from ..film import pixel_coords
from ..materials import bsdf_f, bsdf_pdf, bsdf_sample
from ..samplers import LaneSampler
from .volpath import (Scene, VolPathConfig, _m, sample_medium_interaction,
                      transmittance_ratio_tracking)

INF = jnp.inf

VT_CAMERA, VT_LIGHT, VT_SURFACE, VT_MEDIUM = 0, 1, 2, 3


class Verts(NamedTuple):
    """Stacked subpath vertices; every field (R, K, ...)."""

    p: jnp.ndarray  # (R,K,3)
    ng: jnp.ndarray  # (R,K,3)
    ns: jnp.ndarray  # (R,K,3)
    beta: jnp.ndarray  # (R,K,3)
    pdf_fwd: jnp.ndarray  # (R,K) area measure
    pdf_rev: jnp.ndarray  # (R,K)
    mat_id: jnp.ndarray  # (R,K)
    uv: jnp.ndarray  # (R,K,2)
    light_id: jnp.ndarray  # (R,K) area-light id at the vertex (-1 none)
    vtype: jnp.ndarray  # (R,K)
    delta: jnp.ndarray  # (R,K) specular-connection flag (Vertex::delta)
    valid: jnp.ndarray  # (R,K)
    delta_light: jnp.ndarray  # (R,K) IsDeltaLight() of an endpoint (k=0)
    inf: jnp.ndarray  # (R,K) IsInfiniteLight(): escaped-ray / env endpoint
    med: jnp.ndarray  # (R,K) medium id the path was in arriving here (-1)
    g: jnp.ndarray  # (R,K) HG asymmetry at a VT_MEDIUM vertex

    @staticmethod
    def empty(R, K):
        z = jnp.zeros((R, K))
        z3 = jnp.zeros((R, K, 3))
        zi = jnp.full((R, K), -1, jnp.int32)
        zb = jnp.zeros((R, K), bool)
        return Verts(z3, z3, z3, z3, z, z, zi, jnp.zeros((R, K, 2)), zi,
                     jnp.zeros((R, K), jnp.int32), zb, zb, zb, zb,
                     jnp.full((R, K), -1, jnp.int32), z)

    def set(self, k, **kw):
        out = self
        for name, val in kw.items():
            arr = getattr(out, name)
            out = out._replace(**{name: arr.at[:, k].set(val)})
        return out


# ---------------------------------------------------------------------------
# pdf helpers (Vertex::ConvertDensity / PDF / PDFLight / PDFLightOrigin)
# ---------------------------------------------------------------------------


def convert_density(pdf_solid, from_p, to_p, to_ng, to_on_surface):
    """Solid-angle pdf at from_p -> area density at to_p
    (integrators.cpp:1777)."""
    w = to_p - from_p
    d2 = jnp.sum(w * w, -1)
    inv_d2 = safe_div(1.0, d2, 0.0)
    cos_term = jnp.where(to_on_surface,
                         jnp.abs(dot(to_ng, w)) * jnp.sqrt(inv_d2), 1.0)
    return jnp.where(d2 > 0, pdf_solid * cos_term * inv_d2, 0.0)


def _surface_pdf_dir(scene, mat_id, uv, p, ns, wo_world, wi_world):
    """BSDF sampling pdf (solid angle) at a stored surface vertex."""
    lanes = scene.materials.gather_textured(scene.textures, mat_id, uv, p)
    t1, t2 = coordinate_system(ns)

    def loc(w):
        return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], -1)

    return bsdf_pdf(lanes, loc(wo_world), loc(wi_world))


def _surface_f(scene, mat_id, uv, p, ns, wo_world, wi_world):
    """BSDF value at a stored surface vertex (no cosine)."""
    lanes = scene.materials.gather_textured(scene.textures, mat_id, uv, p)
    t1, t2 = coordinate_system(ns)

    def loc(w):
        return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], -1)

    return bsdf_f(lanes, loc(wo_world), loc(wi_world))


def _vertex_f(scene, v, k, wo_world, wi_world):
    """Vertex::f — BSDF value at a surface vertex, HG phase value at a
    medium vertex (integrators.cpp:1668-1680; sigma_s already rides in
    beta). Returns (R,3)."""
    is_med = v.vtype[:, k] == VT_MEDIUM
    f_s = _surface_f(scene, jnp.maximum(v.mat_id[:, k], 0), v.uv[:, k],
                     v.p[:, k], v.ns[:, k], wo_world, wi_world)
    p_m = henyey_greenstein(dot(wo_world, wi_world), v.g[:, k])
    return jnp.where(is_med[..., None], p_m[..., None], f_s)


def _vertex_pdf_dir(scene, v, k, wo_world, wi_world):
    """Vertex::PDF directional part (solid angle): BSDF pdf at a surface
    vertex, HG phase pdf (== value) at a medium vertex."""
    is_med = v.vtype[:, k] == VT_MEDIUM
    pdf_s = _surface_pdf_dir(scene, jnp.maximum(v.mat_id[:, k], 0),
                             v.uv[:, k], v.p[:, k], v.ns[:, k], wo_world,
                             wi_world)
    p_m = henyey_greenstein(dot(wo_world, wi_world), v.g[:, k])
    return jnp.where(is_med, p_m, pdf_s)


def _connectible(v, k):
    """Vertex::IsConnectible for stored interior vertices: non-specular
    surface vertices and medium vertices (integrators.cpp:1688-1703)."""
    return v.valid[:, k] & ~v.delta[:, k] \
        & ((v.vtype[:, k] == VT_SURFACE) | (v.vtype[:, k] == VT_MEDIUM))


def _tr_between(scene, cfg, sampler, p0, n0, on_surf0, med0, p1, active):
    """Spectral transmittance x visibility between two path vertices
    (ConnectBDPT's integrator.Tr, integrators.cpp:2420,2469): ratio-tracked
    through interface crossings, single hero-channel estimator. Returns
    (sampler, Tr (R,3)) — zero when occluded."""
    dvec = p1 - p0
    dist = length(dvec)
    w = dvec * safe_div(1.0, dist, 0.0)[..., None]
    o = jnp.where(on_surf0[..., None], offset_ray_origin(p0, n0, w), p0)
    sampler, u_h = sampler.get_1d()
    hero_idx = sample_hero_channel(u_h)
    sampler, T_ray, tr_l, tr_u = transmittance_ratio_tracking(
        scene, cfg, o, w, dist * (1.0 - 1e-3), med0, hero_idx, sampler,
        active)
    # single-strategy (shadow-ray) estimator: divide by the ratio-tracking
    # rescaled pdf r_l — E[T_ray / avg(r_l)] = Tr (volpath _combine_ld's
    # light-strategy term with r_p = 1)
    T = T_ray / jnp.maximum(average(tr_l), 1e-30)[..., None]
    return sampler, jnp.where(active[..., None], T, 0.0)


def _area_light_pdf_le_dir(lights, light_id, n_l, w):
    """Emission direction pdf (solid angle) of area light light_id along w
    (DiffuseAreaLight::PDF_Le): cosine-hemisphere, halved if two-sided."""
    if lights.n_area == 0:
        return jnp.zeros(w.shape[:-1])
    ai = jnp.clip(light_id, 0, lights.n_area - 1)
    cos_l = dot(n_l, w)
    two = lights.area_twosided[ai]
    pdf_one = jnp.maximum(cos_l, 0.0) * INV_PI
    pdf_two = jnp.abs(cos_l) * INV_PI * 0.5
    return jnp.where(two, pdf_two, pdf_one)


def _area_light_pdf_pos(lights, light_id):
    """1 / triangle area (Shape::PDF in area measure)."""
    if lights.n_area == 0:
        return jnp.zeros(light_id.shape, jnp.float32)
    ai = jnp.clip(light_id, 0, lights.n_area - 1)
    area2 = length(cross(lights.area_p1[ai] - lights.area_p0[ai],
                         lights.area_p2[ai] - lights.area_p0[ai]))
    return safe_div(1.0, 0.5 * area2, 0.0)


def _env_subpath_supported(lights):
    """The light-subpath sampler can start at the env light (SampleLe,
    lights.cpp:1042 UniformInfiniteLight / 1144 ImageInfiniteLight) except
    for portal env lights (PortalImageInfiniteLight::SampleLe is excluded
    with a warning in this build)."""
    return lights.has_env and lights.portal is None


def _subpath_light_pmf_table(lights):
    """Selection pmf over the lights the light-subpath sampler can start
    from: all emitters minus portal env (no SampleLe). Renormalized so
    PDFLightOrigin evaluations are consistent with _sample_le_detailed
    (integrators.cpp PdfLightOrigin uses the same sampler's pmf as
    GenerateLightSubpath). Distant lights are included: their subpaths
    start on a world-radius disk (DistantLight::SampleLe) and their
    endpoint vertices use the infinite-light MIS semantics —
    Vertex::IsInfiniteLight covers LightType::DeltaDirection
    (integrators.cpp:1714-1718)."""
    n = lights.n_lights
    n_emit = n if _env_subpath_supported(lights) else \
        n - (1 if lights.has_env else 0)
    t = lights.select_pmf_table[:max(n_emit, 1)]
    return t / jnp.maximum(jnp.sum(t), 1e-20)


def _env_subpath_pmf(lights):
    """Scalar selection pmf of the env light under the subpath sampler
    (the last table entry), 0 when the subpath can't start there."""
    if not _env_subpath_supported(lights):
        return 0.0
    t = _subpath_light_pmf_table(lights)
    return t[lights.n_lights - 1]


def _infinite_light_density(lights, wl):
    """InfiniteLightDensity (integrators.cpp:2272): solid-angle density of
    producing direction wl (toward the light) = env PDF_Li x the SUBPATH
    sampler's env selection pmf. This is Vertex::PDFLightOrigin for an
    infinite endpoint (integrators.cpp:1868-1870)."""
    return lights.env_pdf_dir(wl) * _env_subpath_pmf(lights)


def _light_select_pmf(lights, global_idx):
    """Subpath-sampler origin pmf of the light at global_idx (0 for lights
    the subpath sampler never starts from: portal env)."""
    t = _subpath_light_pmf_table(lights)
    gi = jnp.clip(global_idx, 0, t.shape[0] - 1)
    in_range = (global_idx >= 0) & (global_idx < t.shape[0])
    return jnp.where(in_range, t[gi], 0.0)


def _light_pdf_le_dir(lights, light_idx, n_l, w):
    """Solid-angle emission-direction pdf of finite light light_idx along w
    (the per-type PDF_Le dir, matching _sample_le_detailed's samplers):
    point/gonio uniform sphere, spot uniform cone, projection uniform image
    plane, area cosine hemisphere."""
    R = w.shape[:-1]
    pdf = jnp.zeros(R)
    idx = light_idx
    if lights.n_point > 0:
        sel = (idx >= 0) & (idx < lights.n_point)
        pdf = jnp.where(sel, INV_PI * 0.25, pdf)
    if lights.n_spot > 0:
        si = jnp.clip(idx - lights.n_point, 0, lights.n_spot - 1)
        ct_tot = lights.spot_cos_total[si]
        inside = dot(lights.spot_dir[si], w) >= ct_tot
        p_cone = safe_div(1.0, 2.0 * jnp.pi * (1.0 - ct_tot), 0.0)
        sel = (idx >= lights.n_point) & (idx < lights.n_point + lights.n_spot)
        pdf = jnp.where(sel, jnp.where(inside, p_cone, 0.0), pdf)
    if lights.n_gonio > 0:
        sel = (idx >= lights.base_gonio) & (idx < lights.base_proj)
        pdf = jnp.where(sel, INV_PI * 0.25, pdf)
    if lights.n_proj > 0:
        pi2 = jnp.clip(idx - lights.base_proj, 0, lights.n_proj - 1)
        tanf = lights.proj_tan[pi2]
        d_l = jnp.einsum("...ij,...j->...i", lights.proj_r[pi2], w)
        z = jnp.maximum(d_l[..., 2], 1e-9)
        inside = (d_l[..., 2] > 0) \
            & (jnp.abs(d_l[..., 0] / z) <= tanf) \
            & (jnp.abs(d_l[..., 1] / z) <= tanf)
        cos3 = jnp.clip(d_l[..., 2], 0.0, 1.0) ** 3
        p_plane = safe_div(1.0, (2.0 * tanf) ** 2 * cos3, 0.0)
        sel = (idx >= lights.base_proj) & (idx < lights.base_distant)
        pdf = jnp.where(sel, jnp.where(inside, p_plane, 0.0), pdf)
    if lights.n_area > 0:
        ai = jnp.clip(idx - lights.base_area, 0, lights.n_area - 1)
        sel = (idx >= lights.base_area) \
            & (idx < lights.base_area + lights.n_area)
        pdf_a = _area_light_pdf_le_dir(lights, ai, n_l, w)
        pdf = jnp.where(sel, pdf_a, pdf)
    return pdf


def _remap0(x):
    return jnp.where(x != 0.0, x, 1.0)


def _on_surface(v, k):
    """Vertex::IsOnSurface (ng != 0): surface vertices and area-light
    endpoints carry a geometric normal; point lights / the camera do not."""
    is_surf = v.vtype[:, k] == VT_SURFACE
    is_area_light = (v.vtype[:, k] == VT_LIGHT) \
        & (jnp.sum(v.ng[:, k] ** 2, -1) > 0.25)
    return is_surf | is_area_light


# ---------------------------------------------------------------------------
# Subpath random walks
# ---------------------------------------------------------------------------


def _advance_to_vertex(scene, cfg, sampler, o, d, beta, medium, alive):
    """Advance each lane to its next path event, passing through
    material-less interface crossings and delta-tracking any media along
    the way (RandomWalk's intersect + SampleT_maj block,
    integrators.cpp:2028-2130). Returns
    (sampler, beta, medium, ev_med, p_med, g_med, ev_surf, h*, ev_esc,
    alive) where h* is the surface-event hit record fields."""
    R = o.shape[0]
    z3 = jnp.zeros_like(o)
    zf = jnp.zeros((R,))
    zb = jnp.zeros((R,), bool)
    sampler, u_h = sampler.get_1d()
    hero_idx = sample_hero_channel(u_h)
    ones3 = jnp.ones_like(beta)
    # surface-event carry (p, n, ns, uv, mat_id, light_id, med_in, med_out)
    zi = jnp.full((R,), -1, jnp.int32)
    hs = (z3, z3, z3, jnp.zeros((R, 2)), zi, zi, zi, zi)

    def cond(c):
        return jnp.any(c[-2]) & (c[-1] < cfg.max_shadow_segments)

    def body(c):
        (sampler, o, d, beta, medium, ev_med, p_med, g_med, ev_surf, hs,
         ev_esc, alive, moving, it) = c
        h = scene.geometry.intersect(o, d, jnp.full((R,), INF))
        seg_end = jnp.where(h.hit, h.t, jnp.full((R,), 3e37))
        in_med = moving & (medium >= 0)
        mr = sample_medium_interaction(
            scene, cfg, o, d, seg_end, medium, hero_idx, sampler, beta,
            ones3, ones3, jnp.zeros_like(beta), jnp.zeros((R,), jnp.int32),
            in_med)
        sampler = mr.sampler
        beta = _m(in_med, mr.beta, beta)
        scat = in_med & mr.scattered
        ev_med = ev_med | scat
        p_med = _m(scat, o + mr.t_scatter[..., None] * d, p_med)
        g_med = jnp.where(scat, mr.g_scatter, g_med)
        dead = in_med & mr.terminated  # absorbed in the medium
        alive = alive & ~dead
        moving = moving & ~scat & ~dead
        # reached the segment end: material surface, interface, or escape
        surf = moving & h.hit & (h.mat_id >= 0)
        ev_surf = ev_surf | surf
        hf = (h.p, h.n, h.ns, h.uv, h.mat_id, h.light_id, h.med_in,
              h.med_out)
        hs = tuple(
            jnp.where(surf[..., None] if a.ndim > 1 else surf, a, b)
            for a, b in zip(hf, hs))
        esc = moving & ~h.hit
        ev_esc = ev_esc | esc
        # interface: pass through, switching medium by crossing side
        crossing = moving & h.hit & (h.mat_id < 0)
        new_med = jnp.where(dot(d, h.n) < 0, h.med_in, h.med_out)
        medium = jnp.where(crossing, new_med, medium)
        o = _m(crossing, offset_ray_origin(h.p, h.n, d), o)
        moving = moving & ~surf & ~esc
        return (sampler, o, d, beta, medium, ev_med, p_med, g_med, ev_surf,
                hs, ev_esc, alive, moving, it + 1)

    init = (sampler, o, d, beta, medium, zb, z3, zf, zb, hs, zb, alive,
            alive, jnp.int32(0))
    (sampler, _, _, beta, medium, ev_med, p_med, g_med, ev_surf, hs, ev_esc,
     alive, _, _) = jax.lax.while_loop(cond, body, init)
    return (sampler, beta, medium, ev_med, p_med, g_med, ev_surf, hs,
            ev_esc, alive)


def _random_walk(scene, sampler, v, k0, K, o, d, beta, pdf_solid, alive,
                 importance_mode, capture_escape=False, prev0_inf=None,
                 medium=None, cfg=None):
    """Extend a subpath from (o, d) writing vertices k0..K-1
    (integrators.cpp RandomWalk:2010-2178). With capture_escape (camera
    walks, integrators.cpp:2121-2130) an escaped ray writes an
    infinite-light endpoint vertex carrying the UNCONVERTED solid-angle
    pdf_fwd (Vertex::CreateLight(ei, beta, pdf)). prev0_inf marks lanes
    whose vertex 0 is an infinite light (light subpaths from the env):
    pdf_rev written back to it stays in solid-angle measure
    (ConvertDensity, integrators.cpp:1777-1780). With medium (per-lane
    start medium ids), participating media are delta-tracked between
    surfaces and real scatters become VT_MEDIUM vertices with HG phase
    sampling (Vertex::CreateMedium, integrators.cpp:2062-2100).
    Returns (sampler, verts)."""
    use_media = medium is not None
    if cfg is None:
        cfg = VolPathConfig()
    pdf_fwd_solid = pdf_solid
    prev_p = o
    wr = float(scene.lights.world_radius)
    R = o.shape[0]
    for k in range(k0, K):
        if use_media:
            (sampler, beta, medium, ev_med, p_med, g_med, hit, hf, ev_esc,
             alive) = _advance_to_vertex(scene, cfg, sampler, o, d, beta,
                                         medium, alive)
            (h_p, h_n, h_ns, h_uv, h_mat, h_light, h_med_in,
             h_med_out) = hf
            hit = alive & hit
            scat = alive & ev_med
            no_hit = ev_esc
        else:
            t_far = jnp.full_like(o[..., 0], INF)
            h = scene.geometry.intersect(o, d, t_far)
            hit = alive & h.hit & (h.mat_id >= 0)
            h_p, h_n, h_ns, h_uv = h.p, h.n, h.ns, h.uv
            h_mat, h_light = h.mat_id, h.light_id
            scat = jnp.zeros((R,), bool)
            no_hit = ~h.hit
        if capture_escape:
            esc = alive & no_hit
            v = v.set(
                k,
                p=_m(esc, prev_p + d * (2.0 * wr), v.p[:, k]),
                ns=_m(esc, d, v.ns[:, k]),  # escape direction (ng stays 0)
                beta=_m(esc, beta, v.beta[:, k]),
                pdf_fwd=jnp.where(esc, pdf_fwd_solid, v.pdf_fwd[:, k]),
                vtype=jnp.where(esc, VT_LIGHT, v.vtype[:, k]),
                inf=v.inf[:, k] | esc,
                valid=v.valid[:, k] | esc,
            )
        alive = hit | scat
        ns = face_forward(h_ns, h_n)
        # vertex spatial density: area measure at surfaces (|cos| d^-2),
        # plain d^-2 at medium vertices (ConvertDensity)
        vtx_p = _m(scat, p_med, h_p) if use_media else h_p
        on_surf_new = hit & ~scat
        pdf_fwd_area = convert_density(pdf_fwd_solid, prev_p, vtx_p,
                                       h_n, on_surf_new)
        v = v.set(
            k,
            p=_m(hit | scat, vtx_p, v.p[:, k]),
            ng=_m(hit & ~scat, h_n, v.ng[:, k]),
            ns=_m(hit & ~scat, ns, v.ns[:, k]),
            beta=_m(hit | scat, beta, v.beta[:, k]),
            pdf_fwd=jnp.where(hit | scat, pdf_fwd_area, v.pdf_fwd[:, k]),
            mat_id=jnp.where(hit & ~scat, h_mat, v.mat_id[:, k]),
            uv=_m(hit & ~scat, h_uv, v.uv[:, k]),
            light_id=jnp.where(hit & ~scat, h_light, v.light_id[:, k]),
            vtype=jnp.where(scat, VT_MEDIUM,
                            jnp.where(hit, VT_SURFACE, v.vtype[:, k])),
            med=(jnp.where(hit | scat, medium, v.med[:, k])
                 if use_media else v.med[:, k]),
            g=jnp.where(scat, g_med, v.g[:, k]) if use_media else v.g[:, k],
            valid=v.valid[:, k] | hit | scat,
        )
        if k == K - 1:
            break
        # --- surface BSDF sampling ---
        lanes = scene.materials.gather_textured(
            scene.textures, jnp.maximum(h_mat, 0), h_uv, h_p)
        t1, t2 = coordinate_system(ns)

        def loc(w):
            return jnp.stack([dot(w, t1), dot(w, t2), dot(w, ns)], -1)

        def unloc(w):
            return w[..., 0:1] * t1 + w[..., 1:2] * t2 + w[..., 2:3] * ns

        wo_l = loc(-d)
        sampler, u_lobe = sampler.get_1d()
        sampler, u2 = sampler.get_2d()
        bs = bsdf_sample(lanes, wo_l, u_lobe, u2)
        ok_s = hit & ~scat & bs.valid & (bs.pdf > 0)
        wi_w = normalize(unloc(bs.wi))
        cos_wi = jnp.abs(dot(wi_w, ns))
        beta_new = beta * bs.f * cos_wi[..., None] \
            / jnp.maximum(bs.pdf, 1e-30)[..., None]
        if importance_mode:
            # radiance carries 1/eta^2 on refraction; importance does not
            eta2 = jnp.where(bs.is_transmission, bs.eta**2, 1.0)
            beta_new = beta_new * eta2[..., None]
        # reverse pdf at the previous vertex; specular lobes are deltas
        pdf_rev_solid = bsdf_pdf(lanes, loc(wi_w), wo_l)
        pdf_rev_solid = jnp.where(bs.is_specular, 0.0, pdf_rev_solid)
        new_pdf_fwd_solid = jnp.where(bs.is_specular, 0.0, bs.pdf)
        new_o = offset_ray_origin(h_p, h_n, wi_w)
        new_d = wi_w
        is_spec = bs.is_specular
        ok = ok_s
        if use_media:
            # --- HG phase sampling at a medium scatter vertex ---
            sampler, u2m = sampler.get_2d()
            wi_m, pdf_m = sample_henyey_greenstein(-d, g_med, u2m)
            ok_m = scat & (pdf_m > 0)
            # beta *= p/pdf == 1 for exact HG sampling
            beta_new = _m(scat, beta, beta_new)
            pdf_rev_solid = jnp.where(
                scat, henyey_greenstein(dot(wi_m, -d), g_med),
                pdf_rev_solid)
            new_pdf_fwd_solid = jnp.where(scat, pdf_m, new_pdf_fwd_solid)
            new_o = _m(scat, p_med, new_o)
            new_d = _m(scat, wi_m, new_d)
            is_spec = jnp.where(scat, False, is_spec)
            ok = ok_s | ok_m
            # reflection keeps the medium; only true crossings adopt
            # the far side's label (volpath_bounce's round-5 robust rule)
            wi_front_b = dot(wi_w, h_n) > 0
            arr_front_b = dot(d, h_n) < 0
            crossed_b = ok_s & (wi_front_b != arr_front_b)
            med_new = jnp.where(wi_front_b, h_med_out, h_med_in)
            medium = jnp.where(crossed_b, med_new, medium)
        if k > 0:
            prev_on_surface = _on_surface(v, k - 1)
            pdf_rev_area = convert_density(pdf_rev_solid, vtx_p,
                                           v.p[:, k - 1],
                                           v.ng[:, k - 1], prev_on_surface)
            if k == 1 and prev0_inf is not None:
                # toward an infinite endpoint the density stays solid-angle
                pdf_rev_area = jnp.where(prev0_inf, pdf_rev_solid,
                                         pdf_rev_area)
            v = v.set(k - 1, pdf_rev=jnp.where(ok, pdf_rev_area,
                                               v.pdf_rev[:, k - 1]))
        v = v.set(k, delta=jnp.where(ok, is_spec, v.delta[:, k]))
        pdf_fwd_solid = new_pdf_fwd_solid
        prev_p = vtx_p
        o = new_o
        d = new_d
        beta = _m(ok, beta_new, beta)
        alive = ok & (jnp.max(beta, -1) > 0)
    return sampler, v


def generate_camera_subpath(scene, camera, sampler, pixel_id, K,
                            camera_medium=-1, cfg=None, use_media=False):
    """(integrators.cpp GenerateCameraSubpath:1939). Vertex 0 = the pinhole;
    the walk fills 1..K-1."""
    R = pixel_id.shape[0]
    v = Verts.empty(R, K)
    pix = pixel_coords(camera.resolution)[pixel_id]
    sampler, u_pix = sampler.get_2d()
    p_raster = pix.astype(jnp.float32) + u_pix
    sampler, u_lens = sampler.get_2d()
    o, d = camera.generate_rays(p_raster, u_lens)
    cam_p = jnp.broadcast_to(camera.origin_world, o.shape)
    ones = jnp.ones_like(o)
    med0 = jnp.full(R, camera_medium, jnp.int32)
    v = v.set(0, p=cam_p, beta=ones, pdf_fwd=jnp.ones(R),
              vtype=jnp.full(R, VT_CAMERA, jnp.int32),
              med=med0, valid=jnp.ones(R, bool))
    pdf_dir = camera.pdf_we_dir(d)
    sampler, v = _random_walk(scene, sampler, v, 1, K, o, d, ones, pdf_dir,
                              jnp.ones(R, bool), importance_mode=False,
                              capture_escape=_env_subpath_supported(
                                  scene.lights),
                              medium=med0 if use_media else None, cfg=cfg)
    return sampler, v


def _sample_le_detailed(lights, sampler):
    """Light subpath origin with separate densities
    (GenerateLightSubpath:1956-1989): point/spot/gonio/projection/area
    emitters plus the (non-portal) env light; pmf = the renormalized
    subpath selection table."""
    sampler, u_sel = sampler.get_1d()
    sampler, u_side = sampler.get_1d()
    sampler, u2a = sampler.get_2d()
    sampler, u2b = sampler.get_2d()
    R = u_sel.shape
    n = lights.n_lights
    n_emit = n if _env_subpath_supported(lights) else \
        n - (1 if lights.has_env else 0)
    z3 = jnp.zeros(R + (3,))
    out = dict(p=z3, d=z3, Le=z3, n_l=z3,
               pdf_pos=jnp.zeros(R), pdf_dir=jnp.zeros(R),
               pmf=jnp.zeros(R), light_id=jnp.full(R, -1, jnp.int32),
               is_delta=jnp.zeros(R, bool), on_surface=jnp.zeros(R, bool),
               is_env=jnp.zeros(R, bool), is_dist=jnp.zeros(R, bool),
               valid=jnp.zeros(R, bool))
    if n_emit == 0:
        return sampler, out
    pmf_t = _subpath_light_pmf_table(lights)
    cdf = jnp.cumsum(pmf_t)
    idx = jnp.minimum(
        jnp.sum((u_sel[..., None] >= cdf).astype(jnp.int32), -1), n_emit - 1)
    pmf = jnp.maximum(pmf_t[idx], 1e-20)

    if lights.n_point > 0:
        pi = jnp.clip(idx, 0, lights.n_point - 1)
        sel = idx < lights.n_point
        d_p = sample_uniform_sphere(u2a)
        out["p"] = _m(sel, lights.point_p[pi], out["p"])
        out["d"] = _m(sel, d_p, out["d"])
        out["Le"] = _m(sel, lights.point_I[pi], out["Le"])
        out["pdf_pos"] = jnp.where(sel, 1.0, out["pdf_pos"])
        out["pdf_dir"] = jnp.where(sel, INV_PI * 0.25, out["pdf_dir"])
        out["pmf"] = jnp.where(sel, pmf, out["pmf"])
        out["is_delta"] = out["is_delta"] | sel
        out["valid"] = out["valid"] | sel

    if lights.n_spot > 0:
        # uniform-cone direction sampling (SpotLight::SampleLe analog; the
        # smoothstep falloff rides in Le, the pdf is the cone's)
        si = jnp.clip(idx - lights.n_point, 0, lights.n_spot - 1)
        sel = (idx >= lights.n_point) & (idx < lights.n_point + lights.n_spot)
        ct_tot = lights.spot_cos_total[si]
        cos_t = 1.0 - u2a[..., 0] * (1.0 - ct_tot)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))
        phi = 2.0 * jnp.pi * u2a[..., 1]
        axis = lights.spot_dir[si]
        t1, t2 = coordinate_system(axis)
        d_s = (jnp.cos(phi) * sin_t)[..., None] * t1 \
            + (jnp.sin(phi) * sin_t)[..., None] * t2 \
            + cos_t[..., None] * axis
        tt = safe_div(cos_t - ct_tot, lights.spot_cos_start[si] - ct_tot)
        fall = jnp.clip(tt, 0.0, 1.0)
        fall = fall * fall * (3.0 - 2.0 * fall)
        pdf_dir = safe_div(1.0, 2.0 * jnp.pi * (1.0 - ct_tot), 0.0)
        out["p"] = _m(sel, lights.spot_p[si], out["p"])
        out["d"] = _m(sel, d_s, out["d"])
        out["Le"] = _m(sel, lights.spot_I[si] * fall[..., None], out["Le"])
        out["pdf_pos"] = jnp.where(sel, 1.0, out["pdf_pos"])
        out["pdf_dir"] = jnp.where(sel, pdf_dir, out["pdf_dir"])
        out["pmf"] = jnp.where(sel, pmf, out["pmf"])
        out["is_delta"] = out["is_delta"] | sel
        out["valid"] = out["valid"] | (sel & (pdf_dir > 0))

    if lights.n_gonio > 0:
        gi = jnp.clip(idx - lights.base_gonio, 0, lights.n_gonio - 1)
        sel = (idx >= lights.base_gonio) & (idx < lights.base_proj)
        d_g = sample_uniform_sphere(u2a)
        I_g = lights.gonio_I[gi] * lights._gonio_scale(gi, d_g)
        out["p"] = _m(sel, lights.gonio_p[gi], out["p"])
        out["d"] = _m(sel, d_g, out["d"])
        out["Le"] = _m(sel, I_g, out["Le"])
        out["pdf_pos"] = jnp.where(sel, 1.0, out["pdf_pos"])
        out["pdf_dir"] = jnp.where(sel, INV_PI * 0.25, out["pdf_dir"])
        out["pmf"] = jnp.where(sel, pmf, out["pmf"])
        out["is_delta"] = out["is_delta"] | sel
        out["valid"] = out["valid"] | sel

    if lights.n_proj > 0:
        # uniform on the z=1 image plane inside the frustum
        # (ProjectionLight::SampleLe analog, mirrors Lights.sample_le)
        pi2 = jnp.clip(idx - lights.base_proj, 0, lights.n_proj - 1)
        sel = (idx >= lights.base_proj) & (idx < lights.base_distant)
        tanf = lights.proj_tan[pi2]
        x = (2.0 * u2a[..., 0] - 1.0) * tanf
        y = (2.0 * u2a[..., 1] - 1.0) * tanf
        d_l = normalize(jnp.stack([x, y, jnp.ones_like(x)], -1))
        d_w = jnp.einsum("...ji,...j->...i", lights.proj_r[pi2], d_l)
        cos3 = d_l[..., 2] ** 3
        pdf_dir = safe_div(1.0, (2.0 * tanf) ** 2 * cos3, 0.0)
        I_p = lights.proj_I[pi2] * lights._proj_scale(pi2, d_w)
        out["p"] = _m(sel, lights.proj_p[pi2], out["p"])
        out["d"] = _m(sel, d_w, out["d"])
        out["Le"] = _m(sel, I_p, out["Le"])
        out["pdf_pos"] = jnp.where(sel, 1.0, out["pdf_pos"])
        out["pdf_dir"] = jnp.where(sel, pdf_dir, out["pdf_dir"])
        out["pmf"] = jnp.where(sel, pmf, out["pmf"])
        out["is_delta"] = out["is_delta"] | sel
        out["valid"] = out["valid"] | (sel & (pdf_dir > 0))

    if lights.n_distant > 0:
        # DistantLight::SampleLe (lights.cpp): fixed travel direction,
        # origin on a world-radius disk tangent to the world sphere;
        # pdf_pos = 1/(pi r^2), pdf_dir delta (= 1 for the sampled ray)
        di = jnp.clip(idx - lights.base_distant, 0, lights.n_distant - 1)
        sel = (idx >= lights.base_distant) & (idx < lights.base_area)
        d_dst = normalize(lights.distant_dir[di])
        t1d, t2d = coordinate_system(d_dst)
        from ...utils.sampling import sample_uniform_disk_concentric

        cdd = sample_uniform_disk_concentric(u2a) * lights.world_radius
        p_dst = cdd[..., 0:1] * t1d + cdd[..., 1:2] * t2d \
            - d_dst * lights.world_radius
        pdf_pos_d = 1.0 / (jnp.pi * lights.world_radius ** 2)
        out["p"] = _m(sel, p_dst, out["p"])
        out["d"] = _m(sel, d_dst, out["d"])
        out["Le"] = _m(sel, lights.distant_L[di], out["Le"])
        out["pdf_pos"] = jnp.where(sel, pdf_pos_d, out["pdf_pos"])
        out["pdf_dir"] = jnp.where(sel, 1.0, out["pdf_dir"])
        out["pmf"] = jnp.where(sel, pmf, out["pmf"])
        out["is_delta"] = out["is_delta"] | sel  # DeltaDirection
        out["is_dist"] = out["is_dist"] | sel
        out["valid"] = out["valid"] | sel

    if lights.n_area > 0:
        base = lights.base_area
        ai = jnp.clip(idx - base, 0, lights.n_area - 1)
        sel = (idx >= base) & (idx < base + lights.n_area)
        from ...utils.sampling import sample_uniform_triangle

        b = sample_uniform_triangle(u2a)
        p0, p1, p2 = (lights.area_p0[ai], lights.area_p1[ai],
                      lights.area_p2[ai])
        p_l = b[..., 0:1] * p0 + b[..., 1:2] * p1 + b[..., 2:3] * p2
        nc = cross(p1 - p0, p2 - p0)
        area2 = length(nc)
        nl = nc * safe_div(1.0, area2, 0.0)[..., None]
        two = lights.area_twosided[ai]
        flip = two & (u_side < 0.5)
        nl = jnp.where(flip[..., None], -nl, nl)
        t1, t2 = coordinate_system(nl)
        dl = sample_cosine_hemisphere(u2b)
        d_a = dl[..., 0:1] * t1 + dl[..., 1:2] * t2 + dl[..., 2:3] * nl
        cos_l = jnp.maximum(dl[..., 2], 0.0)
        pdf_dir = cos_l * INV_PI * jnp.where(two, 0.5, 1.0)
        out["p"] = _m(sel, p_l, out["p"])
        out["d"] = _m(sel, d_a, out["d"])
        out["Le"] = _m(sel, lights.area_L[ai], out["Le"])
        out["n_l"] = _m(sel, nl, out["n_l"])
        out["pdf_pos"] = jnp.where(sel, safe_div(1.0, 0.5 * area2, 0.0),
                                   out["pdf_pos"])
        out["pdf_dir"] = jnp.where(sel, pdf_dir, out["pdf_dir"])
        out["pmf"] = jnp.where(sel, pmf, out["pmf"])
        out["light_id"] = jnp.where(sel, ai, out["light_id"])
        out["on_surface"] = out["on_surface"] | sel
        out["valid"] = out["valid"] | (sel & (area2 > 0) & (pdf_dir > 0))

    if _env_subpath_supported(lights):
        # UniformInfiniteLight/ImageInfiniteLight::SampleLe
        # (lights.cpp:1042-1058, 1144-1166): direction wl toward the light,
        # ray into the scene from a disk of world_radius tangent to the
        # world sphere (scene center taken as the origin).
        sel = idx == n - 1
        wl, Le_e, pdf_dir_e = lights.sample_env_dir(u2a)
        d_e = -wl
        t1, t2 = coordinate_system(d_e)
        from ...utils.sampling import sample_uniform_disk_concentric

        cd = sample_uniform_disk_concentric(u2b) * lights.world_radius
        p_e = cd[..., 0:1] * t1 + cd[..., 1:2] * t2 \
            - d_e * lights.world_radius
        pdf_pos_e = 1.0 / (jnp.pi * lights.world_radius ** 2)
        out["p"] = _m(sel, p_e, out["p"])
        out["d"] = _m(sel, d_e, out["d"])
        out["Le"] = _m(sel, Le_e, out["Le"])
        out["pdf_pos"] = jnp.where(sel, pdf_pos_e, out["pdf_pos"])
        out["pdf_dir"] = jnp.where(sel, pdf_dir_e, out["pdf_dir"])
        out["pmf"] = jnp.where(sel, pmf, out["pmf"])
        out["is_env"] = out["is_env"] | sel
        out["valid"] = out["valid"] | (sel & (pdf_dir_e > 0))
    return sampler, out


def generate_light_subpath(scene, sampler, R, K, light_medium=-1, cfg=None,
                           use_media=False):
    """(integrators.cpp GenerateLightSubpath:1956). light_medium: the
    medium id surrounding the scene's emitters (single ambient value, the
    MediumInterface of each light in the reference)."""
    v = Verts.empty(R, K)
    sampler, le = _sample_le_detailed(scene.lights, sampler)
    ok = le["valid"]
    # infinite endpoints = env AND distant (Vertex::IsInfiniteLight covers
    # LightType::DeltaDirection, integrators.cpp:1714-1718)
    env = le["is_env"] | le["is_dist"]
    p_l = le["pmf"] * le["pdf_pos"]
    # infinite endpoints: pdf_fwd is the solid-angle InfiniteLightDensity
    # of the sampled direction (integrators.cpp:2002-2005) — 0 for a
    # distant light with no env (delta direction; remap0 treats it as 1)
    pdf_fwd0 = jnp.where(env,
                         _infinite_light_density(scene.lights, -le["d"]), p_l)
    v = v.set(
        0,
        p=_m(ok, le["p"], v.p[:, 0]),
        ng=_m(ok, le["n_l"], v.ng[:, 0]),
        ns=_m(ok, le["n_l"], v.ns[:, 0]),
        beta=_m(ok, le["Le"] / jnp.maximum(p_l, 1e-30)[..., None],
                v.beta[:, 0]),
        pdf_fwd=jnp.where(ok, pdf_fwd0, v.pdf_fwd[:, 0]),
        light_id=jnp.where(ok, le["light_id"], v.light_id[:, 0]),
        vtype=jnp.full(R, VT_LIGHT, jnp.int32),
        # Vertex::delta stays FALSE for light endpoints (it flags specular
        # CONNECTIONS); the light's delta-ness is IsDeltaLight, used only
        # to exclude the hypothetical s'=0 strategy (integrators.cpp:2254)
        delta_light=jnp.where(ok, le["is_delta"], v.delta_light[:, 0]),
        inf=env,
        med=jnp.full(R, light_medium, jnp.int32),
        valid=ok,
    )
    cos0 = jnp.where(le["on_surface"], jnp.abs(dot(le["n_l"], le["d"])), 1.0)
    beta = le["Le"] * cos0[..., None] \
        / jnp.maximum(p_l * le["pdf_dir"], 1e-30)[..., None]
    o = jnp.where(le["on_surface"][..., None],
                  offset_ray_origin(le["p"], le["n_l"], le["d"]), le["p"])
    sampler, v = _random_walk(scene, sampler, v, 1, K, o, le["d"], beta,
                              le["pdf_dir"], ok, importance_mode=True,
                              prev0_inf=env,
                              medium=(jnp.full(R, light_medium, jnp.int32)
                                      if use_media else None), cfg=cfg)
    # env/distant subpath: the first hit's spatial density is pdfPos x
    # |cos| (integrators.cpp:1995-2000) — the direction was the
    # "position" sample
    if scene.lights.has_env or scene.lights.n_distant > 0:
        fix1 = env & v.valid[:, 1]
        # |cos| only at surface vertices (pbrt guards with IsOnSurface();
        # a medium vertex has ng = 0 and carries no cosine)
        pdf1 = le["pdf_pos"] * jnp.where(
            _on_surface(v, 1), jnp.abs(dot(le["d"], v.ng[:, 1])), 1.0)
        v = v._replace(pdf_fwd=v.pdf_fwd.at[:, 1].set(
            jnp.where(fix1, pdf1, v.pdf_fwd[:, 1])))
    return sampler, v


# ---------------------------------------------------------------------------
# Connections + MIS
# ---------------------------------------------------------------------------


def _visible(scene, p0, n0, p1, active):
    """Binary visibility between two points (Tr without media)."""
    d = p1 - p0
    dist = length(d)
    w = d * safe_div(1.0, dist, 0.0)[..., None]
    o = offset_ray_origin(p0, n0, w)
    h = scene.geometry.intersect(o, w, dist * (1.0 - 1e-3))
    blocked = h.hit & (h.mat_id >= 0) & (h.t < dist * (1.0 - 1e-3))
    return active & ~blocked


def _mis_weight(lv, cv, s, t, patch, pdf_fwd_light0=None,
                is_delta_light0=None):
    """MISWeight (integrators.cpp:2186): balance heuristic via the
    remap0-ratio walk, with this strategy's endpoint pdf/delta patches
    applied functionally. `patch`: (side, k) -> pdf_rev override,
    ("delta", side, k) -> forced delta. For s=1, pdf_fwd_light0 /
    is_delta_light0 describe the resampled light vertex."""
    R = cv.p.shape[0]
    if s + t == 2:
        return jnp.ones(R)

    def pr(side, k):
        key = (side, k)
        if key in patch:
            return patch[key]
        v = cv if side == "cam" else lv
        return v.pdf_rev[:, k]

    def pf(side, k):
        if side == "light" and k == 0 and pdf_fwd_light0 is not None:
            return pdf_fwd_light0
        v = cv if side == "cam" else lv
        return v.pdf_fwd[:, k]

    def dl(side, k):
        key = ("delta", side, k)
        if key in patch:
            return patch[key]
        v = cv if side == "cam" else lv
        return v.delta[:, k]

    sum_ri = jnp.zeros(R)
    ri = jnp.ones(R)
    for i in range(t - 1, 0, -1):
        ri = ri * _remap0(pr("cam", i)) / _remap0(pf("cam", i))
        use = ~dl("cam", i) & ~dl("cam", i - 1)
        sum_ri = sum_ri + jnp.where(use, ri, 0.0)
    ri = jnp.ones(R)
    for i in range(s - 1, -1, -1):
        ri = ri * _remap0(pr("light", i)) / _remap0(pf("light", i))
        if i > 0:
            delta_prev = dl("light", i - 1)
        else:
            # the light endpoint itself: excluded if it is a delta light
            # (IsDeltaLight, integrators.cpp:2254-2257)
            delta_prev = (is_delta_light0 if is_delta_light0 is not None
                          else lv.delta_light[:, 0])
        use = ~dl("light", i) & ~delta_prev
        sum_ri = sum_ri + jnp.where(use, ri, 0.0)
    return 1.0 / (1.0 + sum_ri)


def connect(scene, camera, sampler, lv, cv, s, t, cfg=None, use_media=False):
    """One (s,t) strategy for all lanes (ConnectBDPT, integrators.cpp:2387).
    With use_media, connections are weighted by ratio-tracked transmittance
    (integrator.Tr) and medium vertices connect through their HG phase.

    Returns (sampler, L (R,3), splat_pixel (R,) or None)."""
    R = cv.p.shape[0]
    zero3 = jnp.zeros((R, 3))
    false_r = jnp.zeros(R, bool)
    patch = {}

    def tr_or_visible(sampler, v_from, k_from, p_to, active):
        """Tr (R,3) between a stored vertex and a point (1s/0s without
        media)."""
        if use_media:
            return _tr_between(scene, cfg, sampler, v_from.p[:, k_from],
                               v_from.ng[:, k_from],
                               _on_surface(v_from, k_from),
                               v_from.med[:, k_from], p_to, active)
        vis = _visible(scene, v_from.p[:, k_from], v_from.ng[:, k_from],
                       p_to, active)
        return sampler, vis[..., None].astype(jnp.float32)

    if s == 0:
        # the camera subpath hit an emitter (or escaped to the env light):
        # interpret it as a complete path (integrators.cpp:2398-2402)
        pt_valid = cv.valid[:, t - 1]
        lid = cv.light_id[:, t - 1]
        is_inf = cv.inf[:, t - 1]
        d_esc = cv.ns[:, t - 1]  # stored escape direction of an inf vertex
        emissive = pt_valid & ((lid >= 0) | is_inf)
        wo = normalize(cv.p[:, t - 2] - cv.p[:, t - 1])
        Le = scene.lights.le_area(lid, wo, cv.ng[:, t - 1])
        if scene.lights.has_env:
            Le = jnp.where(is_inf[..., None],
                           scene.lights.le_escaped(d_esc), Le)
        L = jnp.where(emissive[..., None], cv.beta[:, t - 1] * Le, zero3)
        ok = emissive & (average(L) > 0)
        base_idx = scene.lights.base_area + jnp.maximum(lid, 0)
        # pt.pdfRev = PDFLightOrigin: area pmf/area; env InfiniteLightDensity
        # in solid-angle measure (integrators.cpp:1862-1882)
        origin_pdf = jnp.where(
            emissive,
            _light_select_pmf(scene.lights, base_idx)
            * _area_light_pdf_pos(scene.lights, lid), 0.0)
        if scene.lights.has_env:
            origin_pdf = jnp.where(
                is_inf, _infinite_light_density(scene.lights, d_esc),
                origin_pdf)
        patch[("cam", t - 1)] = origin_pdf
        patch[("delta", "cam", t - 1)] = false_r
        if t > 1:
            w_pm = cv.p[:, t - 2] - cv.p[:, t - 1]
            d2 = jnp.sum(w_pm * w_pm, -1)
            w_n = w_pm * safe_div(1.0, jnp.sqrt(d2), 0.0)[..., None]
            pdf_dir = _area_light_pdf_le_dir(scene.lights, lid,
                                             cv.ng[:, t - 1], w_n)
            cos_pm = jnp.where(_on_surface(cv, t - 2),
                               jnp.abs(dot(cv.ng[:, t - 2], w_n)), 1.0)
            pl = pdf_dir * safe_div(1.0, d2, 0.0) * cos_pm
            if scene.lights.has_env:
                # ptMinus.pdfRev = PDFLight: planar density 1/(pi r^2) x
                # |cos| at ptMinus, no 1/d^2 (integrators.cpp:1830-1837)
                cos_inf = jnp.where(_on_surface(cv, t - 2),
                                    jnp.abs(dot(cv.ng[:, t - 2], d_esc)), 1.0)
                wr = float(scene.lights.world_radius)
                pl = jnp.where(is_inf,
                               cos_inf / (jnp.pi * wr * wr), pl)
            patch[("cam", t - 2)] = pl
        w = _mis_weight(lv, cv, s, t, patch)
        return sampler, jnp.where(ok[..., None], L * w[..., None], zero3), None

    if t == 1:
        # connect a light-subpath vertex to the camera (splat)
        qs_ok = _connectible(lv, s - 1)
        on_q = _on_surface(lv, s - 1)
        qp = lv.p[:, s - 1]
        valid_c, pixel_id, wi, dist, we = camera.sample_wi(qp)
        ok = qs_ok & valid_c
        wo_q = normalize(lv.p[:, s - 2] - qp)
        f_q = _vertex_f(scene, lv, s - 1, wo_q, wi)
        cos_q = jnp.where(on_q, jnp.abs(dot(wi, lv.ns[:, s - 1])), 1.0)
        cam_p = jnp.broadcast_to(camera.origin_world, qp.shape)
        sampler, Tr = tr_or_visible(sampler, lv, s - 1, cam_p, ok)
        L = lv.beta[:, s - 1] * f_q * Tr \
            * (cos_q * we / jnp.maximum(dist * dist, 1e-12))[..., None]
        ok = ok & (average(L) > 0)
        # qs.pdfRev = camera ray density toward qs (area measure)
        patch[("light", s - 1)] = convert_density(
            camera.pdf_we_dir(-wi), cam_p, qp, lv.ng[:, s - 1], on_q)
        patch[("delta", "light", s - 1)] = false_r
        if s > 1:
            # qsMinus.pdfRev = qs scatter pdf back toward qsMinus given wi
            back_solid = _vertex_pdf_dir(scene, lv, s - 1, wi, wo_q)
            back_conv = convert_density(back_solid, qp, lv.p[:, s - 2],
                                        lv.ng[:, s - 2],
                                        _on_surface(lv, s - 2))
            if s == 2:
                back_conv = jnp.where(lv.inf[:, 0], back_solid, back_conv)
            patch[("light", s - 2)] = back_conv
        w = _mis_weight(lv, cv, s, t, patch)
        L = jnp.where(ok[..., None], L * w[..., None], zero3)
        return sampler, L, jnp.where(ok, pixel_id, -1)

    if s == 1:
        # resample a light point toward the camera vertex (NEE-style,
        # integrators.cpp:2430-2470)
        pt_ok = _connectible(cv, t - 1)
        on_p = _on_surface(cv, t - 1)
        pp = cv.p[:, t - 1]
        wo_p = normalize(cv.p[:, t - 2] - pp)
        sampler, u_sel = sampler.get_1d()
        sampler, u2 = sampler.get_2d()
        ref_p = jnp.where(on_p[..., None],
                          offset_ray_origin(pp, cv.ng[:, t - 1], wo_p), pp)
        ls = scene.lights.sample(ref_p, u_sel, u2)
        # finite lights, the (non-portal) env light, and distant lights;
        # env + distant picks share the infinite-vertex MIS semantics
        # (Vertex::IsInfiniteLight includes DeltaDirection)
        finite = ls.t_shadow < 1.9 * scene.lights.world_radius
        is_env = jnp.zeros_like(finite) if not _env_subpath_supported(
            scene.lights) else ls.light_idx == scene.lights.n_lights - 1
        if scene.lights.n_distant > 0:
            is_dist = ((ls.light_idx >= scene.lights.base_distant)
                       & (ls.light_idx < scene.lights.base_area))
        else:
            is_dist = jnp.zeros_like(finite)
        is_inf_pick = is_env | is_dist
        ok = pt_ok & ls.valid & (finite | is_inf_pick)
        sampled_beta = ls.L / jnp.maximum(ls.pdf_dir * ls.select_pmf,
                                          1e-30)[..., None]
        f_p = _vertex_f(scene, cv, t - 1, wo_p, ls.wi)
        cos_p = jnp.where(on_p, jnp.abs(dot(ls.wi, cv.ns[:, t - 1])), 1.0)
        dist = ls.t_shadow / (1.0 - 1e-3)
        d2 = jnp.maximum(dist * dist, 1e-12)
        p_light = pp + ls.wi * dist[..., None]
        sampler, Tr = tr_or_visible(sampler, cv, t - 1, p_light, ok)
        L = cv.beta[:, t - 1] * f_p * Tr * cos_p[..., None] * sampled_beta
        ok = ok & (average(L) > 0)

        is_area = ls.area_id >= 0
        n_l = ls.n_light
        cos_l = jnp.abs(dot(n_l, ls.wi))  # emission direction = -ls.wi
        # sampled.pdfFwd = PDFLightOrigin = pmf/area; for area lights
        # 1/area = pdf_dir(solid) * cos_l / d^2; delta lights -> 0. The pmf
        # is the SUBPATH sampler's (finite lights, renormalized) — it must
        # match GenerateLightSubpath's selection density for MIS consistency.
        inv_area = ls.pdf_dir * cos_l * safe_div(1.0, d2, 0.0)
        pdf_fwd0 = jnp.where(
            is_area,
            _light_select_pmf(scene.lights, ls.light_idx) * inv_area, 0.0)
        if _env_subpath_supported(scene.lights) \
                or scene.lights.n_distant > 0:
            # env/distant pick: PDFLightOrigin = InfiniteLightDensity(wi),
            # a solid-angle density (integrators.cpp:1868-1870; 0 for a
            # distant light with no env — remap0 treats it as 1)
            pdf_fwd0 = jnp.where(
                is_inf_pick, _infinite_light_density(scene.lights, ls.wi),
                pdf_fwd0)
        # sampled.pdfRev = pt scatter pdf toward the light, area measure
        # there (solid angle stays unconverted toward an infinite vertex)
        pdf_bsdf_solid = _vertex_pdf_dir(scene, cv, t - 1, wo_p, ls.wi)
        patch[("light", 0)] = jnp.where(
            is_inf_pick, pdf_bsdf_solid,
            convert_density(pdf_bsdf_solid, pp, p_light, n_l, is_area))
        patch[("delta", "light", 0)] = false_r
        # pt.pdfRev = emission direction density toward pt (PDFLight):
        # per-light-type PDF_Le along the emission direction -wi; for env
        # the planar density 1/(pi r^2) with no 1/d^2
        # (integrators.cpp:1830-1837); |cos| only at surface vertices
        cos_pt = jnp.where(on_p, jnp.abs(dot(cv.ng[:, t - 1], ls.wi)), 1.0)
        pdf_le_dir = _light_pdf_le_dir(scene.lights, ls.light_idx, n_l,
                                       -ls.wi)
        wr = float(scene.lights.world_radius)
        pdf_light_pt = pdf_le_dir * safe_div(1.0, d2, 0.0) * cos_pt
        patch[("cam", t - 1)] = jnp.where(
            is_inf_pick, cos_pt / (jnp.pi * wr * wr), pdf_light_pt)
        patch[("delta", "cam", t - 1)] = false_r
        if t > 1:
            patch[("cam", t - 2)] = convert_density(
                _vertex_pdf_dir(scene, cv, t - 1, ls.wi, wo_p),
                pp, cv.p[:, t - 2], cv.ng[:, t - 2],
                _on_surface(cv, t - 2))
        w = _mis_weight(lv, cv, s, t, patch, pdf_fwd_light0=pdf_fwd0,
                        is_delta_light0=ls.is_delta)
        L = jnp.where(ok[..., None], L * w[..., None], zero3)
        return sampler, L, None

    # s >= 2 and t >= 2: general vertex-to-vertex connection
    qs_ok = _connectible(lv, s - 1)
    pt_ok = _connectible(cv, t - 1)
    on_q = _on_surface(lv, s - 1)
    on_p = _on_surface(cv, t - 1)
    ok = qs_ok & pt_ok
    qp = lv.p[:, s - 1]
    pp = cv.p[:, t - 1]
    d_qp = pp - qp
    dist2 = jnp.sum(d_qp * d_qp, -1)
    w_qp = d_qp * safe_div(1.0, jnp.sqrt(dist2), 0.0)[..., None]
    wo_q = normalize(lv.p[:, s - 2] - qp)
    wo_p = normalize(cv.p[:, t - 2] - pp)
    f_q = _vertex_f(scene, lv, s - 1, wo_q, w_qp)
    f_p = _vertex_f(scene, cv, t - 1, wo_p, -w_qp)
    # G: cosine terms only at surface endpoints (integrators.cpp:2178-2189)
    g = safe_div(1.0, dist2, 0.0) \
        * jnp.where(on_q, jnp.abs(dot(lv.ns[:, s - 1], w_qp)), 1.0) \
        * jnp.where(on_p, jnp.abs(dot(cv.ns[:, t - 1], w_qp)), 1.0)
    sampler, Tr = tr_or_visible(sampler, lv, s - 1, pp, ok)
    L = lv.beta[:, s - 1] * f_q * f_p * Tr * cv.beta[:, t - 1] \
        * g[..., None]
    ok = ok & (average(L) > 0)
    # MIS patches (integrators.cpp:2224-2244)
    patch[("delta", "light", s - 1)] = false_r
    patch[("delta", "cam", t - 1)] = false_r
    patch[("cam", t - 1)] = convert_density(
        _vertex_pdf_dir(scene, lv, s - 1, wo_q, w_qp),
        qp, pp, cv.ng[:, t - 1], on_p)
    patch[("cam", t - 2)] = convert_density(
        _vertex_pdf_dir(scene, cv, t - 1, -w_qp, wo_p),
        pp, cv.p[:, t - 2], cv.ng[:, t - 2],
        _on_surface(cv, t - 2))
    patch[("light", s - 1)] = convert_density(
        _vertex_pdf_dir(scene, cv, t - 1, wo_p, -w_qp),
        pp, qp, lv.ng[:, s - 1], on_q)
    pdf_back_solid = _vertex_pdf_dir(scene, lv, s - 1, w_qp, wo_q)
    back_conv = convert_density(pdf_back_solid, qp, lv.p[:, s - 2],
                                lv.ng[:, s - 2], _on_surface(lv, s - 2))
    if s == 2:
        # density toward an infinite light endpoint stays solid angle
        # (Vertex::ConvertDensity, integrators.cpp:1779-1780)
        back_conv = jnp.where(lv.inf[:, 0], pdf_back_solid, back_conv)
    patch[("light", s - 2)] = back_conv
    w = _mis_weight(lv, cv, s, t, patch)
    L = jnp.where(ok[..., None], L * w[..., None], zero3)
    return sampler, L, None


# ---------------------------------------------------------------------------
# Render driver
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_depth", "n_lanes", "use_media",
                                   "camera_medium", "light_medium", "cfg"))
def _bdpt_wave(scene, camera, film, film_state, seed, wave_idx, max_depth,
               n_lanes, use_media=False, camera_medium=-1, light_medium=-1,
               cfg=None):
    R = n_lanes
    pixel_id = jnp.arange(R, dtype=jnp.int32) % film.npix
    sampler = LaneSampler.start(seed, pixel_id.astype(jnp.uint32), wave_idx)
    Kc = max_depth + 2
    Kl = max_depth + 1
    sampler, cv = generate_camera_subpath(scene, camera, sampler, pixel_id,
                                          Kc, camera_medium=camera_medium,
                                          cfg=cfg, use_media=use_media)
    sampler, lv = generate_light_subpath(scene, sampler, R, Kl,
                                         light_medium=light_medium, cfg=cfg,
                                         use_media=use_media)
    L = jnp.zeros((R, 3))
    for t in range(1, Kc + 1):
        for s in range(0, Kl + 1):
            depth = s + t - 2
            if depth < 0 or depth > max_depth:
                continue
            if t == 1 and s < 2:
                continue  # (1,1) skipped per the reference; (0,1) is n/a
            sampler, Lst, splat_pix = connect(scene, camera, sampler, lv, cv,
                                              s, t, cfg=cfg,
                                              use_media=use_media)
            if splat_pix is not None:
                film_state = film.add_splats(
                    film_state, jnp.maximum(splat_pix, 0),
                    jnp.where((splat_pix >= 0)[..., None], Lst, 0.0))
            else:
                L = L + Lst
    film_state = film.add_samples(film_state, pixel_id, L, jnp.ones(R))
    return film_state


def scene_has_media(scene):
    """Host-side check: does any primitive bound a participating medium?"""
    import numpy as np

    g = scene.geometry
    for name in g._fields:
        if name.endswith("_med_in") or name.endswith("_med_out"):
            a = getattr(g, name)
            if a is None:
                continue
            a = np.asarray(a)
            if a.size and int(a.max()) >= 0:
                return True
    return False


def render(scene: Scene, camera, film, spp=16, max_depth=5, seed=0,
           camera_medium=-1, light_medium=-1, cfg=None):
    """BDPT render: image = (t>=2 strategies averaged per pixel) +
    splats/(npix*spp) (BDPTIntegrator::Render, splatScale=1/spp with the
    per-pixel We convention). Participating media are supported through
    VT_MEDIUM vertices + ratio-tracked connection transmittance;
    camera_medium/light_medium set the starting medium ids of the two
    subpath walks (-1 = vacuum)."""
    import warnings

    if scene.lights.has_env and scene.lights.portal is not None:
        warnings.warn("bdpt ignores PORTAL env lights (no SampleLe); use "
                      "volpath/path for portal-lit scenes", stacklevel=2)
    use_media = scene_has_media(scene)
    if cfg is None:
        cfg = VolPathConfig(max_depth=max_depth)
    film_state = film.init_state()
    for wave in range(spp):
        film_state = _bdpt_wave(scene, camera, film, film_state,
                                jnp.uint32(seed), jnp.uint32(wave),
                                int(max_depth), film.npix,
                                use_media=use_media,
                                camera_medium=int(camera_medium),
                                light_medium=int(light_medium), cfg=cfg)
    return film.image(film_state, splat_scale=1.0 / (spp * film.npix))
