"""Lights as stacked SoA arrays + vectorized NEE sampling.

Analog of ``src/pbrt/lights.h`` (Point:203, Distant:268, UniformInfinite:555,
DiffuseArea:458) and the uniform light sampler (lightsamplers.h:26). Instead
of TaggedPointer dispatch per ray, every light type's data lives in stacked
arrays and a lane's sampled light is resolved with masked gathers — the whole
wavefront samples NEE in one fused pass.

Global light index layout: [0, n_point) point | [n_point, +n_distant) distant
| [.., +n_area) triangle area lights | last: infinite.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct as struct
import jax.numpy as jnp
import numpy as np

from ..utils.math import INV_4PI, safe_div


def _frac(x):
    """Cheap decorrelated fraction from a float (texel jitter)."""
    return x - jnp.floor(x)
from ..utils.sampling import sample_uniform_sphere, sample_uniform_triangle
from ..utils.vecmath import cross, distance, dot, length, normalize


class LightSample(NamedTuple):
    wi: jnp.ndarray  # (R,3) direction to light
    L: jnp.ndarray  # (R,3) incident radiance (already /dist^2 for point)
    pdf_dir: jnp.ndarray  # (R,) solid-angle pdf of wi given the chosen light
    select_pmf: jnp.ndarray  # (R,) probability of having chosen this light
    is_delta: jnp.ndarray  # (R,) bool
    t_shadow: jnp.ndarray  # (R,) parametric shadow-ray length (d normalized)
    valid: jnp.ndarray  # (R,) bool
    n_light: jnp.ndarray = None  # (R,3) emission normal (area lights; else 0)
    area_id: jnp.ndarray = None  # (R,) sampled area-light id (-1 otherwise)
    light_idx: jnp.ndarray = None  # (R,) global index of the sampled light


@struct.dataclass
class Lights:
    # point lights
    point_p: jnp.ndarray  # (Lp,3)
    point_I: jnp.ndarray  # (Lp,3) intensity
    # spot lights (lights.h Spot:811 - smoothstep cone falloff)
    spot_p: jnp.ndarray  # (Ls,3)
    spot_I: jnp.ndarray  # (Ls,3)
    spot_dir: jnp.ndarray  # (Ls,3) cone axis (normalized)
    spot_cos_total: jnp.ndarray  # (Ls,)
    spot_cos_start: jnp.ndarray  # (Ls,)
    # goniophotometric lights (lights.h Goniometric:633: point light whose
    # angular intensity comes from an equal-area image in light space)
    gonio_p: jnp.ndarray  # (Lg,3)
    gonio_I: jnp.ndarray  # (Lg,3) base intensity scale
    gonio_r: jnp.ndarray  # (Lg,3,3) world->light rotation
    gonio_img: jnp.ndarray  # (Lg,S,S,3) equal-area intensity maps
    # projection lights (lights.h Projection:698: point light projecting an
    # image through a perspective frustum)
    proj_p: jnp.ndarray  # (Lp2,3)
    proj_I: jnp.ndarray  # (Lp2,3) scale
    proj_r: jnp.ndarray  # (Lp2,3,3) world->light rotation (light looks +z)
    proj_img: jnp.ndarray  # (Lp2,H,W,3)
    proj_tan: jnp.ndarray  # (Lp2,) tan(fov/2) of the square frustum
    # distant lights
    distant_dir: jnp.ndarray  # (Ld,3) direction the light travels (from light)
    distant_L: jnp.ndarray  # (Ld,3)
    # triangle area lights (DiffuseAreaLight over emissive triangles)
    area_p0: jnp.ndarray  # (A,3)
    area_p1: jnp.ndarray
    area_p2: jnp.ndarray
    area_L: jnp.ndarray  # (A,3) emitted radiance
    area_twosided: jnp.ndarray  # (A,) bool
    # infinite environment: uniform radiance and/or equal-area image
    env_L: jnp.ndarray  # (3,) radiance; zeros = no env light
    env_img: jnp.ndarray  # (S,S,3) equal-area map (ImageInfiniteLight)
    env_pmf: jnp.ndarray  # (S*S,) texel selection pmf
    env_cdf: jnp.ndarray  # (S*S,)
    select_pmf_table: jnp.ndarray  # (n_lights,) selection pmf
    select_cdf: jnp.ndarray  # (n_lights,)
    has_env: bool = struct.field(pytree_node=False)
    has_env_img: bool = struct.field(pytree_node=False)
    world_radius: float = struct.field(pytree_node=False)  # shadow-ray lengths
    # BVH light sampler over the finite lights (sampler="bvh"); None = table
    bvh: object = struct.field(default=None)
    # portal-constrained env (models/portal_light.PortalLight); when set it
    # replaces the plain env light's sampling/emission
    portal: object = struct.field(default=None)

    @staticmethod
    def make(point_p=None, point_I=None, distant_dir=None, distant_L=None,
             area_tris=None, env_L=None, env_img=None, world_radius=1e4,
             sampler="uniform", spots=None, gonios=None, projections=None):
        """area_tris: list of dicts {p0, p1, p2, L, [twosided]};
        spots: list of dicts {p, I, dir, cos_total, cos_start};
        gonios: list of dicts {p, I, img (S,S,3 equal-area), [rot 3x3]};
        projections: {p, I, img (H,W,3), fov_deg, [rot]} (light looks +z
        in its local frame, rot = world->light);
        sampler: "uniform" | "power" | "bvh" (PowerLightSampler pmf
        proportional to total emitted power, lightsamplers.h:63)."""
        def arr(x, n3=3):
            if x is None:
                return jnp.zeros((0, n3), jnp.float32)
            return jnp.atleast_2d(jnp.asarray(x, jnp.float32))

        a = list(area_tris or [])
        if a:
            a_p0 = jnp.asarray([t["p0"] for t in a], jnp.float32)
            a_p1 = jnp.asarray([t["p1"] for t in a], jnp.float32)
            a_p2 = jnp.asarray([t["p2"] for t in a], jnp.float32)
            a_L = jnp.asarray([t["L"] for t in a], jnp.float32)
            a_two = jnp.asarray([bool(t.get("twosided", False)) for t in a])
        else:
            a_p0 = a_p1 = a_p2 = jnp.zeros((0, 3), jnp.float32)
            a_L = jnp.zeros((0, 3), jnp.float32)
            a_two = jnp.zeros((0,), bool)
        env = jnp.zeros(3, jnp.float32) if env_L is None else jnp.asarray(env_L, jnp.float32)
        has_env_img = env_img is not None
        if has_env_img:
            ei = np.asarray(env_img, np.float32)
            assert ei.shape[0] == ei.shape[1], "equal-area env map must be square"
            lum = ei.mean(-1).reshape(-1).astype(np.float64)
            tot = max(lum.sum(), 1e-20)
            env_pmf = (lum / tot).astype(np.float32)
            env_cdf = np.cumsum(env_pmf).astype(np.float32)
            env_img_a = jnp.asarray(ei)
            env_mean = float(ei.mean())
        else:
            env_img_a = jnp.zeros((1, 1, 3), jnp.float32)
            env_pmf = np.ones(1, np.float32)
            env_cdf = np.ones(1, np.float32)
            env_mean = float(np.mean(env)) if env_L is not None else 0.0
        gn = list(gonios or [])
        if gn:
            S = max(int(np.asarray(g["img"]).shape[0]) for g in gn)
            g_img = np.zeros((len(gn), S, S, 3), np.float32)
            for i, g in enumerate(gn):
                im = np.asarray(g["img"], np.float32)
                if im.ndim == 2:
                    im = np.repeat(im[..., None], 3, -1)
                ys = np.arange(S) * im.shape[0] // S
                xs = np.arange(S) * im.shape[1] // S
                g_img[i] = im[ys][:, xs]
            g_p = jnp.asarray([g["p"] for g in gn], jnp.float32)
            g_I = jnp.asarray([g["I"] for g in gn], jnp.float32)
            g_r = jnp.asarray([g.get("rot", np.eye(3)) for g in gn],
                              jnp.float32)
            g_img = jnp.asarray(g_img)
        else:
            g_p = g_I = jnp.zeros((0, 3), jnp.float32)
            g_r = jnp.zeros((0, 3, 3), jnp.float32)
            g_img = jnp.zeros((0, 1, 1, 3), jnp.float32)
        pj = list(projections or [])
        if pj:
            H = max(int(np.asarray(x["img"]).shape[0]) for x in pj)
            W = max(int(np.asarray(x["img"]).shape[1]) for x in pj)
            p_img = np.zeros((len(pj), H, W, 3), np.float32)
            for i, x in enumerate(pj):
                im = np.asarray(x["img"], np.float32)
                if im.ndim == 2:
                    im = np.repeat(im[..., None], 3, -1)
                ys = np.arange(H) * im.shape[0] // H
                xs = np.arange(W) * im.shape[1] // W
                p_img[i] = im[ys][:, xs]
            p_p = jnp.asarray([x["p"] for x in pj], jnp.float32)
            p_I = jnp.asarray([x["I"] for x in pj], jnp.float32)
            p_r = jnp.asarray([x.get("rot", np.eye(3)) for x in pj],
                              jnp.float32)
            p_tan = jnp.asarray(
                [np.tan(np.radians(x.get("fov_deg", 90.0)) / 2) for x in pj],
                jnp.float32)
            p_img = jnp.asarray(p_img)
        else:
            p_p = p_I = jnp.zeros((0, 3), jnp.float32)
            p_r = jnp.zeros((0, 3, 3), jnp.float32)
            p_img = jnp.zeros((0, 1, 1, 3), jnp.float32)
            p_tan = jnp.zeros((0,), jnp.float32)
        sp = list(spots or [])
        if sp:
            sp_p = jnp.asarray([s["p"] for s in sp], jnp.float32)
            sp_I = jnp.asarray([s["I"] for s in sp], jnp.float32)
            sp_d = jnp.asarray([np.asarray(s["dir"], np.float64)
                                / np.linalg.norm(s["dir"]) for s in sp],
                               jnp.float32)
            sp_ct = jnp.asarray([s.get("cos_total", np.cos(np.radians(30)))
                                 for s in sp], jnp.float32)
            sp_cs = jnp.asarray([s.get("cos_start", np.cos(np.radians(25)))
                                 for s in sp], jnp.float32)
        else:
            sp_p = sp_I = sp_d = jnp.zeros((0, 3), jnp.float32)
            sp_ct = sp_cs = jnp.zeros((0,), jnp.float32)

        # selection pmf (uniform or power-proportional); the order here is
        # the global light index layout: point | spot | gonio | proj |
        # distant | area | env
        powers = []
        for i_ in (point_I if point_I is not None else []):
            powers.append(4 * np.pi * float(np.mean(i_)))
        for s in sp:
            powers.append(2 * np.pi * float(np.mean(s["I"]))
                          * (1 - 0.5 * (s.get("cos_total", 0.87)
                                        + s.get("cos_start", 0.9))))
        for g in gn:
            powers.append(4 * np.pi * float(np.mean(g["I"]))
                          * float(np.mean(np.asarray(g["img"]))))
        for x in pj:
            t = np.tan(np.radians(x.get("fov_deg", 90.0)) / 2)
            omega = 4 * np.arctan(t * t)  # square-frustum solid angle
            powers.append(float(omega) * float(np.mean(x["I"]))
                          * float(np.mean(np.asarray(x["img"]))))
        for l_ in (distant_L if distant_L is not None else []):
            # distant power ~ L * disk(world radius)
            powers.append(float(np.mean(l_)) * np.pi * world_radius**2)
        for t_ in a:
            e1 = np.asarray(t_["p1"], np.float64) - np.asarray(t_["p0"], np.float64)
            e2 = np.asarray(t_["p2"], np.float64) - np.asarray(t_["p0"], np.float64)
            area = 0.5 * np.linalg.norm(np.cross(e1, e2))
            two = 2.0 if t_.get("twosided") else 1.0
            powers.append(float(np.mean(t_["L"])) * area * np.pi * two)
        if env_L is not None or has_env_img:
            powers.append(env_mean * 4 * np.pi**2 * world_radius**2)
        n = len(powers)
        if n == 0:
            pmf = np.zeros((0,), np.float32)
        elif sampler == "power" and sum(powers) > 0:
            pmf = np.asarray(powers, np.float64)
            pmf = (pmf / pmf.sum()).astype(np.float32)
        else:
            pmf = np.full(n, 1.0 / n, np.float32)
        cdf = np.cumsum(pmf).astype(np.float32)
        out = Lights(
            arr(point_p), arr(point_I), sp_p, sp_I, sp_d, sp_ct, sp_cs,
            g_p, g_I, g_r, g_img,
            p_p, p_I, p_r, p_img, p_tan,
            arr(distant_dir), arr(distant_L),
            a_p0, a_p1, a_p2, a_L, a_two,
            env, env_img_a, jnp.asarray(env_pmf), jnp.asarray(env_cdf),
            jnp.asarray(pmf), jnp.asarray(cdf),
            env_L is not None or has_env_img, has_env_img,
            float(world_radius),
        )
        if sampler == "bvh":
            from .lightsamplers import build_light_bvh

            out = out.replace(bvh=build_light_bvh(out))
        return out

    # -- static counts ------------------------------------------------------
    @property
    def n_point(self):
        return self.point_p.shape[0]

    @property
    def n_spot(self):
        return self.spot_p.shape[0]

    @property
    def n_gonio(self):
        return self.gonio_p.shape[0]

    @property
    def n_proj(self):
        return self.proj_p.shape[0]

    @property
    def n_distant(self):
        return self.distant_dir.shape[0]

    @property
    def n_area(self):
        return self.area_p0.shape[0]

    # global light index bases (layout: point|spot|gonio|proj|distant|area|env)
    @property
    def base_gonio(self):
        return self.n_point + self.n_spot

    @property
    def base_proj(self):
        return self.base_gonio + self.n_gonio

    @property
    def base_distant(self):
        return self.base_proj + self.n_proj

    @property
    def base_area(self):
        return self.base_distant + self.n_distant

    @property
    def n_lights(self):
        return self.base_area + self.n_area + (1 if self.has_env else 0)

    @property
    def n_infinite(self):
        """Lights without spatial bounds (distant + env) — sampled outside
        the light BVH (BVHLightSampler keeps them in a separate list,
        lightsamplers.h:268-280)."""
        return self.n_distant + (1 if self.has_env else 0)

    def _select_bvh(self, ref_p, u_select):
        """BVHLightSampler::Sample top level (lightsamplers.h:281-329):
        pick an infinite light uniformly with probability
        n_inf/(n_inf+1), otherwise descend the BVH from ref_p."""
        from .lightsamplers import bvh_select

        n_inf = self.n_infinite
        if n_inf == 0:
            idx, pmf, _ = bvh_select(self.bvh, ref_p, u_select)
            return jnp.maximum(idx, 0), pmf
        p_inf = n_inf / (n_inf + 1.0)
        pick_inf = u_select < p_inf
        which = jnp.minimum((u_select / p_inf * n_inf).astype(jnp.int32),
                            n_inf - 1)
        base_d = self.base_distant
        idx_inf = jnp.where(which < self.n_distant, base_d + which,
                            self.n_lights - 1)
        u_bvh = jnp.clip((u_select - p_inf) / (1 - p_inf), 0.0, 0.9999999)
        idx_b, pmf_b, _ = bvh_select(self.bvh, ref_p, u_bvh)
        idx = jnp.where(pick_inf, idx_inf, idx_b)
        pmf = jnp.where(pick_inf, p_inf / n_inf, pmf_b * (1 - p_inf))
        return jnp.where(pmf > 0, idx, 0), pmf

    # -- textured point-light angular intensities ----------------------------
    def _gonio_scale(self, gi, w):
        """Equal-area image lookup of emission direction w (world) for
        goniometric lights (lights.h Goniometric::I:656)."""
        from ..utils.vecmath import equal_area_sphere_to_square

        wl = jnp.einsum("...ij,...j->...i", self.gonio_r[gi], w)
        S = self.gonio_img.shape[1]
        sq = equal_area_sphere_to_square(normalize(wl))
        ix = jnp.clip((sq[..., 0] * S).astype(jnp.int32), 0, S - 1)
        iy = jnp.clip((sq[..., 1] * S).astype(jnp.int32), 0, S - 1)
        return self.gonio_img[gi, iy, ix]

    def _proj_scale(self, pi, w):
        """Projected-image lookup of emission direction w (world) for
        projection lights (lights.h Projection::I:737): zero outside the
        square frustum around the light's +z axis."""
        wl = jnp.einsum("...ij,...j->...i", self.proj_r[pi], w)
        z = wl[..., 2]
        tanf = self.proj_tan[pi]
        u = 0.5 * (wl[..., 0] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
                   / jnp.maximum(tanf, 1e-9) + 1.0)
        v = 0.5 * (wl[..., 1] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
                   / jnp.maximum(tanf, 1e-9) + 1.0)
        inside = (z > 0) & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        H, W = self.proj_img.shape[1], self.proj_img.shape[2]
        ix = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(((1.0 - v) * H).astype(jnp.int32), 0, H - 1)
        return jnp.where(inside[..., None], self.proj_img[pi, iy, ix], 0.0)

    # -- uniform light sampler (lightsamplers.h UniformLightSampler:26) -----
    def sample(self, ref_p, u_select, u2) -> LightSample:
        """Uniformly pick a light, sample a direction toward it.

        ref_p: (R,3); u_select, u2: sampler draws. Fully masked — all light
        types are evaluated and the selected one gathered per lane.
        """
        n = self.n_lights
        R = ref_p.shape[:-1]
        if n == 0:
            z3 = jnp.zeros(R + (3,))
            z = jnp.zeros(R)
            return LightSample(z3, z3, z, z, z.astype(bool), z,
                               jnp.zeros(R, bool), z3,
                               jnp.full(R, -1, jnp.int32))
        if self.bvh is not None:
            # adaptive spatial selection (BVH light sampler)
            idx, pmf = self._select_bvh(ref_p, u_select)
        else:
            # selection by pmf table (uniform or power)
            idx = jnp.sum(
                (u_select[..., None] >= self.select_cdf).astype(jnp.int32),
                axis=-1)
            idx = jnp.minimum(idx, n - 1)
            pmf = self.select_pmf_table[idx]

        wi = jnp.zeros(R + (3,))
        L = jnp.zeros(R + (3,))
        pdf_dir = jnp.zeros(R)
        is_delta = jnp.zeros(R, bool)
        t_shadow = jnp.zeros(R)
        n_light = jnp.zeros(R + (3,))
        area_id = jnp.full(R, -1, jnp.int32)

        if self.n_point > 0:
            pi = jnp.clip(idx, 0, self.n_point - 1)
            p_light = self.point_p[pi]
            d = p_light - ref_p
            dist = distance(p_light, ref_p)
            wi_p = normalize(d)
            L_p = self.point_I[pi] * safe_div(1.0, dist * dist, 0.0)[..., None]
            sel = idx < self.n_point
            wi = jnp.where(sel[..., None], wi_p, wi)
            L = jnp.where(sel[..., None], L_p, L)
            pdf_dir = jnp.where(sel, 1.0, pdf_dir)
            is_delta = is_delta | sel
            t_shadow = jnp.where(sel, dist, t_shadow)

        if self.n_spot > 0:
            si = jnp.clip(idx - self.n_point, 0, self.n_spot - 1)
            p_light = self.spot_p[si]
            to_l = p_light - ref_p
            dist = distance(p_light, ref_p)
            wi_s = normalize(to_l)
            # smoothstep cone falloff (SpotLight::I)
            ct = dot(self.spot_dir[si], -wi_s)
            t = safe_div(ct - self.spot_cos_total[si],
                         self.spot_cos_start[si] - self.spot_cos_total[si])
            fall = jnp.clip(t, 0.0, 1.0)
            fall = fall * fall * (3.0 - 2.0 * fall)
            L_s = (self.spot_I[si] * fall[..., None]
                   * safe_div(1.0, dist * dist, 0.0)[..., None])
            sel = (idx >= self.n_point) & (idx < self.n_point + self.n_spot)
            wi = jnp.where(sel[..., None], wi_s, wi)
            L = jnp.where(sel[..., None], L_s, L)
            pdf_dir = jnp.where(sel, 1.0, pdf_dir)
            is_delta = is_delta | sel
            t_shadow = jnp.where(sel, dist, t_shadow)

        if self.n_gonio > 0:
            gi = jnp.clip(idx - self.base_gonio, 0, self.n_gonio - 1)
            p_light = self.gonio_p[gi]
            to_l = p_light - ref_p
            dist = distance(p_light, ref_p)
            wi_g = normalize(to_l)
            I_g = self.gonio_I[gi] * self._gonio_scale(gi, -wi_g)
            L_g = I_g * safe_div(1.0, dist * dist, 0.0)[..., None]
            sel = (idx >= self.base_gonio) & (idx < self.base_proj)
            wi = jnp.where(sel[..., None], wi_g, wi)
            L = jnp.where(sel[..., None], L_g, L)
            pdf_dir = jnp.where(sel, 1.0, pdf_dir)
            is_delta = is_delta | sel
            t_shadow = jnp.where(sel, dist, t_shadow)

        if self.n_proj > 0:
            pi2 = jnp.clip(idx - self.base_proj, 0, self.n_proj - 1)
            p_light = self.proj_p[pi2]
            to_l = p_light - ref_p
            dist = distance(p_light, ref_p)
            wi_p2 = normalize(to_l)
            I_p = self.proj_I[pi2] * self._proj_scale(pi2, -wi_p2)
            L_p2 = I_p * safe_div(1.0, dist * dist, 0.0)[..., None]
            sel = (idx >= self.base_proj) & (idx < self.base_distant)
            wi = jnp.where(sel[..., None], wi_p2, wi)
            L = jnp.where(sel[..., None], L_p2, L)
            pdf_dir = jnp.where(sel, 1.0, pdf_dir)
            is_delta = is_delta | sel
            t_shadow = jnp.where(sel, dist, t_shadow)

        if self.n_distant > 0:
            base_d = self.base_distant
            di = jnp.clip(idx - base_d, 0, self.n_distant - 1)
            wi_d = -normalize(self.distant_dir[di])
            sel = (idx >= base_d) & (idx < base_d + self.n_distant)
            wi = jnp.where(sel[..., None], wi_d, wi)
            L = jnp.where(sel[..., None], self.distant_L[di], L)
            pdf_dir = jnp.where(sel, 1.0, pdf_dir)
            is_delta = is_delta | sel
            t_shadow = jnp.where(sel, 2.0 * self.world_radius, t_shadow)

        if self.n_area > 0:
            base = self.base_area
            ai = jnp.clip(idx - base, 0, self.n_area - 1)
            p0, p1, p2 = self.area_p0[ai], self.area_p1[ai], self.area_p2[ai]
            b = sample_uniform_triangle(u2)
            p_l = b[..., 0:1] * p0 + b[..., 1:2] * p1 + b[..., 2:3] * p2
            e1, e2 = p1 - p0, p2 - p0
            n_cross = cross(e1, e2)
            area2 = length(n_cross)
            n_l = n_cross * safe_div(1.0, area2, 0.0)[..., None]
            to_l = p_l - ref_p
            dist = length(to_l)
            wi_a = to_l * safe_div(1.0, dist, 0.0)[..., None]
            cos_l = dot(n_l, -wi_a)
            two = self.area_twosided[ai]
            front = jnp.where(two, jnp.abs(cos_l) > 1e-7, cos_l > 1e-7)
            # solid-angle pdf = dist^2 / (|cos| * area)
            pdf_a = safe_div(dist * dist, jnp.abs(cos_l) * (0.5 * area2), 0.0)
            sel = (idx >= base) & (idx < base + self.n_area)
            wi = jnp.where(sel[..., None], wi_a, wi)
            L = jnp.where((sel & front)[..., None], self.area_L[ai], L)
            pdf_dir = jnp.where(sel, jnp.where(front, pdf_a, 0.0), pdf_dir)
            t_shadow = jnp.where(sel, dist * (1.0 - 1e-3), t_shadow)
            n_light = jnp.where(sel[..., None], n_l, n_light)
            area_id = jnp.where(sel, ai, area_id)

        if self.has_env:
            sel = idx == (n - 1)
            if self.portal is not None:
                wi_e, L_e, pdf_e, ok_e = self.portal.sample_li(ref_p, u2)
                pdf_e = jnp.where(ok_e, jnp.maximum(pdf_e, 1e-12), 0.0)
            elif self.has_env_img:
                # importance-sample texels of the equal-area map
                S = self.env_img.shape[0]
                u_flat = jnp.clip(u2[..., 0], 0.0, 0.999999)
                ti = jnp.clip(jnp.searchsorted(self.env_cdf, u_flat,
                                               side="right"),
                              0, S * S - 1)
                iy = ti // S
                ix = ti % S
                # jitter inside the texel; equal-area square -> sphere
                jx = _frac(u2[..., 1] * 7919.0)
                jy = _frac(u2[..., 1] * 104729.0)
                sq = jnp.stack([(ix + jx) / S, (iy + jy) / S], -1)
                from ..utils.vecmath import equal_area_square_to_sphere

                wi_e = equal_area_square_to_sphere(sq)
                L_e = self.env_img[iy, ix]
                # pdf: pmf over texels * texels per unit solid angle
                pdf_e = self.env_pmf[ti] * (S * S) * INV_4PI
                pdf_e = jnp.maximum(pdf_e, 1e-12)
            else:
                wi_e = sample_uniform_sphere(u2)
                L_e = jnp.broadcast_to(self.env_L, R + (3,))
                pdf_e = jnp.full(R, INV_4PI)
            wi = jnp.where(sel[..., None], wi_e, wi)
            L = jnp.where(sel[..., None], L_e, L)
            pdf_dir = jnp.where(sel, pdf_e, pdf_dir)
            t_shadow = jnp.where(sel, 2.0 * self.world_radius, t_shadow)

        valid = (pdf_dir > 0) & (pmf > 0)
        return LightSample(wi, L, pdf_dir, pmf, is_delta, t_shadow, valid,
                           n_light, area_id, idx)

    # -- emitted-ray sampling for particle tracing (SampleLe) ----------------
    def sample_le(self, u_select, u_side, u2a, u2b):
        """Sample a light-emitted ray (lights.h SampleLe overloads) for
        lightpath/BDPT particle tracing. Supported emitters: point, spot,
        area, distant; infinite lights are excluded (selection pmf is
        renormalized over the finite emitters).

        Returns (p, d, alpha, n_light, is_area, valid, alpha_pos): alpha is
        the full initial particle throughput Le*cos/(pmf*pdf_pos*pdf_dir);
        alpha_pos = Le/(pmf*pdf_pos*pdf_side) supports the light-vertex ->
        camera splat for directly visible area emitters (zero for delta
        emitters)."""
        from ..utils.sampling import (sample_cosine_hemisphere,
                                      sample_uniform_disk_concentric)
        from ..utils.vecmath import coordinate_system

        n = self.n_lights
        R = u_select.shape
        z3 = jnp.zeros(R + (3,))
        if n == 0 or (self.n_lights - (1 if self.has_env else 0)) == 0:
            return (z3, z3, z3, z3, jnp.zeros(R, bool), jnp.zeros(R, bool),
                    z3)
        n_emit = n - (1 if self.has_env else 0)
        pmf_t = self.select_pmf_table[:n_emit]
        pmf_t = pmf_t / jnp.maximum(jnp.sum(pmf_t), 1e-20)
        cdf = jnp.cumsum(pmf_t)
        idx = jnp.sum((u_select[..., None] >= cdf).astype(jnp.int32), -1)
        idx = jnp.minimum(idx, n_emit - 1)
        pmf = jnp.maximum(pmf_t[idx], 1e-20)

        p = jnp.zeros(R + (3,))
        d = jnp.zeros(R + (3,))
        alpha = jnp.zeros(R + (3,))
        alpha_pos = jnp.zeros(R + (3,))
        n_l = jnp.zeros(R + (3,))
        is_area = jnp.zeros(R, bool)
        valid = jnp.zeros(R, bool)

        if self.n_point > 0:
            pi = jnp.clip(idx, 0, self.n_point - 1)
            d_p = sample_uniform_sphere(u2a)
            sel = idx < self.n_point
            p = jnp.where(sel[..., None], self.point_p[pi], p)
            d = jnp.where(sel[..., None], d_p, d)
            alpha = jnp.where(sel[..., None],
                              self.point_I[pi] * (4.0 * jnp.pi)
                              / pmf[..., None], alpha)
            valid = valid | sel

        if self.n_spot > 0:
            si = jnp.clip(idx - self.n_point, 0, self.n_spot - 1)
            ct_tot = self.spot_cos_total[si]
            cos_t = 1.0 - u2a[..., 0] * (1.0 - ct_tot)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))
            phi = 2.0 * jnp.pi * u2a[..., 1]
            axis = self.spot_dir[si]
            t1, t2 = coordinate_system(axis)
            d_s = (jnp.cos(phi) * sin_t)[..., None] * t1 \
                + (jnp.sin(phi) * sin_t)[..., None] * t2 \
                + cos_t[..., None] * axis
            pdf_dir = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - ct_tot), 1e-9)
            tt = safe_div(cos_t - ct_tot,
                          self.spot_cos_start[si] - ct_tot)
            fall = jnp.clip(tt, 0.0, 1.0)
            fall = fall * fall * (3.0 - 2.0 * fall)
            sel = (idx >= self.n_point) & (idx < self.n_point + self.n_spot)
            p = jnp.where(sel[..., None], self.spot_p[si], p)
            d = jnp.where(sel[..., None], d_s, d)
            alpha = jnp.where(sel[..., None],
                              self.spot_I[si] * fall[..., None]
                              / (pmf * pdf_dir)[..., None], alpha)
            valid = valid | sel

        if self.n_gonio > 0:
            gi = jnp.clip(idx - self.base_gonio, 0, self.n_gonio - 1)
            d_g = sample_uniform_sphere(u2b)
            I_g = self.gonio_I[gi] * self._gonio_scale(gi, d_g)
            sel = (idx >= self.base_gonio) & (idx < self.base_proj)
            p = jnp.where(sel[..., None], self.gonio_p[gi], p)
            d = jnp.where(sel[..., None], d_g, d)
            alpha = jnp.where(sel[..., None],
                              I_g * (4.0 * jnp.pi) / pmf[..., None], alpha)
            valid = valid | sel

        if self.n_proj > 0:
            pi2 = jnp.clip(idx - self.base_proj, 0, self.n_proj - 1)
            tanf = self.proj_tan[pi2]
            # uniform on the z=1 image plane inside the frustum
            x = (2.0 * u2b[..., 0] - 1.0) * tanf
            y = (2.0 * u2b[..., 1] - 1.0) * tanf
            d_l = normalize(jnp.stack([x, y, jnp.ones_like(x)], -1))
            # light->world = rot^T (rot is world->light)
            d_p2 = jnp.einsum("...ji,...j->...i", self.proj_r[pi2], d_l)
            # plane pdf = 1/(2t)^2 -> solid angle pdf = 1/((2t)^2 cos^3)
            cos3 = d_l[..., 2] ** 3
            pdf_dir = 1.0 / jnp.maximum((2 * tanf) ** 2 * cos3, 1e-12)
            I_p = self.proj_I[pi2] * self._proj_scale(pi2, d_p2)
            sel = (idx >= self.base_proj) & (idx < self.base_distant)
            p = jnp.where(sel[..., None], self.proj_p[pi2], p)
            d = jnp.where(sel[..., None], d_p2, d)
            alpha = jnp.where(sel[..., None],
                              I_p / (pmf * pdf_dir)[..., None], alpha)
            valid = valid | sel

        if self.n_distant > 0:
            base_d = self.base_distant
            di = jnp.clip(idx - base_d, 0, self.n_distant - 1)
            dd = normalize(self.distant_dir[di])
            t1, t2 = coordinate_system(dd)
            disk = sample_uniform_disk_concentric(u2a) * self.world_radius
            p_d = (-dd * self.world_radius + disk[..., 0:1] * t1
                   + disk[..., 1:2] * t2)
            sel = (idx >= base_d) & (idx < base_d + self.n_distant)
            p = jnp.where(sel[..., None], p_d, p)
            d = jnp.where(sel[..., None], dd, d)
            area_disk = jnp.pi * self.world_radius**2
            alpha = jnp.where(sel[..., None],
                              self.distant_L[di] * area_disk
                              / pmf[..., None], alpha)
            valid = valid | sel

        if self.n_area > 0:
            base = self.base_area
            ai = jnp.clip(idx - base, 0, self.n_area - 1)
            b = sample_uniform_triangle(u2a)
            p0, p1, p2 = self.area_p0[ai], self.area_p1[ai], self.area_p2[ai]
            p_a = b[..., 0:1] * p0 + b[..., 1:2] * p1 + b[..., 2:3] * p2
            nc = cross(p1 - p0, p2 - p0)
            area2 = length(nc)
            nl = nc * safe_div(1.0, area2, 0.0)[..., None]
            two = self.area_twosided[ai]
            flip_side = two & (u_side < 0.5)
            nl = jnp.where(flip_side[..., None], -nl, nl)
            t1, t2 = coordinate_system(nl)
            dl = sample_cosine_hemisphere(u2b)  # local z-up
            d_a = dl[..., 0:1] * t1 + dl[..., 1:2] * t2 + dl[..., 2:3] * nl
            side_pdf = jnp.where(two, 0.5, 1.0)
            # alpha = L*cos/(pmf*(1/area)*(cos/pi)*side) = L*pi*area/(pmf*side)
            a_val = (self.area_L[ai] * (jnp.pi * 0.5 * area2)[..., None]
                     / (pmf * side_pdf)[..., None])
            sel = (idx >= base) & (idx < base + self.n_area)
            p = jnp.where(sel[..., None], p_a, p)
            d = jnp.where(sel[..., None], d_a, d)
            n_l = jnp.where(sel[..., None], nl, n_l)
            alpha = jnp.where(sel[..., None], a_val, alpha)
            alpha_pos = jnp.where(
                sel[..., None],
                self.area_L[ai] * (0.5 * area2)[..., None]
                / (pmf * side_pdf)[..., None], alpha_pos)
            is_area = is_area | sel
            valid = valid | (sel & (area2 > 0))

        return p, d, alpha, n_l, is_area, valid, alpha_pos

    # -- env directional sampling/pdf without selection pmf ------------------
    def sample_env_dir(self, u2):
        """Sample a direction TOWARD the env light (solid angle): returns
        (wl, Le, pdf_dir). Image env importance-samples the equal-area texel
        pmf (ImageInfiniteLight::SampleLe dir part, lights.cpp:1144-1153);
        uniform env is a uniform sphere (lights.cpp:1042-1046). Portal env
        is not supported here (callers gate on `portal is None`)."""
        R = u2.shape[:-1]
        if not self.has_env or self.portal is not None:
            z = jnp.zeros(R)
            return jnp.zeros(R + (3,)), jnp.zeros(R + (3,)), z
        if self.has_env_img:
            from ..utils.vecmath import equal_area_square_to_sphere

            S = self.env_img.shape[0]
            u_flat = jnp.clip(u2[..., 0], 0.0, 0.999999)
            ti = jnp.clip(jnp.searchsorted(self.env_cdf, u_flat,
                                           side="right"), 0, S * S - 1)
            iy = ti // S
            ix = ti % S
            jx = _frac(u2[..., 1] * 7919.0)
            jy = _frac(u2[..., 1] * 104729.0)
            sq = jnp.stack([(ix + jx) / S, (iy + jy) / S], -1)
            wl = equal_area_square_to_sphere(sq)
            Le = self.env_img[iy, ix]
            pdf = jnp.maximum(self.env_pmf[ti] * (S * S) * INV_4PI, 1e-12)
            return wl, Le, pdf
        wl = sample_uniform_sphere(u2)
        Le = jnp.broadcast_to(self.env_L, R + (3,))
        return wl, Le, jnp.full(R, INV_4PI)

    def env_pdf_dir(self, wl):
        """Raw solid-angle pdf of `sample_env_dir` along wl (toward the
        light) — PDF_Li WITHOUT the light-selection pmf (the BDPT
        InfiniteLightDensity building block, integrators.cpp:2272)."""
        if not self.has_env or self.portal is not None:
            return jnp.zeros(wl.shape[:-1])
        if self.has_env_img:
            from ..utils.vecmath import equal_area_sphere_to_square

            S = self.env_img.shape[0]
            sq = equal_area_sphere_to_square(wl)
            ix = jnp.clip((sq[..., 0] * S).astype(jnp.int32), 0, S - 1)
            iy = jnp.clip((sq[..., 1] * S).astype(jnp.int32), 0, S - 1)
            return self.env_pmf[iy * S + ix] * (S * S) * INV_4PI
        return jnp.full(wl.shape[:-1], INV_4PI)

    # -- escaped-ray emission (infinite lights) -----------------------------
    def le_escaped(self, d, o=None):
        """Radiance from infinite lights along escaped direction d: (R,3).
        o: escaped-ray origins (portal lights window-test against them)."""
        if not self.has_env:
            return jnp.zeros(d.shape[:-1] + (3,))
        if self.portal is not None:
            return self.portal.le(d, o)
        if self.has_env_img:
            from ..utils.vecmath import equal_area_sphere_to_square

            S = self.env_img.shape[0]
            sq = equal_area_sphere_to_square(d)
            ix = jnp.clip((sq[..., 0] * S).astype(jnp.int32), 0, S - 1)
            iy = jnp.clip((sq[..., 1] * S).astype(jnp.int32), 0, S - 1)
            return self.env_img[iy, ix]
        return jnp.broadcast_to(self.env_L, d.shape[:-1] + (3,))

    def pdf_li_escaped(self, d, ref_p=None):
        """select_pmf * directional pdf for MIS of escaped rays
        (UniformInfiniteLight::PDF_Li = uniform-sphere pdf; portal lights
        need the previous scattering vertex ref_p)."""
        if not self.has_env:
            return jnp.zeros(d.shape[:-1])
        if self.portal is not None:
            sel = (self.select_pmf_table[self.n_lights - 1]
                   if self.bvh is None else
                   (self.n_infinite / (self.n_infinite + 1.0)) / self.n_infinite)
            if ref_p is None:
                ref_p = jnp.zeros(d.shape[:-1] + (3,))
            return self.portal.pdf_li(ref_p, d) * sel
        if self.bvh is not None:
            n_inf = self.n_infinite
            sel = (n_inf / (n_inf + 1.0)) / n_inf
        else:
            sel = self.select_pmf_table[self.n_lights - 1]
        if self.has_env_img:
            from ..utils.vecmath import equal_area_sphere_to_square

            S = self.env_img.shape[0]
            sq = equal_area_sphere_to_square(d)
            ix = jnp.clip((sq[..., 0] * S).astype(jnp.int32), 0, S - 1)
            iy = jnp.clip((sq[..., 1] * S).astype(jnp.int32), 0, S - 1)
            pdf = self.env_pmf[iy * S + ix] * (S * S) * INV_4PI
            return pdf * sel
        return INV_4PI * jnp.broadcast_to(sel, d.shape[:-1])

    # -- area-light queries at a surface hit --------------------------------
    def le_area(self, light_id, wo, n):
        """Emitted radiance toward wo from area light light_id with surface
        normal n at the hit (DiffuseAreaLight::L semantics)."""
        if self.n_area == 0:
            return jnp.zeros(wo.shape[:-1] + (3,))
        ai = jnp.clip(light_id, 0, self.n_area - 1)
        vis = dot(n, wo) > 0
        vis = vis | self.area_twosided[ai]
        ok = (light_id >= 0) & vis
        return jnp.where(ok[..., None], self.area_L[ai], 0.0)

    def pdf_li_area(self, light_id, ref_p, p_hit, n_hit):
        """select_pmf * solid-angle pdf of having sampled the hit point on
        area light light_id from ref_p (for MIS at an emissive hit)."""
        if self.n_area == 0:
            return jnp.zeros(ref_p.shape[:-1])
        ai = jnp.clip(light_id, 0, self.n_area - 1)
        e1 = self.area_p1[ai] - self.area_p0[ai]
        e2 = self.area_p2[ai] - self.area_p0[ai]
        area = 0.5 * length(cross(e1, e2))
        to_h = p_hit - ref_p
        dist2 = jnp.sum(to_h * to_h, -1)
        wi = to_h * safe_div(1.0, jnp.sqrt(dist2), 0.0)[..., None]
        cos_l = jnp.abs(dot(n_hit, wi))
        pdf = safe_div(dist2, cos_l * area, 0.0)
        base = self.base_area
        if self.bvh is not None:
            from .lightsamplers import bvh_pmf

            n_inf = self.n_infinite
            p_inf = n_inf / (n_inf + 1.0)
            sel_pmf = (1.0 - p_inf) * bvh_pmf(self.bvh, ref_p, base + ai)
        else:
            sel_pmf = self.select_pmf_table[jnp.clip(
                base + ai, 0, max(self.n_lights - 1, 0))]
        return jnp.where(light_id >= 0, pdf * sel_pmf, 0.0)
