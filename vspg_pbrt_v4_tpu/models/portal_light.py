"""Portal-image infinite light (lights.h PortalImageInfiniteLight:700).

An environment light constrained to the directions passing through a planar
rectangular portal. The reference's design, re-built vectorized:

- Directions are re-parameterized in the portal frame by the equal-area-ish
  (alpha, beta) = (atan(x/z), atan(y/z)) mapping (lights.cpp
  ImageFromRender/RenderFromImage), so the set of directions through the
  portal from ANY point is an axis-aligned uv rectangle (ImageBounds).
- The environment image is warped into this parameterization once at build
  time; sampling restricted to the visible window uses a summed-area table
  (util/sampling.h WindowedPiecewiseConstant2D) — here inverted by
  fixed-iteration vectorized bisection instead of pointer binary search.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.math import safe_div
from ..utils.vecmath import cross, dot, length, normalize

HALF_PI = np.pi / 2.0


class PortalLight(NamedTuple):
    img: jnp.ndarray  # (S,S,3) radiance in portal uv coords
    sat: jnp.ndarray  # (S+1,S+1) summed-area table of luminance
    p0: jnp.ndarray  # (3,) portal corners (planar quad, CCW)
    p1: jnp.ndarray
    p2: jnp.ndarray
    p3: jnp.ndarray
    x_axis: jnp.ndarray  # (3,) portal frame
    y_axis: jnp.ndarray
    z_axis: jnp.ndarray  # faces the illuminated side

    @staticmethod
    def make(env_fn, corners, res=128):
        """corners: 4 CCW points of the planar portal; env_fn(dirs (N,3))
        -> (N,3) world-space radiance (evaluated on the portal-coord grid
        at build time — the reference's image warp, lights.cpp:~750)."""
        c = [np.asarray(p, np.float64) for p in corners]
        x = c[1] - c[0]
        y = c[3] - c[0]
        xn = x / np.linalg.norm(x)
        yn = y / np.linalg.norm(y)
        zn = np.cross(xn, yn)
        zn = zn / np.linalg.norm(zn)
        # grid of uv -> directions -> env radiance
        s = (np.arange(res) + 0.5) / res
        u, v = np.meshgrid(s, s, indexing="xy")
        alpha = (u - 0.5) * np.pi
        beta = (v - 0.5) * np.pi
        tx = np.tan(alpha)
        ty = np.tan(beta)
        d_local = np.stack([tx, ty, np.ones_like(tx)], -1)
        d_local /= np.linalg.norm(d_local, axis=-1, keepdims=True)
        d_world = (d_local[..., 0:1] * xn + d_local[..., 1:2] * yn
                   + d_local[..., 2:3] * zn)
        img = np.asarray(env_fn(d_world.reshape(-1, 3)),
                         np.float32).reshape(res, res, 3)
        lum = img.mean(-1).astype(np.float64)
        sat = np.zeros((res + 1, res + 1), np.float64)
        sat[1:, 1:] = lum.cumsum(0).cumsum(1)
        sat /= max(sat[-1, -1], 1e-20)
        return PortalLight(
            jnp.asarray(img), jnp.asarray(sat, jnp.float32),
            jnp.asarray(c[0], jnp.float32), jnp.asarray(c[1], jnp.float32),
            jnp.asarray(c[2], jnp.float32), jnp.asarray(c[3], jnp.float32),
            jnp.asarray(xn, jnp.float32), jnp.asarray(yn, jnp.float32),
            jnp.asarray(zn, jnp.float32))

    # -- direction <-> uv ----------------------------------------------------
    def uv_of_dir(self, w):
        """world direction -> (uv (…,2), valid, duv/dw Jacobian).

        (lights.cpp PortalImageInfiniteLight::ImageFromRender)."""
        wl = jnp.stack([dot(w, self.x_axis), dot(w, self.y_axis),
                        dot(w, self.z_axis)], -1)
        z = wl[..., 2]
        valid = z > 1e-7
        zs = jnp.where(valid, z, 1.0)
        alpha = jnp.arctan(wl[..., 0] / zs)
        beta = jnp.arctan(wl[..., 1] / zs)
        u = jnp.clip(alpha / jnp.pi + 0.5, 0.0, 1.0)
        v = jnp.clip(beta / jnp.pi + 0.5, 0.0, 1.0)
        # |J| = d(omega)/d(uv) = pi^2 (1+tan^2 a)(1+tan^2 b) cos^3 theta
        ta = wl[..., 0] / zs
        tb = wl[..., 1] / zs
        cos_t = zs / jnp.maximum(length(wl), 1e-12)
        jac = jnp.pi * jnp.pi * (1 + ta * ta) * (1 + tb * tb) * cos_t ** 3
        return jnp.stack([u, v], -1), valid, jnp.maximum(jac, 1e-12)

    def dir_of_uv(self, uv):
        """(RenderFromImage)."""
        alpha = (uv[..., 0] - 0.5) * jnp.pi
        beta = (uv[..., 1] - 0.5) * jnp.pi
        ta = jnp.tan(alpha)
        tb = jnp.tan(beta)
        dl = jnp.stack([ta, tb, jnp.ones_like(ta)], -1)
        dl = dl / jnp.maximum(length(dl), 1e-12)[..., None]
        return (dl[..., 0:1] * self.x_axis + dl[..., 1:2] * self.y_axis
                + dl[..., 2:3] * self.z_axis)

    def image_bounds(self, p):
        """uv window of the portal quad seen from p (ImageBounds)."""
        uv0, v0, _ = self.uv_of_dir(normalize(self.p0 - p))
        uv2, v2, _ = self.uv_of_dir(normalize(self.p2 - p))
        lo = jnp.minimum(uv0, uv2)
        hi = jnp.maximum(uv0, uv2)
        return lo, hi, v0 & v2

    # -- summed-area-table windowed sampling ---------------------------------
    def _sat_at(self, u, v):
        """Bilinear SAT lookup at continuous (u,v) in [0,1]."""
        S = self.sat.shape[0] - 1
        x = jnp.clip(u * S, 0.0, S)
        y = jnp.clip(v * S, 0.0, S)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, S)
        y1 = jnp.minimum(y0 + 1, S)
        fx = x - x0
        fy = y - y0
        s00 = self.sat[y0, x0]
        s10 = self.sat[y0, x1]
        s01 = self.sat[y1, x0]
        s11 = self.sat[y1, x1]
        return ((1 - fx) * (1 - fy) * s00 + fx * (1 - fy) * s10
                + (1 - fx) * fy * s01 + fx * fy * s11)

    def _window_integral(self, lo_u, lo_v, hi_u, hi_v):
        return (self._sat_at(hi_u, hi_v) - self._sat_at(lo_u, hi_v)
                - self._sat_at(hi_u, lo_v) + self._sat_at(lo_u, lo_v))

    def sample_window(self, lo, hi, u2, iters=20):
        """Sample uv ~ image luminance restricted to [lo, hi]
        (WindowedPiecewiseConstant2D::Sample via bisection). Returns
        (uv, pdf_uv)."""
        lo_u, lo_v = lo[..., 0], lo[..., 1]
        hi_u, hi_v = hi[..., 0], hi[..., 1]
        # 1. marginal in u: F(x) = I(lo_u..x, full v window)
        total = self._window_integral(lo_u, lo_v, hi_u, hi_v)
        a, b = lo_u, hi_u
        for _ in range(iters):
            m = 0.5 * (a + b)
            fm = safe_div(self._window_integral(lo_u, lo_v, m, hi_v),
                          total, 0.0)
            go_hi = fm < u2[..., 0]
            a = jnp.where(go_hi, m, a)
            b = jnp.where(go_hi, b, m)
        u = 0.5 * (a + b)
        # 2. conditional in v at u (strip of width eps around u)
        S = self.sat.shape[0] - 1
        eps = 1.0 / S
        su0 = jnp.clip(u - 0.5 * eps, lo_u, hi_u)
        su1 = jnp.clip(u + 0.5 * eps, lo_u, hi_u)
        strip = self._window_integral(su0, lo_v, su1, hi_v)
        a, b = lo_v, hi_v
        for _ in range(iters):
            m = 0.5 * (a + b)
            fm = safe_div(self._window_integral(su0, lo_v, su1, m), strip, 0.0)
            go_hi = fm < u2[..., 1]
            a = jnp.where(go_hi, m, a)
            b = jnp.where(go_hi, b, m)
        v = 0.5 * (a + b)
        uv = jnp.stack([u, v], -1)
        pdf = self.pdf_window(lo, hi, uv)
        return uv, pdf

    def pdf_window(self, lo, hi, uv):
        """Windowed pdf of uv: f(uv) / integral over the window."""
        S = self.img.shape[0]
        ix = jnp.clip((uv[..., 0] * S).astype(jnp.int32), 0, S - 1)
        iy = jnp.clip((uv[..., 1] * S).astype(jnp.int32), 0, S - 1)
        f = jnp.mean(self.img[iy, ix], -1)
        total = self._window_integral(lo[..., 0], lo[..., 1],
                                      hi[..., 0], hi[..., 1])
        # sat is normalized over the whole [0,1]^2 with cell mass lum/S^2:
        # density f_norm = lum(uv)/(total_mass) where total_mass folded into
        # sat normalization -> reconstruct from image directly:
        f_norm = safe_div(f, self._whole_mean(), 0.0)  # wrt full square
        return safe_div(f_norm, jnp.maximum(total, 1e-12), 0.0)

    def _whole_mean(self):
        return jnp.maximum(jnp.mean(self.img.mean(-1)), 1e-20)

    # -- light interface pieces ----------------------------------------------
    def le(self, w, o=None):
        """Escaped-ray radiance: nonzero only if the ray (o, w) passes
        through the portal window (lights.cpp PortalImageInfiniteLight::Le
        checks Inside(uv, ImageBounds(ray.o)))."""
        uv, valid, _ = self.uv_of_dir(w)
        if o is not None:
            lo, hi, okb = self.image_bounds(o)
            valid = (valid & okb
                     & (uv[..., 0] >= lo[..., 0]) & (uv[..., 0] <= hi[..., 0])
                     & (uv[..., 1] >= lo[..., 1]) & (uv[..., 1] <= hi[..., 1]))
        S = self.img.shape[0]
        ix = jnp.clip((uv[..., 0] * S).astype(jnp.int32), 0, S - 1)
        iy = jnp.clip((uv[..., 1] * S).astype(jnp.int32), 0, S - 1)
        return jnp.where(valid[..., None], self.img[iy, ix], 0.0)

    def sample_li(self, p, u2):
        """Sample incident direction at p through the portal.

        Returns (wi, L, pdf_solid, valid)."""
        lo, hi, ok = self.image_bounds(p)
        uv, pdf_uv = self.sample_window(lo, hi, u2)
        wi = self.dir_of_uv(uv)
        _, _, jac = self.uv_of_dir(wi)
        pdf_solid = safe_div(pdf_uv, jac, 0.0)  # p_w = p_uv / |d(omega)/d(uv)|
        S = self.img.shape[0]
        ix = jnp.clip((uv[..., 0] * S).astype(jnp.int32), 0, S - 1)
        iy = jnp.clip((uv[..., 1] * S).astype(jnp.int32), 0, S - 1)
        L = self.img[iy, ix]
        ok = ok & (pdf_solid > 0)
        return wi, jnp.where(ok[..., None], L, 0.0), pdf_solid, ok

    def pdf_li(self, p, wi):
        """Solid-angle pdf of sample_li at p for direction wi."""
        lo, hi, ok = self.image_bounds(p)
        uv, valid, jac = self.uv_of_dir(wi)
        inside = (valid & ok
                  & (uv[..., 0] >= lo[..., 0]) & (uv[..., 0] <= hi[..., 0])
                  & (uv[..., 1] >= lo[..., 1]) & (uv[..., 1] <= hi[..., 1]))
        pdf_uv = self.pdf_window(lo, hi, uv)
        return jnp.where(inside, safe_div(pdf_uv, jac, 0.0), 0.0)
