"""Sampling warps + MIS heuristics (vectorized jnp).

TPU-native analog of the reference's ``src/pbrt/util/sampling.h`` — every warp
is a pure elementwise function over batched U[0,1) draws, so XLA fuses them
straight into the integrator's VPU stream. Distribution tables
(PiecewiseConstant1D/2D, AliasTable) are built host-side in numpy and sampled
on-device with searchsorted/gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .math import INV_2PI, INV_4PI, INV_PI, PI, PI_OVER_2, PI_OVER_4, safe_div, safe_sqrt, sqr
from .vecmath import spherical_direction


# -- MIS heuristics (sampling.h BalanceHeuristic/PowerHeuristic) -------------


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return safe_div(nf * f_pdf, nf * f_pdf + ng * g_pdf)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    return jnp.where(jnp.isinf(sqr(f)), 1.0, safe_div(sqr(f), sqr(f) + sqr(g)))


# -- 1D warps ----------------------------------------------------------------


def sample_exponential(u, a):
    """Sample t ~ a*exp(-a t); free-flight distances (sampling.h SampleExponential)."""
    return -jnp.log1p(-u) / a


def exponential_pdf(x, a):
    return a * jnp.exp(-a * x)


def sample_linear(u, a, b):
    x = safe_div(u * (a + b), a + jnp.sqrt((1 - u) * sqr(a) + u * sqr(b)))
    return jnp.minimum(x, 0.99999994)


def linear_pdf(x, a, b):
    ok = (x >= 0) & (x <= 1)
    return jnp.where(ok, 2.0 * ((1 - x) * a + x * b) / (a + b), 0.0)


def sample_tent(u, r):
    take_neg = u < 0.5
    u0 = jnp.where(take_neg, 1.0 - 2.0 * u, 2.0 * u - 1.0)
    x = r * (1.0 - jnp.sqrt(jnp.maximum(1.0 - u0, 0.0)))
    return jnp.where(take_neg, -x, x)


def sample_discrete(weights, u):
    """Pick index ~ weights (trailing axis), return (index, pmf, u_remapped).

    weights: (..., N) nonnegative; u: (...). Vectorized analog of
    sampling.h SampleDiscrete including the u-reuse remap.
    """
    total = jnp.sum(weights, axis=-1, keepdims=True)
    p = safe_div(weights, total)
    cdf = jnp.cumsum(p, axis=-1)
    # strict < so u==cdf boundary goes right; clamp final
    idx = jnp.sum((u[..., None] >= cdf).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, weights.shape[-1] - 1)
    pmf = jnp.take_along_axis(p, idx[..., None], axis=-1)[..., 0]
    lo = jnp.where(idx == 0, 0.0, jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None], axis=-1)[..., 0])
    u_new = jnp.clip(safe_div(u - lo, pmf), 0.0, 0.99999994)
    return idx, pmf, u_new


# -- 2D / spherical warps ----------------------------------------------------


def sample_uniform_disk_concentric(u2):
    """Concentric (Shirley) square->disk map."""
    ox = 2.0 * u2[..., 0] - 1.0
    oy = 2.0 * u2[..., 1] - 1.0
    zero = (ox == 0) & (oy == 0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x, PI_OVER_4 * safe_div(oy, ox), PI_OVER_2 - PI_OVER_4 * safe_div(ox, oy)
    )
    p = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, p)


def sample_uniform_disk_polar(u2):
    r = jnp.sqrt(u2[..., 0])
    theta = 2.0 * PI * u2[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_uniform_sphere(u2):
    z = 1.0 - 2.0 * u2[..., 0]
    r = safe_sqrt(1.0 - sqr(z))
    phi = 2.0 * PI * u2[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_SPHERE_PDF = INV_4PI
UNIFORM_HEMISPHERE_PDF = INV_2PI


def sample_uniform_hemisphere(u2):
    z = u2[..., 0]
    r = safe_sqrt(1.0 - sqr(z))
    phi = 2.0 * PI * u2[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_cosine_hemisphere(u2):
    d = sample_uniform_disk_concentric(u2)
    z = safe_sqrt(1.0 - sqr(d[..., 0]) - sqr(d[..., 1]))
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def sample_uniform_cone(u2, cos_theta_max):
    cos_theta = (1.0 - u2[..., 0]) + u2[..., 0] * cos_theta_max
    sin_theta = safe_sqrt(1.0 - sqr(cos_theta))
    phi = 2.0 * PI * u2[..., 1]
    return spherical_direction(sin_theta, cos_theta, phi)


def uniform_cone_pdf(cos_theta_max):
    return safe_div(1.0, 2.0 * PI * (1.0 - cos_theta_max), fill=jnp.inf)


def sample_uniform_triangle(u2):
    """Barycentrics (b0,b1,b2) uniform on the simplex (sqrt-free variant)."""
    u0, u1 = u2[..., 0], u2[..., 1]
    flip = u0 < u1
    b0 = jnp.where(flip, u0 / 2.0, u0 - u1 / 2.0)
    b1 = jnp.where(flip, u1 - b0, u1 / 2.0)
    return jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)


def invert_uniform_triangle_sample(b):
    # Forward map: flip (u0<u1) => b0=u0/2, b1=u1-b0; else b0=u0-u1/2, b1=u1/2.
    b0, b1 = b[..., 0], b[..., 1]
    flip = b0 < b1
    u0 = jnp.where(flip, 2.0 * b0, b0 + b1)
    u1 = jnp.where(flip, b1 + b0, 2.0 * b1)
    return jnp.stack([u0, u1], axis=-1)


# -- phase functions ---------------------------------------------------------


def henyey_greenstein(cos_theta, g):
    """HG phase function value p(cos θ) (sampling.h HenyeyGreenstein)."""
    g = jnp.clip(g, -0.99, 0.99)
    denom = 1.0 + sqr(g) + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - sqr(g)) * safe_div(1.0, denom * safe_sqrt(denom), fill=0.0)


def sample_henyey_greenstein(wo, g, u2):
    """Sample wi ~ HG, pbrt convention: wo points back toward the camera.

    cos(theta) is measured in the +wo frame; forward scattering (g>0)
    concentrates wi near -wo. Returns (wi, pdf) with pdf == phase value
    (HG importance-samples itself exactly).
    """
    g = jnp.clip(g, -0.99, 0.99)
    u0, u1 = u2[..., 0], u2[..., 1]
    # cosTheta measured w.r.t. -wo (forward scattering dir)
    iso = jnp.abs(g) < 1e-3
    cos_theta_iso = 1.0 - 2.0 * u0
    sqr_term = safe_div(1.0 - sqr(g), 1.0 + g - 2.0 * g * u0)
    cos_theta_g = -safe_div(1.0 + sqr(g) - sqr(sqr_term), 2.0 * g, fill=0.0)
    cos_theta = jnp.where(iso, cos_theta_iso, cos_theta_g)
    sin_theta = safe_sqrt(1.0 - sqr(cos_theta))
    phi = 2.0 * PI * u1
    from .vecmath import coordinate_system  # local import to avoid cycle

    t1, t2 = coordinate_system(wo)
    local = spherical_direction(sin_theta, cos_theta, phi)
    wi = local[..., 0:1] * t1 + local[..., 1:2] * t2 + local[..., 2:3] * wo
    pdf = henyey_greenstein(cos_theta, g)
    return wi, pdf


# -- misc --------------------------------------------------------------------


def sample_visible_wavelengths(u):
    return 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * u)


def visible_wavelengths_pdf(lam):
    ok = (lam >= 360.0) & (lam <= 830.0)
    return jnp.where(ok, 0.0039398042 / sqr(jnp.cosh(0.0072 * (lam - 538.0))), 0.0)


# -- PiecewiseConstant distributions (host-built tables) ---------------------


class PiecewiseConstant1D:
    """Tabulated 1D distribution; numpy build, jnp sample.

    Mirrors sampling.h PiecewiseConstant1D: func over [min,max], integral-
    normalized cdf; Sample(u) -> (x, pdf, offset).
    """

    def __init__(self, func, x_min=0.0, x_max=1.0):
        f = np.abs(np.asarray(func, np.float64))
        n = len(f)
        cdf = np.zeros(n + 1)
        cdf[1:] = np.cumsum(f) * (x_max - x_min) / n
        self.func_int = float(cdf[-1])
        if self.func_int == 0:
            cdf[1:] = np.arange(1, n + 1) / n
        else:
            cdf /= self.func_int
        self.func = jnp.asarray(f, jnp.float32)
        self.cdf = jnp.asarray(cdf, jnp.float32)
        self.x_min, self.x_max = float(x_min), float(x_max)
        self.n = n

    def sample(self, u):
        o = jnp.clip(jnp.searchsorted(self.cdf, u, side="right") - 1, 0, self.n - 1)
        cdf_o = self.cdf[o]
        dcdf = self.cdf[o + 1] - cdf_o
        du = jnp.where(dcdf > 0, safe_div(u - cdf_o, dcdf), 0.0)
        fi = jnp.float32(self.func_int)
        pdf = jnp.where(fi > 0, self.func[o] / fi, 0.0)
        x = self.x_min + (o + du) / self.n * (self.x_max - self.x_min)
        return x, pdf, o


class PiecewiseConstant2D:
    """Tabulated 2D distribution (sampling.h PiecewiseConstant2D): a
    marginal PiecewiseConstant1D over rows + per-row conditionals, all
    stored as dense arrays so sample/pdf are gather-only."""

    def __init__(self, func, domain=((0.0, 1.0), (0.0, 1.0))):
        f = np.abs(np.asarray(func, np.float64))  # (ny, nx)
        ny, nx = f.shape
        (x0, x1), (y0, y1) = domain
        row_int = f.sum(1) * (x1 - x0) / nx
        self.marginal = PiecewiseConstant1D(row_int, y0, y1)
        cdf = np.zeros((ny, nx + 1))
        cdf[:, 1:] = np.cumsum(f, 1) * (x1 - x0) / nx
        ints = cdf[:, -1:].copy()
        safe = np.where(ints > 0, ints, 1.0)
        cdf /= safe
        zero = (ints[:, 0] <= 0)
        cdf[zero] = np.arange(nx + 1) / nx
        self.cond_cdf = jnp.asarray(cdf, jnp.float32)
        self.cond_func = jnp.asarray(
            np.where(ints > 0, f / safe * ((x1 - x0) / 1.0), 0.0),
            jnp.float32)  # func normalized by the row integral
        self.func = jnp.asarray(f, jnp.float32)
        self.func_int = float(max(row_int.sum() * (y1 - y0) / ny, 0.0))
        self.nx, self.ny = nx, ny
        self.domain = domain

    def sample(self, u2):
        """u2 (...,2) -> (p (...,2), pdf (...,))."""
        (x0, x1), (y0, y1) = self.domain
        y, pdf_y, row = self.marginal.sample(u2[..., 1])
        u = u2[..., 0]
        cdf_r = self.cond_cdf[row]
        o = jnp.clip(
            jnp.sum((u[..., None] >= cdf_r).astype(jnp.int32), -1) - 1,
            0, self.nx - 1)
        cdf_o = jnp.take_along_axis(cdf_r, o[..., None], -1)[..., 0]
        dcdf = jnp.take_along_axis(cdf_r, o[..., None] + 1, -1)[..., 0] - cdf_o
        du = jnp.where(dcdf > 0, safe_div(u - cdf_o, dcdf), 0.0)
        x = x0 + (o + du) / self.nx * (x1 - x0)
        pdf = self.pdf(jnp.stack([x, y], -1))
        return jnp.stack([x, y], -1), pdf

    def pdf(self, p):
        (x0, x1), (y0, y1) = self.domain
        ix = jnp.clip(((p[..., 0] - x0) / (x1 - x0) * self.nx).astype(
            jnp.int32), 0, self.nx - 1)
        iy = jnp.clip(((p[..., 1] - y0) / (y1 - y0) * self.ny).astype(
            jnp.int32), 0, self.ny - 1)
        if self.func_int <= 0:
            return jnp.zeros(p.shape[:-1])
        return self.func[iy, ix] / self.func_int


class AliasTable:
    """O(1) discrete sampling (sampling.h AliasTable: Vose's method).

    Build host-side; sample() is two gathers + one compare per lane."""

    def __init__(self, weights):
        w = np.asarray(weights, np.float64)
        n = len(w)
        total = max(w.sum(), 1e-30)
        self.p = jnp.asarray(w / total, jnp.float32)
        scaled = w / total * n
        q = np.ones(n)
        alias = np.arange(n)
        small = [i for i in range(n) if scaled[i] < 1.0]
        large = [i for i in range(n) if scaled[i] >= 1.0]
        while small and large:
            s = small.pop()
            g = large.pop()
            q[s] = scaled[s]
            alias[s] = g
            scaled[g] = scaled[g] + scaled[s] - 1.0
            (small if scaled[g] < 1.0 else large).append(g)
        self.q = jnp.asarray(q, jnp.float32)
        self.alias = jnp.asarray(alias, jnp.int32)
        self.n = n

    def sample(self, u):
        """u (...,) -> (index, pmf, u_remapped)."""
        un = u * self.n
        o = jnp.clip(un.astype(jnp.int32), 0, self.n - 1)
        frac = un - o
        take = frac < self.q[o]
        idx = jnp.where(take, o, self.alias[o])
        u_new = jnp.where(
            take, safe_div(frac, self.q[o]),
            safe_div(frac - self.q[o], 1.0 - self.q[o]))
        return idx, self.p[idx], jnp.clip(u_new, 0.0, 0.9999999)
