"""Ray-primitive intersection kernels (vectorized over ray lanes).

TPU-native analog of the reference's shape intersection routines
(``src/pbrt/shapes.h``: Sphere:107, Triangle:833; ``util/vecmath.h``
Bounds3::IntersectP). All functions broadcast over leading ray dims and are
branchless — misses are encoded as t = inf. Watertightness strategy: pbrt's
interval arithmetic is replaced by normal-offset ray spawning (interaction
offsets) + conservative slab tests, the standard GPU/TPU approach.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import difference_of_products, quadratic, safe_div
from ..utils.vecmath import cross, dot, length_squared, normalize

INF = jnp.inf


def ray_aabb(o, d, t_max, b_min, b_max):
    """Slab test. Returns (hit, t0, t1) of the overlap of ray [0,t_max] with box.

    o,d: (...,3); b_min/b_max: (3,) or (...,3). Robust to d==0 components via
    inf arithmetic (IEEE semantics match pbrt's Bounds3::IntersectP).
    """
    inv_d = 1.0 / d  # inf where d==0 is fine
    t_lo = (b_min - o) * inv_d
    t_hi = (b_max - o) * inv_d
    # NaNs appear when o on boundary and d==0 -> 0*inf; scrub via min/max order
    t_near = jnp.nanmax(jnp.minimum(t_lo, t_hi), axis=-1)
    t_far = jnp.nanmin(jnp.maximum(t_lo, t_hi), axis=-1)
    # conservative epsilon like pbrt's 1+2*gamma(3)
    t_far = t_far * (1.0 + 2.0 * 6.0 * 5.96e-08)
    t0 = jnp.maximum(t_near, 0.0)
    t1 = jnp.minimum(t_far, t_max)
    hit = t0 <= t1
    return hit, t0, t1


def aabb_normal(p, b_min, b_max):
    """Outward normal of the box face nearest to surface point p."""
    c = 0.5 * (b_min + b_max)
    half = 0.5 * (b_max - b_min)
    rel = safe_div(p - c, half, fill=0.0)
    amax = jnp.argmax(jnp.abs(rel), axis=-1)
    sign = jnp.sign(jnp.take_along_axis(rel, amax[..., None], axis=-1))[..., 0]
    one_hot = jnp.arange(3) == amax[..., None]
    return jnp.where(one_hot, sign[..., None], 0.0)


def ray_sphere(o, d, t_max, center, radius):
    """Returns (hit, t, p, n). Quadratic in world space (shapes.h Sphere:107
    semantics, simplified to full spheres; reprojection improves robustness).
    """
    oc = o - center
    a = length_squared(d)
    b = 2.0 * dot(oc, d)
    c = length_squared(oc) - radius * radius
    has, t0, t1 = quadratic(a, b, c)
    eps = 1e-4 * radius
    t = jnp.where(t0 > eps, t0, t1)
    hit = has & (t > eps) & (t < t_max)
    p = o + t[..., None] * d
    # reproject onto sphere for robustness (pbrt's p *= radius/Distance)
    pr = center + (p - center) * safe_div(radius, jnp.sqrt(length_squared(p - center)), 1.0)[..., None]
    n = normalize(pr - center)
    return hit, jnp.where(hit, t, INF), pr, n


def ray_triangle(o, d, t_max, p0, p1, p2):
    """Watertight-style Möller–Trumbore. Returns (hit, t, b0, b1, n_geom).

    Equivalent outcome to pbrt's TriangleIntersect (shapes.h:833) — same
    barycentric parameterization; the coordinate-permutation watertight
    transform is replaced by double-precision-free edge tests adequate at
    renderer scale with offset-spawned rays.
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = safe_div(1.0, det, fill=0.0)
    tvec = o - p0
    b1 = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    b2 = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    eps = 1e-9
    hit = (
        (jnp.abs(det) > eps)
        & (b1 >= 0.0)
        & (b2 >= 0.0)
        & (b1 + b2 <= 1.0)
        & (t > 1e-5)
        & (t < t_max)
    )
    ng = normalize(cross(e1, e2))
    return hit, jnp.where(hit, t, INF), 1.0 - b1 - b2, b1, ng


def offset_ray_origin(p, n, w):
    """Offset spawn point along the normal to avoid self-intersection.

    Simplified from pbrt's error-bound-based OffsetRayOrigin
    (interaction.h): scale-aware epsilon along the geometric normal, signed
    toward the outgoing direction w.
    """
    scale = jnp.maximum(jnp.max(jnp.abs(p), axis=-1), 1.0)
    eps = 1e-4 * scale
    sign = jnp.where(dot(n, w) >= 0.0, 1.0, -1.0)
    return p + (sign * eps)[..., None] * n


def ray_cylinder(o, d, t_max, base, axis, radius, height):
    """Finite open cylinder (shapes.h Cylinder:551, world-space form).

    base: (C,3) bottom-cap center; axis: (C,3) unit; broadcastable against
    o/d (...,1,3). Returns (hit, t, p, n) with n the outward radial normal.
    """
    oc = o - base
    od = oc - dot(oc, axis)[..., None] * axis
    dd = d - dot(d, axis)[..., None] * axis
    a = length_squared(dd)
    b = 2.0 * dot(od, dd)
    c = length_squared(od) - radius * radius
    has, t0, t1 = quadratic(a, b, c)
    eps = 1e-4

    def z_of(t):
        return dot(oc + t[..., None] * d, axis)

    def ok_at(t):
        z = z_of(t)
        return has & (t > eps) & (t < t_max) & (z >= 0.0) & (z <= height)

    t = jnp.where(ok_at(t0), t0, jnp.where(ok_at(t1), t1, jnp.inf))
    hit = jnp.isfinite(t)
    p = o + jnp.where(hit, t, 0.0)[..., None] * d
    z = dot(p - base, axis)
    n = normalize(p - base - z[..., None] * axis)
    return hit, t, p, n


def ray_bilinear_patch(o, d, t_max, p00, p10, p01, p11):
    """Ray vs bilinear patch (shapes.h BilinearPatch intersection; the
    Reshetov "Cool Patches" quadratic-in-u solve, Ray Tracing Gems ch. 8).

    Returns (hit, t, u, v, n_geometric)."""
    e10 = p10 - p00
    e11 = p11 - p10
    e00 = p01 - p00
    qn = cross(e10, p01 - p11)
    q00 = p00 - o
    q10 = p10 - o
    a = dot(cross(q00, d), e00)
    c = dot(qn, d)
    b = dot(cross(q10, d), e11) - (a + c)
    det = b * b - 4.0 * a * c
    eps = 1e-4
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    # robust quadratic roots for a + b*u + c*u^2 = 0 (linear when |c| tiny)
    lin = jnp.abs(c) < 1e-12
    u_lin = safe_div(-a, b, -1.0)
    qq = -0.5 * (b + jnp.sign(jnp.where(b == 0, 1.0, b)) * sq)
    u1 = jnp.where(lin, u_lin, safe_div(qq, c, -1.0))
    u2 = jnp.where(lin, -1.0, safe_div(a, qq, -1.0))

    def solve(u):
        pa = q00 + u[..., None] * e10  # lerp(u, p00, p10) - o
        pb = e00 + u[..., None] * (e11 - e00)  # v-edge direction at u
        n = cross(d, pb)
        det2 = length_squared(n)
        n2 = cross(n, pa)
        t = safe_div(dot(n2, pb), det2, jnp.inf)
        v = safe_div(dot(n2, d), det2, -1.0)
        ok = ((u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
              & (t > eps) & (t < t_max) & (det2 > 1e-20) & (det >= 0.0))
        return jnp.where(ok, t, jnp.inf), v

    t_1, v_1 = solve(u1)
    t_2, v_2 = solve(u2)
    pick1 = t_1 <= t_2
    t = jnp.where(pick1, t_1, t_2)
    u = jnp.where(pick1, u1, u2)
    v = jnp.where(pick1, v_1, v_2)
    hit = jnp.isfinite(t)
    dpdu = e10 + v[..., None] * ((p11 - p01) - e10)
    dpdv = e00 + u[..., None] * (e11 - e00)
    n = normalize(cross(dpdu, dpdv))
    return hit, t, u, v, n
