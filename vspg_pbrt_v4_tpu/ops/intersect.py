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
