"""Vector geometry over ``(..., 3)`` jnp arrays.

TPU-native analog of the reference's ``src/pbrt/util/vecmath.h``. Instead of
Point3f/Vector3f/Normal3f classes, everything is a plain array with a trailing
dimension of 3 — SoA-friendly, vmap/shard-trivial, and XLA fuses the
elementwise chains. Bounds are (pmin, pmax) pairs of such arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math import PI, safe_acos, safe_div, safe_sqrt, sqr


def vec(x, y, z, dtype=jnp.float32):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)], axis=-1
    )


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return dot(v, v)


def length(v):
    return jnp.sqrt(length_squared(v))


def normalize(v):
    return v * safe_div(1.0, length(v), fill=0.0)[..., None]


def distance(a, b):
    return length(a - b)


def distance_squared(a, b):
    return length_squared(a - b)


def face_forward(n, v):
    """Flip n so it lies in the hemisphere of v (pbrt FaceForward)."""
    return jnp.where(dot(n, v)[..., None] < 0, -n, n)


def angle_between(a, b):
    """Numerically stable angle between unit vectors (vecmath.h AngleBetween)."""
    asin_sum = jnp.arcsin(jnp.clip(length(a + b) * 0.5, -1.0, 1.0))
    asin_diff = jnp.arcsin(jnp.clip(length(b - a) * 0.5, -1.0, 1.0))
    return jnp.where(dot(a, b) < 0, PI - 2.0 * asin_sum, 2.0 * asin_diff)


def gram_schmidt(v, w):
    return v - dot(v, w)[..., None] * w


def coordinate_system(v):
    """Build an orthonormal basis around unit v (Duff et al. branchless).

    Returns (t1, t2) with (t1, t2, v) right-handed orthonormal.
    Mirrors vecmath.h CoordinateSystem's copysign construction.
    """
    z = v[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = v[..., 0] * v[..., 1] * a
    t1 = jnp.stack(
        [1.0 + sign * sqr(v[..., 0]) * a, sign * b, -sign * v[..., 0]], axis=-1
    )
    t2 = jnp.stack([b, sign + sqr(v[..., 1]) * a, -v[..., 1]], axis=-1)
    return t1, t2


# -- spherical geometry ------------------------------------------------------


def spherical_direction(sin_theta, cos_theta, phi):
    sin_theta = jnp.clip(sin_theta, -1.0, 1.0)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def spherical_theta(v):
    return safe_acos(v[..., 2])


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0, p + 2.0 * PI, p)


def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return sqr(w[..., 2])


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w):
    return jnp.sqrt(sin2_theta(w))


def tan_theta(w):
    return safe_div(sin_theta(w), cos_theta(w), fill=jnp.inf)


def tan2_theta(w):
    return safe_div(sin2_theta(w), cos2_theta(w), fill=jnp.inf)


def cos_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0, 1.0, jnp.clip(safe_div(w[..., 0], s), -1.0, 1.0))


def sin_phi(w):
    s = sin_theta(w)
    return jnp.where(s == 0, 0.0, jnp.clip(safe_div(w[..., 1], s), -1.0, 1.0))


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0


def spherical_triangle_area(a, b, c):
    return jnp.abs(
        2.0 * jnp.arctan2(dot(a, cross(b, c)), 1.0 + dot(a, b) + dot(a, c) + dot(b, c))
    )


def spherical_quad_area(a, b, c, d):
    return spherical_triangle_area(a, b, c) + spherical_triangle_area(a, c, d)


# -- octahedral unit-vector encoding (vecmath.h OctahedralVector) ------------


def _oct_wrap(v):
    return (1.0 - jnp.abs(v[..., ::-1])) * jnp.where(v >= 0.0, 1.0, -1.0)


def oct_encode(d):
    """Unit vector -> 2 floats in [-1,1]^2."""
    d = d / (jnp.abs(d[..., 0]) + jnp.abs(d[..., 1]) + jnp.abs(d[..., 2]))[..., None]
    xy = d[..., :2]
    xy = jnp.where(d[..., 2:3] >= 0.0, xy, _oct_wrap(xy))
    return xy


def oct_decode(e):
    x, y = e[..., 0], e[..., 1]
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    t = jnp.maximum(-z, 0.0)
    x = x + jnp.where(x >= 0, -t, t)
    y = y + jnp.where(y >= 0, -t, t)
    return normalize(jnp.stack([x, y, z], axis=-1))


# -- equal-area sphere <-> square (vecmath.h EqualAreaSquareToSphere) --------


def equal_area_square_to_sphere(p):
    """[0,1]^2 -> unit sphere, low-distortion equal-area (Clarberg 2008)."""
    u = 2.0 * p[..., 0] - 1.0
    v = 2.0 * p[..., 1] - 1.0
    up, vp = jnp.abs(u), jnp.abs(v)
    sd = 1.0 - (up + vp)
    d = jnp.abs(sd)
    r = 1.0 - d
    phi = jnp.where(r == 0, 1.0, (vp - up) / jnp.where(r == 0, 1.0, r) + 1.0) * PI / 4.0
    z = (1.0 - sqr(r)) * jnp.sign(sd)
    cos_phi_ = jnp.cos(phi) * jnp.sign(u)
    sin_phi_ = jnp.sin(phi) * jnp.sign(v)
    scale = r * safe_sqrt(2.0 - sqr(r))
    return jnp.stack([cos_phi_ * scale, sin_phi_ * scale, z], axis=-1)


def equal_area_sphere_to_square(d):
    x, y, z = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    r = safe_sqrt(1.0 - z)
    a = jnp.maximum(x, y)
    b = jnp.minimum(x, y)
    b = jnp.where(a == 0, 0.0, safe_div(b, a))
    # atan(b) on [0,1] via polynomial (Clarberg); jnp.arctan is fine on TPU
    phi = jnp.arctan(b) * (2.0 / PI)
    phi = jnp.where(x < y, 1.0 - phi, phi)
    v_ = phi * r
    u_ = r - v_
    # southern hemisphere: fold
    u_s = jnp.where(d[..., 2] < 0, 1.0 - v_, u_)
    v_s = jnp.where(d[..., 2] < 0, 1.0 - u_, v_)
    u_f = u_s * jnp.sign(d[..., 0])
    v_f = v_s * jnp.sign(d[..., 1])
    return jnp.stack([0.5 * (u_f + 1.0), 0.5 * (v_f + 1.0)], axis=-1)


# -- bounds ------------------------------------------------------------------


def bounds_union(b0, b1):
    return jnp.minimum(b0[0], b1[0]), jnp.maximum(b0[1], b1[1])


def bounds_union_point(b, p):
    return jnp.minimum(b[0], p), jnp.maximum(b[1], p)


def bounds_diagonal(b):
    return b[1] - b[0]


def bounds_surface_area(b):
    d = bounds_diagonal(b)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def bounds_centroid(b):
    return 0.5 * (b[0] + b[1])


def bounds_offset(b, p):
    """Relative position of p in b, in [0,1]^3."""
    d = bounds_diagonal(b)
    return safe_div(p - b[0], d, fill=0.0)


def bounds_contains(b, p):
    return jnp.all((p >= b[0]) & (p <= b[1]), axis=-1)


def bounds_bounding_sphere(b):
    c = bounds_centroid(b)
    return c, distance(c, b[1])


def bounds_expand(b, delta):
    return b[0] - delta, b[1] + delta
