"""4x4 homogeneous transforms (analog of ``util/transform.h``).

A Transform is a plain pair of (4,4) float32 arrays (m, m_inv); helpers build
the standard renderer transforms. Application functions broadcast over
``(..., 3)`` point/vector/normal arrays. Host-side scene construction uses
numpy; the same functions work on jnp arrays inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Transform(NamedTuple):
    m: jnp.ndarray  # (4,4)
    m_inv: jnp.ndarray  # (4,4)

    def inverse(self) -> "Transform":
        return Transform(self.m_inv, self.m)

    def __matmul__(self, other: "Transform") -> "Transform":
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)


def identity() -> Transform:
    eye = np.eye(4, dtype=np.float32)
    return Transform(eye, eye.copy())


def from_matrix(m) -> Transform:
    m = np.asarray(m, np.float32).reshape(4, 4)
    return Transform(m, np.linalg.inv(m).astype(np.float32))


def translate(dx, dy, dz) -> Transform:
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [dx, dy, dz]
    mi = np.eye(4, dtype=np.float32)
    mi[:3, 3] = [-dx, -dy, -dz]
    return Transform(m, mi)


def scale(sx, sy, sz) -> Transform:
    m = np.diag(np.array([sx, sy, sz, 1.0], np.float32))
    mi = np.diag(np.array([1.0 / sx, 1.0 / sy, 1.0 / sz, 1.0], np.float32))
    return Transform(m, mi)


def rotate(angle_deg, axis) -> Transform:
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    s, c = np.sin(np.radians(angle_deg)), np.cos(np.radians(angle_deg))
    m = np.eye(4, dtype=np.float64)
    x, y, z = a
    m[:3, :3] = [
        [x * x + (1 - x * x) * c, x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
        [x * y * (1 - c) + z * s, y * y + (1 - y * y) * c, y * z * (1 - c) - x * s],
        [x * z * (1 - c) - y * s, y * z * (1 - c) + x * s, z * z + (1 - z * z) * c],
    ]
    return Transform(m.astype(np.float32), m.T.astype(np.float32))


def rotate_x(deg):
    return rotate(deg, (1, 0, 0))


def rotate_y(deg):
    return rotate(deg, (0, 1, 0))


def rotate_z(deg):
    return rotate(deg, (0, 0, 1))


def look_at(eye, look, up) -> Transform:
    """Camera-to-world transform (pbrt LookAt semantics: left-handed +z view)."""
    eye = np.asarray(eye, np.float64)
    look = np.asarray(look, np.float64)
    up = np.asarray(up, np.float64)
    d = look - eye
    d = d / np.linalg.norm(d)
    right = np.cross(up / np.linalg.norm(up), d)
    nr = np.linalg.norm(right)
    if nr < 1e-8:
        raise ValueError("LookAt: up vector parallel to viewing direction")
    right /= nr
    new_up = np.cross(d, right)
    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, 0] = right
    c2w[:3, 1] = new_up
    c2w[:3, 2] = d
    c2w[:3, 3] = eye
    return Transform(c2w.astype(np.float32), np.linalg.inv(c2w).astype(np.float32))


def perspective(fov_deg, z_near=1e-2, z_far=1000.0) -> Transform:
    """Camera-to-NDC perspective projection (pbrt Perspective transform)."""
    persp = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 0, 0],
            [0, 0, z_far / (z_far - z_near), -z_far * z_near / (z_far - z_near)],
            [0, 0, 1, 0],
        ],
        np.float64,
    )
    inv_tan = 1.0 / np.tan(np.radians(fov_deg) / 2.0)
    s = np.diag([inv_tan, inv_tan, 1.0, 1.0])
    return from_matrix(s @ persp)


def orthographic(z_near=0.0, z_far=1.0) -> Transform:
    return scale(1.0, 1.0, 1.0 / (z_far - z_near)) @ translate(0, 0, -z_near)


# -- application (broadcast over (...,3)) ------------------------------------


def apply_point(t: Transform, p):
    m = t.m
    xp = p[..., 0] * m[0, 0] + p[..., 1] * m[0, 1] + p[..., 2] * m[0, 2] + m[0, 3]
    yp = p[..., 0] * m[1, 0] + p[..., 1] * m[1, 1] + p[..., 2] * m[1, 2] + m[1, 3]
    zp = p[..., 0] * m[2, 0] + p[..., 1] * m[2, 1] + p[..., 2] * m[2, 2] + m[2, 3]
    wp = p[..., 0] * m[3, 0] + p[..., 1] * m[3, 1] + p[..., 2] * m[3, 2] + m[3, 3]
    out = jnp.stack([xp, yp, zp], axis=-1)
    return jnp.where(wp[..., None] == 1.0, out, out / wp[..., None])


def apply_vector(t: Transform, v):
    m = t.m
    return jnp.stack(
        [
            v[..., 0] * m[0, 0] + v[..., 1] * m[0, 1] + v[..., 2] * m[0, 2],
            v[..., 0] * m[1, 0] + v[..., 1] * m[1, 1] + v[..., 2] * m[1, 2],
            v[..., 0] * m[2, 0] + v[..., 1] * m[2, 1] + v[..., 2] * m[2, 2],
        ],
        axis=-1,
    )


def apply_normal(t: Transform, n):
    mi = t.m_inv  # normals transform by inverse-transpose
    return jnp.stack(
        [
            n[..., 0] * mi[0, 0] + n[..., 1] * mi[1, 0] + n[..., 2] * mi[2, 0],
            n[..., 0] * mi[0, 1] + n[..., 1] * mi[1, 1] + n[..., 2] * mi[2, 1],
            n[..., 0] * mi[0, 2] + n[..., 1] * mi[1, 2] + n[..., 2] * mi[2, 2],
        ],
        axis=-1,
    )


def swaps_handedness(t: Transform) -> bool:
    return bool(np.linalg.det(np.asarray(t.m)[:3, :3]) < 0)
