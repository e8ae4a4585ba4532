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


# ---------------------------------------------------------------------------
# AnimatedTransform (util/transform.h AnimatedTransform: TRS decomposition +
# slerp interpolation; used for motion blur with per-ray times)
# ---------------------------------------------------------------------------


def decompose(m):
    """Decompose a 4x4 into (T (3,), R quaternion (4,) wxyz, S (3,3)) —
    polar-decomposition iteration (transform.cpp AnimatedTransform ctor)."""
    m = np.asarray(m, np.float64)
    T = m[:3, 3].copy()
    M = m[:3, :3].copy()
    # polar decomposition: average with inverse transpose until convergence
    R = M.copy()
    for _ in range(100):
        R_next = 0.5 * (R + np.linalg.inv(R.T))
        if np.abs(R_next - R).max() < 1e-9:
            R = R_next
            break
        R = R_next
    S = np.linalg.inv(R) @ M
    # rotation matrix -> quaternion (w,x,y,z)
    tr_ = np.trace(R)
    if tr_ > 0:
        w = np.sqrt(1.0 + tr_) / 2
        q = np.array([w, (R[2, 1] - R[1, 2]) / (4 * w),
                      (R[0, 2] - R[2, 0]) / (4 * w),
                      (R[1, 0] - R[0, 1]) / (4 * w)])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12))
        qv = np.zeros(3)
        qv[i] = s / 2
        qv[j] = (R[j, i] + R[i, j]) / (2 * s)
        qv[k] = (R[k, i] + R[i, k]) / (2 * s)
        q = np.array([(R[k, j] - R[j, k]) / (2 * s), *qv])
    return T, q / np.linalg.norm(q), S


def _quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


class AnimatedTransform(NamedTuple):
    """Two keyframe transforms with TRS interpolation (transform.h
    AnimatedTransform). ``interpolate(t)`` is traceable: translation and
    scale lerp, rotation slerps."""

    t0: jnp.ndarray  # (3,)
    t1: jnp.ndarray
    q0: jnp.ndarray  # (4,) wxyz
    q1: jnp.ndarray
    s0: jnp.ndarray  # (3,3)
    s1: jnp.ndarray
    time0: float
    time1: float

    @staticmethod
    def make(xf_start: Transform, xf_end: Transform, time0=0.0, time1=1.0):
        T0, q0, S0 = decompose(xf_start.m)
        T1, q1, S1 = decompose(xf_end.m)
        if float(np.dot(q0, q1)) < 0:  # shortest arc
            q1 = -q1
        return AnimatedTransform(
            jnp.asarray(T0, jnp.float32), jnp.asarray(T1, jnp.float32),
            jnp.asarray(q0, jnp.float32), jnp.asarray(q1, jnp.float32),
            jnp.asarray(S0, jnp.float32), jnp.asarray(S1, jnp.float32),
            float(time0), float(time1))

    def interpolate_matrix(self, time):
        """(...,) times -> (...,4,4) interpolated matrices (traceable)."""
        dt = jnp.clip((time - self.time0)
                      / max(self.time1 - self.time0, 1e-9), 0.0, 1.0)
        T = (1 - dt)[..., None] * self.t0 + dt[..., None] * self.t1
        cos_th = jnp.sum(self.q0 * self.q1)
        theta = jnp.arccos(jnp.clip(cos_th, -1.0, 1.0))
        sin_th = jnp.sin(theta)
        w0 = jnp.where(sin_th > 1e-6, jnp.sin((1 - dt) * theta) / sin_th,
                       1 - dt)
        w1 = jnp.where(sin_th > 1e-6, jnp.sin(dt * theta) / sin_th, dt)
        q = w0[..., None] * self.q0 + w1[..., None] * self.q1
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        S = (1 - dt)[..., None, None] * self.s0 \
            + dt[..., None, None] * self.s1
        M = _quat_to_matrix(q) @ S
        out = jnp.zeros(dt.shape + (4, 4))
        out = out.at[..., :3, :3].set(M)
        out = out.at[..., :3, 3].set(T)
        out = out.at[..., 3, 3].set(1.0)
        return out

    def apply_point(self, p, time):
        m = self.interpolate_matrix(time)
        return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) \
            + m[..., :3, 3]
